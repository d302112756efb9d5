"""Checkpoint-over-checkpoint guided-inpainting eval (PARITY.md round 4).

For every ``{exp_name}-{it}.ckpt`` in a training run directory, loads the EMA
weights and runs the flagship guided long-gap inpainting task (T=35 order-2
xi=0.25, 1.5 s center gap — reference conf/tester/inpainting_tester.yaml) on
held-out test clips from the corpus' 2009 split, reporting gap-SNR and
gap-LSD per checkpoint. This is the training-evidence ledger the reference
never ships (it has no metrics at all): monotone improvement over iterations
is the acceptance for a believed-at-scale training run.

Alongside the per-gap SNR/LSD it reports a set-level FAD (in-repo log-mel
embedder, reconstructed-vs-clean full signals) per checkpoint, and writes the
whole table to ``{model_dir}/eval_ledger.json``.

Usage:
  python scripts/eval_checkpoints.py <model_dir> <corpus_root> [n_clips] \
      [override ...]
Env: EVAL_WAV_DIR (dump orig/masked/reconstructed wavs per checkpoint here)
"""
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/aid_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from aid_tpu import setup as asetup
    from aid_tpu.data import audio_io
    from aid_tpu.sampling import degradations as degr
    from aid_tpu.testing import metrics
    from aid_tpu.training.utils import resample_batch
    from aid_tpu.utils.config import compose

    model_dir = sys.argv[1]
    corpus = sys.argv[2]
    n_clips = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    args = compose(overrides=["exp=maestro22k_8s",
                              "logging.print_model_summary=False",
                              f"model_dir={model_dir}"]
                   + [o for o in sys.argv[4:] if o])
    L = int(args.exp.audio_len)
    fs = int(args.exp.sample_rate)

    # held-out clips: fixed offsets into each 2009 test file (several
    # non-overlapping offsets per file so a 4-file split still yields >=16
    # clips — VERDICT r4 weak #2: N=4 was too thin), device-resampled
    # 44.1k -> 22.05k exactly like the training/test path
    test_files = sorted(glob.glob(os.path.join(corpus, "2009", "*.wav")))
    assert test_files, f"no 2009/ test split under {corpus}"
    per_file = max(1, -(-n_clips // len(test_files)))
    clips = []
    for f in test_files:
        x, ffs = audio_io.read(f)
        for j in range(per_file):
            if len(clips) >= n_clips:
                break
            off = int((10.0 + 30.0 * j) * ffs)
            seg = x[off:off + 2 * L + 256]
            if seg.shape[-1] < 2 * L + 256:
                continue
            y = resample_batch(jnp.asarray(seg[None]),
                               np.full((1,), ffs, np.int64), fs,
                               rates=(int(ffs),))
            clips.append(np.asarray(y)[:, :L])
    clean = np.concatenate(clips, axis=0)
    assert clean.shape == (len(clips), L), clean.shape
    print(f"eval set: {clean.shape[0]} clips x {L / fs:.2f} s "
          f"from {len(test_files)} held-out files")

    gap = int(1.5 * fs)
    s = (L - gap) // 2
    mask = np.ones_like(clean)
    mask[:, s:s + gap] = 0.0
    y_masked = jnp.asarray(clean * mask)
    mask_j = jnp.asarray(mask)
    g = slice(s, s + gap)

    eval_bs = int(os.environ.get("EVAL_BATCH", "4"))
    bundle = asetup.setup_network(args)
    ediff = asetup.setup_diff_parameters(args)
    bundle.init(jax.random.PRNGKey(0), eval_bs, L)
    sampler = asetup.setup_sampler(args, network=bundle, diff_params=ediff)

    def run_all(key):
        """Guided inpainting over the whole eval set in eval_bs chunks (one
        compile for the [eval_bs, L] program; 16 clips at batch 16 would
        blow HBM — the measured serving optimum is batch<=2-4)."""
        outs = []
        for i in range(0, clean.shape[0], eval_bs):
            outs.append(np.asarray(sampler.predict_inpainting(
                y_masked[i:i + eval_bs], mask_j[i:i + eval_bs],
                jax.random.fold_in(key, i))))
        return np.concatenate(outs, axis=0)

    ckpts = sorted(
        glob.glob(os.path.join(model_dir, f"{args.exp.exp_name}-*.ckpt")),
        key=lambda q: int(re.findall(r"-(\d+)\.ckpt$", q)[0]))
    only = os.environ.get("EVAL_ITS", "")  # e.g. "22500,25000" to subset
    if only:
        keep = {int(v) for v in only.split(",") if v}
        ckpts = [c for c in ckpts
                 if int(re.findall(r"-(\d+)\.ckpt$", c)[0]) in keep]
    assert ckpts, f"no checkpoints under {model_dir}"
    wav_dir = os.environ.get("EVAL_WAV_DIR", "")

    clean_emb = np.concatenate(
        [metrics.logmel_embedder(clean[i], fs) for i in range(len(clean))])

    print(f"{'it':>8} {'gap SNR dB':>11} {'gap LSD':>9} {'FAD':>8}"
          "  per-clip SNR")
    rows = []

    # masked-input baseline (VERDICT r4 weak #2): the metrics of the degraded
    # signal itself — the floor any checkpoint must beat. gap-SNR of silence
    # is 0 dB by the SNR definition; LSD/FAD of the zeroed gap are the real
    # reference floor.
    masked_np = np.asarray(y_masked)
    base_snr = float(np.mean([metrics.snr(clean[i, g], masked_np[i, g])
                              for i in range(clean.shape[0])]))
    base_lsd = float(np.mean([metrics.lsd(clean[i, g], masked_np[i, g])
                              for i in range(clean.shape[0])]))
    base_emb = np.concatenate(
        [metrics.logmel_embedder(masked_np[i], fs) for i in range(len(clean))])
    base_fad = float(metrics.fad_from_embeddings(base_emb, clean_emb))
    print(f"{'masked':>8} {base_snr:>11.2f} {base_lsd:>9.3f} {base_fad:>8.3f}"
          "  (degraded-input floor)")

    from aid_tpu.utils import ckpt_io
    for ck in ckpts:
        it = int(re.findall(r"-(\d+)\.ckpt$", ck)[0])
        restored = ckpt_io.load(ck)
        # EMA weights, like the reference tester (tester_inpainting.py:195-202)
        # device_put once: host-numpy params would re-upload per sampler call
        bundle.params = jax.device_put(
            restored.get("ema", restored.get("network")))
        # EVAL_SEED varies the sampler noise stream (seed-variance studies);
        # the default 1234 keeps rows comparable checkpoint-over-checkpoint
        rec = run_all(jax.random.PRNGKey(
            int(os.environ.get("EVAL_SEED", "1234"))))
        snrs = [metrics.snr(clean[i, g], rec[i, g])
                for i in range(clean.shape[0])]
        lsds = [metrics.lsd(clean[i, g], rec[i, g])
                for i in range(clean.shape[0])]
        rec_emb = np.concatenate(
            [metrics.logmel_embedder(rec[i], fs) for i in range(len(rec))])
        fad = metrics.fad_from_embeddings(rec_emb, clean_emb)
        rows.append((it, float(np.mean(snrs)), float(np.mean(lsds)),
                     float(fad)))
        print(f"{it:>8} {np.mean(snrs):>11.2f} {np.mean(lsds):>9.3f} "
              f"{fad:>8.3f}  "
              + " ".join(f"{v:.2f}" for v in snrs), flush=True)
        if wav_dir:
            os.makedirs(wav_dir, exist_ok=True)
            for i in range(min(2, clean.shape[0])):
                audio_io.write(os.path.join(wav_dir,
                                            f"it{it}_clip{i}_rec.wav"),
                               rec[i], fs)
                if it == rows[0][0]:
                    audio_io.write(os.path.join(
                        wav_dir, f"clip{i}_orig.wav"), clean[i], fs)
                    audio_io.write(os.path.join(
                        wav_dir, f"clip{i}_masked.wav"), clean[i] * mask[i],
                        fs)
    print("\n| it | gap SNR (dB) | gap LSD | FAD (logmel) |")
    print("|---|---|---|---|")
    for it, sn, ls, fd in rows:
        print(f"| {it} | {sn:.2f} | {ls:.3f} | {fd:.3f} |")
    ledger = os.path.join(model_dir, "eval_ledger.json")
    with open(ledger, "w") as f:
        json.dump({"workload": "guided inpainting T=35 order-2 xi=0.25, "
                               "1.5 s center gap",
                   "n_clips": int(clean.shape[0]),
                   "masked_baseline": {"gap_snr_db": base_snr,
                                       "gap_lsd": base_lsd,
                                       "fad_logmel": base_fad},
                   "columns": ["it", "gap_snr_db", "gap_lsd", "fad_logmel"],
                   "rows": rows}, f, indent=1)
    print(f"ledger -> {ledger}")


if __name__ == "__main__":
    main()
