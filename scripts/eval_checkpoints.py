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
    n_clips = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    args = compose(overrides=["exp=maestro22k_8s",
                              "logging.print_model_summary=False",
                              f"model_dir={model_dir}"]
                   + [o for o in sys.argv[4:] if o])
    L = int(args.exp.audio_len)
    fs = int(args.exp.sample_rate)

    # held-out clips: fixed offset into each 2009 test file, device-resampled
    # 44.1k -> 22.05k exactly like the training/test path
    test_files = sorted(glob.glob(os.path.join(corpus, "2009", "*.wav")))
    assert test_files, f"no 2009/ test split under {corpus}"
    clips = []
    for f in test_files[:n_clips]:
        x, ffs = audio_io.read(f)
        off = int(10.0 * ffs)
        seg = x[off:off + 2 * L + 256]
        y = resample_batch(jnp.asarray(seg[None]),
                           np.full((1,), ffs, np.int64), fs,
                           rates=(int(ffs),))
        clips.append(np.asarray(y)[:, :L])
    clean = np.concatenate(clips, axis=0)
    assert clean.shape == (len(clips), L), clean.shape

    gap = int(1.5 * fs)
    s = (L - gap) // 2
    mask = np.ones_like(clean)
    mask[:, s:s + gap] = 0.0
    y_masked = jnp.asarray(clean * mask)
    mask_j = jnp.asarray(mask)
    g = slice(s, s + gap)

    bundle = asetup.setup_network(args)
    ediff = asetup.setup_diff_parameters(args)
    bundle.init(jax.random.PRNGKey(0), clean.shape[0], L)
    sampler = asetup.setup_sampler(args, network=bundle, diff_params=ediff)

    ckpts = sorted(
        glob.glob(os.path.join(model_dir, f"{args.exp.exp_name}-*.ckpt")),
        key=lambda q: int(re.findall(r"-(\d+)\.ckpt$", q)[0]))
    assert ckpts, f"no checkpoints under {model_dir}"
    wav_dir = os.environ.get("EVAL_WAV_DIR", "")

    clean_emb = np.concatenate(
        [metrics.logmel_embedder(clean[i], fs) for i in range(len(clean))])

    print(f"{'it':>8} {'gap SNR dB':>11} {'gap LSD':>9} {'FAD':>8}"
          "  per-clip SNR")
    rows = []
    import orbax.checkpoint as ocp
    for ck in ckpts:
        it = int(re.findall(r"-(\d+)\.ckpt$", ck)[0])
        restored = ocp.PyTreeCheckpointer().restore(os.path.abspath(ck))
        # EMA weights, like the reference tester (tester_inpainting.py:195-202)
        bundle.params = restored.get("ema", restored.get("network"))
        rec = np.asarray(sampler.predict_inpainting(
            y_masked, mask_j, jax.random.PRNGKey(1234)))
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
                   "columns": ["it", "gap_snr_db", "gap_lsd", "fad_logmel"],
                   "rows": rows}, f, indent=1)
    print(f"ledger -> {ledger}")


if __name__ == "__main__":
    main()
