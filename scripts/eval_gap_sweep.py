"""Gap-length sweep eval on one checkpoint (the JAES paper's MUSHRA grid).

Runs guided long-gap inpainting at the reference's MUSHRA gap lengths
(tester_inpainting.py:355-358: {371, 743, 1486, 2962} ms, center-placed) on
held-out 2009-split clips, reporting gap-SNR / gap-LSD per length. All gap
lengths reuse ONE compiled program (the mask is data, shapes are static), so
the sweep costs compile-once + T-scan per length.

Usage:
  python scripts/eval_gap_sweep.py <checkpoint.ckpt|.pt> <corpus_root> \
      [n_clips] [override ...]
Env: EVAL_WAV_DIR (dump clean/masked/reconstructed wavs per gap length)
"""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

GAPS_MS = (371, 743, 1486, 2962)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/aid_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from aid_tpu import setup as asetup
    from aid_tpu.data import audio_io
    from aid_tpu.testing import metrics
    from aid_tpu.training.utils import resample_batch
    from aid_tpu.utils.config import compose

    ckpt = sys.argv[1]
    corpus = sys.argv[2]
    n_clips = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    args = compose(overrides=["exp=maestro22k_8s",
                              "logging.print_model_summary=False",
                              "model_dir=/tmp/aid_gap_sweep"]
                   + [o for o in sys.argv[4:] if o])
    L = int(args.exp.audio_len)
    fs = int(args.exp.sample_rate)

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

    bundle = asetup.setup_network(args)
    ediff = asetup.setup_diff_parameters(args)
    bundle.init(jax.random.PRNGKey(0), clean.shape[0], L)
    sampler = asetup.setup_sampler(args, network=bundle, diff_params=ediff)
    # EMA weights like the reference tester (tester_inpainting.py:195-202)
    if ckpt.endswith(".pt"):
        from aid_tpu.utils import checkpoint_torch as cvt
        bundle.params = cvt.load_reference_checkpoint(ckpt, bundle)
    else:
        from aid_tpu.utils import ckpt_io
        restored = ckpt_io.load(ckpt)
        # device_put once: host-numpy params would re-upload per sampler call
        bundle.params = jax.device_put(
            restored.get("ema", restored.get("network")))

    wav_dir = os.environ.get("EVAL_WAV_DIR", "")
    print(f"{'gap ms':>8} {'gap SNR dB':>11} {'gap LSD':>9}  per-clip SNR")
    rows = []
    for gms in GAPS_MS:
        gap = int(gms / 1000.0 * fs)
        if gap >= L - 2048:  # gap must leave context on both sides
            print(f"{gms:>8}  (skipped: gap {gap} >= window {L})", flush=True)
            continue
        s = (L - gap) // 2
        mask = np.ones_like(clean)
        mask[:, s:s + gap] = 0.0
        rec = np.asarray(sampler.predict_inpainting(
            jnp.asarray(clean * mask), jnp.asarray(mask),
            jax.random.PRNGKey(1234)))
        g = slice(s, s + gap)
        snrs = [metrics.snr(clean[i, g], rec[i, g])
                for i in range(clean.shape[0])]
        lsds = [metrics.lsd(clean[i, g], rec[i, g])
                for i in range(clean.shape[0])]
        rows.append((gms, float(np.mean(snrs)), float(np.mean(lsds))))
        print(f"{gms:>8} {np.mean(snrs):>11.2f} {np.mean(lsds):>9.3f}  "
              + " ".join(f"{v:.2f}" for v in snrs), flush=True)
        if wav_dir:
            os.makedirs(wav_dir, exist_ok=True)
            for i in range(min(2, clean.shape[0])):
                audio_io.write(os.path.join(
                    wav_dir, f"gap{gms}ms_clip{i}_rec.wav"), rec[i], fs)

    print("\n| gap (ms) | gap SNR (dB) | gap LSD |")
    print("|---|---|---|")
    for gms, sn, ls in rows:
        print(f"| {gms} | {sn:.2f} | {ls:.3f} |")
    out = os.path.join(os.path.dirname(os.path.abspath(ckpt)) or ".",
                       "gap_sweep.json")
    with open(out, "w") as f:
        json.dump({"workload": "guided inpainting T=35 order-2 xi=0.25, "
                               "MUSHRA gap grid (center-placed)",
                   "checkpoint": os.path.abspath(ckpt),
                   "n_clips": int(clean.shape[0]),
                   "columns": ["gap_ms", "gap_snr_db", "gap_lsd"],
                   "rows": rows}, f, indent=1)
    print(f"ledger -> {out}")


if __name__ == "__main__":
    main()
