"""End-to-end inpainting demo (the reference's Colab notebook flow,
notebooks/demo_inpainting_spectrogram.ipynb: download checkpoint -> compose
config -> mask -> sample -> listen).

Usage:
    python examples/demo_inpainting.py --wav input.wav \
        --checkpoint maestro_22k_8s-750000.pt --gap-ms 1500 --out out/

Works with the released reference .pt checkpoints (converted on the fly) or
this framework's orbax .ckpt directories. Without --wav it inpaints a synthetic
tone cluster so the pipeline can be exercised anywhere.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wav", default=None, help="input audio (wav)")
    ap.add_argument("--checkpoint", default=None, help=".pt or .ckpt path")
    ap.add_argument("--gap-ms", type=float, default=1500.0)
    ap.add_argument("--xi", type=float, default=0.35,
                    help="guidance strength (notebook default)")
    ap.add_argument("--T", type=int, default=35)
    ap.add_argument("--out", default="demo_out")
    ap.add_argument("--spectrogram", action="store_true",
                    help="mask a time-frequency box instead of a time gap")
    args_cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from aid_tpu import setup as asetup
    from aid_tpu.data import audio_io
    from aid_tpu.utils import logging_utils as logu
    from aid_tpu.utils.config import compose

    args = compose(overrides=[
        f"tester.T={args_cli.T}",
        f"tester.posterior_sampling.xi={args_cli.xi}",
        f"model_dir={args_cli.out}",
        "tester.modes=['inpainting']",
    ])
    fs = int(args.exp.sample_rate)
    L = int(args.exp.audio_len)

    bundle = asetup.setup_network(args)
    bundle.init(jax.random.PRNGKey(0), 1, L)
    ediff = asetup.setup_diff_parameters(args)

    if args_cli.checkpoint:
        from aid_tpu.testing.tester import Tester
        t = Tester(args, network=bundle, diff_params=ediff, test_set=None)
        assert t.load_checkpoint(args_cli.checkpoint), "checkpoint load failed"
        sampler = t.sampler
    else:
        print("NOTE: no checkpoint given - sampling with random weights")
        sampler = asetup.setup_sampler(args, network=bundle, diff_params=ediff)

    if args_cli.wav:
        x, in_fs = audio_io.read(args_cli.wav)
        x = audio_io.resample_host(x, in_fs, fs)
    else:
        tgrid = np.arange(L) / fs
        x = sum(0.1 * np.sin(2 * np.pi * f0 * tgrid)
                for f0 in (220.0, 277.2, 329.6)).astype(np.float32)
    if x.shape[-1] < L:
        x = np.pad(x, (0, L - x.shape[-1]))
    x = x[:L][None]

    os.makedirs(args_cli.out, exist_ok=True)
    key = jax.random.PRNGKey(42)

    if args_cli.spectrogram:
        from aid_tpu.sampling import degradations as degr
        from aid_tpu.testing.tester import Tester
        t = Tester(args, network=bundle, diff_params=ediff, test_set=None)
        mask_FT = jnp.asarray(t.prepare_spectral_mask())
        apply_mask = degr.spectral_mask(mask_FT, args.tester.spectrogram_inpainting.stft)
        y_masked = apply_mask(jnp.asarray(x))
        rec = sampler.predict_spectrogram_inpainting(y_masked, mask_FT, key)
    else:
        gap = int(args_cli.gap_ms / 1000 * fs)
        mask = np.ones((1, L), np.float32)
        s = (L - gap) // 2
        mask[:, s:s + gap] = 0.0
        mask = jnp.asarray(mask)
        y_masked = jnp.asarray(x) * mask
        rec = sampler.predict_inpainting(y_masked, mask, key)

    for name, sig in (("original", x[0]), ("degraded", np.asarray(y_masked)[0]),
                      ("reconstructed", np.asarray(rec)[0])):
        fp = logu.write_audio_file(sig, fs, name, args_cli.out)
        logu.plot_spectrogram_from_raw_audio(sig, fs, fp + ".png", title=name)
        print("wrote", fp)


if __name__ == "__main__":
    main()
