"""Checkpoint-parity harness: compare this framework's denoiser against the
reference on a released .pt checkpoint (SURVEY.md §4 gate (3)).

Zero-egress environments can't fetch the HuggingFace checkpoints, so this
script is the one-command check for when a .pt IS available:

    python scripts/parity_vs_reference.py --pt maestro_22k_8s-750000.pt \
        [--network cqtdiff_plus_22k --exp maestro22k_8s] [--export out.npz]

It (1) converts the EMA weights, (2) runs D(x, sigma) on a fixed seeded input
at several sigmas in f32/highest-precision matmuls, (3) prints summary stats,
and (4) optionally exports the tensors to .npz so the same input can be run
through the PyTorch reference elsewhere and diffed offline:

    np.load(out.npz): x, sigmas, denoised[s, b, t]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pt", required=True)
    ap.add_argument("--network", default="cqtdiff_plus_22k")
    ap.add_argument("--exp", default="maestro22k_8s")
    ap.add_argument("--export", default=None)
    ap.add_argument("--compare", default=None,
                    help=".npz with reference 'denoised' to diff against")
    args_cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")

    from aid_tpu import setup as asetup
    from aid_tpu.diffusion import edm
    from aid_tpu.utils.config import compose

    args = compose(overrides=[
        f"network={args_cli.network}",
        f"exp={args_cli.exp}",
        "network.compute_dtype=float32",   # parity runs are f32
        "model_dir=/tmp/aid_tpu_parity",
    ])
    L = int(args.exp.audio_len)
    bundle = asetup.setup_network(args)
    bundle.init(jax.random.PRNGKey(0), 1, L)

    from aid_tpu.utils import checkpoint_torch
    bundle.params = checkpoint_torch.load_reference_checkpoint(args_cli.pt,
                                                               bundle)
    print(f"converted {args_cli.pt}")

    ediff = asetup.setup_diff_parameters(args)
    p = ediff.params
    rng = np.random.default_rng(1234)
    x = jnp.asarray(rng.standard_normal((1, L)) * 0.063, jnp.float32)
    sigmas = np.asarray([1e-3, 1e-2, 1e-1, 0.5, 1.0], np.float32)

    outs = []
    fwd = jax.jit(lambda xn, s: edm.denoiser(
        p, lambda q, cn: bundle.module.apply(bundle.params, q, cn), xn, s))
    for s in sigmas:
        xn = x + s * jnp.asarray(rng.standard_normal((1, L)), jnp.float32)
        d = np.asarray(fwd(xn, jnp.full((1, 1), s)))
        outs.append(d)
        print(f"sigma={s:8.4f}  |D|_max={np.abs(d).max():.5f} "
              f"std={d.std():.5f}")
    den = np.stack(outs)

    if args_cli.export:
        np.savez(args_cli.export, x=np.asarray(x), sigmas=sigmas, denoised=den)
        print("exported", args_cli.export)
    if args_cli.compare:
        ref = np.load(args_cli.compare)["denoised"]
        diff = np.abs(den - ref)
        print(f"max-abs-diff vs reference: {diff.max():.3e} "
              f"(rel {diff.max() / (np.abs(ref).max() + 1e-12):.3e})")
        assert diff.max() < 1e-3, "parity FAILED"
        print("parity OK")


if __name__ == "__main__":
    main()
