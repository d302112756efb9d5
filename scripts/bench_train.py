"""Flagship training-step timing on the real TPU.

Composes the flagship config (remat on: one 15.75G chip OOMs without it),
feeds synthetic batches, and times the ONE jitted donated train step
(resample -> sigma-draw -> loss -> grads -> clip -> Adam -> EMA -> stats)
with a scalar-readback sync (axon's block_until_ready returns early for
short programs — BASELINE.md / verify skill).

Usage:  python scripts/bench_train.py [override ...]
Env:    TRAIN_BENCH_STEPS (default 10)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/aid_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from aid_tpu import setup as asetup
    from aid_tpu.utils.config import compose

    args = compose(overrides=["network.remat=True",
                              "logging.print_model_summary=False",
                              "logging.save_model=False",
                              "model_dir=/tmp/aid_bench_train"]
                   + [o for o in sys.argv[1:] if o])
    B = int(args.exp.batch)
    L = int(args.exp.audio_len)
    fs = int(args.exp.sample_rate)

    rng = np.random.default_rng(0)

    def batch():
        return (rng.standard_normal((B, L)).astype(np.float32) * 0.05,
                np.full((B,), fs, np.int64))

    bundle = asetup.setup_network(args)
    ediff = asetup.setup_diff_parameters(args)
    trainer = asetup.setup_trainer(args, dset=iter(batch, None),
                                   network=bundle, diff_params=ediff)
    trainer.init_state()

    def sync():
        leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
        return float(jnp.sum(leaf))

    t0 = time.time()
    audio, fsb = batch()
    m = trainer.train_step(audio, fsb)
    sync()
    print(f"first step (compile): {time.time() - t0:.1f}s")

    steps = int(os.environ.get("TRAIN_BENCH_STEPS", "10"))
    t0 = time.time()
    for _ in range(steps):
        audio, fsb = batch()
        trainer.train_step(audio, fsb)
    sync()
    dt = (time.time() - t0) / steps
    audio_s = B * L / fs
    print(f"train step: {dt * 1e3:.1f} ms  (global batch {B}, "
          f"{audio_s:.2f} s audio/step -> {audio_s / dt:.1f}x realtime)")


if __name__ == "__main__":
    main()
