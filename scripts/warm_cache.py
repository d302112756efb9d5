"""Pre-compile the production programs into the persistent XLA cache.

Remote TPU compilation of the flagship programs takes ~10-15 minutes each;
deploys should pay that once, offline. This warms: the guided-inpainting
sampler (bench/serving hot path), the unconditional sampler, and the training
step — for the flagship config plus any extra override sets given on the
command line (semicolon-separated).

Usage:
    python scripts/warm_cache.py                       # flagship defaults
    python scripts/warm_cache.py "network.remat=True"  # + training variant
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def warm(overrides):
    import jax
    import jax.numpy as jnp

    from aid_tpu import setup as asetup
    from aid_tpu.utils.config import compose

    args = compose(overrides=overrides + ["logging.print_model_summary=False",
                                          "model_dir=/tmp/aid_tpu_warm"])
    L = int(args.exp.audio_len)
    fs = float(args.exp.sample_rate)
    bundle = asetup.setup_network(args)
    ediff = asetup.setup_diff_parameters(args)
    bundle.init(jax.random.PRNGKey(0), 1, L)
    sampler = asetup.setup_sampler(args, network=bundle, diff_params=ediff)

    gap = int(1.5 * fs)
    mask = np.ones((1, L), np.float32)
    s = (L - gap) // 2
    mask[:, s:s + gap] = 0.0
    mask_j = jnp.asarray(mask)
    y = jnp.zeros((1, L), jnp.float32)

    t0 = time.time()
    out = sampler.predict_inpainting(y, mask_j, jax.random.PRNGKey(0))
    float(jnp.sum(out))
    print(f"[warm] guided inpainting sampler: {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    out = sampler.predict_unconditional((1, L), jax.random.PRNGKey(0))
    float(jnp.sum(out))
    print(f"[warm] unconditional sampler: {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    # flagship training on ONE 15.75G chip needs remat (README quick start);
    # warming the no-remat variant just OOMs the compiler
    if "network.remat=True" not in overrides:
        args = compose(overrides=overrides + ["network.remat=True",
                                              "logging.print_model_summary=False",
                                              "model_dir=/tmp/aid_tpu_warm"])
        bundle = asetup.setup_network(args)
        bundle.init(jax.random.PRNGKey(0), 1, L)
    trainer = asetup.setup_trainer(args, dset=None, network=bundle,
                                   diff_params=ediff)
    trainer.init_state()
    audio = np.zeros((int(args.exp.batch), L), np.float32)
    fsb = np.full((int(args.exp.batch),), int(fs), np.int64)
    m = trainer.train_step(audio, fsb)
    float(np.asarray(m["loss"]))
    print(f"[warm] train step: {time.time()-t0:.0f}s", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/aid_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sets = [[]]
    for arg in sys.argv[1:]:
        sets.append([o for o in arg.split() if o])
    for ov in sets:
        print(f"[warm] overrides: {ov or '(flagship defaults)'}", flush=True)
        try:
            warm(ov)
        except Exception as e:
            print(f"[warm] variant failed: {e}", flush=True)


if __name__ == "__main__":
    main()
