"""Profile the guided-score hot path (the per-step cost unit of inpainting).

Times, on the real TPU, the three nested cost units of the flagship workload
(BASELINE.md: T=35 order-2 xi=0.25 long-gap inpainting):

  1. denoiser forward                           (1 NFE)
  2. guided score = value_and_grad(fwd) + proj  (1 score; the 69x unit)
  3. full segment sampler                       (69 scores)

and optionally captures a jax.profiler trace of (2) for op-level analysis
(PROFILE_TRACE=/path). Keeps the persistent XLA cache warm so re-runs are
cheap.

Usage:  python scripts/profile_score.py [override ...]
Env:    PROFILE_BATCH (default 1), PROFILE_TRACE (trace dir; off by default)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, reps=5):
    import jax
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/aid_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from aid_tpu import setup as asetup
    from aid_tpu.sampling import degradations as degr
    from aid_tpu.sampling.heun import make_score_fn
    from aid_tpu.utils.config import compose

    batch = int(os.environ.get("PROFILE_BATCH", "1"))
    args = compose(overrides=[o for o in sys.argv[1:] if o]
                   + ["logging.print_model_summary=False",
                      "model_dir=/tmp/aid_tpu_prof"])
    L = int(args.exp.audio_len)
    fs = float(args.exp.sample_rate)
    bundle = asetup.setup_network(args)
    ediff = asetup.setup_diff_parameters(args)
    bundle.init(jax.random.PRNGKey(0), batch, L)
    sampler = asetup.setup_sampler(args, network=bundle, diff_params=ediff)

    gap = int(1.5 * fs)
    mask = np.ones((batch, L), np.float32)
    s = (L - gap) // 2
    mask[:, s:s + gap] = 0.0
    mask_j = jnp.asarray(mask)
    smooth = jnp.asarray(degr.make_smooth_mask(mask, sampler.hann_size))
    y = jnp.zeros((batch, L), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, L), jnp.float32)

    p, cfg = sampler.p, sampler.cfg
    params = sampler.model.params

    @jax.jit
    def jfwd(prm, xx, tt):
        return sampler._denoise_fn(prm)(xx, tt)

    @jax.jit
    def jscore(prm, xx):
        proj = degr.inpainting_projector(y, smooth)
        score = make_score_fn(p, cfg, sampler._denoise_fn(prm), y=y,
                              degradation=degr.time_mask(mask_j), proj=proj,
                              hpf=sampler._hpf())
        return score(xx, 0.5)[0]

    t = jnp.full((batch, 1), 0.5, jnp.float32)

    dt_f = timeit(lambda: jfwd(params, x, t))
    print(f"denoiser fwd     : {dt_f*1e3:9.2f} ms", flush=True)
    dt_s = timeit(lambda: jscore(params, x))
    print(f"guided score     : {dt_s*1e3:9.2f} ms  (bwd/fwd = "
          f"{(dt_s - dt_f)/dt_f:.2f})", flush=True)
    n_scores = 2 * cfg.T - 1
    est = n_scores * dt_s
    print(f"est. segment     : {est:9.3f} s  -> RTF ~ {batch*L/fs/est:.2f}x",
          flush=True)

    trace = os.environ.get("PROFILE_TRACE", "")
    if trace:
        with jax.profiler.trace(trace):
            for _ in range(3):
                out = jscore(params, x)
            jax.block_until_ready(out)
        print(f"trace written to {trace}", flush=True)

    t0 = time.perf_counter()
    out = sampler.predict_inpainting(y, mask_j, jax.random.PRNGKey(0))
    jax.block_until_ready(out)
    dt0 = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = sampler.predict_inpainting(y, mask_j, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"full sampler     : {dt:9.3f} s (first {dt0:.3f})  "
          f"-> RTF {batch*L/fs/dt:.2f}x   per-score {dt/n_scores*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
