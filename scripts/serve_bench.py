"""Service-level latency/throughput numbers for InpaintingService on-chip.

VERDICT r4 weak #7: the serving layer is correctness-tested but had no
recorded end-to-end service-level numbers. This measures, on the real TPU
(or CPU with JAX_PLATFORMS=cpu for plumbing checks):

  * single-gap request latency (one 1.5 s center gap in an 8.35 s clip) at
    max_batch=1 (latency mode) and the config's serving optimum;
  * sustained throughput: a stream of independent single-gap requests;
  * a chained long-gap request (10 s gap in a 30 s clip — exercises the
    autoregressive chain scheduler, reference edm_sampler.py:386-418 recipe).

Prints one JSON line per row and a markdown table for PARITY.md.

Usage: python scripts/serve_bench.py [checkpoint] [override ...]
"""
import json
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
    _plat = os.environ.get("JAX_PLATFORMS", "")
    if _plat and "axon" not in _plat:
        jax.config.update("jax_platforms", _plat)

    from aid_tpu.serving import InpaintingService

    ckpt = sys.argv[1] if len(sys.argv) > 1 and not ("=" in sys.argv[1]) \
        else None
    overrides = [o for o in sys.argv[1:] if "=" in o]
    reps = int(os.environ.get("SERVE_REPS", "3"))

    rows = []

    def bench(service, n_requests, audio_s, gap_s, label):
        fs = int(service.args.exp.sample_rate)
        rng = np.random.default_rng(0)
        n_samp = int(audio_s * fs)
        audio = (rng.standard_normal(n_samp) * 0.063).astype(np.float32)
        mask = np.ones(n_samp, np.float32)
        g = int(gap_s * fs)
        s = (n_samp - g) // 2
        mask[s:s + g] = 0.0
        # warmup / compile
        service.inpaint(audio, mask, fs, seed=1)
        times = []
        for r in range(reps):
            t0 = time.time()
            for i in range(n_requests):
                service.inpaint(audio, mask, fs, seed=2 + r * 97 + i)
            times.append((time.time() - t0) / n_requests)
        lat = min(times)
        row = {"case": label, "latency_s": round(lat, 3),
               "audio_s": audio_s, "gap_s": gap_s,
               "rtf": round(audio_s / lat, 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    # latency mode: one window per call
    svc1 = InpaintingService.from_config(overrides, checkpoint=ckpt,
                                         max_batch=1)
    clip_s = float(svc1.args.exp.audio_len) / float(svc1.args.exp.sample_rate)
    bench(svc1, 1, clip_s, 1.5, "single_gap_latency_b1")

    # throughput mode: the measured serving optimum co-batches requests'
    # windows only within ONE inpaint() call; a stream of single-gap
    # requests is one window each, so throughput mode is exercised with a
    # TWO-gap request (both windows ride one compiled call)
    svc = InpaintingService.from_config(overrides, checkpoint=ckpt)
    if svc.max_batch > 1:
        fs = int(svc.args.exp.sample_rate)
        n = int(3 * clip_s * fs)
        rng = np.random.default_rng(1)
        audio = (rng.standard_normal(n) * 0.063).astype(np.float32)
        mask = np.ones(n, np.float32)
        g = int(1.5 * fs)
        for c in (0.25, 0.75):
            s = int(c * n)
            mask[s:s + g] = 0.0
        svc.inpaint(audio, mask, fs, seed=1)  # warmup
        times = []
        for r in range(reps):
            t0 = time.time()
            svc.inpaint(audio, mask, fs, seed=5 + r)
            times.append(time.time() - t0)
        lat = min(times)
        rows.append({"case": f"two_gap_cobatch_b{svc.max_batch}",
                     "latency_s": round(lat, 3), "audio_s": 3 * clip_s,
                     "gap_s": 3.0, "rtf": round(3 * clip_s / lat, 3)})
        print(json.dumps(rows[-1]), flush=True)

    # chained long gap: 10 s gap in a 30 s clip (sequential passes)
    bench(svc, 1, 30.0, 10.0, f"chained_long_gap_b{svc.max_batch}")

    print("\n| case | latency s | audio s | gap s | RTF |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['case']} | {r['latency_s']} | {r['audio_s']:.2f} | "
              f"{r['gap_s']} | {r['rtf']} |")


if __name__ == "__main__":
    main()
