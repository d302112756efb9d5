"""Headline benchmark: long-gap inpainting real-time factor on one TPU chip.

Reproduces the reference's hot path (BASELINE.md: T=35 2nd-order stochastic
Heun, reconstruction guidance xi=0.25 => 2T-1 denoiser forwards AND backward
passes per segment, data-consistency projection every step, 1500 ms center gap
on a 184184-sample 22.05 kHz segment) with random-init weights (identical
FLOPs to trained ones) and prints ONE JSON line:

  {"metric": "inpaint_rtf", "value": <audio-seconds per wall-second>,
   "unit": "x_realtime", "vs_baseline": <value / 10.0>}

vs_baseline is against the driver-set north star of 10x real time per chip
(BASELINE.md "North star"; the reference repo publishes no perf numbers).
"""
import json
import os
import time

import numpy as np


def main() -> None:
    # batch 2 is the measured throughput optimum on one v5e for the flagship
    # guided workload (sweep in PARITY.md: 1 -> 2.117x, 2 -> 2.175x,
    # 3 -> 1.975x, 4 -> 1.90x aggregate RT; 3+ goes HBM-bound)
    batch = int(os.environ.get("BENCH_BATCH", "2"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    # BENCH_DEVICES=n: data-parallel serving over an n-device dp mesh
    # (aggregate RTF; per-window batch stays BENCH_BATCH per device). On the
    # 1-chip harness this is validated with virtual CPU devices:
    #   XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    #   BENCH_DEVICES=8 BENCH_OVERRIDES="exp=test_cqtdiff_22k ..." python bench.py
    n_dev = int(os.environ.get("BENCH_DEVICES", "1"))

    import jax

    # The axon sitecustomize pins the TPU backend regardless of the
    # JAX_PLATFORMS env var; honor an explicit non-axon request (the bench
    # guard test and the virtual-mesh BENCH_DEVICES mode run this script on
    # CPU — without this they'd attach the single-tenant TPU tunnel).
    _plat = os.environ.get("JAX_PLATFORMS", "")
    if _plat and "axon" not in _plat:
        jax.config.update("jax_platforms", _plat)

    # persistent compile cache: the flagship guided-Heun program is a large
    # XLA graph; cache it so only the first-ever bench run pays the compile
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/aid_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # A wedged TPU tunnel makes the PJRT attach block FOREVER (observed:
    # single-tenant relay holding a dead client's grant). Fail legibly
    # instead of hanging the whole bench run.
    import threading
    attached = threading.Event()

    def _watchdog():
        if not attached.wait(float(os.environ.get("BENCH_ATTACH_TIMEOUT",
                                                  "600"))):
            print("bench.py: backend attach timed out — TPU tunnel "
                  "unreachable; no benchmark was run", flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    jax.devices()        # force the attach now, under the watchdog
    attached.set()

    import jax.numpy as jnp

    from aid_tpu.utils.config import compose
    from aid_tpu import setup as asetup

    overrides = [o for o in os.environ.get("BENCH_OVERRIDES", "").split() if o]
    args = compose(overrides=overrides)
    audio_len = int(args.exp.audio_len)
    fs = float(args.exp.sample_rate)

    bundle = asetup.setup_network(args)
    ediff = asetup.setup_diff_parameters(args)

    # BENCH_TP=k: tensor-parallel latency mode — each score call split over
    # k chips (Megatron-style kernel sharding, aid_tpu/parallel/tp.py);
    # composes with BENCH_DEVICES as a (dp=BENCH_DEVICES, tp=k) mesh. The
    # first pod measurement for the 44k >=1x-realtime claim is
    #   BENCH_TP=4 BENCH_BATCH=1 BENCH_OVERRIDES="exp=musicnet44k_4s
    #   network=cqtdiff_plus_44k" python bench.py
    n_tp = int(os.environ.get("BENCH_TP", "1"))

    mesh = None
    if n_tp > 1:
        from aid_tpu.parallel import tp as ptp
        mesh = ptp.make_tp_mesh(n_tp, n_dp=n_dev)
        batch = batch * n_dev  # global batch: BENCH_BATCH windows per dp row
    elif n_dev > 1:
        from aid_tpu.parallel import mesh as pmesh
        mesh = pmesh.make_mesh(n_dev)
        n_dev = int(mesh.devices.size)
        batch = batch * n_dev  # global batch: BENCH_BATCH windows per device

    bundle.init(jax.random.PRNGKey(0), batch, audio_len)
    if mesh is not None:
        if n_tp > 1:
            from aid_tpu.parallel import tp as ptp
            bundle.params = ptp.place_params(bundle.params, mesh)
        else:
            from aid_tpu.parallel import mesh as pmesh
            bundle.params = pmesh.replicate(mesh, bundle.params)

    sampler = asetup.setup_sampler(args, network=bundle, diff_params=ediff)

    # 1500 ms center gap (reference conf/tester/inpainting_tester.yaml:74-77)
    gap = int(1500 / 1000 * fs)
    mask_np = np.ones((batch, audio_len), np.float32)
    start = (audio_len - gap) // 2
    mask_np[:, start:start + gap] = 0.0
    rng = np.random.default_rng(0)
    y_np = (rng.standard_normal((batch, audio_len)) * 0.063).astype(np.float32)
    if mesh is not None:
        from aid_tpu.parallel import mesh as pmesh
        sh = pmesh.batch_sharding(mesh)
        mask = jax.device_put(mask_np, sh)
        y = jax.device_put(y_np, sh)
    else:
        mask = jnp.asarray(mask_np)
        y = jnp.asarray(y_np)
    y_masked = y * mask

    key = jax.random.PRNGKey(1)
    # warmup / compile. NOTE: on the axon tunnel block_until_ready() may
    # return before remote execution finishes; a scalar readback is the only
    # reliable sync (adds ~27 ms RTT, negligible vs seconds-long programs).
    out = sampler.predict_inpainting(y_masked, mask, key)
    float(jnp.sum(out))

    times = []
    for i in range(reps):
        k = jax.random.fold_in(key, i)
        t0 = time.time()
        out = sampler.predict_inpainting(y_masked, mask, k)
        float(jnp.sum(out))
        times.append(time.time() - t0)

    wall = min(times)
    audio_seconds = batch * audio_len / fs
    rtf = audio_seconds / wall
    line = {
        "metric": "inpaint_rtf",
        "value": round(rtf, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 10.0, 3),
    }
    if n_dev > 1:
        line["devices"] = n_dev  # aggregate RTF over the dp mesh
    if n_tp > 1:
        line["tp"] = n_tp        # per-score latency split over tp chips
    print(json.dumps(line))


if __name__ == "__main__":
    main()
