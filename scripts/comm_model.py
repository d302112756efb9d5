"""Communication-cost model for tp/cp serving of the 44k flagship (VERDICT #4).

Makes the "tp(2) => >=1x realtime on the 44k" claim falsifiable BEFORE pod
hardware exists: compiles the guided-score program with real tp (Megatron
kernel sharding, parallel/tp.py) or cp (full-score context parallelism)
shardings on a virtual n-device CPU mesh, parses the compiled HLO for the
collectives XLA actually inserted (op counts + exact tensor bytes), and
combines them with v5e ICI parameters into a predicted per-score time and
realtime factor next to the measured single-chip number.

Model (per score):
  t(n) = t_compute(1)/n + wire_bytes/ICI_BW + n_collectives * LATENCY
  wire_bytes(all-gather/reduce-scatter) = (n-1)/n * full_tensor_bytes
  wire_bytes(all-reduce) = 2 * (n-1)/n * full_bytes   (ring)
  wire_bytes(collective-permute) = shard bytes
ICI_BW = 45 GB/s one-way per link (public v5e figure; a 1-D ring uses one
link each way — the bidirectional ring halves step time, which the BIDIR=1
toggle models), LATENCY = 1 us per collective (ring hop pipelining folded in).

Usage:
  python scripts/comm_model.py tp 2 [44k|22k]
  python scripts/comm_model.py cp 4 44k
Env: COMM_ICI_GBS (default 45), COMM_LAT_US (default 1.0), COMM_BIDIR (0/1,
     default 1), COMM_T_MS (measured single-chip ms/score override)
"""
import os
import re
import sys

MODE = sys.argv[1] if len(sys.argv) > 1 else "tp"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 2
MODEL = sys.argv[3] if len(sys.argv) > 3 else "44k"

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={N}")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

# measured single-chip per-score milliseconds (PARITY.md; trace-derived)
MEASURED_MS = {"44k": 111.3,   # 0.544x RT at batch 1: 4.1765 s / 0.544 / 69
               "22k": 121.8 / 2,  # batch-2 trace, per segment-score
               "tiny": 1.0}


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/aid_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from aid_tpu import setup as asetup
    from aid_tpu.parallel import tp as ptp
    from aid_tpu.sampling import degradations as degr
    from aid_tpu.sampling.heun import make_score_fn
    from aid_tpu.utils.config import compose

    overrides = ["logging.print_model_summary=False", "model_dir=/tmp/aid_cm"]
    if MODEL == "44k":
        overrides = ["exp=musicnet44k_4s", "network=cqtdiff_plus_44k"] + overrides
    elif MODEL == "tiny":  # parser self-test operating point (fast compile)
        overrides = ["exp=test_cqtdiff_22k", "exp.audio_len=8192",
                     "network.cqt.num_octs=3", "network.cqt.bins_per_oct=8",
                     "network.Ns=[8,16,16]", "network.num_dils=[1,1,1]",
                     "network.attention_layers=[0,0,1,1]"] + overrides
    if MODE == "cp":
        overrides += ["network.context_parallel=True",
                      "network.attention_dict.context_parallel=True"]
    args = compose(overrides=overrides)
    L = int(args.exp.audio_len)
    fs = float(args.exp.sample_rate)

    mesh = ptp.make_tp_mesh(N, n_dp=1)
    if MODE == "cp":
        from jax.sharding import Mesh
        from aid_tpu.parallel.ring_attention import set_cp_mesh
        mesh = Mesh(mesh.devices.reshape(1, N), ("dp", "cp"))
        set_cp_mesh(mesh)

    bundle = asetup.setup_network(args)
    ediff = asetup.setup_diff_parameters(args)
    bundle.init(jax.random.PRNGKey(0), 1, L)
    if MODE == "tp":
        bundle.params = ptp.place_params(bundle.params, mesh)
    sampler = asetup.setup_sampler(args, network=bundle, diff_params=ediff)

    gap = int(1.5 * fs)
    mask = np.ones((1, L), np.float32)
    s = (L - gap) // 2
    mask[:, s:s + gap] = 0.0
    mask_j = jnp.asarray(mask)
    smooth = jnp.asarray(degr.make_smooth_mask(mask, sampler.hann_size))
    y = jnp.zeros((1, L), jnp.float32)
    x = jnp.zeros((1, L), jnp.float32)
    p, cfg = sampler.p, sampler.cfg

    def jscore(prm, xx):
        proj = degr.inpainting_projector(y, smooth)
        score = make_score_fn(p, cfg, sampler._denoise_fn(prm), y=y,
                              degradation=degr.time_mask(mask_j), proj=proj,
                              hpf=sampler._hpf())
        return score(xx, 0.5)[0]

    print(f"compiling {MODE}({N}) {MODEL} score on the virtual mesh...",
          flush=True)
    with mesh:
        compiled = jax.jit(jscore).lower(bundle.params, x).compile()
    txt = compiled.as_text()
    if not isinstance(txt, str):
        txt = str(txt)

    DTB = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "c64": 8, "pred": 1,
           "s8": 1, "u32": 4, "f64": 8, "u8": 1, "s64": 8}

    def tensor_bytes(sig):
        """bytes of 'bf16[2,128,1024]{...}' or a (tuple, of, them)."""
        total = 0
        for m in re.finditer(r"(\w+)\[([\d,]*)\]", sig):
            dt = m.group(1)
            if dt not in DTB:
                continue
            dims = [int(d) for d in m.group(2).split(",") if d]
            n = int(np.prod(dims)) if dims else 1
            total += n * DTB[dt]
        return total

    colls = {"all-gather": [], "all-reduce": [], "reduce-scatter": [],
             "collective-permute": [], "all-to-all": []}
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?\S+ = (.+?) (all-gather|all-reduce|"
                     r"reduce-scatter|collective-permute|all-to-all)"
                     r"(?:-start)?\(", line)
        if m:
            colls[m.group(2)].append(tensor_bytes(m.group(1)))

    bw = float(os.environ.get("COMM_ICI_GBS", "45")) * 1e9
    if int(os.environ.get("COMM_BIDIR", "1")):
        bw *= 2.0
    lat = float(os.environ.get("COMM_LAT_US", "1.0")) * 1e-6
    t1 = float(os.environ.get("COMM_T_MS", MEASURED_MS[MODEL])) * 1e-3

    wire = 0.0
    n_coll = 0
    print(f"-- collectives in the compiled {MODE}({N}) score --")
    for kind, sizes in colls.items():
        if not sizes:
            continue
        full = sum(sizes)
        if kind == "all-reduce":
            w = 2 * (N - 1) / N * full
        elif kind in ("all-gather", "reduce-scatter"):
            w = (N - 1) / N * full
        else:  # permute / all-to-all: result bytes already per-shard wire
            w = full
        wire += w
        n_coll += len(sizes)
        print(f"  {kind:<20} x{len(sizes):4d}  result bytes {full/2**20:9.2f}"
              f" MiB  wire {w/2**20:9.2f} MiB")

    t_comm = wire / bw + n_coll * lat
    t_n = t1 / N + t_comm
    seg = L / fs
    print(f"\nmeasured single-chip: {t1*1e3:.1f} ms/score -> "
          f"RT {seg/(69*t1):.3f}x")
    print(f"{MODE}({N}): compute {t1/N*1e3:.1f} + comm {t_comm*1e3:.2f} ms "
          f"({wire/2**20:.1f} MiB wire, {n_coll} collectives)")
    print(f"predicted {MODE}({N}) per-score {t_n*1e3:.1f} ms -> "
          f"RT {seg/(69*t_n):.3f}x   "
          f"[ICI {bw/1e9:.0f} GB/s eff, {lat*1e6:.1f} us/coll]")


if __name__ == "__main__":
    main()
