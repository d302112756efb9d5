"""Microbenchmark the dilated freq-conv formulations at flagship shapes.

The dilated (5,3) freq-convs are ~60% of denoiser FLOPs (PARITY.md). This
sweeps, per encoder level of the 22k flagship, the lowering strategies:

  direct   conv_general_dilated with rhs_dilation=(d,1)           [current d<8]
  regroup  residue-class fold: plain conv at batch*d              [current d>=8]
  fold2    regroup + fold time-pairs into channels (C->2C) so C=64
           levels use full 128 MXU lanes

and reports ms, TFLOP/s, and % of v5e bf16 peak (197 TFLOP/s), fwd and
fwd+bwd(dx). Small programs — compiles in seconds, safe to iterate.

Usage: python scripts/bench_convs.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/aid_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PEAK = 197e12  # v5e bf16 peak FLOP/s


def conv_direct(x, w, d):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", rhs_dilation=(d, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_regroup(x, w, d):
    B, F, T, C = x.shape
    N = w.shape[-1]
    z = x.reshape(B, F // d, d, T, C).transpose(0, 2, 1, 3, 4)
    z = z.reshape(B * d, F // d, T, C)
    y = jax.lax.conv_general_dilated(
        z, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(B, d, F // d, T, N)
    return y.transpose(0, 2, 1, 3, 4).reshape(B, F, T, N)


def conv_fold2(x, w, d):
    """Regroup + fold adjacent time pairs into channels: the (5,3) conv on
    [*, F', T, C] becomes a (5,2) conv on [*, F', T/2, 2C] with a
    block-structured kernel. Exact for SAME padding when T is even."""
    B, F, T, C = x.shape
    kh, kw, _, N = w.shape
    assert kw == 3 and T % 2 == 0
    z = x.reshape(B, F // d, d, T, C).transpose(0, 2, 1, 3, 4)
    z = z.reshape(B * d, F // d, T // 2, 2 * C)
    # out even t (pair slot 0): taps x[2t-1]=in[t-1]c1, x[2t]=in[t]c0, x[2t+1]=in[t]c1
    # out odd  t (pair slot 1): taps x[2t]  =in[t]c0,  x[2t+1]=in[t]c1, x[2t+2]=in[t+1]c0
    w2 = np.zeros((kh, 2, 2 * C, 2 * N), np.float32)
    wn = np.asarray(w, np.float32)
    # kernel time index: 0 -> t-1 tap, 1 -> t, 2 -> t+1 (SAME, size 3)
    # folded kernel window of size 2 over pairs: j=0 -> pair t-1.. wait:
    # choose folded window j in {0,1} covering pairs {t_p-? }. Use padding (1,1)
    # below with window size 2 covering pairs [t_p, t_p+1] after a left-shift:
    # simpler: window size 2 with explicit padding (1, 0): covers pairs
    # [t_p - 1, t_p].
    #   even out (slot0) at pair t_p needs in pairs t_p-1 (c1) and t_p (c0,c1)
    #   odd  out (slot1) at pair t_p needs in pairs t_p (c0,c1) and t_p+1 (c0)
    # -> not expressible with one window for both slots unless size 2 window
    #    is [t_p-1, t_p] for slot0 and [t_p, t_p+1] for slot1. Use size-3
    #    folded window with SAME padding instead (27% extra MACs but uniform):
    w3 = np.zeros((kh, 3, 2 * C, 2 * N), np.float32)
    for h in range(kh):
        # slot0 output (cols 0:N): in[t-1]=pair(t_p-1) slot1 tap w[...,0]
        w3[h, 0, C:2 * C, 0:N] = wn[h, 0]          # prev pair, slot1
        w3[h, 1, 0:C, 0:N] = wn[h, 1]              # this pair, slot0
        w3[h, 1, C:2 * C, 0:N] = wn[h, 2]          # this pair, slot1
        # slot1 output (cols N:2N)
        w3[h, 1, 0:C, N:2 * N] = wn[h, 0]
        w3[h, 1, C:2 * C, N:2 * N] = wn[h, 1]
        w3[h, 2, 0:C, N:2 * N] = wn[h, 2]
    y = jax.lax.conv_general_dilated(
        z, jnp.asarray(w3, x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(B, d, F // d, T // 2, 2, N).transpose(0, 2, 1, 3, 4, 5)
    return y.reshape(B, F, T, N)


def _chain(step, x, reps):
    """reps applications of `step` chained INSIDE one jitted program: the
    axon tunnel costs ~1-2 ms per dispatch, which swamps per-op time; the
    real sampler runs hundreds of ops per dispatch, so that is the regime
    to measure."""
    def body(c, _):
        y = step(c)
        # renormalize so bf16 doesn't overflow across the chain (cheap VPU)
        return y * jax.lax.rsqrt(jnp.mean(jnp.square(y.astype(jnp.float32))) + 1e-9).astype(y.dtype), None
    return jax.lax.scan(body, x, None, length=reps)[0]


def conv_foldf(x, w, d):
    """Regroup (if d>1) + fold adjacent FREQ pairs into channels: the (5,3)
    conv on [*, F', T, C] becomes a (3,3) conv on [*, F'/2, T, 2C] -> 2N.
    MAC overhead 18/15 = 1.2x for 2x lane width at C=64. Exact for SAME
    padding when F' is even."""
    B, F, T, C = x.shape
    kh, kw, _, N = w.shape
    assert kh == 5
    if d > 1:
        z = x.reshape(B, F // d, d, T, C).transpose(0, 2, 1, 3, 4)
        z = z.reshape(B * d, F // d, T, C)
    else:
        z = x
    Bz, Fz = z.shape[0], z.shape[1]
    assert Fz % 2 == 0
    z = z.reshape(Bz, Fz // 2, 2, T, C)
    z = z.transpose(0, 1, 3, 2, 4).reshape(Bz, Fz // 2, T, 2 * C)
    wn = np.asarray(w, np.float32)
    # folded window size 3 over freq-pairs (SAME pad 1), slot = f parity.
    #   out slot0 at pair p, tap r in {-2..2}: in row 2p+r -> pair p+(r-(r&1?..))
    # Build by direct index mapping: out slot s (s in {0,1}) row 2p+s; input
    # row 2p+s+r-2 (r=0..4) = pair (2p+s+r-2)//2, slot (s+r)%2.
    w3 = np.zeros((3, kw, 2 * C, 2 * N), np.float32)
    for s in (0, 1):
        for r in range(5):
            q = s + r - 2            # row offset from 2p
            pair_off = q // 2        # in {-1, 0, 1}
            slot_in = q % 2
            w3[pair_off + 1, :, slot_in * C:(slot_in + 1) * C,
               s * N:(s + 1) * N] += wn[r]
    y = jax.lax.conv_general_dilated(
        z, jnp.asarray(w3, x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(Bz, Fz // 2, T, 2, N).transpose(0, 1, 3, 2, 4).reshape(Bz, Fz, T, N)
    if d > 1:
        y = y.reshape(B, d, F // d, T, N)
        y = y.transpose(0, 2, 1, 3, 4).reshape(B, F, T, N)
    return y


def conv_packf_grouped(x, w, d):
    """Freq-pair lane packing WITHOUT regroup, for EVEN d: output parity ==
    input parity when the tap stride is even, so the (5,3) dilation-d conv on
    [B,F,T,C] equals a feature_group_count=2 (5,3) dilation-(d/2) conv on the
    packed [B,F/2,T,2C] tensor with kernel [5,3,C,2N] (each parity group gets
    the same taps). Zero per-layer transposes once the stack is packed."""
    B, F, T, C = x.shape
    N = w.shape[-1]
    assert d % 2 == 0 and F % 2 == 0
    z = x.reshape(B, F // 2, 2, T, C).transpose(0, 1, 3, 2, 4)
    z = z.reshape(B, F // 2, T, 2 * C)
    wg = jnp.concatenate([w, w], axis=-1)  # [5,3,C,2N]: per-group kernels
    y = jax.lax.conv_general_dilated(
        z, wg, (1, 1), "SAME", rhs_dilation=(d // 2, 1),
        feature_group_count=2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(B, F // 2, T, 2, N).transpose(0, 1, 3, 2, 4)
    return y.reshape(B, F, T, N)


def conv_packf_dense(x, w, d):
    """Packed freq pairs with a DENSE block-diagonal kernel [5,3,2C,2N]
    (2x MACs but a single full-lane conv — no grouped-conv lowering)."""
    B, F, T, C = x.shape
    N = w.shape[-1]
    assert d % 2 == 0 and F % 2 == 0
    z = x.reshape(B, F // 2, 2, T, C).transpose(0, 1, 3, 2, 4)
    z = z.reshape(B, F // 2, T, 2 * C)
    wd = jnp.zeros((5, 3, 2 * C, 2 * N), w.dtype)
    wd = wd.at[:, :, :C, :N].set(w)
    wd = wd.at[:, :, C:, N:].set(w)
    y = jax.lax.conv_general_dilated(
        z, wd, (1, 1), "SAME", rhs_dilation=(d // 2, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(B, F // 2, T, 2, N).transpose(0, 1, 3, 2, 4)
    return y.reshape(B, F, T, N)


def conv_tf_swap(x, w, d):
    """[B,T,F,C] spatial order: dilation rides the W (second-minor) spatial
    dim — probes whether XLA's TPU conv prefers the dilated dim minor."""
    z = x.transpose(0, 2, 1, 3)
    y = jax.lax.conv_general_dilated(
        z, w.transpose(1, 0, 2, 3), (1, 1), "SAME", rhs_dilation=(1, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.transpose(0, 2, 1, 3)


def conv_tf_native(x, w, d):
    """Same as tf_swap but x ALREADY [B,T,F,C] (no transposes measured):
    the number to compare if the whole model flipped its layout."""
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", rhs_dilation=(1, d),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def run(name, fn, x, w, d, reps=30):
    f = jax.jit(lambda a: _chain(lambda c: fn(c, w, d), a, reps))
    base = jax.jit(lambda a: _chain(lambda c: c * 1.000001, a, reps))
    jax.block_until_ready(f(x)); jax.block_until_ready(base(x))
    t0 = time.perf_counter(); jax.block_until_ready(f(x))
    t1 = time.perf_counter(); jax.block_until_ready(base(x))
    t2 = time.perf_counter()
    dt = max((t1 - t0) - (t2 - t1), 1e-9) / reps

    def gstep(c):
        return jax.grad(lambda a: jnp.sum(fn(a, w, d).astype(jnp.float32) ** 2))(c)
    g = jax.jit(lambda a: _chain(gstep, a, reps))
    jax.block_until_ready(g(x))
    t0 = time.perf_counter(); jax.block_until_ready(g(x))
    t1 = time.perf_counter()
    dtg = max((t1 - t0) - (t2 - t1), 1e-9) / reps

    B, F, T, C = x.shape
    N = w.shape[-1]
    fl = B * F * T * 15 * C * N * 2
    print(f"  {name:8s} fwd {dt*1e3:7.3f} ms {fl/dt/1e12:6.1f} TF/s "
          f"({100*fl/dt/PEAK:4.1f}%)   fwd+bwd {dtg*1e3:7.3f} ms "
          f"({100*3*fl/dtg/PEAK:4.1f}% assuming 3x)", flush=True)


def main():
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    # (level, F, T, C, N, dils)
    levels = [
        ("L0", 64, 4096, 64, 64, 2),
        ("L1", 128, 2048, 96, 96, 3),
        ("L2", 192, 1024, 96, 96, 4),
        ("L3", 256, 512, 128, 128, 5),
        ("L4", 320, 256, 128, 128, 6),
        ("L5", 384, 128, 256, 256, 7),
        ("L6", 448, 64, 256, 256, 7),
    ]
    only = os.environ.get("LEVELS", "")
    for (nm, F, T, C, N, nd) in levels:
        if only and nm not in only.split(","):
            continue
        for i in range(nd):
            d = 2 ** i
            if os.environ.get("ONLY_MAX_D") and i not in (0, nd - 1):
                continue
            x = jax.random.normal(key, (batch, F, T, C), dt)
            w = jax.random.normal(key, (5, 3, C, N), dt) * 0.05
            print(f"{nm} F={F} T={T} C={C}->{N} d={d}", flush=True)
            run("direct", conv_direct, x, w, d)
            if d > 1 and F % d == 0:
                run("regroup", conv_regroup, x, w, d)
            if T % 2 == 0 and (d == 1 or F % d == 0) and not os.environ.get("SKIP_FOLD2"):
                run("fold2", conv_fold2, x, w, max(d, 1))
            if d % 2 == 0 and F % 2 == 0:
                run("packfG", conv_packf_grouped, x, w, d)
                run("packfD", conv_packf_dense, x, w, d)
            xt = x.transpose(0, 2, 1, 3)
            wt = w.transpose(1, 0, 2, 3)
            run("tfnative", lambda a, ww, dd: conv_tf_native(a, wt, dd), xt, w, d)


if __name__ == "__main__":
    main()
