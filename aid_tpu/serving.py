"""Serving layer: arbitrary-length audio inpainting as a library/service call.

The reference only evaluates fixed-length segments at batch 1 (its tester
loops files, tester_inpainting.py:442-443). Production serving needs: load a
checkpoint once, compile once per shape, accept audio of ANY length and a
sample mask, and return the restored audio. This module does that the
TPU-friendly way:

  * each gap gets a model-length window centered on it (windows never recross
    compile boundaries — one static shape);
  * windows are batched up to ``max_batch`` and run through the ONE compiled
    guided-Heun program;
  * gaps longer than ~60% of a window are filled by CHAINED sub-windows:
    each pass conditions on 25% leading context (the autoregressive
    outpainting recipe, reference testing/edm_sampler.py:386-418) and fills
    the rest, marching left-to-right until the gap closes; a work-queue
    scheduler co-batches one pass per chain with pending single-window jobs
    so no batch row idles while work remains;
  * every window's observation mask is sliced from a LIVE mask (unknown
    samples flip to known only after write-back), so clustered gaps inside
    one window are never pinned as fake observations;
  * reconstructions are written back only inside the gaps; edge continuity
    comes from the sampler's Hann-smoothed data-consistency projection;
  * inputs at foreign sample rates are resampled in (and back out) with the
    native soxr path;
  * ``shard(mesh)`` turns on data-parallel serving: weights replicated over a
    ``dp`` device mesh, window batches sharded across it — the multi-chip
    throughput route (aggregate RTF scales with the mesh; per-window latency
    is single-chip either way).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aid_tpu import setup as asetup
from aid_tpu.data import audio_io


@dataclasses.dataclass
class _Chain:
    """March state for a gap longer than one window: ``pos`` is the first
    still-unfilled sample; each pass fills [pos, min(g1, window_end))."""
    g0: int
    g1: int
    pos: int


def find_gaps(mask: np.ndarray) -> List[Tuple[int, int]]:
    """Contiguous zero-runs of a binary sample mask -> [(start, end)) list."""
    m = np.asarray(mask).reshape(-1) > 0.5
    edges = np.flatnonzero(np.diff(np.concatenate([[True], m, [True]])))
    return [(int(edges[i]), int(edges[i + 1]))
            for i in range(0, len(edges), 2)]


@dataclasses.dataclass
class InpaintingService:
    args: object
    bundle: object
    sampler: object
    # windows per compiled guided-Heun call (GLOBAL batch; shard() rounds it
    # up to a multiple of the mesh size). 2 is the measured single-chip
    # throughput optimum for the flagship guided workload (PARITY.md sweep:
    # 1 -> 2.117x, 2 -> 2.175x, 3+ regress HBM-bound); set 1 to minimize
    # per-request latency instead.
    max_batch: int = 2
    mesh: object = None

    # fraction of a window a gap may occupy before chaining kicks in, and the
    # leading observed-context fraction of each chained pass
    LONG_GAP_FRACTION = 0.6
    CHAIN_CONTEXT_FRACTION = 0.25

    @classmethod
    def from_config(cls, overrides: Sequence[str] = (),
                    checkpoint: Optional[str] = None,
                    max_batch: Optional[int] = None) -> "InpaintingService":
        from aid_tpu.utils.config import compose
        args = compose(overrides=list(overrides))
        if max_batch is None:
            # per-model measured optimum (network.serving_max_batch); the
            # batch sweep is model-dependent — see PARITY.md
            max_batch = int(args.network.get("serving_max_batch", 2))
        bundle = asetup.setup_network(args)
        bundle.init(jax.random.PRNGKey(0), 1, int(args.exp.audio_len))
        diff = asetup.setup_diff_parameters(args)
        if checkpoint:
            from aid_tpu.testing.tester import Tester
            t = Tester(args, network=bundle, diff_params=diff, test_set=None)
            if not t.load_checkpoint(checkpoint):
                raise FileNotFoundError(checkpoint)
            sampler = t.sampler
        else:
            sampler = asetup.setup_sampler(args, network=bundle,
                                           diff_params=diff)
        return cls(args=args, bundle=bundle, sampler=sampler,
                   max_batch=max_batch)

    # ------------------------------------------------------------ parallelism

    def shard(self, mesh=None) -> "InpaintingService":
        """Enable SPMD serving over a ``dp`` (throughput) and/or ``dp`` x
        ``tp`` (throughput x latency) mesh.

        1-D ``dp`` mesh (default): replicates the network weights and shards
        each window batch along the dp axis (``max_batch`` is the GLOBAL
        batch; it is rounded up to a multiple of the dp size). The
        per-window computation is embarrassingly parallel, so XLA partitions
        the jitted guided-Heun program with zero cross-chip collectives —
        aggregate throughput scales with the mesh.

        2-D ("dp", "tp") mesh (``parallel.tp.make_tp_mesh``): additionally
        splits every conv/dense kernel's output channels over the tp axis
        (Megatron-style, aid_tpu/parallel/tp.py), so each individual score
        call — and therefore each sequential chain pass of a long gap — runs
        across tp chips. This is the latency route for models whose
        single-chip FLOPs ceiling is below realtime (the 44k flagship,
        PARITY.md). Multi-host pods: call
        ``aid_tpu.parallel.mesh.init_distributed()`` first.

        2-D ("dp", "cp") mesh: full-score context parallelism — every
        activation's frame-time axis is sharded over the cp axis
        (models/unet_cqt._cp_constrain: conv halo exchanges, resampler
        halos, ring attention), weights stay replicated. The alternative
        latency route: activation (not weight) traffic rides ICI, which
        wins over tp when channel counts are small relative to T (this
        model family). Rebuilds the service's module with
        ``network.context_parallel=True`` — params are unchanged (the flag
        only inserts sharding constraints).
        """
        from aid_tpu.parallel import mesh as pmesh
        from aid_tpu.parallel import tp as ptp
        from aid_tpu.parallel import ring_attention as ring
        self.mesh = mesh if mesh is not None else pmesh.make_mesh()
        n_dp = int(self.mesh.shape.get(pmesh.DATA_AXIS, 1))
        self.max_batch = int(np.ceil(self.max_batch / n_dp) * n_dp)
        n_tp = int(self.mesh.shape.get(ptp.MODEL_AXIS, 1))
        n_cp = int(self.mesh.shape.get(ring.CP_AXIS, 1))
        if n_tp > 1 and n_cp > 1:
            raise ValueError("serving over a tp x cp mesh is not supported: "
                             "pick ONE latency axis (tp splits kernels, cp "
                             "splits the time axis)")
        if n_cp > 1:
            # flip the module to its context-parallel form (same params —
            # the flag only adds with_sharding_constraint pins) and install
            # the mesh for _cp_constrain / ring_attention to pick up
            self.args.network["context_parallel"] = True
            if "attention_dict" in self.args.network:
                self.args.network["attention_dict"]["context_parallel"] = True
            self.bundle.module = asetup.setup_network(self.args).module
            ring.set_cp_mesh(self.mesh)
        if n_tp > 1:
            from aid_tpu.ops.qconv import quant_mode
            if quant_mode(getattr(self.args.network, "quant", "none")) != "none":
                raise ValueError("tensor-parallel serving does not compose "
                                 "with int8 quantization (network.quant / "
                                 "AID_TPU_QUANT must be 'none')")
            self.bundle.params = ptp.place_params(self.bundle.params,
                                                  self.mesh)
        else:
            self.bundle.params = pmesh.replicate(self.mesh, self.bundle.params)
        return self

    def _place_batch(self, arr: np.ndarray):
        if self.mesh is None:
            return jnp.asarray(arr)
        from aid_tpu.parallel import mesh as pmesh
        sh = pmesh.batch_sharding(self.mesh)
        if jax.process_count() > 1:
            # every process holds the SAME full window batch; hand each
            # device its slice without any cross-process collective
            arr = np.asarray(arr)
            return jax.make_array_from_callback(arr.shape, sh,
                                                lambda idx: arr[idx])
        return jax.device_put(arr, sh)

    def precompile(self, seed: int = 0) -> None:
        """Warm the compiled guided-Heun program for this service's window
        shape without running it (production warmup; multi-process meshes
        call this before their first barrier — see Sampler.compile_inpainting)."""
        L = int(self.args.exp.audio_len)
        xb = np.zeros((self.max_batch, L), np.float32)
        mb = np.ones((self.max_batch, L), np.float32)
        mb[:, L // 4: L // 2] = 0.0
        self.sampler.compile_inpainting(
            self._place_batch(xb), self._place_batch(mb),
            jax.random.PRNGKey(seed))

    def _compiled_for_batch(self, n: int, seed: int = 0):
        L = int(self.args.exp.audio_len)
        xb = np.zeros((n, L), np.float32)
        mb = np.ones((n, L), np.float32)
        mb[:, L // 4: L // 2] = 0.0
        return self.sampler.compile_inpainting(
            self._place_batch(xb), self._place_batch(mb),
            jax.random.PRNGKey(seed))

    def autotune_max_batch(self, limit_bytes: Optional[int] = None,
                           margin: float = 0.85, cap: int = 16) -> int:
        """Fit ``max_batch`` to device memory from AOT memory analysis.

        Compiles the guided-Heun program at window batch 1 and 2 (no
        execution — the compiles land in the persistent cache) and reads
        each executable's ``memory_analysis()``: the per-row footprint is
        the difference (the guidance backward's activation stash scales
        linearly with rows; weights/constants do not). Picks the largest
        batch whose extrapolated footprint stays under ``margin *
        limit_bytes`` and CAPS ``self.max_batch`` with it.

        Use when deploying a model/chip pair with no measured throughput
        optimum (``network.serving_max_batch``): fitting HBM is necessary
        for any batch to run at all; the throughput optimum may be lower
        (on v5e the 22k flagship fits batch >4 but peaks at 2 — see
        PARITY.md batch sweeps), so this never RAISES a configured optimum.
        ``limit_bytes`` defaults to the device's reported memory limit.
        """
        if self.mesh is not None:
            raise RuntimeError(
                "autotune_max_batch probes single-device footprints; call it "
                "BEFORE shard() (the dp row count then scales with the mesh)")
        dev = jax.devices()[0]
        if limit_bytes is None:
            stats = getattr(dev, "memory_stats", lambda: None)() or {}
            limit_bytes = int(stats.get("bytes_limit", 0))
            if not limit_bytes:
                # some PJRT plugins (e.g. the axon tunnel) report no memory
                # stats; fall back to the known HBM of the device kind
                kind = str(getattr(dev, "device_kind", ""))
                for prefix, gib in (("TPU v5 lite", 15.75), ("TPU v5e", 15.75),
                                    ("TPU v4", 31.75), ("TPU v5p", 95.0),
                                    ("TPU v6", 31.25)):
                    if kind.startswith(prefix):
                        limit_bytes = int(gib * 2 ** 30)
                        break
            if not limit_bytes:
                raise ValueError(
                    f"device {dev} reports no memory limit; pass limit_bytes")

        def footprint(n):
            ma = self._compiled_for_batch(n).memory_analysis()
            return (int(ma.argument_size_in_bytes)
                    + int(ma.output_size_in_bytes)
                    + int(ma.temp_size_in_bytes))

        f1, f2 = footprint(1), footprint(2)
        per_row = max(f2 - f1, 1)
        fixed = max(f1 - per_row, 0)
        budget = margin * limit_bytes
        fit = int((budget - fixed) // per_row)
        if fit < 1:
            raise RuntimeError(
                f"guided sampling does not fit: fixed {fixed/2**30:.2f} GiB"
                f" + {per_row/2**30:.2f} GiB/row vs budget "
                f"{budget/2**30:.2f} GiB")
        self.max_batch = max(1, min(self.max_batch, min(fit, cap)))
        return min(fit, cap)

    def _run_batch(self, xb: np.ndarray, mb: np.ndarray, key) -> np.ndarray:
        """One compiled guided-Heun call on a [max_batch, L] window batch."""
        y = self._place_batch((xb * mb).astype(np.float32))
        m = self._place_batch(mb.astype(np.float32))
        rec = self.sampler.predict_inpainting(y, m, key)
        rec = rec[0] if self.sampler.rid else rec
        if self.mesh is not None and jax.process_count() > 1:
            # multi-host mesh: rows live on other hosts' chips; device_get
            # would fail on non-addressable shards — allgather the result
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(
                rec, tiled=True))
        return np.asarray(jax.device_get(rec))

    # ------------------------------------------------------------------ core

    def inpaint(self, audio: np.ndarray, mask: np.ndarray, fs: int,
                seed: int = 0) -> np.ndarray:
        """Restore the masked samples of an arbitrary-length mono signal."""
        model_fs = int(self.args.exp.sample_rate)
        L = int(self.args.exp.audio_len)
        audio = np.asarray(audio, np.float32).reshape(-1)
        mask = np.asarray(mask, np.float32).reshape(-1)
        if audio.shape != mask.shape:
            raise ValueError("audio and mask must have the same length")
        if fs != model_fs:
            scale = model_fs / fs
            audio_m = audio_io.resample_host(audio, fs, model_fs)
            idx = (np.arange(len(audio_m)) / scale).astype(np.int64)
            mask_m = mask[np.clip(idx, 0, len(mask) - 1)]
        else:
            audio_m, mask_m = audio, mask

        orig_len = len(audio_m)
        if orig_len < L:  # short inputs: pad as pinned (observed) silence
            audio_m = np.pad(audio_m, (0, L - orig_len))
            mask_m = np.pad(mask_m, (0, L - orig_len), constant_values=1.0)

        T = len(audio_m)
        gaps = find_gaps(mask_m)
        if not gaps:
            return audio.copy()
        out = audio_m.copy()
        # live observation mask: 0 = still unknown, flipped to 1 as gaps fill.
        # EVERY window's mask is sliced from this, so a window overlapping
        # someone else's still-unfilled gap never pins that gap's (zeroed)
        # samples as observations — the data-consistency projection of
        # reference testing/edm_sampler_inpainting.py:336-343 must only see
        # genuinely known samples.
        cur_mask = mask_m.copy()

        long_gap = int(self.LONG_GAP_FRACTION * L)
        ready = []   # independent single-window passes: (w0, a, b) with the
        #              row's OWN gap at window-relative [a, b)
        chains = []  # long gaps marching left-to-right (sequential passes)
        for g0, g1 in gaps:
            if g1 - g0 > long_gap:
                chains.append(_Chain(g0=g0, g1=g1, pos=g0))
            else:
                c = (g0 + g1) // 2
                w0 = int(np.clip(c - L // 2, 0, T - L))
                ready.append((w0, max(g0 - w0, 0), min(g1 - w0, L)))

        # Work-queue scheduler: each round co-batches one pass per active
        # chain (a chain's next pass depends on the previous write-back, so
        # it contributes at most one row) with as many independent window
        # jobs as fit — no row of the compiled max_batch program idles while
        # work is pending.
        key = jax.random.PRNGKey(seed)
        ctx = max(1, int(self.CHAIN_CONTEXT_FRACTION * L))
        while ready or chains:
            batch = []  # (w0, a, b, chain-or-None)
            # Leave at least one row for independent window jobs whenever
            # any are pending, so many concurrent chains can't starve the
            # short gaps; unscheduled chains rotate to the front next round.
            n_chain = min(len(chains),
                          self.max_batch - 1 if ready else self.max_batch)
            for ch in chains[:n_chain]:
                # chained sub-window: observe ``ctx`` known samples on the
                # left, fill the reachable remainder (the autoregressive
                # outpainting recipe, reference testing/edm_sampler.py:396-418)
                w0 = int(np.clip(ch.pos - ctx, 0, T - L))
                fill_hi = min(ch.g1, w0 + L)
                batch.append((w0, ch.pos - w0, fill_hi - w0, ch))
            while len(batch) < self.max_batch and ready:
                batch.append(ready.pop(0) + (None,))
            xb = np.zeros((self.max_batch, L), np.float32)
            mb = np.ones((self.max_batch, L), np.float32)
            for r, (w0, a, b, _) in enumerate(batch):
                xb[r] = out[w0:w0 + L]
                mb[r] = cur_mask[w0:w0 + L]
                mb[r, a:b] = 0.0
            key, k = jax.random.split(key)
            rec = self._run_batch(xb, mb, k)
            done = []
            for r, (w0, a, b, ch) in enumerate(batch):
                # write back ONLY the row's own fill range; anything else the
                # sampler hallucinated in overlapping unknowns is discarded
                out[w0 + a:w0 + b] = rec[r, a:b]
                cur_mask[w0 + a:w0 + b] = 1.0
                if ch is not None:
                    ch.pos = w0 + b
                    if ch.pos >= ch.g1:
                        done.append(ch)
            finished = {id(ch) for ch in done}
            chains = ([ch for ch in chains[n_chain:]]
                      + [ch for ch in chains[:n_chain]
                         if id(ch) not in finished])

        out = out[:orig_len]
        mask_m = mask_m[:orig_len]
        if fs != model_fs:
            restored = audio_io.resample_host(out, model_fs, fs)
            restored = restored[: len(audio)]
            if len(restored) < len(audio):
                restored = np.pad(restored, (0, len(audio) - len(restored)))
            # keep originals outside gaps exactly
            return np.where(mask > 0.5, audio, restored).astype(np.float32)
        return np.where(mask_m > 0.5, audio[: orig_len], out).astype(np.float32)

    def inpaint_file(self, in_path: str, mask: np.ndarray, out_path: str,
                     seed: int = 0) -> str:
        audio, fs = audio_io.read(in_path)
        restored = self.inpaint(audio, mask, fs, seed=seed)
        audio_io.write(out_path, restored, fs)
        return out_path
