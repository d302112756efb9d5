"""Task-level sampler facade: unconditional, inpainting, spectrogram
inpainting, bandwidth extension, declipping, phase retrieval, compressive
sensing, autoregressive outpainting.

API parity with the reference samplers (testing/edm_sampler_inpainting.py
``Sampler``: predict_unconditional :155, predict_inpainting :327,
predict_spectrogram_inpainting :348; testing/edm_sampler.py subclasses:
SamplerBWE :443, SamplerDeclipping :359, SamplerPhaseRetrieval :308,
SamplerCompSens :337, SamplerAutoregressive :386, SamplerInpainting :424).
One class covers them all here: every ``predict_*`` builds a pure score
function and runs the single jitted Heun scan; compiled programs are cached per
(task, shape) so repeated test-set items pay zero re-compilation.

Test-time diffusion-parameter overrides (reference update_diff_params :34-44,
driven by conf/tester/*.yaml ``diff_params.same_as_training: False``) are
applied at construction.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aid_tpu.diffusion import edm
from aid_tpu.sampling import degradations as degr
from aid_tpu.utils.xla import compiler_options
from aid_tpu.sampling.heun import SamplerConfig, heun_sample, make_score_fn


class Sampler:
    def __init__(self, model, diff_params, args, rid: bool = False):
        """model: NetBundle; diff_params: edm.EDM or EDMParams; args: config tree."""
        self.model = model
        self.args = args
        self.rid = rid
        p = diff_params.params if hasattr(diff_params, "params") else diff_params
        t = args.tester
        if not t.diff_params.same_as_training:
            p = edm.EDMParams.from_args(t.diff_params)
        self.p = p

        dc = t.data_consistency
        self.cfg = SamplerConfig(
            T=int(t.T), order=int(t.order),
            xi=float(t.posterior_sampling.xi),
            norm=t.posterior_sampling.norm,
            smoothl1_beta=float(t.posterior_sampling.get("smoothl1_beta", 1.0)),
            data_consistency=bool(dc.use) and dc.type == "always",
            data_consistency_end=bool(dc.use) and dc.type == "end",
            filter_out_cqt_DC_Nyq=bool(t.filter_out_cqt_DC_Nyq),
            record=rid,
        )
        self.smooth = bool(dc.use) and bool(dc.get("smooth", False))
        self.hann_size = int(dc.get("hann_size", 50))
        self._programs = {}   # (task, static-key) -> compiled program
        self._prequant = None  # (source params tree, prequantized tree)

    def _sparams(self):
        """Serving-time params: under int8 quant, kernel leaves are replaced
        ONCE per loaded checkpoint with load-time-quantized QWeights
        (qconv.prequantize_params) so the compiled score programs read int8
        weights from HBM instead of re-quantizing full-precision kernels
        every call. Cached by source-tree identity: a checkpoint (re)load
        swaps ``model.params`` and invalidates naturally."""
        from aid_tpu.ops.qconv import prequantize_params, quant_mode
        params = self.model.params
        net = getattr(self.args, "network", None)
        # the module attribute is what Conv2dFT actually dispatches on
        # (e2e_smoke's quant sweep clones the module without touching args)
        field = getattr(self.model.module, "quant", None)
        if field is None and net is not None:
            field = net.get("quant", "none")
        if quant_mode(field or "none") != "int8":
            return params
        if self._prequant is None or self._prequant[0] is not params:
            dtype = getattr(self.model.module, "dtype", None)
            if dtype is None:
                dtype = jnp.bfloat16 if str(net.get(
                    "compute_dtype", "bfloat16")) == "bfloat16" \
                    else jnp.float32
            # hold the SOURCE tree too: caching only id() would go stale if
            # a reloaded checkpoint's tree reused the freed id
            self._prequant = (params, prequantize_params(params, dtype))
        return self._prequant[1]

    # ------------------------------------------------------------------ core

    def _denoise_fn(self, params):
        apply = self.model.module.apply
        p = self.p

        def denoise(x, t):
            sigma = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (x.shape[0], 1))
            return edm.denoiser(p, lambda xx, cn: apply(params, xx, cn), x, sigma)

        return denoise

    def _hpf(self):
        cqt = self.model.cqt
        if cqt is None:
            return None
        return cqt.apply_hpf_DC

    @functools.cached_property
    def _jit_uncond(self):
        p, cfg = self.p, self.cfg

        def run(params, key, shape):
            score = make_score_fn(p, cfg, self._denoise_fn(params), hpf=self._hpf())
            return heun_sample(key, shape, p, cfg, score)

        return jax.jit(run, static_argnames=("shape",),
                       compiler_options=compiler_options())

    @functools.cached_property
    def _jit_inpaint(self):
        p, cfg = self.p, self.cfg

        def run(params, key, y_masked, mask, smooth_mask):
            proj = degr.inpainting_projector(y_masked, smooth_mask)
            score = make_score_fn(
                p, cfg, self._denoise_fn(params), y=y_masked,
                degradation=degr.time_mask(mask), proj=proj, hpf=self._hpf())
            return heun_sample(key, y_masked.shape, p, cfg, score, proj_end=proj)

        return jax.jit(run, compiler_options=compiler_options())

    # ----------------------------------------------------------------- tasks

    def predict_unconditional(self, shape, key) -> jnp.ndarray:
        x, rec = self._jit_uncond(self._sparams(), key, tuple(shape))
        return (x, rec) if self.rid else x

    def predict_inpainting(self, y_masked, mask, key):
        """Long/short-gap inpainting (reference :327-346): degradation is the
        mask multiply; projection uses the Hann-smoothed mask."""
        if self.smooth:
            smooth = self._smooth_mask_like(mask)
        else:
            smooth = mask
        x, rec = self._jit_inpaint(self._sparams(), key, y_masked, mask, smooth)
        if self.rid:
            return x, rec
        return x

    def compile_inpainting(self, y_masked, mask, key):
        """AOT-compile the guided-inpainting program for these arg shapes
        without executing it. Compilation is process-local; multi-process
        serving calls this before its first cross-process barrier so the
        first collective (the result allgather) isn't stuck behind another
        host's single-core compile (gloo's ~30 s rendezvous window).

        Returns the compiled executable (its ``memory_analysis()`` drives
        ``InpaintingService.autotune_max_batch``)."""
        smooth = self._smooth_mask_like(mask) if self.smooth else mask
        return self._jit_inpaint.lower(
            self._sparams(), key, y_masked, mask, smooth).compile()

    def _smooth_mask_like(self, mask):
        """Hann-smoothed mask placed like ``mask``. The smoothing is
        row-independent, so on a multi-process mesh each host smooths only
        its addressable shards and the global array is assembled without
        fetching non-addressable data."""
        if (isinstance(mask, jax.Array)
                and not mask.is_fully_addressable):
            shards = [
                jax.device_put(
                    jnp.asarray(degr.make_smooth_mask(
                        np.asarray(s.data), self.hann_size)), s.device)
                for s in mask.addressable_shards]
            return jax.make_array_from_single_device_arrays(
                mask.shape, mask.sharding, shards)
        smooth = jnp.asarray(
            degr.make_smooth_mask(np.asarray(mask), self.hann_size))
        if isinstance(getattr(mask, "sharding", None),
                      jax.sharding.NamedSharding):
            smooth = jax.device_put(smooth, mask.sharding)  # follow dp
        return smooth

    def _generic_cfg(self):
        """Config for the tasks modeled on the GENERIC reference sampler
        (testing/edm_sampler.py: BWE/declipping/phase retrieval): its guidance
        scale places the stabilizing epsilon differently from the inpainting
        sampler's (see SamplerConfig.guidance_eps)."""
        import dataclasses
        return dataclasses.replace(self.cfg, guidance_eps="generic")

    def _cached_program(self, task_key, builder):
        """One compiled program per (task, static-config) key: building a
        fresh jax.jit closure per call would retrace/recompile every test-set
        item (minutes each on the remote-compile backend)."""
        prog = self._programs.get(task_key)
        if prog is None:
            prog = jax.jit(builder(), compiler_options=compiler_options())
            self._programs[task_key] = prog
        return prog

    def predict_spectrogram_inpainting(self, y_masked, mask_FT, key):
        """STFT-domain rectangular mask inpainting (reference :348-364).
        mask_FT is a traced argument — repainting the mask never recompiles."""
        p, cfg = self.p, self.cfg

        def build():
            stft_cfg = self.args.tester.spectrogram_inpainting.stft

            def run(params, key, y, m):
                apply_mask = degr.spectral_mask(m, stft_cfg)
                proj = degr.spectral_projector(y, apply_mask)
                score = make_score_fn(p, cfg, self._denoise_fn(params), y=y,
                                      degradation=apply_mask, proj=proj,
                                      hpf=self._hpf())
                return heun_sample(key, y.shape, p, cfg, score, proj_end=proj)

            return run

        x, rec = self._cached_program(("spec_inpaint",), build)(
            self._sparams(), key, y_masked, mask_FT)
        return (x, rec) if self.rid else x

    def predict_bwe(self, y_lowpassed, key, fc: float, fs: float,
                    filter_type: str = "firwin", order: int = 200):
        """Bandwidth extension (reference SamplerBWE, edm_sampler.py:443-508):
        degradation = lowpass; projection = y + x - LPF(x)."""
        if filter_type == "firwin":
            lpf = degr.firwin_lowpass(order, fc, fs)
        elif filter_type in ("cheby1", "biquad", "butter"):
            lpf = degr.iir_lowpass("cheby1" if filter_type == "cheby1" else "butter",
                                   order if filter_type == "cheby1" else 2, fc, fs)
        elif filter_type in ("decimate", "resample"):
            factor = int(round(fs / (2 * fc)))
            down, up = degr.decimate(factor)
            lpf = lambda x: up(down(x))
        else:
            raise ValueError(f"unknown BWE filter {filter_type!r}")
        p, cfg = self.p, self._generic_cfg()

        def build():
            def run(params, key, y):
                proj = lambda x: y + x - lpf(x)
                score = make_score_fn(p, cfg, self._denoise_fn(params), y=y,
                                      degradation=lpf, proj=proj,
                                      hpf=self._hpf())
                return heun_sample(key, y.shape, p, cfg, score, proj_end=proj)

            return run

        x, rec = self._cached_program(
            ("bwe", filter_type, float(fc), float(fs), int(order)), build)(
            self._sparams(), key, y_lowpassed)
        return (x, rec) if self.rid else x

    def predict_declipping(self, y_clipped, key, clip_value: float):
        """Declipping (reference SamplerDeclipping, edm_sampler.py:359-384).
        clip_value is a traced argument (per-file clip levels, one program)."""
        p, cfg = self.p, self._generic_cfg()

        def build():
            def run(params, key, y, cv):
                clip = lambda x: jnp.clip(x, -cv, cv)
                score = make_score_fn(p, cfg, self._denoise_fn(params), y=y,
                                      degradation=clip, proj=None,
                                      hpf=self._hpf())
                return heun_sample(key, y.shape, p, cfg, score)

            return run

        x, rec = self._cached_program(("declip",), build)(
            self._sparams(), key, y_clipped, jnp.float32(clip_value))
        return (x, rec) if self.rid else x

    def predict_phase_retrieval(self, y_mag, shape, key):
        """Phase retrieval from STFT magnitudes (reference SamplerPhaseRetrieval,
        edm_sampler.py:308-336)."""
        p, cfg = self.p, self._generic_cfg()

        def build():
            stft_cfg = self.args.tester.spectrogram_inpainting.stft
            mag = degr.stft_magnitude(stft_cfg)
            shp = tuple(shape)

            def run(params, key, y):
                score = make_score_fn(p, cfg, self._denoise_fn(params), y=y,
                                      degradation=mag, proj=None,
                                      hpf=self._hpf())
                return heun_sample(key, shp, p, cfg, score)

            return run

        x, rec = self._cached_program(("phase", tuple(shape)), build)(
            self._sparams(), key, y_mag)
        return (x, rec) if self.rid else x

    def predict_compsens(self, y_subsampled, mask, key):
        """Compressive sensing (reference SamplerCompSens, edm_sampler.py:337-357):
        a GENERIC-family task — reconstruction guidance through the random
        sample mask only, with data consistency explicitly off (the reference
        constructor asserts data_consistency==False and xi>0 at :340-342) and
        the generic guidance epsilon. mask is a traced argument, so new masks
        never recompile."""
        import dataclasses
        p = self.p
        cfg = dataclasses.replace(self._generic_cfg(),
                                  data_consistency=False,
                                  data_consistency_end=False)

        def build():
            def run(params, key, y, m):
                score = make_score_fn(p, cfg, self._denoise_fn(params), y=y,
                                      degradation=degr.time_mask(m),
                                      proj=None, hpf=self._hpf())
                return heun_sample(key, y.shape, p, cfg, score)

            return run

        x, rec = self._cached_program(("compsens",), build)(
            self._sparams(), key, y_subsampled, mask)
        return (x, rec) if self.rid else x

    def predict_autoregressive(self, key, num_segments: int, overlap: float = 0.25,
                               shape: Optional[Tuple[int, int]] = None):
        """Unbounded-length outpainting by chaining fixed windows with an
        overlap mask (reference SamplerAutoregressive, edm_sampler.py:386-418):
        segment 0 is unconditional; each next segment is inpainting conditioned
        on the trailing ``overlap`` fraction of the previous one. The outer
        chain is a Python loop over one compiled inpainting program.
        """
        if shape is None:
            shape = (1, int(self.args.exp.audio_len))
        B, L = shape
        n_ov = int(L * overlap)
        mask_np = np.zeros((B, L), np.float32)
        mask_np[:, :n_ov] = 1.0
        mask = jnp.asarray(mask_np)

        key, k0 = jax.random.split(key)
        seg = self.predict_unconditional(shape, k0)
        if self.rid:
            seg = seg[0]
        out = [np.asarray(seg)]
        for _ in range(num_segments - 1):
            key, k = jax.random.split(key)
            y = jnp.zeros(shape, jnp.float32).at[:, :n_ov].set(seg[:, -n_ov:])
            seg = self._jit_inpaint(self._sparams(), k, y * mask, mask, mask)[0]
            out.append(np.asarray(seg[:, n_ov:]))
        return np.concatenate(out, axis=1)
