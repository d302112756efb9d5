"""aid_tpu — TPU-native audio-inpainting diffusion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
eloimoliner/audio-inpainting-diffusion ("CQTDiff+", Moliner & Valimaki, JAES 2024):
an EDM-parameterized diffusion denoiser over an invertible octave-banded
constant-Q transform (CQT-NSGT), with posterior-sampling audio inpainting
(stochastic Heun + reconstruction guidance + data-consistency projection).

Layer map (mirrors reference SURVEY.md section 1, re-designed TPU-first):
  ops/        — CQT-NSGT analysis/synthesis, FIR resampling, STFT (L0)
  models/     — Flax U-Net backbone over octave CQT bands (L2)
  diffusion/  — EDM preconditioning/schedule/loss as pure functions (L3)
  sampling/   — jitted lax.scan Heun samplers + degradation operators (L4)
  training/   — pjit data-parallel trainer, EMA, checkpointing (L5)
  testing/    — evaluation harnesses (inpainting testers) (L5)
  data/       — host-side dataset loaders, per-process sharding (Lx)
  parallel/   — mesh construction + sharding rules (DP/TP over ICI)
  utils/      — config composition, registry, logging, audio IO (L1)
"""

__version__ = "0.1.0"
