"""Training utilities: polyphase resampling, A-weighting, EMA schedules.

Capability parity with reference utils/training_utils.py: ``resample_batch``
(:140-212 — 44.1k/48k -> target-rate batched resampling, minus its
early-return-in-loop bugs, SURVEY.md §7 "quirks not to replicate"),
``FIRFilter`` A-weighting (:55-138) and ``EMAWarmup`` (:6-51). All device code
is pure JAX with statically designed (host-side scipy/numpy) filters, so every
path jits and differentiates.
"""
from __future__ import annotations

import functools
import math
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal


# ------------------------------------------------------------------ resampling

@functools.lru_cache(maxsize=16)
def _design_polyphase(up: int, down: int, taps_per_phase: int = 24,
                      beta: float = 8.555) -> np.ndarray:
    """Kaiser-windowed sinc lowpass for rational resampling, length up*taps."""
    cutoff = 1.0 / max(up, down)
    half = taps_per_phase * max(up, down) // 2
    n = np.arange(-half, half + 1)
    h = cutoff * np.sinc(cutoff * n) * np.kaiser(len(n), beta) * up
    return h.astype(np.float32)


def resample(x: jnp.ndarray, orig_fs: int, new_fs: int) -> jnp.ndarray:
    """Rational-rate polyphase resampling along the last axis.

    Static (orig_fs, new_fs) -> one lax conv; the two production paths are
    44100->22050 (1:2) and 48000->22050 (147:320), same as the reference's
    torchaudio.functional.resample calls (training_utils.py:147-154).
    """
    if orig_fs == new_fs:
        return x
    g = math.gcd(int(orig_fs), int(new_fs))
    up, down = int(new_fs) // g, int(orig_fs) // g
    h = jnp.asarray(_design_polyphase(up, down))
    k = h.shape[0]
    lead = x.shape[:-1]
    T = x.shape[-1]
    z = x.reshape(-1, T, 1)
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        z, h[:, None, None], window_strides=(down,), padding=[(pad, pad)],
        lhs_dilation=(up,), dimension_numbers=("NWC", "WIO", "NWC"))
    out_len = int(np.ceil(T * up / down))
    got = y.shape[1]
    if got < out_len:       # conv VALID tail can fall one sample short
        y = jnp.pad(y, ((0, 0), (0, out_len - got), (0, 0)), mode="edge")
    return y[:, :out_len, 0].reshape(lead + (out_len,))


def resample_batch(batch: jnp.ndarray, fs_batch, target_fs: int,
                   rates: tuple = (44100, 48000, 22050, 16000)) -> jnp.ndarray:
    """Resample a batch whose items share one of a few known rates.

    The reference loops per-item with torchaudio (training_utils.py:156-212);
    here rates are grouped and each group is one batched conv, with
    jnp.where-select so the whole thing stays jittable when fs is a traced
    array. Output length = batch_len * target/max(rates) truncated like the
    reference's segment cropping (trainer.py:244-252).

    ``rates`` is the static candidate set. Callers that know the rates
    actually present on the host (the trainer specializes per batch) pass the
    reduced set: a single-rate batch then costs ONE polyphase conv instead of
    four convs plus selects.
    """
    fs_batch = jnp.asarray(fs_batch).reshape(-1)
    rates = tuple(rates)
    if len(rates) == 1:
        r = int(rates[0])
        if r == int(target_fs):
            return batch
        T_out = batch.shape[-1]
        y = resample(batch, r, target_fs)
        return (y[..., :T_out] if y.shape[-1] >= T_out else jnp.pad(
            y, [(0, 0)] * (y.ndim - 1) + [(0, T_out - y.shape[-1])]))
    T_out = batch.shape[-1]
    candidates = []
    for r in rates:
        y = resample(batch, r, target_fs)
        y = y[..., :T_out] if y.shape[-1] >= T_out else jnp.pad(
            y, [(0, 0)] * (y.ndim - 1) + [(0, T_out - y.shape[-1])])
        candidates.append(y)
    out = candidates[0]
    for r, y in zip(rates[1:], candidates[1:]):
        sel = (fs_batch == r).reshape(-1, *([1] * (batch.ndim - 1)))
        out = jnp.where(sel, y, out)
    return out


# ----------------------------------------------------------------- A-weighting

@functools.lru_cache(maxsize=4)
def _design_aweighting(fs: int, ntaps: int = 101) -> np.ndarray:
    """FIR least-squares fit of the IEC 61672 A-weighting curve (reference
    FIRFilter 'aw', training_utils.py:91-122: bilinear analog zpk -> freqz ->
    firls)."""
    f1, f2, f3, f4 = 20.598997, 107.65265, 737.86223, 12194.217
    A1000 = 1.9997
    num = [(2 * np.pi * f4) ** 2 * 10 ** (A1000 / 20), 0, 0, 0, 0]
    den = np.polymul([1, 4 * np.pi * f4, (2 * np.pi * f4) ** 2],
                     [1, 4 * np.pi * f1, (2 * np.pi * f1) ** 2])
    den = np.polymul(np.polymul(den, [1, 2 * np.pi * f3]), [1, 2 * np.pi * f2])
    b, a = scipy.signal.bilinear(num, den, fs=fs)
    w, h = scipy.signal.freqz(b, a, worN=512, fs=fs)
    taps = scipy.signal.firls(ntaps, w, np.abs(h), fs=fs)
    return taps.astype(np.float32)


def a_weighting_filter(fs: int, ntaps: int = 101) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Returns err -> A-weighted err, for the loss error_filter hook
    (reference edm.py:189-190 applying FIRFilter to (estimate, target))."""
    taps = jnp.asarray(_design_aweighting(int(fs), int(ntaps)))
    k = taps.shape[0]

    def apply(x: jnp.ndarray) -> jnp.ndarray:
        lead = x.shape[:-1]
        z = x.reshape(-1, x.shape[-1], 1)
        y = jax.lax.conv_general_dilated(
            z, taps[:, None, None], window_strides=(1,),
            padding=[(k // 2, (k - 1) // 2)], dimension_numbers=("NWC", "WIO", "NWC"))
        return y[..., 0].reshape(lead + (x.shape[-1],))

    return apply


# ------------------------------------------------------------------------ EMA

def ema_rate_at(it: int, batch: int, ema_rate: float, ema_rampup: Optional[int]) -> float:
    """Effective EMA decay with warmup (reference trainer.py:291-304:
    t = it*batch, rate = min(ema_rate, (1+t)/(10+t)) under rampup)."""
    if ema_rampup is None:
        return ema_rate
    t = it * batch
    return min(ema_rate, (1 + t) / (10 + t))


class EMAWarmup:
    """Power-function EMA warmup schedule (reference training_utils.py:6-51;
    defined there but unused by the Trainer — kept for API parity)."""

    def __init__(self, inv_gamma: float = 1.0, power: float = 1.0,
                 min_value: float = 0.0, max_value: float = 1.0,
                 start_at: int = 0, last_epoch: int = 0):
        self.inv_gamma, self.power = inv_gamma, power
        self.min_value, self.max_value = min_value, max_value
        self.start_at, self.last_epoch = start_at, last_epoch

    def get_value(self) -> float:
        epoch = max(0, self.last_epoch - self.start_at)
        value = 1 - (1 + epoch / self.inv_gamma) ** -self.power
        return 0.0 if epoch < 0 else min(self.max_value, max(self.min_value, value))

    def step(self) -> None:
        self.last_epoch += 1

    def state_dict(self) -> Dict:
        return dict(self.__dict__)

    def load_state_dict(self, state: Dict) -> None:
        self.__dict__.update(state)


# ----------------------------------------------------------------- augmentation

def augment(key: jax.Array, audio: jnp.ndarray, aug_cfg) -> jnp.ndarray:
    """Batch augmentations (reference applies rev_polarity in get_batch;
    conf/exp/*:augmentations). Polarity flip is exact; gain is uniform dB."""
    if aug_cfg is None:
        return audio
    ps = aug_cfg.get("pitch_shift", None)
    if ps is not None and bool(ps.get("use", False)):
        # The reference configs carry this key but no implementation exists
        # there either (conf/exp/*:augmentations.pitch_shift is never read).
        # An enabled-and-ignored capability must fail loudly, not no-op.
        raise NotImplementedError(
            "augmentations.pitch_shift.use=True is not implemented "
            "(the reference never implements it either); set use=False "
            "or remove the key.")
    if bool(aug_cfg.get("rev_polarity", False)):
        key, k = jax.random.split(key)
        sign = jnp.where(jax.random.bernoulli(k, 0.5, (audio.shape[0], 1)), -1.0, 1.0)
        audio = audio * sign
    gain = aug_cfg.get("gain", None)
    if gain is not None and bool(gain.get("use", False)):
        key, k = jax.random.split(key)
        db = jax.random.uniform(k, (audio.shape[0], 1),
                                minval=float(gain.get("min_db", -3)),
                                maxval=float(gain.get("max_db", 3)))
        audio = audio * 10.0 ** (db / 20.0)
    return audio
