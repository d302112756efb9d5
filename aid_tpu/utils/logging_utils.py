"""Observability: audio files, spectrogram images, loss-vs-sigma plots.

Capability parity with reference utils/logging.py (688 LoC of plotly/wandb
helpers): ``write_audio_file`` (:295-318), ``plot_spectrogram_from_raw_audio``
(:611-617), ``plot_loss_by_sigma`` (:127-135), STFT spectrograms (:20-55,
:161-293). Re-designed for this environment: matplotlib (present) instead of
plotly (absent); wandb strictly optional (absent here — every logger degrades
to files under model_dir). Spectrogram STFTs run through aid_tpu.ops.stft on
whatever backend is active.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from aid_tpu.data import audio_io


def write_audio_file(x, fs: int, name: str, path: str = ".",
                     normalize: bool = True) -> str:
    """Save mono wav; peak-normalize only if clipping (reference :295-318)."""
    os.makedirs(path, exist_ok=True)
    fp = os.path.join(path, name if name.endswith(".wav") else name + ".wav")
    audio_io.write(fp, np.asarray(x).reshape(-1), int(fs),
                   normalize_if_clipping=normalize)
    return fp


def _stft_mag_db(x: np.ndarray, n_fft: int = 1024, hop: int = 256) -> np.ndarray:
    import jax.numpy as jnp
    from aid_tpu.ops import stft as stft_ops
    X = stft_ops.stft(jnp.asarray(x, jnp.float32)[None], n_fft, hop, n_fft)[0]
    # |X| ON DEVICE before the transfer: d2h of a complex array is
    # UNIMPLEMENTED on the axon TPU backend — this exact line (np.asarray of
    # the complex STFT) was the r4/r5 heavy_logging demo killer: the sampler
    # ran fine, uncond_0.wav was written, then the FIRST spectrogram's
    # complex readback poisoned the backend (PARITY round 5).
    mag = np.asarray(jnp.abs(X)) + 1e-8
    return 20.0 * np.log10(mag)


def plot_spectrogram_from_raw_audio(x, fs: int, out_path: str,
                                    n_fft: int = 1024, hop: int = 256,
                                    title: str = "") -> Optional[str]:
    """Log-magnitude STFT image (reference :611-617 logged these to wandb;
    here they land next to the wavs)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    S = _stft_mag_db(np.asarray(x).reshape(-1), n_fft, hop)
    fig, ax = plt.subplots(figsize=(10, 4))
    extent = [0, S.shape[0] * hop / fs, 0, fs / 2 / 1000.0]
    ax.imshow(S.T, origin="lower", aspect="auto", extent=extent,
              vmin=S.max() - 80, vmax=S.max(), cmap="magma")
    ax.set_xlabel("time [s]"); ax.set_ylabel("freq [kHz]")
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=90)
    plt.close(fig)
    return out_path


# plot_loss_by_sigma runs EVERY log interval for the whole life of a training
# run — unlike the other (occasional) plots it must not allocate a fresh
# figure per call: create/close leaked ~25 MB per call in the training loop
# (round-5 RSS investigation, PARITY.md — the source of the r4 run's
# ~15 GB/hour host-RSS climb; gc.collect + malloc_trim did NOT recover it).
# One persistent figure, cleared and redrawn, holds RSS flat.
_LBS_FIG = []


def plot_loss_by_sigma(bin_edges: Sequence[float], means: Sequence[float],
                       stds: Sequence[float], out_path: str) -> Optional[str]:
    """Loss-vs-sigma binned curve (reference :127-135 via plotly error_line)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    centers = np.sqrt(np.asarray(bin_edges[:-1]) * np.asarray(bin_edges[1:]))
    means = np.asarray(means); stds = np.asarray(stds)
    if not _LBS_FIG:
        from matplotlib.figure import Figure
        _LBS_FIG.append(Figure(figsize=(7, 4)))  # no pyplot registry entry
    fig = _LBS_FIG[0]
    fig.clear()
    ax = fig.add_subplot(111)
    ax.errorbar(centers, means, yerr=stds, marker="o", ms=3, lw=1, capsize=2)
    ax.set_xscale("log"); ax.set_yscale("log")
    ax.set_xlabel("sigma"); ax.set_ylabel("loss")
    fig.tight_layout()
    fig.savefig(out_path, dpi=90)
    return out_path


def plot_diffusion_trajectory(xt_steps, fs: int, out_path: str,
                              max_frames: int = 8, n_fft: int = 1024,
                              hop: int = 256) -> Optional[str]:
    """Spectrogram filmstrip of a sampler trajectory (the reference's
    diffusion animations, utils/logging.py:386-609, as a static grid —
    consumes the ``rid`` Record's xt / denoised stacks [T, B, L])."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    xt = np.asarray(xt_steps)
    if xt.ndim == 3:
        xt = xt[:, 0]
    steps = np.linspace(0, xt.shape[0] - 1, min(max_frames, xt.shape[0]))
    steps = np.unique(steps.astype(int))
    fig, axes = plt.subplots(1, len(steps), figsize=(3 * len(steps), 3),
                             sharey=True)
    if len(steps) == 1:
        axes = [axes]
    for ax, s in zip(axes, steps):
        S = _stft_mag_db(xt[s], n_fft, hop)
        ax.imshow(S.T, origin="lower", aspect="auto",
                  vmin=S.max() - 80, vmax=S.max(), cmap="magma")
        ax.set_title(f"step {s}")
        ax.set_xticks([]); ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(out_path, dpi=90)
    plt.close(fig)
    return out_path


def animate_diffusion_trajectory(xt_steps, fs: int, out_path: str,
                                 max_frames: int = 24, n_fft: int = 1024,
                                 hop: int = 256, ms_per_frame: int = 120
                                 ) -> Optional[str]:
    """Animated GIF of a sampler trajectory's spectrograms — the moving
    counterpart of ``plot_diffusion_trajectory`` (the reference renders
    diffusion-process animations, utils/logging.py:386-609, via plotly;
    here each rid ``denoised``/``xt`` stack becomes one GIF via PIL)."""
    try:
        from PIL import Image
    except Exception:
        return None
    xt = np.asarray(xt_steps)
    if xt.ndim == 3:
        xt = xt[:, 0]
    steps = np.unique(np.linspace(0, xt.shape[0] - 1,
                                  min(max_frames, xt.shape[0])).astype(int))
    frames = []
    vmax = None
    for s in steps:
        S = _stft_mag_db(xt[s], n_fft, hop)
        if vmax is None:
            vmax = float(_stft_mag_db(xt[steps[-1]], n_fft, hop).max())
        # normalize into [0,1] over a fixed 80 dB window anchored at the
        # final step's peak so brightness is comparable across frames
        img = np.clip((S.T[::-1] - (vmax - 80.0)) / 80.0, 0.0, 1.0)
        rgb = (_magma(img) * 255).astype(np.uint8)
        frames.append(Image.fromarray(rgb))
    if not frames:
        return None
    frames[0].save(out_path, save_all=True, append_images=frames[1:],
                   duration=ms_per_frame, loop=0)
    return out_path


def _magma(v: np.ndarray) -> np.ndarray:
    """v in [0,1] -> RGB via matplotlib's magma (fallback: grayscale)."""
    try:
        import matplotlib
        return matplotlib.colormaps["magma"](v)[..., :3]
    except Exception:
        return np.stack([v, v, v], axis=-1)


class WandbLogger:
    """Strictly-optional wandb sink (reference trainer.py:83-121). No-ops when
    wandb is not installed or disabled in config."""

    def __init__(self, cfg, args_dict=None, run_name: str = ""):
        self._run = None
        if cfg is None or not bool(cfg.get("use", False)):
            return
        try:
            import wandb
            self._run = wandb.init(entity=cfg.get("entity") or None,
                                   project=cfg.get("project", "aid-tpu"),
                                   config=args_dict, name=run_name or None)
        except Exception as e:
            print(f"[wandb] disabled: {e}")

    def log(self, data: dict, step: Optional[int] = None):
        if self._run is not None:
            self._run.log(data, step=step)

    def finish(self):
        if self._run is not None:
            self._run.finish()
