"""Audio file I/O: native C++ fast path, pure-Python fallback.

The reference delegates audio I/O to compiled libraries outside Python
(soundfile/libsndfile — datasets/maestro_dataset.py:3, utils/logging.py:295);
this framework's equivalent native component is ``aid_tpu/native/audioio.cpp``
(WAV decode with random-access segment reads + libsoxr resampling), loaded via
ctypes. Fallbacks: scipy.io.wavfile / stdlib wave, so the package works
everywhere the native lib hasn't been built.
"""
from __future__ import annotations

import ctypes
import os
import wave as _wave
from typing import Tuple

import numpy as np

_NATIVE = None
_NATIVE_TRIED = False


def _native():
    """Load the C++ audioio library once (built by aid_tpu/native/build.sh)."""
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    native_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
    here = os.path.join(native_dir, "libaudioio.so")
    if not os.path.exists(here):
        # build on first use (g++ is a baseline dependency of this framework's
        # native runtime components; failure just means Python fallbacks)
        import subprocess
        try:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-o", here,
                 os.path.join(native_dir, "audioio.cpp"),
                 os.path.join(native_dir, "flac.cpp"), "-ldl"],
                check=True, capture_output=True, timeout=120)
        except Exception:
            pass
    if os.path.exists(here):
        lib = ctypes.CDLL(here)
        if not hasattr(lib, "aio_flac_info"):
            # stale pre-FLAC build: rebuild in place and reload
            import subprocess
            try:
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", here,
                     os.path.join(native_dir, "audioio.cpp"),
                     os.path.join(native_dir, "flac.cpp"), "-ldl"],
                    check=True, capture_output=True, timeout=120)
                lib = ctypes.CDLL(here)
            except Exception:
                pass
        lib.aio_read_info.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_long),
                                      ctypes.POINTER(ctypes.c_int),
                                      ctypes.POINTER(ctypes.c_int)]
        lib.aio_read_info.restype = ctypes.c_int
        lib.aio_read_segment.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                         ctypes.c_long,
                                         ctypes.POINTER(ctypes.c_float)]
        lib.aio_read_segment.restype = ctypes.c_long
        lib.aio_write_wav.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_float),
                                      ctypes.c_long, ctypes.c_int]
        lib.aio_write_wav.restype = ctypes.c_int
        lib.aio_resample.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                                     ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                                     ctypes.c_double, ctypes.c_double]
        lib.aio_resample.restype = ctypes.c_long
        if hasattr(lib, "aio_flac_info"):
            lib.aio_flac_info.argtypes = [ctypes.c_char_p,
                                          ctypes.POINTER(ctypes.c_long),
                                          ctypes.POINTER(ctypes.c_int),
                                          ctypes.POINTER(ctypes.c_int)]
            lib.aio_flac_info.restype = ctypes.c_int
            lib.aio_flac_read_segment.argtypes = [
                ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
                ctypes.POINTER(ctypes.c_float)]
            lib.aio_flac_read_segment.restype = ctypes.c_long
        _NATIVE = lib
    return _NATIVE


# FLAC has no cheap random access (decode is sequential from the stream
# start), but the training loaders draw 8 segments per file (reference
# datasets/maestro_dataset.py:84-100 semantics) — so whole decoded files are
# cached, bounded by total samples.
_FLAC_CACHE: "dict[str, Tuple[np.ndarray, int]]" = {}
_FLAC_CACHE_MAX_SAMPLES = 200_000_000  # ~800 MB float32


def _flac_full(path: str) -> Tuple[np.ndarray, int]:
    hit = _FLAC_CACHE.pop(path, None)
    if hit is not None:
        _FLAC_CACHE[path] = hit  # re-insert: LRU order
        return hit
    lib = _native()
    if lib is None or not hasattr(lib, "aio_flac_info"):
        raise ValueError(
            f"cannot decode {path!r}: FLAC needs the native audioio library "
            f"(build aid_tpu/native)")
    frames = ctypes.c_long(); fs = ctypes.c_int(); ch = ctypes.c_int()
    rc = lib.aio_flac_info(path.encode(), ctypes.byref(frames),
                           ctypes.byref(fs), ctypes.byref(ch))
    if rc != 0:
        raise ValueError(f"not a decodable FLAC file: {path!r} (rc={rc})")
    out = np.zeros(frames.value, np.float32)
    got = lib.aio_flac_read_segment(
        path.encode(), 0, frames.value,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if got < 0 or got < frames.value:
        raise ValueError(
            f"FLAC decode failed for {path!r} "
            f"(got {got} of {frames.value} samples)")
    item = (out[:got], fs.value)
    while (_FLAC_CACHE
           and sum(a.size for a, _ in _FLAC_CACHE.values()) + got
           > _FLAC_CACHE_MAX_SAMPLES):
        _FLAC_CACHE.pop(next(iter(_FLAC_CACHE)))
    _FLAC_CACHE[path] = item
    return item


def info(path: str) -> Tuple[int, int, int]:
    """(num_frames, sample_rate, channels) without decoding the whole file."""
    lib = _native()
    if path.lower().endswith(".flac"):
        if lib is None or not hasattr(lib, "aio_flac_info"):
            raise ValueError(f"FLAC needs the native audioio library: {path!r}")
        frames = ctypes.c_long(); fs = ctypes.c_int(); ch = ctypes.c_int()
        rc = lib.aio_flac_info(path.encode(), ctypes.byref(frames),
                               ctypes.byref(fs), ctypes.byref(ch))
        if rc != 0:
            raise ValueError(f"not a decodable FLAC file: {path!r} (rc={rc})")
        return frames.value, fs.value, ch.value
    if lib is not None and path.lower().endswith(".wav"):
        frames = ctypes.c_long(); fs = ctypes.c_int(); ch = ctypes.c_int()
        if lib.aio_read_info(path.encode(), ctypes.byref(frames),
                             ctypes.byref(fs), ctypes.byref(ch)) == 0:
            return frames.value, fs.value, ch.value
    with _wave.open(path, "rb") as w:
        return w.getnframes(), w.getframerate(), w.getnchannels()


def read(path: str, start: int = 0, frames: int = -1) -> Tuple[np.ndarray, int]:
    """Mono float32 [T] segment + sample rate. start/frames in samples."""
    lib = _native()
    if path.lower().endswith(".flac"):
        audio, fs = _flac_full(path)
        if frames < 0:
            return audio[start:], fs
        return audio[start:start + frames], fs
    if lib is not None and path.lower().endswith(".wav"):
        n_total, fs, _ch = info(path)
        n = n_total - start if frames < 0 else min(frames, n_total - start)
        n = max(n, 0)
        out = np.zeros(n, np.float32)
        got = lib.aio_read_segment(path.encode(), start, n,
                                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if got >= 0:
            return out[:got], fs
    return _read_python(path, start, frames)


def _read_python(path: str, start: int, frames: int) -> Tuple[np.ndarray, int]:
    if not path.lower().endswith(".wav"):
        raise ValueError(
            f"cannot decode {path!r}: only WAV is supported without the native "
            f"audioio library (build aid_tpu/native; FLAC corpora should be "
            f"converted to wav)")
    with _wave.open(path, "rb") as w:
        fs = w.getframerate()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        n_total = w.getnframes()
        n = n_total - start if frames < 0 else min(frames, n_total - start)
        n = max(n, 0)
        w.setpos(min(start, n_total))
        raw = w.readframes(n)
    if sw == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    elif sw == 3:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        x = ((b[:, 0].astype(np.int32)) | (b[:, 1].astype(np.int32) << 8)
             | (b[:, 2].astype(np.int32) << 16))
        x = (x - ((x & 0x800000) << 1)).astype(np.float32) / 8388608.0
    elif sw == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {sw} in {path}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, fs


def write(path: str, audio: np.ndarray, fs: int, normalize_if_clipping: bool = True
          ) -> np.ndarray:
    """Write mono float32 as 16-bit WAV (reference write_audio_file semantics,
    utils/logging.py:295-318: peak-normalize only when it would clip)."""
    x = np.asarray(audio, np.float32).reshape(-1)
    peak = float(np.max(np.abs(x))) if x.size else 0.0
    if normalize_if_clipping and peak > 1.0:
        x = x / peak
    lib = _native()
    if lib is not None:
        if lib.aio_write_wav(path.encode(),
                             x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                             x.size, int(fs)) == 0:
            return x
    with _wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(int(fs))
        w.writeframes((np.clip(x, -1, 1) * 32767.0).astype("<i2").tobytes())
    return x


def resample_host(x: np.ndarray, fs_in: float, fs_out: float) -> np.ndarray:
    """Host-side resampling: libsoxr through the native lib when built, else
    scipy.signal.resample_poly."""
    if fs_in == fs_out:
        return np.asarray(x, np.float32)
    lib = _native()
    x = np.ascontiguousarray(x, np.float32)
    if lib is not None:
        out_len = int(np.ceil(x.size * fs_out / fs_in)) + 16
        out = np.zeros(out_len, np.float32)
        got = lib.aio_resample(x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                               x.size,
                               out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                               out_len, float(fs_in), float(fs_out))
        if got > 0:
            return out[:got]
    import scipy.signal
    from math import gcd
    g = gcd(int(fs_in), int(fs_out))
    return scipy.signal.resample_poly(x, int(fs_out) // g,
                                      int(fs_in) // g).astype(np.float32)
