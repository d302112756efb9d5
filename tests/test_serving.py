"""Serving-layer tests: gap discovery, windowing, arbitrary-length restore."""
import numpy as np
import pytest

from aid_tpu.serving import InpaintingService, find_gaps


def test_find_gaps():
    m = np.ones(100, np.float32)
    m[10:20] = 0
    m[50:51] = 0
    assert find_gaps(m) == [(10, 20), (50, 51)]
    assert find_gaps(np.ones(10)) == []
    m2 = np.zeros(5)
    assert find_gaps(m2) == [(0, 5)]


@pytest.fixture(scope="module")
def service():
    return InpaintingService.from_config(overrides=[
        "exp.audio_len=2048",
        "network.cqt.num_octs=3",
        "network.cqt.bins_per_oct=8",
        "network.Ns=[8,16,16]",
        "network.num_dils=[1,1,1]",
        "network.attention_layers=[0,0,0,0]",
        "tester.T=3",
    ], max_batch=2)


def test_inpaint_long_signal_multiple_gaps(service):
    fs = 22050
    T = 3 * 2048
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(T) * 0.05).astype(np.float32)
    mask = np.ones(T, np.float32)
    mask[1000:1100] = 0
    mask[4000:4080] = 0
    out = service.inpaint(audio, mask, fs, seed=1)
    assert out.shape == audio.shape
    assert np.all(np.isfinite(out))
    # observed samples untouched
    np.testing.assert_array_equal(out[mask > 0.5], audio[mask > 0.5])
    # gap samples actually replaced (not left masked-to-zero)
    assert np.std(out[1000:1100]) > 0


def test_inpaint_resampled_rate(service):
    fs_in = 44100
    T = 6 * 2048
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(T) * 0.05).astype(np.float32)
    mask = np.ones(T, np.float32)
    mask[8000:8400] = 0
    out = service.inpaint(audio, mask, fs_in, seed=2)
    assert out.shape == audio.shape
    np.testing.assert_array_equal(out[mask > 0.5], audio[mask > 0.5])


def test_inpaint_file_roundtrip(service, tmp_path):
    from aid_tpu.data import audio_io
    fs = 22050
    T = 3 * 2048
    audio = (np.sin(np.arange(T) * 0.05) * 0.3).astype(np.float32)
    p_in = str(tmp_path / "in.wav")
    audio_io.write(p_in, audio, fs)
    mask = np.ones(T, np.float32)
    mask[2000:2200] = 0
    p_out = service.inpaint_file(p_in, mask, str(tmp_path / "out.wav"))
    y, fs2 = audio_io.read(p_out)
    assert fs2 == fs and len(y) == T
