"""Data-layer tests: native/python WAV IO, dataset iterators, batching
(built on generated fixtures — the reference ships no data tests)."""
import csv
import os

import numpy as np
import pytest

from aid_tpu.data import audio_io
from aid_tpu.data.loader import batched, make_train_loader
from aid_tpu.utils.config import compose


@pytest.fixture(scope="module")
def wav_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("maestro")
    years = [2015, 2009]
    rows = []
    rng = np.random.default_rng(0)
    for yi, year in enumerate(years):
        d = root / str(year)
        d.mkdir()
        for j in range(2):
            rel = f"{year}/file_{j}.wav"
            x = rng.standard_normal(30000).astype(np.float32) * 0.2
            audio_io.write(str(root / rel), x, 44100)
            rows.append({"year": year, "split": "train" if year == 2015 else "test",
                         "audio_filename": rel})
    with open(root / "maestro-v3.0.0.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["year", "split", "audio_filename"])
        w.writeheader()
        w.writerows(rows)
    return str(root)


def test_wav_roundtrip(tmp_path):
    x = (np.sin(np.linspace(0, 100, 5000)) * 0.7).astype(np.float32)
    p = str(tmp_path / "a.wav")
    audio_io.write(p, x, 16000)
    n, fs, ch = audio_io.info(p)
    assert (n, fs, ch) == (5000, 16000, 1)
    y, fs2 = audio_io.read(p)
    assert fs2 == 16000
    np.testing.assert_allclose(y, x, atol=1e-4)
    seg, _ = audio_io.read(p, 1000, 256)
    np.testing.assert_allclose(seg, y[1000:1256], atol=1e-7)


def test_resample_host_halves():
    x = np.random.default_rng(1).standard_normal(44100).astype(np.float32)
    y = audio_io.resample_host(x, 44100, 22050)
    assert abs(len(y) - 22050) <= 1
    # energy preserved within reason for white noise (lowpass halves power)
    assert 0.2 < float(np.std(y)) / float(np.std(x)) < 1.2


def test_maestro_train_iterator(wav_tree):
    args = compose(overrides=[
        "dset=maestro_allyears", f"dset.path={wav_tree}",
        "dset.years=[2015]", "dset.load_len=8192",
        "exp.audio_len=4096",
    ])
    from aid_tpu.data.maestro import MaestroDatasetFs
    ds = MaestroDatasetFs(args)
    it = iter(ds)
    for _ in range(3):
        x, fs = next(it)
        assert x.shape == (8192,)
        assert fs == 44100


def test_maestro_test_chunks(wav_tree):
    args = compose(overrides=[
        "dset=maestro_allyears", f"dset.path={wav_tree}",
        "dset.years_test=[2009]", "dset.test.num_samples=2",
        "exp.audio_len=4096", "exp.resample_factor=1",
    ])
    from aid_tpu.data.maestro import MaestroDatasetTestChunks
    ds = MaestroDatasetTestChunks(args)
    items = list(ds)
    assert len(items) == 2
    x, fs, name = items[0]
    assert x.shape == (4096,)
    assert name.endswith(".wav")


def test_audiofolder(wav_tree):
    args = compose(overrides=[
        "dset=musicnet", f"dset.path={wav_tree}",
        f"dset.test.path={wav_tree}", "dset.test.num_samples=2",
        "exp.audio_len=4096", "exp.resample_factor=1",
    ])
    from aid_tpu.data.audiofolder import AudioFolderDataset, AudioFolderDatasetTest
    it = iter(AudioFolderDataset(args))
    x, fs = next(it)
    assert x.shape == (4096,)
    test = list(AudioFolderDatasetTest(args))
    assert len(test) == 2


def test_masked_dataset(wav_tree, tmp_path):
    mask = np.ones(4096, np.float32)
    mask[100:200] = 0
    np.save(str(tmp_path / "file_0.npy"), mask)
    args = compose(overrides=[
        "dset=inpainting_mask_dataset",
        f"dset.test.path={wav_tree}/2015",
        f"dset.test.mask_path={tmp_path}",
        "dset.test.num_samples=1",
        "exp.audio_len=4096", "exp.resample_factor=1",
    ])
    from aid_tpu.data.masked import MaskedAudioDatasetTest
    items = list(MaskedAudioDatasetTest(args))
    assert len(items) == 1
    x, m, fs, name = items[0]
    assert x.shape == m.shape == (4096,)
    assert m[150] == 0 and m[50] == 1


def test_batcher(wav_tree):
    def gen():
        rng = np.random.default_rng(0)
        while True:
            yield rng.standard_normal(128).astype(np.float32), 22050

    b = batched(iter(gen()), 4)
    x, fs = next(b)
    assert x.shape == (4, 128)
    assert fs.shape == (4,)
    pf = make_train_loader(iter(gen()), 4)
    x2, _ = next(pf)
    assert x2.shape == (4, 128)


def test_overfit_mode(wav_tree):
    args = compose(overrides=[
        "dset=musicnet", f"dset.path={wav_tree}", "dset.overfit=True",
        "exp.audio_len=4096", "exp.resample_factor=1",
    ])
    from aid_tpu.data.audiofolder import AudioFolderDataset
    it = iter(AudioFolderDataset(args))
    a, _ = next(it)
    b, _ = next(it)
    np.testing.assert_array_equal(a, b)


def test_multiprocess_loader(wav_tree):
    """Spawned decode workers (reference DataLoader num_workers parity)."""
    from aid_tpu.data.loader import MultiProcessLoader
    args = compose(overrides=[
        "dset=maestro_allyears", f"dset.path={wav_tree}",
        "exp.audio_len=2000", "exp.resample_factor=1", "exp.batch=2",
        "dset.years=[2015]", "dset.load_len=20000",
    ])
    loader = MultiProcessLoader(args, str(args.dset.callable),
                                batch_size=2, num_workers=2)
    try:
        seen = []
        for _ in range(3):
            audio, fs = next(loader)
            assert audio.shape == (2, 20000) and fs.shape == (2,)
            assert np.isfinite(audio).all()
            seen.append(audio)
        # workers are independently seeded: batches are not all identical
        assert not all(np.array_equal(seen[0], s) for s in seen[1:])
    finally:
        loader.close()


def test_process_seed_never_attaches_backend(monkeypatch):
    """_process_seed must not INITIALIZE a jax backend (regression: decode
    workers fork from a template where sitecustomize has jax imported, so a
    bare ``'jax' in sys.modules`` guard let process_index() attach to the
    single-tenant TPU tunnel and deadlock the loader). Here a backend IS up
    (conftest), so we assert the explicit worker-env guard short-circuits,
    and that with a backend up and no guard the host seed offset applies."""
    from aid_tpu.data.maestro import _process_seed

    monkeypatch.setenv("AID_TPU_DATA_WORKER", "1")
    assert _process_seed(42) == 42          # worker: never consult jax
    monkeypatch.delenv("AID_TPU_DATA_WORKER")
    import jax
    expect = 42 + 1000003 * jax.process_index()
    assert _process_seed(42) == expect      # host with live backend: sharded


def test_worker_failure_propagates(tmp_path):
    from aid_tpu.data.loader import MultiProcessLoader
    bad = tmp_path / "empty"
    bad.mkdir()
    (bad / "x.flac").write_bytes(b"junk")
    args = compose(overrides=[
        "dset=librispeech", f"dset.path={bad}",
        "exp.audio_len=1000", "exp.resample_factor=1", "exp.batch=1",
    ])
    loader = MultiProcessLoader(args, str(args.dset.callable),
                                batch_size=1, num_workers=1)
    try:
        with pytest.raises(RuntimeError, match="data worker failed"):
            for _ in range(200):
                next(loader)
    finally:
        loader.close()
