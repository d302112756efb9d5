"""Corpus-scale data validation (slow tier): long MAESTRO-layout files with
random-access segment decode, spawned decode workers, decode-failure
robustness mid-corpus, and a short training run consuming the corpus through
the full ``setup_dataset`` path (reference datasets/maestro_dataset.py:59-100
semantics at realistic file sizes; the quick-tier tests in test_data.py use
~1 s fixtures, which never exercises seek cost or the skip counters).

The headline ~1 GB throughput numbers live in PARITY.md (measured with
scripts/bench_loader.py); this test keeps a smaller corpus so CI stays
bounded while still covering every corpus-scale code path.
"""
import csv
import os
import sys

import numpy as np
import pytest

from aid_tpu import setup as asetup
from aid_tpu.utils.config import compose

pytestmark = pytest.mark.slow

FS = 44100
FILE_SECS = 60.0
N_FILES = 6


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """MAESTRO-layout corpus: 6 x 60 s native-rate WAVs (+CSV), ~63 MB."""
    from aid_tpu.data import audio_io
    root = str(tmp_path_factory.mktemp("maestro_corpus"))
    rng = np.random.default_rng(0)
    rows = []
    t = np.arange(int(FILE_SECS * FS)) / FS
    for j in range(N_FILES):
        rel = f"2015/file_{j}.wav"
        os.makedirs(os.path.join(root, "2015"), exist_ok=True)
        x = (0.2 * np.sin(2 * np.pi * 110.0 * (1 + j) * t)
             + 0.05 * rng.standard_normal(t.size)).astype(np.float32)
        audio_io.write(os.path.join(root, rel), x, FS)
        rows.append({"year": 2015, "split": "train", "audio_filename": rel})
    with open(os.path.join(root, "maestro-v3.0.0.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["year", "split", "audio_filename"])
        w.writeheader()
        w.writerows(rows)
    return root


def _args(corpus_root, tmp, **exp):
    overrides = [
        "exp=test_cqtdiff_22k",
        "dset=maestro_allyears",
        f"dset.path={corpus_root}",
        "dset.load_len=405000",   # the reference's ~9 s native window
        "logging.print_model_summary=False",
        f"model_dir={tmp}",
    ] + [f"exp.{k}={v}" for k, v in exp.items()]
    return compose(overrides=overrides)


def test_corpus_segments_multiworker(corpus, tmp_path):
    """Spawned workers random-access long files: native rate, full windows,
    and actual segment diversity (not one cached window)."""
    args = _args(corpus, str(tmp_path), batch=4, num_workers=2)
    loader = asetup.setup_dataset(args)
    try:
        seen = []
        for _ in range(6):
            audio, fs = next(loader)
            assert audio.shape == (4, 405000)
            assert audio.dtype == np.float32
            assert np.all(np.asarray(fs) == FS)
            assert np.all(np.isfinite(audio))
            seen.append(np.asarray(audio[:, :64]))
        stacked = np.concatenate(seen, axis=0).reshape(len(seen) * 4, -1)
        uniq = {s.tobytes() for s in stacked}
        assert len(uniq) > len(stacked) // 2, "segments are not diverse"
    finally:
        if hasattr(loader, "close"):
            loader.close()


def test_corpus_decode_failure_skipped(corpus, tmp_path):
    """A corrupt file mid-corpus is skipped (counted), not fatal — the
    maestro loader's abort-after-50 hardening (aid_tpu/data/maestro.py:95-117)
    under a corpus-shaped tree."""
    import shutil
    broken = str(tmp_path / "corpus")
    shutil.copytree(corpus, broken)
    with open(os.path.join(broken, "2015", "file_2.wav"), "wb") as f:
        f.write(b"RIFFgarbage")  # undecodable header
    args = _args(broken, str(tmp_path), batch=2)
    loader = asetup.setup_dataset(args)
    for _ in range(8):  # far more draws than files: must hit the bad one
        audio, fs = next(loader)
        assert audio.shape == (2, 405000)
        assert np.all(np.isfinite(audio))


def test_training_on_corpus_with_workers(corpus, tmp_path):
    """Three real train steps fed by 2 decode workers off the corpus: the
    resample path (44.1k native -> 22.05k model) plus crop runs in-graph and
    the loss stays finite — the full reference training data path
    (trainer.py:236-252) at corpus scale."""
    args = compose(overrides=[
        "exp=test_cqtdiff_22k",
        "dset=maestro_allyears",
        f"dset.path={corpus}",
        "dset.load_len=8192",
        "exp.audio_len=2048",
        "exp.batch=4",
        "exp.num_workers=2",
        "exp.total_its=3",
        "exp.lr_rampup_it=2",
        "exp.resample_factor=2",
        "network.cqt.num_octs=3",
        "network.cqt.bins_per_oct=8",
        "network.Ns=[8,16,16]",
        "network.num_dils=[1,1,1]",
        "network.attention_layers=[0,0,1,1]",
        "logging.save_interval=1000",
        "logging.log_interval=1000",
        "logging.print_model_summary=False",
        f"model_dir={tmp_path}",
    ])
    bundle = asetup.setup_network(args)
    ediff = asetup.setup_diff_parameters(args)
    dset = asetup.setup_dataset(args)
    try:
        tr = asetup.setup_trainer(args, dset=dset, network=bundle,
                                  diff_params=ediff)
        tr.init_state()
        final_it = tr.training_loop()
        assert final_it == 3
        import jax
        leaves = jax.tree_util.tree_leaves(jax.device_get(tr.state.params))
        assert all(np.all(np.isfinite(l)) for l in leaves)
    finally:
        if hasattr(dset, "close"):
            dset.close()
