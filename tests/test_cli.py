"""CLI end-to-end smoke: train.py main() over a generated wav folder for a
few iterations (exercises compose -> factories -> loader -> trainer -> ckpt),
and test.py main() unconditional mode."""
import os
import sys

import numpy as np
import pytest

from aid_tpu.data import audio_io


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    rng = np.random.default_rng(0)
    for i in range(3):
        audio_io.write(str(d / f"clip_{i}.wav"),
                       rng.standard_normal(9000).astype(np.float32) * 0.1,
                       22050)
    return str(d)


TINY_NET = [
    "exp=test_cqtdiff_22k",
    "exp.audio_len=2048",
    "exp.resample_factor=1",
    "network.cqt.num_octs=3",
    "network.cqt.bins_per_oct=8",
    "network.Ns=[8,16,16]",
    "network.num_dils=[1,1,1]",
    "network.attention_layers=[0,0,0,0]",
]


def test_train_cli_end_to_end(wav_dir, tmp_path, monkeypatch):
    import train as train_cli
    argv = ["train.py", *TINY_NET,
            "dset=musicnet", f"dset.path={wav_dir}",
            f"dset.test.path={wav_dir}",
            "exp.batch=2", "exp.total_its=2", "exp.resume=False",
            "logging.save_interval=2", "logging.log_interval=1",
            "logging.print_model_summary=False",
            "tester.do_test=False",
            f"model_dir={tmp_path}"]
    monkeypatch.setattr(sys, "argv", argv)
    assert train_cli.main() == 0
    cks = [f for f in os.listdir(tmp_path) if f.endswith(".ckpt")]
    assert cks, os.listdir(tmp_path)


def test_train_cli_dry_run(monkeypatch, capsys):
    import train as train_cli
    monkeypatch.setattr(sys, "argv", ["train.py", "dry_run=True"])
    assert train_cli.main() == 0
    out = capsys.readouterr().out
    assert "sigma_data" in out


def test_test_cli_unconditional(wav_dir, tmp_path, monkeypatch):
    import test as test_cli
    argv = ["test.py", *TINY_NET,
            "dset=musicnet", f"dset.path={wav_dir}",
            f"dset.test.path={wav_dir}", "dset.test.num_samples=1",
            "tester.T=3",
            "tester.modes=['unconditional']",
            "tester.unconditional.num_samples=1",
            "tester.unconditional.audio_len=2048",
            f"model_dir={tmp_path}"]
    monkeypatch.setattr(sys, "argv", argv)
    assert test_cli.main() == 0
    found = []
    for root, _, files in os.walk(tmp_path):
        found += [f for f in files if f.endswith(".wav")]
    assert found
