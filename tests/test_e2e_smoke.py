"""E2E quality CI gate (slow tier): the learning smoke must clear PINNED
quality thresholds, so perf work (quantization, layout changes, gelu swaps,
kernel rewrites) that silently degrades sampling quality fails CI instead of
surfacing in listening tests (VERDICT r2 #10).

Runs scripts/e2e_smoke.py as a subprocess on CPU at a reduced iteration
budget. The smoke itself enforces the gates (SMOKE_MIN_SNR_GAIN_DB /
SMOKE_MAX_LSD_RATIO env knobs, pinned defaults in the script); this test
pins the CI operating point and asserts the script's verdict.
"""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_e2e_smoke_quality_gate(tmp_path):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "SMOKE_DTYPE": "float32",  # bf16 is software-emulated on CPU
        "SMOKE_L": "8192",         # half-size problem: ~15 min on one core
        "SMOKE_ITS": "150",
        # CI operating point, calibrated 2026-08-19 (gain 5.97 dB at these
        # settings): training must lift gap SNR by >= 4 dB over untrained
        # weights AND cut the in-gap log-spectral distance by >= 5% (calibrated ratio 0.869).
        "SMOKE_MIN_SNR_GAIN_DB": "4.0",
        "SMOKE_MAX_LSD_RATIO": "0.95",
    })
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "e2e_smoke.py")],
        env=env, capture_output=True, text=True, timeout=3600)
    tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-25:])
    assert proc.returncode == 0, f"e2e smoke failed:\n{tail}"
    assert "E2E SMOKE PASS" in proc.stdout, tail
