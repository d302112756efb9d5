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
        "SMOKE_ITS": "150",
        # CI operating point, calibrated on the 150-it CPU run (see
        # scripts/e2e_smoke.py header): training must lift gap SNR by
        # >= 5 dB over untrained weights AND the reconstruction must be
        # spectrally closer to clean than the gapped input by >= 20%.
        "SMOKE_MIN_SNR_GAIN_DB": "5.0",
        "SMOKE_MAX_LSD_RATIO": "0.8",
    })
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "e2e_smoke.py")],
        env=env, capture_output=True, text=True, timeout=3600)
    tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-25:])
    assert proc.returncode == 0, f"e2e smoke failed:\n{tail}"
    assert "E2E SMOKE PASS" in proc.stdout, tail
