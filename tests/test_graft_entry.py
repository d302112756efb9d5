"""The driver's entry points must be callable with ZERO env setup.

Round-1 regression: the driver imports __graft_entry__ and calls
dryrun_multichip(8) from a process where jax already initialized on the real
single-chip backend — the function must self-bootstrap a virtual CPU mesh
(MULTICHIP_r01.json recorded ok:false because it merely asserted).
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_respawns_from_unsuitable_backend():
    # Simulate the driver: jax comes up with too few devices (here: force a
    # 1-device CPU, the same "wrong backend" shape as the real 1-chip TPU),
    # then call dryrun_multichip(8). It must detect the mismatch and re-exec.
    env = dict(os.environ)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=560)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "dryrun_multichip(8): loss=" in proc.stdout, proc.stdout[-2000:]
