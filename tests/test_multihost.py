"""REAL multi-process SPMD: two jax processes, one global dp mesh.

The reference's distributed story was an env:// rendezvous that was never
turned on (SURVEY §2.9). This framework's multi-host path is
jax.distributed.initialize + per-process data sharding
(make_array_from_process_local_data); here it runs for real — two local
processes, each owning 4 virtual CPU devices of one 8-device mesh, executing
the SAME jitted train step on process-local batch halves. Both must agree on
the (psum-reduced) loss bit-for-bit.
"""
import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/aid_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
coord, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert len(jax.local_devices()) == 4

import numpy as np
from aid_tpu import setup as asetup
from aid_tpu.parallel import mesh as pmesh
from aid_tpu.utils.config import compose

# tiny on purpose: both processes compile independently on ONE core, and
# the first cross-process collective fires a timeout if their compile skew
# is larger than the gloo window — keep compiles to seconds
args = compose(overrides=[
    "exp=test_cqtdiff_22k", "exp.audio_len=1024", "exp.batch=8",
    "exp.total_its=1", "network.cqt.num_octs=2", "network.cqt.bins_per_oct=4",
    "network.Ns=[4,8]", "network.num_dils=[1,1]",
    "network.attention_layers=[0,0,0]", "logging.save_model=False",
    "logging.print_model_summary=False",
    f"model_dir=/tmp/aid_tpu_mh_{pid}",
])
bundle = asetup.setup_network(args)
ediff = asetup.setup_diff_parameters(args)
trainer = asetup.setup_trainer(args, dset=None, network=bundle,
                               diff_params=ediff)
trainer.init_state()

B_local = pmesh.local_batch_size(8, trainer.mesh)
assert B_local == 4, B_local
# each process contributes ITS half of the global batch (deterministic,
# disjoint halves -> the global batch is identical for both processes)
full = np.random.default_rng(7).standard_normal((8, 1024)).astype(np.float32)
audio = full[pid * 4:(pid + 1) * 4]
fs = np.full((4,), 22050, np.int64)
# gloo's first-contact rendezvous has a hard ~30 s window; two defenses:
# (1) AOT-compile the step BEFORE the barrier — compilation is process-local,
#     so all the single-core compile skew is absorbed by the barrier's 300 s
#     coordination-service window instead of gloo's 30 s;
# (2) a barrier right before each collective phase aligns the processes.
def barrier(name):
    from jax._src import distributed as _dist
    _dist.global_state.client.wait_at_barrier(name, 300_000)

trainer.compile_step(audio, fs)
barrier("before_step")
metrics = trainer.train_step(audio, fs)
loss = float(np.asarray(jax.device_get(metrics["loss"])))
print(f"MHLOSS {pid} {loss:.9f}", flush=True)

# dp-sharded serving across BOTH processes: windows land on all 8 devices,
# the result is allgathered so every host returns the full restored signal
from aid_tpu.serving import InpaintingService
args.tester["T"] = 2
bundle.init(jax.random.PRNGKey(0), 1, 1024)
srv = InpaintingService(
    args=args, bundle=bundle,
    sampler=asetup.setup_sampler(args, network=bundle, diff_params=ediff),
    max_batch=8).shard(trainer.mesh)
aud = np.random.default_rng(3).standard_normal(3 * 1024).astype(np.float32) * 0.05
msk = np.ones_like(aud)
msk[500:540] = 0.0
msk[2000:2040] = 0.0
srv.precompile()  # process-local; hoists the big compile out of the window
barrier("before_serving")
restored = srv.inpaint(aud, msk, 22050)
assert np.array_equal(restored[msk > 0.5], aud[msk > 0.5])
print(f"MHSRV {pid} {float(np.sum(restored)):.9f}", flush=True)
jax.distributed.shutdown()
"""


@pytest.mark.slow
def test_two_process_spmd_train_step(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    env = dict(os.environ)
    env["XLA_FLAGS"] = " ".join(
        [f for f in env.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
        + ["--xla_force_host_platform_device_count=4"])
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO

    script = str(tmp_path / "worker.py")
    with open(script, "w") as f:
        f.write(_WORKER)
    procs = [subprocess.Popen([sys.executable, script, coord, str(i)],
                              cwd=REPO, env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} rc={p.returncode}:\n{out[-3000:]}"
    losses, srv_sums = {}, {}
    for out in outs:
        m = re.search(r"MHLOSS (\d) (-?[\d.]+)", out)
        assert m, out[-2000:]
        losses[int(m.group(1))] = float(m.group(2))
        m2 = re.search(r"MHSRV (\d) (-?[\d.]+)", out)
        assert m2, out[-2000:]
        srv_sums[int(m2.group(1))] = float(m2.group(2))
    assert set(losses) == {0, 1}
    # the psum-reduced loss must agree exactly across processes
    assert losses[0] == losses[1], losses
    assert np.isfinite(losses[0])
    # both hosts reconstruct the identical full signal from the shared mesh
    assert srv_sums[0] == srv_sums[1], srv_sums
    assert np.isfinite(srv_sums[0])
