"""Trainer tests: one compiled step end-to-end on the 8-device CPU mesh,
EMA semantics, checkpoint save/resume (SURVEY.md §4 gates; the reference has
no trainer tests at all)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aid_tpu import setup as asetup
from aid_tpu.utils.config import compose


def _tiny_args(tmp, batch=8, its=3):
    return compose(overrides=[
        "exp=test_cqtdiff_22k",
        "exp.audio_len=2048",
        f"exp.batch={batch}",
        f"exp.total_its={its}",
        "exp.lr_rampup_it=2",
        "network.cqt.num_octs=3",
        "network.cqt.bins_per_oct=8",
        "network.Ns=[8,16,16]",
        "network.num_dils=[1,1,1]",
        "network.attention_layers=[0,0,1,1]",
        "logging.save_interval=2",
        "logging.log_interval=1",
        f"model_dir={tmp}",
    ])


class _SynthData:
    """Infinite synthetic batches at the model rate (no resample path)."""

    def __init__(self, batch, T):
        self.batch, self.T = batch, T
        self.rng = np.random.default_rng(0)

    def __iter__(self):
        return self

    def __next__(self):
        x = self.rng.standard_normal((self.batch, self.T)).astype(np.float32) * 0.063
        return x, np.full((self.batch,), 22050, np.int64)


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("trainer"))
    args = _tiny_args(tmp)
    bundle = asetup.setup_network(args)
    ediff = asetup.setup_diff_parameters(args)
    tr = asetup.setup_trainer(args, dset=_SynthData(8, 2048), network=bundle,
                              diff_params=ediff)
    # tests share this module-scoped trainer and must not depend on which of
    # them runs first (the core/medium tiering reorders subsets)
    tr.init_state()
    return tr


def test_train_step_runs_and_descends(trainer):
    trainer.init_state()  # reset it=0 so the it==3 assert is order-free
    losses = []
    for _ in range(3):
        audio, fs = trainer.get_batch()
        m = trainer.train_step(audio, fs)
        losses.append(float(np.asarray(m["loss"])))
    assert all(np.isfinite(l) for l in losses), losses
    assert int(np.asarray(jax.device_get(trainer.state.it))) == 3


def test_ema_tracks_params(trainer):
    # after steps, EMA must differ from both init and params but stay close
    p = jax.tree_util.tree_leaves(trainer.state.params)[0]
    e = jax.tree_util.tree_leaves(trainer.state.ema)[0]
    assert p.shape == e.shape
    # rampup at tiny t keeps ema glued closely to params
    diff = float(jnp.max(jnp.abs(p - e)))
    assert diff < 1.0


def test_metrics_shapes(trainer):
    audio, fs = trainer.get_batch()
    m = trainer.train_step(audio, fs)
    bins = np.asarray(m["sigma_bins"])
    assert bins.shape == (trainer.num_sigma_bins, 3)
    # all samples fall in some bin
    assert int(bins[:, 0].sum()) == 8
    scalars = trainer.easy_logging(m)
    assert np.isfinite(scalars["loss"])


def test_skip_step_guardrail(tmp_path_factory):
    """exp.skip_grad_norm: a step whose pre-clip gradient norm exceeds the
    threshold must leave params, optimizer moments, and EMA untouched
    (guards Adam state against pathological batches; PARITY.md round 4)."""
    tmp = str(tmp_path_factory.mktemp("skiptr"))
    args = _tiny_args(tmp)
    args.exp["skip_grad_norm"] = 1e-12   # everything skips
    bundle = asetup.setup_network(args)
    ediff = asetup.setup_diff_parameters(args)
    tr = asetup.setup_trainer(args, dset=_SynthData(8, 2048), network=bundle,
                              diff_params=ediff)
    tr.init_state()
    p0 = [np.asarray(l).copy()
          for l in jax.tree_util.tree_leaves(tr.state.params)]
    for _ in range(2):   # step 2 has a non-zero ramped LR
        m = tr.train_step(*tr.get_batch())
    assert float(np.asarray(m["skipped"])) == 1.0
    p1 = [np.asarray(l) for l in jax.tree_util.tree_leaves(tr.state.params)]
    for a, b in zip(p0, p1):
        np.testing.assert_array_equal(a, b)
    assert int(np.asarray(jax.device_get(tr.state.it))) == 2  # it advances

    # generous threshold: the step applies and reports not-skipped
    args2 = _tiny_args(str(tmp_path_factory.mktemp("skiptr2")))
    args2.exp["skip_grad_norm"] = 1e9
    bundle2 = asetup.setup_network(args2)
    tr2 = asetup.setup_trainer(args2, dset=_SynthData(8, 2048),
                               network=bundle2, diff_params=ediff)
    tr2.init_state()
    q0 = [np.asarray(l).copy()
          for l in jax.tree_util.tree_leaves(tr2.state.params)]
    for _ in range(2):
        m2 = tr2.train_step(*tr2.get_batch())
    assert float(np.asarray(m2["skipped"])) == 0.0
    q1 = [np.asarray(l) for l in jax.tree_util.tree_leaves(tr2.state.params)]
    assert any(not np.array_equal(a, b) for a, b in zip(q0, q1))


def test_skip_factor_guardrail(tmp_path_factory):
    """exp.skip_grad_factor: the RELATIVE guardrail rejects isolated spikes
    against a running gnorm EMA but keeps applying steps as the healthy
    scale drifts — the absolute threshold froze a 20k-it flagship run
    (~99% of late steps reverted; Adam count 8668 at it 20000)."""
    tmp = str(tmp_path_factory.mktemp("skipfac"))
    args = _tiny_args(tmp, its=30)
    args.exp["skip_grad_norm"] = 0
    args.exp["skip_grad_factor"] = 8.0
    bundle = asetup.setup_network(args)
    ediff = asetup.setup_diff_parameters(args)
    tr = asetup.setup_trainer(args, dset=_SynthData(8, 2048), network=bundle,
                              diff_params=ediff)
    tr.init_state()
    for _ in range(3):          # warm the EMA on healthy batches
        m = tr.train_step(*tr.get_batch())
    assert float(np.asarray(m["skipped"])) == 0.0
    ema0 = float(np.asarray(m["gnorm_ema"]))
    assert ema0 > 0.0
    assert int(jax.device_get(tr.state.applied)) == 3

    # a spiked batch must be rejected: params untouched, EMA barely moved
    # (winsorized update: at most the factor-cap enters the average)
    p0 = [np.asarray(l).copy()
          for l in jax.tree_util.tree_leaves(tr.state.params)]
    audio, fs = tr.get_batch()
    m = tr.train_step(audio * 1e4, fs)
    assert float(np.asarray(m["skipped"])) == 1.0
    assert int(jax.device_get(tr.state.applied)) == 3
    for a, b in zip(p0, jax.tree_util.tree_leaves(tr.state.params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    ema1 = float(np.asarray(m["gnorm_ema"]))
    assert ema1 <= ema0 * (0.98 + 0.02 * 8.0) + 1e-6

    # the next healthy batch applies again — no freeze
    m = tr.train_step(*tr.get_batch())
    assert float(np.asarray(m["skipped"])) == 0.0
    assert int(jax.device_get(tr.state.applied)) == 4

    # a sustained level SHIFT cannot freeze training: the winsorized EMA
    # update keeps raising the cap ~14%/step (beta=0.02, factor=8) even
    # while steps are being skipped, so after a one-time 3x amplitude jump
    # the guardrail must re-open within tens of steps and stay open
    applied_before = int(jax.device_get(tr.state.applied))
    recent = []
    for _ in range(40):
        audio, fs = tr.get_batch()
        m = tr.train_step(audio * 3.0, fs)
        recent.append(1.0 - float(np.asarray(m["skipped"])))
    applied = int(jax.device_get(tr.state.applied))
    assert applied > applied_before, "level shift froze training entirely"
    assert sum(recent[-8:]) >= 7, (
        f"guardrail still mostly closed after 40 steps: last8={recent[-8:]}")


def test_guardrail_state_checkpoint_roundtrip(tmp_path_factory):
    """gnorm_ema/applied survive save+resume; checkpoints written before the
    guardrail state existed (no such keys) still restore."""
    tmp = str(tmp_path_factory.mktemp("gr_ckpt"))
    args = _tiny_args(tmp)
    args.exp["skip_grad_factor"] = 8.0
    bundle = asetup.setup_network(args)
    ediff = asetup.setup_diff_parameters(args)
    tr = asetup.setup_trainer(args, dset=_SynthData(8, 2048), network=bundle,
                              diff_params=ediff)
    tr.init_state()
    for _ in range(2):
        tr.train_step(*tr.get_batch())
    ema_val = float(jax.device_get(tr.state.gnorm_ema))
    assert ema_val > 0.0
    path = tr.save_checkpoint()

    args2 = _tiny_args(tmp)
    args2.exp["skip_grad_factor"] = 8.0
    bundle2 = asetup.setup_network(args2)
    tr2 = asetup.setup_trainer(args2, dset=_SynthData(8, 2048),
                               network=bundle2, diff_params=ediff)
    assert tr2.resume_from_checkpoint(path)
    assert float(jax.device_get(tr2.state.gnorm_ema)) == pytest.approx(
        ema_val, rel=1e-6)
    assert int(jax.device_get(tr2.state.applied)) == 2
    tr2.train_step(*tr2.get_batch())  # and training continues

    # legacy payload without the guardrail keys
    import orbax.checkpoint as ocp
    legacy = os.path.join(tmp, "legacy-7.ckpt")
    ocp.PyTreeCheckpointer().save(
        os.path.abspath(legacy),
        {"it": 7, "network": jax.device_get(tr.state.params),
         "ema": jax.device_get(tr.state.ema),
         "optimizer": jax.device_get(tr.state.opt_state)}, force=True)
    tr3 = asetup.setup_trainer(args2, dset=_SynthData(8, 2048),
                               network=bundle2, diff_params=ediff)
    assert tr3.resume_from_checkpoint(legacy)
    assert float(jax.device_get(tr3.state.gnorm_ema)) == 0.0
    assert int(jax.device_get(tr3.state.applied)) == 7
    tr3.train_step(*tr3.get_batch())


def test_checkpoint_roundtrip(trainer):
    path = trainer.save_checkpoint()
    assert os.path.exists(path)
    it_before = int(np.asarray(jax.device_get(trainer.state.it)))
    p_before = np.asarray(jax.tree_util.tree_leaves(trainer.state.params)[0])
    trainer.state = None
    assert trainer.resume_from_checkpoint()
    assert int(np.asarray(jax.device_get(trainer.state.it))) == it_before
    p_after = np.asarray(jax.tree_util.tree_leaves(trainer.state.params)[0])
    np.testing.assert_array_equal(p_before, p_after)


def test_lr_ramp_schedule():
    from aid_tpu.training.trainer import make_optimizer
    args = compose(overrides=["exp.lr=1.0", "exp.lr_rampup_it=10"])
    tx = make_optimizer(args.exp)
    params = {"w": jnp.ones(4)}
    state = tx.init(params)
    g = {"w": jnp.ones(4) * 0.1}
    # step 0: lr = 0 -> no update beyond clip/adam scale by zero
    updates, state = tx.update(g, state, params)
    assert float(jnp.max(jnp.abs(updates["w"]))) < 1e-6


def test_gradient_accumulation(tmp_path):
    args = _tiny_args(str(tmp_path), batch=8, its=2)
    args = compose(overrides=[
        "exp=test_cqtdiff_22k", "exp.audio_len=2048", "exp.batch=8",
        "exp.num_accumulation_rounds=2", "exp.total_its=2",
        "network.cqt.num_octs=3", "network.cqt.bins_per_oct=8",
        "network.Ns=[8,16,16]", "network.num_dils=[1,1,1]",
        "network.attention_layers=[0,0,0,0]",
        "logging.print_model_summary=False",
        f"model_dir={tmp_path}",
    ])
    bundle = asetup.setup_network(args)
    ediff = asetup.setup_diff_parameters(args)
    tr = asetup.setup_trainer(args, dset=_SynthData(8, 2048), network=bundle,
                              diff_params=ediff)
    tr.init_state()
    audio, fs = tr.get_batch()
    m = tr.train_step(audio, fs)
    assert np.isfinite(float(np.asarray(m["loss"])))
    bins = np.asarray(m["sigma_bins"])
    assert int(bins[:, 0].sum()) == 8  # all samples across micro-batches


def test_shape_matched_partial_resume(tmp_path):
    args = compose(overrides=[
        "exp=test_cqtdiff_22k", "exp.audio_len=2048", "exp.batch=8",
        "network.cqt.num_octs=3", "network.cqt.bins_per_oct=8",
        "network.Ns=[8,16,16]", "network.num_dils=[1,1,1]",
        "network.attention_layers=[0,0,0,0]",
        "logging.print_model_summary=False",
        f"model_dir={tmp_path}",
    ])
    bundle = asetup.setup_network(args)
    ediff = asetup.setup_diff_parameters(args)
    tr = asetup.setup_trainer(args, dset=_SynthData(8, 2048), network=bundle,
                              diff_params=ediff)
    tr.init_state()
    path = tr.save_checkpoint()

    # a WIDER network config: only matching-shape leaves restore
    args2 = compose(overrides=[
        "exp=test_cqtdiff_22k", "exp.audio_len=2048", "exp.batch=8",
        "network.cqt.num_octs=3", "network.cqt.bins_per_oct=8",
        "network.Ns=[8,16,32]", "network.num_dils=[1,1,1]",
        "network.attention_layers=[0,0,0,0]",
        "logging.print_model_summary=False",
        f"model_dir={tmp_path}",
    ])
    bundle2 = asetup.setup_network(args2)
    tr2 = asetup.setup_trainer(args2, dset=_SynthData(8, 2048),
                               network=bundle2, diff_params=ediff)
    tr2.init_state()
    assert tr2.resume_from_checkpoint(path)
    # matching leaf got copied
    a = np.asarray(jax.device_get(tr.state.params))["params"] if False else None
    ref_leaf = jax.device_get(tr.state.params)["params"]["embedding"]["mlp_0"]["kernel"]
    new_leaf = jax.device_get(tr2.state.params)["params"]["embedding"]["mlp_0"]["kernel"]
    np.testing.assert_array_equal(np.asarray(ref_leaf), np.asarray(new_leaf))


def test_grad_norms_by_module_reported(trainer):
    if trainer.state is None:
        trainer.init_state()
    audio, fs = next(trainer.dset)
    m = trainer.train_step(audio, fs)
    gm = m["grad_norms_by_module"]
    assert len(gm) >= 3  # per-top-level-module norms (wandb.watch equivalent)
    for k, v in gm.items():
        assert np.isfinite(float(np.asarray(v))), k
    # and easy_logging surfaces them as scalars
    out = trainer.easy_logging(m)
    assert any(k.startswith("grads/") for k in out)


def test_collector_flushes_per_interval(trainer):
    if trainer.state is None:
        trainer.init_state()
    audio, fs = next(trainer.dset)
    m = trainer.train_step(audio, fs)
    trainer.easy_logging(m)
    # interval semantics: stats were read+plotted then flushed
    assert trainer.collector.names() == []


def test_heavy_logging_writes_artifacts(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("heavy"))
    args = _tiny_args(tmp, batch=8, its=1)
    args.tester["T"] = 3
    args.tester["unconditional"]["num_samples"] = 2
    args.tester["unconditional"]["audio_len"] = 2048
    bundle = asetup.setup_network(args)
    ediff = asetup.setup_diff_parameters(args)
    tester = asetup.setup_tester(args, network=bundle, diff_params=ediff,
                                 test_set=None, in_training=True)
    tr = asetup.setup_trainer(args, dset=_SynthData(8, 2048), network=bundle,
                              diff_params=ediff, tester=tester)
    tr.init_state()
    tr.heavy_logging()
    d = os.path.join(tmp, "heavy_logging", "it_0")
    wavs = [f for f in os.listdir(d) if f.endswith(".wav")]
    assert len(wavs) == 2, os.listdir(d)


def test_stall_guard_exits_on_stale_heartbeat(trainer, monkeypatch):
    # 2026-08-20 incident: the TPU tunnel dropped mid-run, the in-flight
    # dispatch never returned, and the trainer hung forever — invisible to
    # the external relaunch watchdog. The in-process guard must exit(3) when
    # the loop heartbeat goes stale.
    import time
    monkeypatch.setattr(trainer, "stall_timeout_s", 0.5)
    calls = []

    def fake_exit(code):
        calls.append(code)
        trainer._stall_stop.set()  # retire the guard instead of raising —
        # an exception here shows up as PytestUnhandledThreadExceptionWarning

    monkeypatch.setattr(os, "_exit", fake_exit)
    beat = trainer._start_stall_guard()
    assert beat is not None
    deadline = time.time() + 10
    while not calls and time.time() < deadline:
        time.sleep(0.05)
    trainer._stall_stop.set()
    assert calls[0] == 3


def test_stall_guard_disabled_and_heartbeat_keeps_it_quiet(trainer,
                                                           monkeypatch):
    import time
    monkeypatch.setattr(trainer, "stall_timeout_s", 0.0)
    assert trainer._start_stall_guard() is None  # 0 disables

    monkeypatch.setattr(trainer, "stall_timeout_s", 1.0)
    calls = []
    monkeypatch.setattr(os, "_exit",
                        lambda code: (calls.append(code),
                                      (_ for _ in ()).throw(SystemExit))[0])
    beat = trainer._start_stall_guard()
    for _ in range(6):  # a progressing loop bumps the beat: no exit
        time.sleep(0.3)
        beat[0] = time.time()
    # retire the guard before monkeypatch restores the real os._exit —
    # a surviving thread would kill the whole pytest process ~30 min later
    # once the restored stall_timeout elapsed (advisor round 4, medium)
    trainer._stall_stop.set()
    assert calls == []


def test_heavy_logging_failure_disables_demos_not_training(tmp_path_factory):
    # 2026-08-20 incident: an axon UNIMPLEMENTED inside the demo sampler was
    # caught, but the trainer kept re-attempting demos and the poisoned
    # backend killed the next train_step. Contract (r5): a demo failure →
    # probe the backend, skip THIS demo, keep training; stand down only
    # after 2 consecutive failures (VERDICT r4 weak #4: a single transient
    # failure must not permanently disable the capability).
    tmp = str(tmp_path_factory.mktemp("heavy_fail"))
    args = _tiny_args(tmp, batch=8, its=1)
    bundle = asetup.setup_network(args)
    ediff = asetup.setup_diff_parameters(args)

    class _BoomTester:
        calls = 0

        def sample_unconditional_ema(self, ema):
            type(self).calls += 1
            raise ValueError("UNIMPLEMENTED: TPU backend error")

    tr = asetup.setup_trainer(args, dset=_SynthData(8, 2048), network=bundle,
                              diff_params=ediff, tester=_BoomTester())
    tr.init_state()
    tr.heavy_logging()          # must not raise, must not os._exit
    assert tr._demo_failures == 1   # one strike; demos still enabled
    audio, fs = next(tr.dset)
    tr.train_step(audio, fs)    # training continues on the healthy backend
    tr.heavy_logging()          # second consecutive failure → stand down
    assert tr._demo_failures == 2
    tr.heavy_logging()          # further calls are clean no-ops
    assert _BoomTester.calls == 2


def test_training_continues_after_resume(tmp_path):
    # round-2 regression: orbax restores optimizer state as generic dicts;
    # the first post-resume step must still run (Adam state re-wrapped)
    args = _tiny_args(str(tmp_path), batch=8, its=2)
    bundle = asetup.setup_network(args)
    ediff = asetup.setup_diff_parameters(args)
    tr = asetup.setup_trainer(args, dset=_SynthData(8, 2048), network=bundle,
                              diff_params=ediff)
    tr.init_state()
    audio, fs = next(tr.dset)
    tr.train_step(audio, fs)
    path = tr.save_checkpoint()
    tr.state = None
    assert tr.resume_from_checkpoint(path)
    import optax
    # genuinely optax state, not dicts
    flat = jax.tree_util.tree_leaves(
        tr.state.opt_state, is_leaf=lambda x: hasattr(x, "_fields"))
    assert any(hasattr(x, "_fields") for x in flat)
    m = tr.train_step(*next(tr.dset))  # would raise AttributeError before fix
    assert np.isfinite(float(np.asarray(m["loss"])))


def test_stream_checkpoint_format_and_orbax_fallback(tmp_path):
    # round-5: checkpoints stream one leaf at a time (bounded host memory —
    # the orbax save path spiked ~14 GB per flagship save, one OOM-killed
    # relaunch in round 4). Loaders must read BOTH formats: new stream dirs
    # and pre-round-5 orbax dirs.
    from aid_tpu.utils import ckpt_io
    args = _tiny_args(str(tmp_path), batch=8, its=2)
    bundle = asetup.setup_network(args)
    ediff = asetup.setup_diff_parameters(args)
    tr = asetup.setup_trainer(args, dset=_SynthData(8, 2048), network=bundle,
                              diff_params=ediff)
    tr.init_state()
    tr.train_step(*next(tr.dset))
    path = tr.save_checkpoint()
    assert ckpt_io.is_stream(path)  # new saves use the stream layout

    # a legacy orbax checkpoint of the same payload must keep loading
    import orbax.checkpoint as ocp
    legacy = str(tmp_path / "legacy.ckpt")
    from aid_tpu.parallel import mesh as pmesh
    ocp.PyTreeCheckpointer().save(legacy, {
        "it": 1,
        "network": pmesh.gather_to_host(tr.state.params),
        "ema": pmesh.gather_to_host(tr.state.ema),
        "optimizer": pmesh.gather_to_host(tr.state.opt_state),
    }, force=True)
    for p in (path, legacy):
        tr.state = None
        assert tr.resume_from_checkpoint(p)
        m = tr.train_step(*next(tr.dset))
        assert np.isfinite(float(np.asarray(m["loss"]))), p

    # the two formats restore numerically identical network weights
    a = ckpt_io.load(path)["network"]
    b = ckpt_io.load(legacy)["network"]
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
