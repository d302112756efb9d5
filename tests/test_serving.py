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


def test_long_gap_chained_outpainting(service):
    # gap longer than 60% of the 2048-sample model window: must be filled by
    # chained sub-windows (round-1 finding: remainder was silently left masked)
    fs = 22050
    T = 4 * 2048
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(T) * 0.05).astype(np.float32)
    mask = np.ones(T, np.float32)
    g0, g1 = 2000, 2000 + 3000  # 3000 samples ~ 1.5 windows
    mask[g0:g1] = 0
    out = service.inpaint(audio, mask, fs, seed=4)
    np.testing.assert_array_equal(out[mask > 0.5], audio[mask > 0.5])
    # every part of the gap got energy (chained fills, not one window's worth)
    for lo in range(g0, g1 - 500, 500):
        assert float(np.std(out[lo:lo + 500])) > 1e-4, lo
    assert np.all(np.isfinite(out))


def test_clustered_gaps_never_pinned_as_observations(service, monkeypatch):
    """Two gaps close enough to share a window: the OTHER gap's (zeroed)
    samples must be masked unknown in every window, never pinned as
    observations by the data-consistency projection (round-2 verdict Weak #3:
    the old code masked only the row's own gap)."""
    fs = 22050
    L = 2048
    T = 3 * L
    rng = np.random.default_rng(11)
    audio = (rng.standard_normal(T) * 0.05).astype(np.float32)
    mask = np.ones(T, np.float32)
    gaps = [(2600, 2750), (3100, 3260)]  # both inside one 2048 window
    for g0, g1 in gaps:
        mask[g0:g1] = 0

    seen = []  # (w0-aligned window masks, window starts) per batch
    real_run = InpaintingService._run_batch

    def spy(self, xb, mb, key):
        seen.append(mb.copy())
        return real_run(self, xb, mb, key)

    monkeypatch.setattr(InpaintingService, "_run_batch", spy)
    out = service.inpaint(audio, mask, fs, seed=12)
    np.testing.assert_array_equal(out[mask > 0.5], audio[mask > 0.5])
    for g0, g1 in gaps:
        assert float(np.std(out[g0:g1])) > 1e-4

    # reconstruct each row's window start from the spy and assert every
    # still-unknown sample inside it was masked 0 in the batch it ran in
    assert seen, "no batches ran"
    mb0 = seen[0]
    # first batch: both gaps unfilled — wherever a row's window overlaps
    # EITHER gap, that overlap must be masked unknown
    for r in range(mb0.shape[0]):
        zeros = np.flatnonzero(mb0[r] < 0.5)
        if zeros.size == 0:
            continue  # padding row
        # both gaps lie in [2600, 3260), and each row's window (centered on
        # its own gap) covers BOTH, so every used row must mask at least the
        # combined gap samples — the old per-own-gap masking carried only ~150
        total_gap = sum(g1 - g0 for g0, g1 in gaps)
        assert zeros.size >= total_gap, (
            f"row {r} masked only {zeros.size} samples; with clustered gaps "
            f"it must mask all {total_gap} unknown samples in its window")


def test_chain_passes_cobatched_with_pending_jobs(service, monkeypatch):
    """A long (chained) gap plus short gaps at max_batch=2: while single-
    window jobs are pending, the chain's batches must carry them in the idle
    rows instead of padding (round-2 verdict Weak #4)."""
    fs = 22050
    L = 2048
    T = 8 * L
    rng = np.random.default_rng(13)
    audio = (rng.standard_normal(T) * 0.05).astype(np.float32)
    mask = np.ones(T, np.float32)
    mask[3000:3000 + 3000] = 0        # long gap -> chained passes
    mask[9000:9100] = 0               # short gaps, far from the chain
    mask[12000:12080] = 0
    mask[14500:14600] = 0

    rows_used = []
    real_run = InpaintingService._run_batch

    def spy(self, xb, mb, key):
        # a row is "used" iff it has unknown samples to fill
        rows_used.append([int((mb[r] < 0.5).sum() > 0)
                          for r in range(mb.shape[0])])
        return real_run(self, xb, mb, key)

    monkeypatch.setattr(InpaintingService, "_run_batch", spy)
    out = service.inpaint(audio, mask, fs, seed=14)
    np.testing.assert_array_equal(out[mask > 0.5], audio[mask > 0.5])
    assert np.all(np.isfinite(out))

    # 1 chain (>=2 passes) + 3 single jobs at max_batch=2: every batch except
    # possibly the last must have ALL rows doing real work
    assert len(rows_used) >= 2
    for used in rows_used[:-1]:
        assert all(used), f"idle batch row while work was pending: {rows_used}"


def test_ready_jobs_not_starved_by_many_chains(service, monkeypatch):
    """More active chains than max_batch must not starve short gaps: while
    single-window jobs are pending, each batch reserves a row for them
    (ADVICE r3: scheduler fairness). Ready rows are identifiable by their
    small unknown span; chain rows fill most of a window."""
    fs = 22050
    L = 2048
    T = 16 * L
    rng = np.random.default_rng(5)
    audio = (rng.standard_normal(T) * 0.05).astype(np.float32)
    mask = np.ones(T, np.float32)
    # three long gaps -> three chains (> max_batch=2), each needing >=2 passes
    for s0 in (2000, 12000, 22000):
        mask[s0:s0 + 3000] = 0
    # two short gaps -> ready jobs
    mask[28000:28100] = 0
    mask[30500:30600] = 0

    small_rows_at = []
    real_run = InpaintingService._run_batch

    def spy(self, xb, mb, key):
        small_rows_at.append([int(0 < (mb[r] < 0.5).sum() < 500)
                              for r in range(mb.shape[0])])
        return real_run(self, xb, mb, key)

    monkeypatch.setattr(InpaintingService, "_run_batch", spy)
    out = service.inpaint(audio, mask, fs, seed=7)
    np.testing.assert_array_equal(out[mask > 0.5], audio[mask > 0.5])
    assert np.all(np.isfinite(out))

    # both ready jobs must run in the first two batches (one reserved row
    # each); before the fix three chains monopolized both rows until a
    # chain drained
    n_small_first_two = sum(sum(r) for r in small_rows_at[:2])
    assert n_small_first_two >= 2, small_rows_at


def test_short_signal_padded(service):
    fs = 22050
    T = 1500  # shorter than the 2048 model window
    rng = np.random.default_rng(5)
    audio = (rng.standard_normal(T) * 0.05).astype(np.float32)
    mask = np.ones(T, np.float32)
    mask[600:700] = 0
    out = service.inpaint(audio, mask, fs, seed=6)
    assert out.shape == (T,)
    np.testing.assert_array_equal(out[mask > 0.5], audio[mask > 0.5])
    assert float(np.std(out[600:700])) > 1e-4


def test_sharded_service_matches_single_device(service):
    # dp-mesh serving (8 virtual CPU devices) must agree with the unsharded
    # path: same seed, same windows => same program modulo partitioning.
    import jax
    from aid_tpu.parallel import mesh as pmesh

    fs = 22050
    T = 3 * 2048
    rng = np.random.default_rng(7)
    audio = (rng.standard_normal(T) * 0.05).astype(np.float32)
    mask = np.ones(T, np.float32)
    mask[1000:1150] = 0
    mask[4100:4220] = 0
    ref = service.inpaint(audio, mask, fs, seed=8)

    sharded = InpaintingService(
        args=service.args, bundle=service.bundle, sampler=service.sampler,
        max_batch=2).shard(pmesh.make_mesh(8))
    assert sharded.max_batch == 8  # rounded up to the mesh size
    out = sharded.inpaint(audio, mask, fs, seed=8)
    np.testing.assert_array_equal(out[mask > 0.5], audio[mask > 0.5])
    # same sampler program + same key; only the partitioning differs
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_shard_places_batch_on_mesh(service):
    import jax
    from aid_tpu.parallel import mesh as pmesh
    mesh = pmesh.make_mesh(8)
    s = InpaintingService(args=service.args, bundle=service.bundle,
                          sampler=service.sampler, max_batch=8).shard(mesh)
    arr = s._place_batch(np.zeros((8, 128), np.float32))
    assert len(arr.sharding.device_set) == 8
    # every device holds exactly one row
    assert arr.addressable_shards[0].data.shape == (1, 128)


def test_init_distributed_gating(monkeypatch):
    from aid_tpu.parallel import mesh as pmesh
    calls = []
    import jax
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append(1))
    monkeypatch.delenv("AID_TPU_DISTRIBUTED", raising=False)
    assert pmesh.init_distributed(False) is False
    assert not calls
    monkeypatch.setenv("AID_TPU_DISTRIBUTED", "1")
    assert pmesh.init_distributed(False) is True
    assert len(calls) == 1
    monkeypatch.delenv("AID_TPU_DISTRIBUTED", raising=False)
    assert pmesh.init_distributed(True) is True
    assert len(calls) == 2


def test_serving_max_batch_from_network_config():
    """from_config(max_batch=None) picks the per-model measured optimum
    (network.serving_max_batch: 22k flagship -> 2, 44k -> 1)."""
    from aid_tpu.utils.config import compose
    a22 = compose(overrides=["network=cqtdiff_plus_22k",
                             "model_dir=/tmp/aid_smb"])
    a44 = compose(overrides=["network=cqtdiff_plus_44k",
                             "model_dir=/tmp/aid_smb"])
    assert int(a22.network.serving_max_batch) == 2
    assert int(a44.network.serving_max_batch) == 1


def test_sharded_service_with_int8_quant():
    """int8 serving composes with dp-mesh sharding: the quantized guided
    program (dynamic per-tensor scales inside the partitioned computation)
    runs over the 8-virtual-device mesh, pins observed samples, and stays
    close to the unsharded int8 restoration."""
    from aid_tpu.parallel import mesh as pmesh

    overrides = [
        "exp.audio_len=2048", "network.cqt.num_octs=3",
        "network.cqt.bins_per_oct=8", "network.Ns=[8,16,16]",
        "network.num_dils=[1,1,1]", "network.attention_layers=[0,0,0,0]",
        "network.quant=int8", "tester.T=3",
    ]
    svc = InpaintingService.from_config(overrides=overrides, max_batch=2)
    fs = 22050
    T = 2 * 2048
    rng = np.random.default_rng(9)
    audio = (rng.standard_normal(T) * 0.05).astype(np.float32)
    mask = np.ones(T, np.float32)
    mask[900:1050] = 0
    ref = svc.inpaint(audio, mask, fs, seed=3)

    sharded = InpaintingService(
        args=svc.args, bundle=svc.bundle, sampler=svc.sampler,
        max_batch=2).shard(pmesh.make_mesh(8))
    out = sharded.inpaint(audio, mask, fs, seed=3)
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out[mask > 0.5], audio[mask > 0.5])
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_autotune_max_batch(service):
    """HBM-fit autotune: AOT memory analysis at batch 1/2 extrapolates the
    per-row footprint; the chosen batch is monotone in the limit, never
    raises the configured optimum, and a hopeless limit raises."""
    before = service.max_batch
    # generous limit: the fit cap must be >= the configured 2 and must not
    # RAISE max_batch above the configured throughput optimum
    fit = service.autotune_max_batch(limit_bytes=1 << 34)  # 16 GiB
    assert fit >= 2
    assert service.max_batch == before
    # tiny limit: must refuse rather than return a batch that cannot run
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        service.autotune_max_batch(limit_bytes=1 << 20)  # 1 MiB
    # monotonicity in the limit
    assert service.autotune_max_batch(limit_bytes=1 << 35) >= fit
    assert service.max_batch == before
