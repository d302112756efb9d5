"""End-to-end TPU smoke: train a tiny CQTDiff+ on synthetic audio, then
inpaint a gap with the trained EMA weights and verify reconstruction quality.

Proves the full loop — data -> jitted train step -> EMA -> checkpoint ->
sampler with guidance + data consistency — actually LEARNS, without needing
any dataset or released checkpoint. Target: inpainted-gap SNR clearly above
the masked input's (which is -inf in the gap) and above what random weights
produce.

Run: python scripts/e2e_smoke.py  (~10 min incl. remote compiles)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # honor an explicit non-axon JAX_PLATFORMS (the PJRT-plugin sitecustomize
    # otherwise pins the TPU regardless of the env var)
    _plat = os.environ.get("JAX_PLATFORMS", "")
    if _plat and "axon" not in _plat:
        jax.config.update("jax_platforms", _plat)

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/aid_tpu_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from aid_tpu import setup as asetup
    from aid_tpu.utils.config import compose

    L = int(os.environ.get("SMOKE_L", "16384"))  # CI gate uses 8192 (faster)
    fs = 22050
    its = int(os.environ.get("SMOKE_ITS", "400"))
    args = compose(overrides=[
        "exp=test_cqtdiff_22k",
        f"exp.audio_len={L}",
        "exp.batch=8",
        f"exp.total_its={its}",
        "exp.lr=3e-4",
        "exp.lr_rampup_it=50",
        "exp.ema_rampup=50",
        "network.cqt.num_octs=5",
        "network.cqt.bins_per_oct=16",
        "network.Ns=[16,24,24,32,32]",
        "network.num_dils=[1,2,2,3,3]",
        "network.attention_layers=[0,0,0,1,1,1]",
        # bf16 on TPU; the CPU CI gate passes SMOKE_DTYPE=float32 (bf16 is
        # software-emulated on CPU — ~10x slower, same learning signal)
        f"network.compute_dtype={os.environ.get('SMOKE_DTYPE', 'bfloat16')}",
        "tester.T=25",
        "tester.order=2",
        "tester.posterior_sampling.xi=0.25",
        "logging.save_model=False",
        "logging.log_interval=100",
        "logging.print_model_summary=False",
        "diff_params.sigma_data=0.2",
        "tester.diff_params.sigma_data=0.2",
        "model_dir=/tmp/aid_tpu_smoke",
    ] + ([f"network.gelu={os.environ['SMOKE_GELU']}"]
         if os.environ.get("SMOKE_GELU") else []))

    # synthetic "music": random 3-note chords from a pentatonic set with a
    # shared envelope — highly structured, learnable by a tiny net
    notes = np.asarray([220.0, 261.6, 329.6, 392.0, 440.0])
    t = np.arange(L) / fs

    def make_batch(rng, n):
        x = np.zeros((n, L), np.float32)
        for i in range(n):
            f0 = rng.choice(notes, size=3, replace=False)
            ph = rng.uniform(0, 2 * np.pi, 3)
            # envelope floor keeps every region audible (an SNR-in-the-gap
            # check against near-silence is meaningless)
            env = 0.7 + 0.3 * np.sin(2 * np.pi * rng.uniform(0.3, 1.0) * t
                                     + rng.uniform(0, 6.28))
            x[i] = env * sum(0.12 * np.sin(2 * np.pi * f * t + p)
                             for f, p in zip(f0, ph))
        return x.astype(np.float32)

    class SynthSet:
        def __init__(self):
            self.rng = np.random.default_rng(0)

        def __iter__(self):
            return self

        def __next__(self):
            return make_batch(self.rng, 8), np.full((8,), fs, np.int64)

    bundle = asetup.setup_network(args)
    ediff = asetup.setup_diff_parameters(args)

    # untrained baseline for the same task (fair difficulty reference)
    rng = np.random.default_rng(99)
    clean = make_batch(rng, 1)
    gap = int(0.05 * fs)
    s = (L - gap) // 2
    mask = np.ones((1, L), np.float32)
    mask[:, s:s + gap] = 0.0
    y_masked = jnp.asarray(clean * mask)

    def gap_snr(rec):
        g = slice(s, s + gap)
        err = np.asarray(rec)[0, g] - clean[0, g]
        return float(10 * np.log10(np.sum(clean[0, g] ** 2)
                                   / (np.sum(err ** 2) + 1e-12)))

    bundle.init(jax.random.PRNGKey(0), 1, L)
    sampler0 = asetup.setup_sampler(args, network=bundle, diff_params=ediff)
    rec0 = np.asarray(sampler0.predict_inpainting(
        y_masked, jnp.asarray(mask), jax.random.PRNGKey(5)))
    snr_untrained = gap_snr(rec0)
    print(f"gap SNR untrained: {snr_untrained:.2f} dB", flush=True)

    trainer = asetup.setup_trainer(args, dset=SynthSet(), network=bundle,
                                   diff_params=ediff)
    t0 = time.time()
    trainer.init_state()
    print(f"init: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    final_it = trainer.training_loop()
    print(f"trained {final_it} its in {time.time()-t0:.1f}s", flush=True)

    # persist EMA for offline debugging/iteration
    import orbax.checkpoint as ocp
    ocp.PyTreeCheckpointer().save(
        "/tmp/aid_tpu_smoke/ema.ckpt",
        {"ema": jax.device_get(trainer.state.ema),
         "network": jax.device_get(trainer.state.params)}, force=True)

    # inpaint with EMA weights
    bundle.params = jax.device_get(trainer.state.ema)
    sampler = asetup.setup_sampler(args, network=bundle, diff_params=ediff)
    rec = np.asarray(sampler.predict_inpainting(y_masked, jnp.asarray(mask),
                                                jax.random.PRNGKey(5)))
    snr = gap_snr(rec)
    print(f"gap SNR after training: {snr:.2f} dB "
          f"(untrained {snr_untrained:.2f})", flush=True)
    out_dir = "/tmp/aid_tpu_smoke"
    os.makedirs(out_dir, exist_ok=True)
    from aid_tpu.utils import logging_utils as logu
    logu.write_audio_file(clean[0], fs, "clean", out_dir)
    logu.write_audio_file(np.asarray(y_masked)[0], fs, "masked", out_dir)
    logu.write_audio_file(rec[0], fs, "reconstructed", out_dir)
    # SMOKE_GELU_SWEEP=1: sample the SAME trained weights under each gelu
    # flavor (the "reference-trained checkpoint served with the tanh
    # approximation" scenario behind the network.gelu default)
    if os.environ.get("SMOKE_GELU_SWEEP"):
        trained_with = bundle.module.gelu
        for v in ("erf", "tanh", "sigmoid"):
            if v == trained_with:
                print(f"gap SNR gelu={v}: {snr:.2f} dB (trained with)", flush=True)
                continue
            bundle.module = bundle.module.clone(gelu=v)
            sv = asetup.setup_sampler(args, network=bundle, diff_params=ediff)
            rv = np.asarray(sv.predict_inpainting(
                y_masked, jnp.asarray(mask), jax.random.PRNGKey(5)))
            print(f"gap SNR gelu={v}: {gap_snr(rv):.2f} dB  "
                  f"(max|Δ| vs {trained_with} = {np.max(np.abs(rv - rec)):.2e})",
                  flush=True)
        bundle.module = bundle.module.clone(gelu=trained_with)

    # SMOKE_QUANT_SWEEP=1: serve the SAME trained weights through the int8
    # path (network.quant) — the quality side of the int8 serving decision
    # (gap SNR + waveform delta vs the bf16/f32 reconstruction)
    if os.environ.get("SMOKE_QUANT_SWEEP"):
        bundle.module = bundle.module.clone(quant="int8")
        sq = asetup.setup_sampler(args, network=bundle, diff_params=ediff)
        rq = np.asarray(sq.predict_inpainting(
            y_masked, jnp.asarray(mask), jax.random.PRNGKey(5)))
        print(f"gap SNR quant=int8: {gap_snr(rq):.2f} dB vs none {snr:.2f}  "
              f"(max|delta| = {np.max(np.abs(rq - rec)):.2e})", flush=True)
        bundle.module = bundle.module.clone(quant="none")

    # quality-metric gate (testing/metrics.py — the same LSD used for
    # paper-parity evaluation), scored on the GAP REGION, trained vs
    # untrained reconstruction. Whole-signal LSD vs the masked input is
    # only meaningful for fully-trained models (silence in the gap inflates
    # the masked baseline); the gap-scoped untrained-relative form stays
    # discriminative at CI iteration budgets.
    from aid_tpu.testing import metrics as qm
    g = slice(s, s + gap)
    lsd_gap_tr = qm.lsd(clean[0, g], rec[0, g], n_fft=256, hop=64)
    lsd_gap_un = qm.lsd(clean[0, g], rec0[0, g], n_fft=256, hop=64)
    lsd_rec = qm.lsd(clean[0], rec[0], n_fft=512, hop=128)
    lsd_masked = qm.lsd(clean[0], np.asarray(y_masked)[0], n_fft=512, hop=128)
    print(f"gap LSD trained {lsd_gap_tr:.3f} vs untrained {lsd_gap_un:.3f}; "
          f"full-signal LSD reconstructed {lsd_rec:.3f} vs masked "
          f"{lsd_masked:.3f}", flush=True)

    # pass = training moved the needle decisively vs the untrained baseline,
    # in-gap SNR AND in-gap spectral distance. Thresholds are PINNED
    # (env-overridable) so quality regressions from perf work fail CI
    # (tests/test_e2e_smoke.py):
    #   SMOKE_MIN_SNR_GAIN_DB  minimum (trained - untrained) gap-SNR lift
    #   SMOKE_MAX_LSD_RATIO    maximum lsd_gap(trained)/lsd_gap(untrained)
    # Calibration (CPU f32, SMOKE_L=8192, SMOKE_ITS=150, 2026-08-19):
    # snr gain 5.97 dB, gap-LSD ratio printed by the run — defaults keep
    # margin below/above those.
    min_gain = float(os.environ.get("SMOKE_MIN_SNR_GAIN_DB", "4.0"))
    max_ratio = float(os.environ.get("SMOKE_MAX_LSD_RATIO", "0.95"))
    gain = snr - snr_untrained
    ratio = lsd_gap_tr / max(lsd_gap_un, 1e-9)
    print(f"gates: snr gain {gain:.2f} dB (min {min_gain}), "
          f"gap-LSD ratio {ratio:.3f} (max {max_ratio})", flush=True)
    ok = gain >= min_gain and ratio <= max_ratio
    print("E2E SMOKE", "PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
