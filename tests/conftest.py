"""Test harness config: run all tests on a virtual 8-device CPU mesh.

The reference has no automated test suite at all (SURVEY.md section 4); this
framework's tests are designed from scratch. Multi-chip paths are exercised the
JAX-native way: 8 fake host devices via XLA_FLAGS, no cluster required.

NOTE: under the axon harness the JAX_PLATFORMS *env var* is ignored (the axon
PJRT plugin claims the backend regardless); only the in-process
``jax.config.update("jax_platforms", ...)`` actually forces CPU. Without it the
whole suite silently runs over the TPU tunnel — slow, and conv numerics differ.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# This box has a single CPU core: XLA CPU compiles are expensive. Persist them
# so test reruns only pay for changed graphs.
jax.config.update("jax_compilation_cache_dir", "/tmp/aid_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()


# Tests measured >= ~8 s on the 1-core reference box (pytest --durations).
# They stay in the ``quick`` tier (full pre-merge signal) but are demoted out
# of ``core`` so ``pytest -m core`` is a true minutes-scale inner loop.
# Names are matched on the unparametrized test id.
MEDIUM = {
    "tests/test_bench.py::test_bench_runs_and_prints_json",
    "tests/test_checkpoint_convert.py::test_load_reference_pt_end_to_end",
    "tests/test_cli.py::test_train_cli_end_to_end",
    "tests/test_cp_full.py::test_dp_cp_serving_inpaint_matches_single_device",
    "tests/test_cp_full.py::test_full_score_cp_matches_unsharded",
    "tests/test_cqt.py::test_bwd_fwd_equals_hpf",
    "tests/test_cqt.py::test_custom_vjp_matches_autodiff",
    "tests/test_cqt.py::test_gradients_flow",
    "tests/test_fsdp.py::test_fsdp_checkpoint_roundtrip",
    "tests/test_fsdp.py::test_fsdp_trajectory_matches_replicated",
    "tests/test_graft_entry.py::test_dryrun_multichip_respawns_from_unsuitable_backend",
    "tests/test_model_parity.py::test_full_model_matches_torch_reference",
    "tests/test_trainer.py::test_heavy_logging_failure_disables_demos_not_training",
    "tests/test_pallas.py::test_fused_matches_unfused_grads",
    "tests/test_parallel.py::test_model_context_parallel_attention",
    "tests/test_parallel.py::test_ring_attention_matches_dense",
    "tests/test_parallel.py::test_sharded_step_matches_single_device",
    "tests/test_qconv.py::test_guided_sampler_runs_quantized",
    "tests/test_qconv.py::test_int8_composes_with_stack_modes",
    "tests/test_qconv.py::test_model_apply_with_prequant_params_matches_dynamic",
    "tests/test_qconv.py::test_model_fidelity_and_guidance_direction",
    "tests/test_qconv.py::test_sampler_prequantizes_once",
    "tests/test_reference_code_parity.py::test_autoregressive_outpainting_parity_vs_reference",
    "tests/test_reference_code_parity.py::test_bwe_trajectory_parity_vs_generic_reference_sampler",
    "tests/test_reference_code_parity.py::test_compsens_trajectory_parity_vs_generic_reference_sampler",
    "tests/test_reference_code_parity.py::test_declipping_trajectory_parity_vs_generic_reference_sampler",
    "tests/test_reference_code_parity.py::test_forward_parity_vs_reference_code",
    "tests/test_reference_code_parity.py::test_sampler_guided_trajectory_parity_vs_reference_code",
    "tests/test_reference_code_parity.py::test_sampler_trajectory_parity_vs_reference_code",
    "tests/test_reference_code_parity.py::test_spectrogram_inpainting_trajectory_parity",
    "tests/test_reference_code_parity.py::test_training_gradient_parity_vs_reference_code",
    "tests/test_serving.py::test_autotune_max_batch",
    "tests/test_serving.py::test_ready_jobs_not_starved_by_many_chains",
    "tests/test_serving.py::test_sharded_service_matches_single_device",
    "tests/test_serving.py::test_sharded_service_with_int8_quant",
    "tests/test_tester.py::test_dodajob_writes_wavs",
    "tests/test_tp.py::test_dp_tp_serving_inpaint_matches_single_device",
    "tests/test_tp.py::test_tp_forward_matches_replicated",
    "tests/test_trainer.py::test_gradient_accumulation",
    "tests/test_trainer.py::test_skip_step_guardrail",
    "tests/test_trainer.py::test_heavy_logging_writes_artifacts",
    "tests/test_trainer.py::test_train_step_runs_and_descends",
    "tests/test_trainer.py::test_training_continues_after_resume",
    "tests/test_unet.py::test_chain_fold_matches_default",
    "tests/test_unet.py::test_chain_stride_matches_default",
    "tests/test_unet.py::test_eight_octave_architecture",
}


def pytest_collection_modifyitems(items):
    # Three tiers (README "Tests"):
    #   core   = the <5-min inner loop on a 1-core box (default dev signal)
    #   quick  = core + medium: everything not ``slow`` (pre-merge signal)
    #   slow   = flagship-scale / e2e / multihost (opt-in)
    # ``quick`` and ``core`` are auto-applied so `-m core` / `-m quick` /
    # `-m "not slow"` all work without per-test opt-in.
    for item in items:
        if "slow" in item.keywords:
            continue
        item.add_marker(pytest.mark.quick)
        base = item.nodeid.split("[")[0]
        if base in MEDIUM:
            item.add_marker(pytest.mark.medium)
        else:
            item.add_marker(pytest.mark.core)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
