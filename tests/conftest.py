"""Test fixtures: force an 8-device virtual CPU mesh before JAX initializes.

This is the TPU-native answer to 'test multi-node without a cluster'
(SURVEY.md §4): sharding/collective code paths run on 8 virtual CPU devices.

Note: the axon TPU plugin ignores the JAX_PLATFORMS env var, so we ALSO pin
the platform through jax.config — env alone leaves tests running on the
tunneled TPU chip.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg():
    from mjvideo_tpu.configs import tiny_test_config

    return tiny_test_config()


# ---------------------------------------------------------------------------
# Two-tier suite (VERDICT r3 next-6): the full 300-test suite takes >20 min
# on one core (dominated by torch-oracle parity, generation rollouts and
# multi-device compiles), which no CI/driver budget here can gate on.  The
# fast tier must stay ~2-3 min: `pytest -m "not slow"`.
#
# Slow tests are marked centrally from measured durations (>~4 s on one
# core, pytest --durations): adding a test to a SLOW_MODULE marks it slow
# unless listed in FAST_EXCEPTIONS; tests elsewhere are marked slow by name
# in SLOW_TESTS.  Keep new heavyweight tests in slow modules or add them to
# SLOW_TESTS.
SLOW_MODULES = {
    "test_train_eval",      # trainer steps, remat/resume bit-exactness
    "test_zero1",           # sharded-optimizer end-to-end runs
    "test_lora",            # finetune loops
    "test_quant",           # quantized judge decode
    "test_quant4",          # int4 scorer + pallas decode kernel
    "test_prefix_cache",    # full generation A/Bs
    "test_graft_entry",     # multichip dryruns (2 full compiles)
    "test_batched_generate",
    "test_generate",
    "test_qwen2vl",         # transformers oracle + generation
    "test_minicpmv",
    "test_cogvlm2",
    "test_full_parity",     # full torch-oracle reward model
    "test_kv_quant",
}
# Tests that live in a SLOW_MODULE (or are listed in SLOW_TESTS) but are
# themselves cheap (<~1 s) and guard pure wiring — the fast gate still runs
# them.  Currently empty; the mechanism exists so the recipe above works.
FAST_EXCEPTIONS = set()
SLOW_TESTS = {
    "test_phi3_decoder_matches_transformers",
    "test_reward_checkpoint_roundtrip_preserves_forward",
    "test_kv_valid_matches_unpadded_reference",
    "test_flash_gradients_match_xla",
    "test_pallas_backward_kernels_match_xla_vjp",
    "test_videoscore_judge_vision_actually_enters",
    "test_eval_cli_judge_end_to_end_hermetic",
    "test_train_cli_end_to_end_hermetic",
    "test_gradient_accumulation_matches_full_batch",
    "test_scorer_micro_batch_split_matches_single_dispatch",
    "test_micro_batch_split_non_uniform_tiles",
    "test_dp_sharded_forward_matches_single_device",
    "test_tp_sharded_forward_matches_single_device",
    "test_tp_sharded_cogvlm2_forward_matches_single_device",
    "test_tp_sharded_minicpmv_forward_matches_single_device",
    "test_tp_sharded_qknorm_vit_chat_matches_single_device",
    "test_tp_sharded_phi3_reward_matches_single_device",
    "test_tp_sharded_cached_generation_matches_single_device",
    "test_mesh_sharded_scorer_matches_unsharded",
    "test_sequence_parallel_attention_matches_single_device",
    "test_ring_attention_matches_single_device",
    "test_sequence_parallel_decoder_matches_single_device",
    "test_sp_reward_forward_matches_single_device",
    "test_sp_scorer_matches_plain_scorer",
    "test_vision_tower_matches_transformers",
    "test_connector_matches_transformers",
    "test_full_videoscore_forward_matches_transformers",
    "test_remat_policies_give_identical_gradients",
    "test_resume_is_bit_exact",
    "test_reproduce_script_hermetic_dry_run",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        name = item.name.split("[")[0]
        if name in FAST_EXCEPTIONS:
            continue
        if mod in SLOW_MODULES or name in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
