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
