"""Test configuration: force CPU backend with 8 virtual devices.

The standard JAX fake-backend for multi-device (pjit/shard_map) logic — the
TPU-rebuild analogue of the reference's CPU-only CI strategy
(``/root/reference/.github/workflows/ci.yml``; SURVEY.md §4).
Must run before jax initializes, hence module-level os.environ in conftest.
"""

import os

# Hard-set (not setdefault): the environment pins JAX_PLATFORMS to the TPU
# plugin and the plugin's sitecustomize imports jax at interpreter start, so
# the env var alone is locked in before conftest runs — update jax.config too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_config():
    from tiny_audio_tpu.config import tiny_test_config

    return tiny_test_config()
