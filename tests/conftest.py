"""Test config: force CPU with a virtual 8-device mesh so sharding logic is
exercised without TPU hardware (SURVEY.md §4 strategy).

NOTE: env vars are not enough here — the machine's sitecustomize imports JAX
at interpreter startup with JAX_PLATFORMS=axon baked in, so we must override
through the config API before any backend is initialised.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
