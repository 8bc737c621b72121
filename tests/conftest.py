"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware via the
standard XLA host-platform trick (SURVEY.md §4).

Note: the environment registers a remote-TPU PJRT plugin ('axon') whose
backend init takes minutes and pins jax_platforms; tests force the CPU
backend and drop that factory before the first JAX operation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as _xb

_xb._backend_factories.pop("axon", None)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
