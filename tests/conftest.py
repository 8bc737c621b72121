"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware via the
standard XLA host-platform trick (SURVEY.md §4).

Note: the environment registers a remote-TPU PJRT plugin ('axon') whose
backend init takes minutes and pins jax_platforms; tests force the CPU
backend and drop that factory before the first JAX operation.

Hardware runs: `SPEINET_TEST_TPU=1 pytest -m tpu` keeps the TPU backend
and runs only the @pytest.mark.tpu lowered-kernel parity tests
(tests/test_tpu_hardware.py) — the guard against Mosaic lowering
regressions that interpret-mode CI cannot see.
"""

import os

_TPU_RUN = os.environ.get("SPEINET_TEST_TPU", "0") == "1"

if not _TPU_RUN:
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags
                                   + " --xla_force_host_platform_device_count=8")

import jax

if not _TPU_RUN:
    jax.config.update("jax_platforms", "cpu")
    import jax._src.xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: lowered-kernel parity tests that need TPU hardware "
                   "(run with SPEINET_TEST_TPU=1 pytest -m tpu)")


def pytest_collection_modifyitems(config, items):
    skip_tpu = pytest.mark.skip(reason="needs SPEINET_TEST_TPU=1 + TPU")
    for item in items:
        if "tpu" in item.keywords and not _TPU_RUN:
            item.add_marker(skip_tpu)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
