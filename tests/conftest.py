"""Test environment: CPU backend with a virtual 8-device mesh.

Must run before any `import jax` in test modules (pytest imports conftest first).
Multi-device sharding tests run on the fake CPU mesh per SURVEY.md §4; numerical
parity tests compare fp32 JAX against the fp64 NumPy/SciPy oracle in oracle.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A sitecustomize may have force-registered a TPU-tunnel backend via
# jax.config.update("jax_platforms", ...), which overrides the env var; override
# it back before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
