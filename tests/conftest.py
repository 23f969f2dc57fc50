"""Test configuration.

Tests run on CPU with 8 virtual devices (so the multi-chip shard_map paths
get real coverage without a TPU slice, cf. SURVEY.md §4) and with x64
enabled so the float64 oracle/parity tests (Fortran fixtures need atol=1e-8)
are meaningful.  The library itself is dtype-parametric; TPU benchmarks use
float32.
"""

import os

# Force CPU: the dev environment presets JAX_PLATFORMS to the TPU tunnel
# (and its sitecustomize re-sets the env var at interpreter start), which
# must not be used for the f64 oracle/parity tests.  The config update after
# import wins over the env var.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
