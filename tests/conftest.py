"""Test configuration: force an 8-device virtual CPU platform so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4)."""

import os

# Must be set before jax is imported anywhere in the test process. The
# environment ships JAX_PLATFORMS=axon (the remote TPU tunnel) — tests must
# OVERRIDE it, not setdefault, or every compile silently round-trips through
# the remote compile service (~100x slower and flaky).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize hook calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter start, which overrides the env var — force it
# back to pure CPU here (env alone is NOT enough).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
