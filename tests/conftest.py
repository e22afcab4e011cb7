"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before any test module imports jax (pytest imports conftest first).
Multi-chip sharding is validated on this virtual mesh; real-TPU runs happen
only in bench.py / the driver's dryrun.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin overrides jax_platforms at import time (plugin
# config stomp), silently moving "CPU" tests onto the tunneled TPU chip.
# Re-assert CPU after import — a post-import config.update wins.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def random_seq(rng, n, alphabet="ACGT"):
    return "".join(rng.choice(list(alphabet), size=n))


@pytest.fixture(scope="session")
def make_seq(rng):
    def _make(n, alphabet="ACGT"):
        return random_seq(rng, n, alphabet)
    return _make
