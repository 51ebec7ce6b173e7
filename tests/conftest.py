"""Test env: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without real TPUs the standard way
(SURVEY.md §4): fake 8 host devices.  The container's sitecustomize pre-loads
jax with a TPU platform pinned via env, so we must override through
jax.config (env vars are already latched) before any backend initializes.
Pallas kernels run in interpreter mode off-TPU (see jacobi_pallas._interpret).

Set TEST_ON_TPU=1 to run the suite against the real chip instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if not os.environ.get("TEST_ON_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
