"""Test harness: force an 8-device CPU platform before JAX initializes.

This is the JAX analog of the reference's oversubscribed single-host
``mpiexec -np 8`` testing (report §6): the same shard_map code paths run on 8
virtual CPU devices here and on real TPU slices unmodified. Must run before
any ``import jax`` in the test process.
"""

import os

# Note: this image's sitecustomize imports jax at interpreter startup (TPU
# tunnel registration), so env vars alone are too late — jax.config.update is
# the reliable override. XLA_FLAGS is still read lazily at CPU-client init.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# NOTE: do NOT enable the persistent compilation cache here — this suite
# runs Pallas kernels in INTERPRETER mode (python-callback custom calls),
# and serializing such an executable into the cache was measured
# SEGFAULTING the process (jax compilation_cache.put_executable_and_time).
# Suite wall-time is compile-dominated and sensitive to concurrent load on
# the machine (identical 7-file subsets measured 81 s solo vs 1081 s under
# competing processes); run it solo.

import numpy as np
import pytest


# The reference's shipped golden systems (hand-checkable math facts,
# SURVEY.md §4.1) — single source of truth in tpucg.io.golden, shared with
# `python -m tpucg selftest`.
from tpucg.io.golden import GOLDEN_2X2, GOLDEN_4X4  # noqa: E402


@pytest.fixture
def golden_2x2():
    return GOLDEN_2X2


@pytest.fixture
def golden_4x4():
    return GOLDEN_4X4
