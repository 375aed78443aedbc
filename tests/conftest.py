"""Test harness: force an 8-device virtual CPU mesh before JAX imports.

This is the TPU-world replacement for a gloo/fake process-group backend
(reference SURVEY §4): every multi-device test runs on one host with
XLA's --xla_force_host_platform_device_count trick.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may point at a TPU tunnel
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# the axon TPU plugin (sitecustomize) pins jax_platforms via jax.config,
# which overrides the env var — force CPU explicitly for the test suite.
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: jit-heavy tests recompile identical tiny
# programs every run; the cache turns repeat suite runs from minutes of
# XLA compiles into cache hits.
from spe_tpu.utils.jax_setup import setup  # noqa: E402

setup(platform="cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
