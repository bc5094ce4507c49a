"""Test harness: force CPU backend with 8 virtual devices + fp64.

Per SURVEY.md §4.4: multi-host code paths are exercised on a CPU-simulated
mesh (xla_force_host_platform_device_count=8) — the same shard_map code
path as real ICI. fp64 is enabled so golden numerical tests can use tight
tolerances; TPU-facing tests create fp32 arrays explicitly.

Note: this machine's sitecustomize imports jax and registers the TPU
("axon") PJRT plugin before conftest runs, so JAX_PLATFORMS in the
environment is not enough — we must flip the already-imported config.
XLA_FLAGS still takes effect because the CPU backend initializes lazily.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
