"""Test env: force an 8-device CPU JAX platform before jax is imported.

The reference's distributed tests require >= 2 physical GPUs under torchrun
(SURVEY.md §4); here all multi-device logic is testable on a virtual CPU
mesh, per the driver contract.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon environment pre-imports jax via PYTHONPATH sitecustomize, so the
# env vars above may be captured already — override through the config API
# (must happen before any backend is resolved).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
try:  # persistent compile cache — the box has 2 cores, cold compiles hurt
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.device_count() == 8 and jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual 8-device CPU mesh; got " + str(jax.devices())
)


@pytest.fixture
def tiny_csc():
    """The reference test fixture graph (``tests/test_sampler_uniform.py:14-15``):
    11 nodes, indptr=[0,4,5,5,5,5,10,10,10,10,10,10], indices=1..10."""
    indptr = np.array([0, 4, 5, 5, 5, 5, 10, 10, 10, 10, 10, 10], dtype=np.int64)
    indices = np.arange(1, 11, dtype=np.int32)
    return indptr, indices


def rng(seed=0):
    return np.random.default_rng(seed)
