"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU benchmarking happens in bench.py / __graft_entry__.py; unit tests
validate numerics + sharding semantics on host CPU devices.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's sitecustomize force-registers the axon TPU plugin and overrides
# jax_platforms in-config; the env var alone does not win. Pin CPU explicitly.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the interpret-mode Pallas oracles compile for
# minutes on XLA-CPU (test_dynjac_kernel.py, test_fast_linearize.py); cache
# them across suite runs. Safe to delete .jax_cache/ any time.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def go2():
    from iterative_learning_nmpc_tpu.robots.go2 import go2_spec

    return go2_spec()


@pytest.fixture(scope="session")
def solo12():
    from iterative_learning_nmpc_tpu.robots.solo12 import solo12_spec

    return solo12_spec()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
