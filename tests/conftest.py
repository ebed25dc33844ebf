"""Test conftest: force an 8-virtual-device CPU backend BEFORE jax init.

SURVEY.md §4.2 "Distributed without a cluster": tests run on the CPU backend
with xla_force_host_platform_device_count=8 so mesh/sharding/collective
paths are exercised without TPU hardware. Must run before jax initializes.
"""

import os
import sys

# The dev environment pins JAX_PLATFORMS=axon (real TPU tunnel); tests must
# run on the 8-virtual-device CPU backend, so force-override (not setdefault).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# The CI box has ONE cpu core; XLA:CPU compile time dominates the suite
# (~33% of wall). Opt level 0 trades negligible runtime on test-sized
# shapes for much faster compiles; numerics are unaffected (precision is
# pinned separately below). Export XLA_FLAGS yourself to override.
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize pins the platform at import; env alone is not
# enough — override via config before first backend init.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_debug_nans", False)  # individual tests opt in

# Persistent XLA:CPU compilation cache: compile time dominates the suite on
# this 1-core box (top tests are 20-70s of compile, <1s of compute), and
# XLA:CPU AOT results cache fine across runs. First run pays full compile;
# repeat runs (the "must stay green" gate) land well under the 10-minute
# budget. Delete .jax_cache_tests/ or set JAX_TEST_NO_CACHE=1 to disable.
if not os.environ.get("JAX_TEST_NO_CACHE"):
    _cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "..", ".jax_cache_tests")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# Default matmul precision is bf16-like even on CPU in jax 0.9; pin to
# highest so kernel-vs-XLA-twin comparisons are meaningful (production code
# keeps the fast default on TPU).
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.key(0)


@pytest.fixture
def mesh8():
    from multimodal_sc_tpu.runtime.mesh import make_mesh

    return make_mesh(data=8, model=1)
