import os
import tempfile

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
# Hermetic per-run compilation cache: the shared ~/.cache/jax_dpilqr cache
# can hold XLA:CPU executables produced by the axon REMOTE-compile helper
# on a host with different CPU features; loading those locally risks
# SIGILL (observed as mid-suite segfaults).  Tests compile fresh instead.
os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
    prefix="jax_dpilqr_test_cache_"
)

import jax  # noqa: E402
import pytest  # noqa: E402

import dpilqr_tpu  # noqa: F401, E402  (enables x64)

# The axon sitecustomize force-registers the TPU backend; tests run on the
# CPU backend (8 virtual devices for sharding tests) regardless.
jax.config.update("jax_default_device", jax.devices("cpu")[0])


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Every compiled XLA:CPU executable holds tens-to-hundreds of memory
    mappings; a full suite run accumulates ~60k of them and crosses the
    kernel's vm.max_map_count (65530 here), at which point a LATER compile
    segfaults inside backend_compile_and_load (observed deterministically
    around test #127, axon-independent).  Dropping compiled programs
    between modules keeps the count bounded -- measured 20266 -> 633 for
    tests/test_distributed.py -- at the cost of cross-module recompiles."""
    yield
    jax.clear_caches()


def pytest_configure(config):
    pass
