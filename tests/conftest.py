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

import dpilqr_tpu  # noqa: F401, E402  (enables x64)

# The axon sitecustomize force-registers the TPU backend; tests run on the
# CPU backend (8 virtual devices for sharding tests) regardless.
jax.config.update("jax_default_device", jax.devices("cpu")[0])


def pytest_configure(config):
    pass
