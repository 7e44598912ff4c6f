import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

import dpilqr_tpu  # noqa: F401, E402  (enables x64)

# The axon sitecustomize force-registers the TPU backend; tests run on the
# CPU backend (8 virtual devices for sharding tests) regardless.
jax.config.update("jax_default_device", jax.devices("cpu")[0])


def pytest_configure(config):
    pass
