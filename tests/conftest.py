"""Test harness config: force CPU with a virtual 8-device mesh.

Tests must not require TPU hardware; multi-chip sharding logic is validated
on a virtual CPU mesh (`--xla_force_host_platform_device_count=8`), matching
how the driver dry-runs the multi-chip path.

NOTE: this image pins JAX_PLATFORMS=axon (the tunneled TPU) at interpreter
startup via sitecustomize, so a plain env-var default is not enough — we
overwrite the env var *and* the jax config before any backend is touched.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env vars so they take effect)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()} ({jax.device_count()} devices)"
