"""Test-session configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multi-chip
path; benches run on the real chip).

NOTE: the ambient environment pre-imports jax (sitecustomize) with
JAX_PLATFORMS pinned to the tunneled TPU, so env vars are already captured by
the time pytest starts; the platform must be switched via jax.config, which
takes effect as long as no backend has been initialized yet.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, "virtual CPU mesh not active"
