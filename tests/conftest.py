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

# persistent compilation cache: the suite re-traces the same IPM step
# modules on every run, and XLA:CPU compiles of the big step graphs
# dominate wall time (VERDICT round-2 item 9: suite crept to 15+ min).
# Keyed by HLO + config, so code changes that alter a module recompile
# it; IXM_TEST_NO_CACHE=1 opts out for a cold-timing run.
if os.environ.get("IXM_TEST_NO_CACHE", "0") == "0":
    try:
        _cache = os.path.expanduser("~/.ixm_test_jax_cache")
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
