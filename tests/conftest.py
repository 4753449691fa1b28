"""Test harness config.

Tests run on CPU with 8 virtual devices (the standard fake backend for mesh
code) and float64 enabled so golden-value parity tests against the fp64
PyTorch reference are exact. The environment pins JAX_PLATFORMS=axon (the
TPU tunnel), so the platform must be forced via jax.config, before any
backend initialises.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
try:  # persistent compile cache — large speedup on repeated suite runs
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass
