"""Test configuration: CPU-hosted JAX with a virtual 8-device mesh.

Parity tests run in float64 on CPU (the reference is a CPU double-precision
solver); multi-device sharding tests use the 8 virtual host devices. The
real-TPU path is exercised by bench.py / __graft_entry__.py instead.

NOTE: in this environment the axon TPU plugin pins the platform at
interpreter start; JAX_PLATFORMS env vars are ignored. The only working
override is jax.config.update('jax_platforms', ...), done below BEFORE any
jax computation. Virtual host devices still need the XLA flag.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/ida_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass
