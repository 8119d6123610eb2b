"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is exercised on virtual CPU devices
(xla_force_host_platform_device_count), per the TPU-development workflow;
the driver separately dry-runs the multi-chip path.
"""

import os

# Force CPU for tests even when the environment points at a TPU: unit
# tests exercise sharding on virtual CPU devices and must not pay the
# remote-TPU compile round-trip.  The axon sitecustomize imports jax at
# interpreter start, so env vars alone are too late — use config.update.
os.environ["JAX_PLATFORMS"] = "cpu"
# Tests and every subprocess they spawn are CPU-only: disable the axon
# sitecustomize TPU registration in children (it dials the tunnel at
# interpreter start, which can block every spawned python when the
# tunnel is wedged — and CPU children never need it).
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite compiles hundreds of
# programs; caching them across test processes/runs cuts wall time
# and the in-process compiler pressure (one long-lived CPU process
# has been observed to segfault in backend_compile late in the run).
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("MPG_JAX_CACHE",
                                     "/tmp/mpg_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass
