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
    flags = (flags + " --xla_force_host_platform_device_count=8")
# 8 virtual device threads timeshare this box's core(s): a slow (or
# serialized) eager collective can blow XLA:CPU's default 40 s
# cross-module rendezvous termination window and SIGABRT the whole
# process even though nothing is deadlocked.  Give the rendezvous the
# same order of patience as a compile.
if "collective_call_terminate" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds"
              "=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds"
              "=1200")
os.environ["XLA_FLAGS"] = flags.strip()

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


# ---------------------------------------------------------------------
# Test tiers (the reference CI's unit/example split,
# .github/workflows/main.yaml): ``pytest -m quick`` is the < 5 min
# tier — pure-unit modules plus one fast representative per SHARDED
# module, so every parallel/ subsystem still gets compiled and
# numerically checked without the multi-minute run_sharded drivers.
# ---------------------------------------------------------------------
import pytest  # noqa: E402

QUICK_MODULES = {
    "test_bigfile.py", "test_cosmology.py", "test_params.py",
    "test_morton_cic.py", "test_cooling.py", "test_fof.py",
    "test_pm_gravity.py", "test_tools.py", "test_lightcone.py",
    "test_neutrinos.py", "test_qso_lightup.py", "test_plane.py",
    # round-4 parallel modules: striped writer + distributed FOF
    # small-box representatives (parallel/snapshot.py, parallel/fof.py)
    "test_quick_parallel.py",
}
QUICK_TESTS = {
    # sharded-module representatives (parallel/: pfft, decomp,
    # treepm, sph, sort, winds, blackhole agreement)
    "test_pencil_fft_roundtrip_matches_rfftn",
    "test_exchange_to_slabs_routes_and_conserves",
    "test_ghost_strips_cover_rcut_neighbors",
    "test_sharded_pm_matches_single_chip",
    "test_sharded_sort_global_order",
    "test_sharded_sph_density_matches_single",
    "test_sharded_winds_match_single",
    # parallel/blackhole.py representative (the promised BH agreement
    # test; accretion/dynfric/swallow/feedback vs single device)
    "test_sharded_bh_matches_single",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "quick: < 5 min tier covering every module")


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        if fname in QUICK_MODULES or item.name.split("[")[0] \
                in QUICK_TESTS:
            item.add_marker(pytest.mark.quick)
