"""Benchmark: particle-steps/sec for a full TreePM KDK step on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"geometries"} — the headline value is the LARGEST fully-measured
geometry (the dm-50-512 ladder point 256^3 by default); "geometries"
carries every measured point plus the 512^3 probe outcome.

The step is the flagship computation: short-range Barnes-Hut tree force
(Morton octree build + fused-multipole walk + direct leaf interactions)
+ PM long-range force (CIC + FFT + Green's function + 4 transforms)
+ kick + drift, at the dm-50-512 geometry ladder (Nmesh = 2 N^(1/3),
the reference benchmark shape, /root/reference/benchmarks/dm-50-512/
paramfile.gadget:1-40 scaled to one chip).

Baseline: MEASURED.  The reference's short-range tree path
(force_tree_full + grav_short_tree, the dominant TreePM cost) runs
unmodified single-rank via baseline/ref_tree_bench.c: 10,869
particle-steps/sec/core at 32^3 unclustered (8,360 clustered; 5,342 at
64^3 clustered), tree-only, i.e. an upper bound on the full-step rate.
That reproduces the earlier job-sizing estimate of ~1e4/core, so the
node constant stays 1e4 * 56 cores = 5.6e5 — the measured unclustered
upper bound (see BASELINE.md "Measured baseline").  vs_baseline = our
one-chip rate / that per-node rate.

Environment knobs: BENCH_GEOMS=64,128,256 (particle grid sizes),
BENCH_512=1 to include the 512^3 single-chip probe (reports the OOM
boundary if it does not fit), BENCH_GROUP / BENCH_WCHUNK override the
tuned tree block size / walk chunk, BENCH_NGRID=N runs the legacy
single-geometry mode, BENCH_GAS=1 the gas step.
"""

import json
import os
import time

import numpy as np

REFERENCE_NODE_RATE = 5.6e5  # particle-steps/sec on a 56-core CPU node


def _tuned_group(ngrid):
    """Tree target-block size per geometry (round-5 on-chip sweep:
    256^3 walks 26% faster at G=512; smaller boxes prefer 256)."""
    if "BENCH_GROUP" in os.environ:
        return int(os.environ["BENCH_GROUP"])
    return 512 if ngrid >= 256 else 256


def bench_gas():
    """Gas-step particle rate: SPH density (fused in-jit hsml loop) +
    hydro force + TreePM gravity at 64^3 gas (the lya-config geometry
    on one chip).  Steady-state: hsml is converged, so the density
    while_loop exits after ~2 iterations — the production per-step
    cost, not the cold-start bisection."""
    import jax
    import jax.numpy as jnp
    from mpgadget_tpu.sph.density import sph_density, DensityParams
    from mpgadget_tpu.sph.hydra import hydro_force, HydroParams
    from mpgadget_tpu.gravity.treepm import TreeGravity, tree_force
    from mpgadget_tpu.pm.gravity import _pm_force_kernel

    ngrid = int(os.environ.get("BENCH_NGRID", 64))
    nmesh = 2 * ngrid
    boxsize = 50000.0 * ngrid / 64
    n = ngrid ** 3
    rng = np.random.RandomState(5)
    grid = np.indices((ngrid, ngrid, ngrid)).reshape(3, -1).T
    pos = np.mod((grid + rng.uniform(0, 0.3, (n, 3))) / ngrid
                 * boxsize, boxsize)
    ipos = jnp.asarray((pos / boxsize * 2.0 ** 32).astype(np.uint32))
    mass = jnp.ones(n, jnp.float32)
    valid = jnp.ones(n, bool)
    vel = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 10.0)
    ones = jnp.ones(n, jnp.float32)
    mean_sep = boxsize / ngrid
    hsml = jnp.full(n, 2.0 * mean_sep, jnp.float32)
    dpar = DensityParams(kernel_type=2)       # quintic, as lya config
    hpar = HydroParams(kernel_type=2)
    tg = TreeGravity(boxsize=boxsize, nmesh=nmesh, asmth=1.5, rcut=6,
                     G=43007.1, softening=2.8 * boxsize / ngrid / 30,
                     tree_use_bh=0, with_potential=False)
    kw = tg.force_kwargs(n)

    def gas_step(hsml):
        out = sph_density(ipos, mass, valid, hsml, vel, vel, ones,
                          dpar, boxsize)
        res = hydro_force(ipos, mass, valid, out["hsml"], vel, ones,
                          out["density"], out["egy_wt_density"],
                          out["div_vel"], out["curl_vel"],
                          out["dhsml_egy_factor"], hpar, boxsize,
                          1.0, 0.1, 0.01)
        tr = tree_force(ipos, mass, valid, jnp.zeros(n, jnp.float32),
                        **kw)
        acc_pm, _, _ = _pm_force_kernel(ipos, mass, nmesh, boxsize,
                                        43007.1, 1.5,
                                        compute_potential=False)
        return out["hsml"], res["hydro_accel"], tr.accel + acc_pm

    # cold: converge hsml + compile everything
    hsml, ha, ga = gas_step(hsml)
    float(jnp.sum(ha[0]))
    nrep = 4
    t0 = time.perf_counter()
    for _ in range(nrep):
        h2, ha, ga = gas_step(hsml)
        float(jnp.sum(ha[0]))
    dt = (time.perf_counter() - t0) / nrep
    rate = n / dt
    print(json.dumps({
        "metric": f"gas step particle rate ({ngrid}^3 gas, "
                  "density+hydro+TreePM, 1 chip)",
        "value": rate,
        "unit": "particle-steps/sec",
        "vs_baseline": rate / REFERENCE_NODE_RATE,
    }))


def bench_geometry(ngrid, nrep=None):
    """One full KDK step at ngrid^3 DM on a 2*ngrid mesh; returns a
    dict with the measured rate (or the failure boundary)."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from mpgadget_tpu.gravity.treepm import TreeGravity, tree_force
    from mpgadget_tpu.pm.gravity import _pm_force_kernel, \
        pm_force_split
    from mpgadget_tpu.integrate import drift, kick
    from mpgadget_tpu.gravity.tree import TreeConfig
    from mpgadget_tpu.gravity.treewalk import WalkConfig

    nmesh = 2 * ngrid
    boxsize = 50000.0 * ngrid / 64
    n = ngrid ** 3
    rng = np.random.RandomState(3)
    # build positions in z-chunks to bound host memory at 512^3
    chunks = []
    for z in range(0, ngrid, 64):
        zz = np.arange(z, min(z + 64, ngrid))
        g = np.stack(np.meshgrid(np.arange(ngrid), np.arange(ngrid),
                                 zz, indexing="ij"),
                     axis=-1).reshape(-1, 3).astype(np.float64)
        g += rng.uniform(0, 0.3, g.shape)
        chunks.append((g / ngrid * 2.0 ** 32).astype(np.uint32))
    # meshgrid(ij) over (x, y, zchunk) yields x-major rows; the
    # concatenation is NOT globally x-major but stays raster-local,
    # which is what the CIC and Morton sort care about.  Transfer
    # chunk-by-chunk: a single >1 GB host->device transfer has been
    # observed to crash the axon tunnel worker.
    ipos = jnp.concatenate([jnp.asarray(c) for c in chunks])
    del chunks
    vel = jnp.zeros((n, 3), jnp.float32)
    mass = jnp.ones(n, jnp.float32)
    valid = jnp.ones(n, bool)
    amag = jnp.zeros(n, jnp.float32)

    gmax = _tuned_group(ngrid)
    wchunk = int(os.environ.get("BENCH_WCHUNK", 2048))
    tg = TreeGravity(boxsize=boxsize, nmesh=nmesh, asmth=1.5, rcut=6,
                     G=43007.1, softening=2.8 * boxsize / ngrid / 30,
                     tree_use_bh=0, with_potential=False,
                     tree_cfg=TreeConfig(group_max=gmax),
                     walk_cfg=WalkConfig(walk_chunk=wchunk))
    kw = tg.force_kwargs(n)

    # per-dispatch tunnel latency is ~30ms, so small runs fuse
    # BENCH_BATCH whole KDK steps into one graph via lax.scan; at
    # >1M particles the fused graph trips XLA scoped-vmem limits and
    # large meshes OOM on the padded FFT temp, so 256^3+ splits tree
    # and PM into separate programs (pm_force_split).
    batch = int(os.environ.get("BENCH_BATCH",
                               4 if n <= 2 ** 18 else 1))

    if n > 2 ** 21:
        @jax.jit
        def tree_part(ipos, mass, valid, amag):
            return tree_force(ipos, mass, valid, amag, **kw).accel

        @jax.jit
        def update(ipos, vel, acc_tree, acc_pm):
            acc = acc_tree + acc_pm
            amag = jnp.sqrt(jnp.sum(acc * acc, axis=-1))
            vel2 = kick(vel, acc, 1e-6)
            ipos2 = drift(ipos, vel2, 1e-6, 1.0 / boxsize)
            return ipos2, vel2, amag

        def step(ipos, vel, mass, valid, amag):
            acc_tree = tree_part(ipos, mass, valid, amag)
            acc_pm, _, _ = pm_force_split(ipos, mass, nmesh, boxsize,
                                          43007.1, 1.5)
            return update(ipos, vel, acc_tree, acc_pm)

        batch = 1
    else:
        def one_step(ipos, vel, mass, valid, amag):
            res = tree_force(ipos, mass, valid, amag, **kw)
            acc_pm, _, _ = _pm_force_kernel(
                ipos, mass, nmesh, boxsize, 43007.1, 1.5,
                compute_potential=False)
            acc = res.accel + acc_pm
            amag = jnp.sqrt(jnp.sum(acc * acc, axis=-1))
            vel = kick(vel, acc, 1e-6)
            ipos = drift(ipos, vel, 1e-6, 1.0 / boxsize)
            return ipos, vel, amag

        @partial(jax.jit, donate_argnums=(0, 1))
        def step(ipos, vel, mass, valid, amag):
            if batch == 1:
                return one_step(ipos, vel, mass, valid, amag)

            def body(carry, _):
                ip, v, am = carry
                return one_step(ip, v, mass, valid, am)[:3], None

            (ipos, vel, amag), _ = jax.lax.scan(
                body, (ipos, vel, amag), None, length=batch)
            return ipos, vel, amag

    state = (ipos, vel, mass, valid, amag)

    def run1(state):
        ipos, vel, amag = step(*state)
        return (ipos, vel, state[2], state[3], amag)

    # warmup/compile; a scalar fetch forces real execution (the axon
    # tunnel's block_until_ready is a no-op)
    t0 = time.perf_counter()
    state = run1(state)
    float(jnp.sum(state[1][0]))
    compile_s = time.perf_counter() - t0

    if nrep is None:
        nrep = 6 if n <= 2 ** 21 else 3
    t0 = time.perf_counter()
    for _ in range(nrep):
        state = run1(state)
        float(jnp.sum(state[1][0]))
    dt = (time.perf_counter() - t0) / nrep / batch
    return {"ngrid": ngrid, "nmesh": nmesh, "rate": n / dt,
            "step_s": dt, "group": gmax, "compile_s": compile_s,
            "vs_baseline": (n / dt) / REFERENCE_NODE_RATE}


def main():
    if os.environ.get("BENCH_NGRID"):
        # legacy single-geometry mode
        r = bench_geometry(int(os.environ["BENCH_NGRID"]))
        print(json.dumps({
            "metric": "TreePM KDK step particle rate "
                      f"({r['ngrid']}^3 DM, {r['nmesh']}^3 mesh, "
                      "1 chip)",
            "value": r["rate"],
            "unit": "particle-steps/sec",
            "vs_baseline": r["vs_baseline"],
        }))
        return

    geoms = [int(g) for g in os.environ.get(
        "BENCH_GEOMS", "64,128,256").split(",")]
    results = {}
    for ng in geoms:
        try:
            results[str(ng)] = bench_geometry(ng)
        except Exception as e:  # noqa: BLE001 — record, keep going
            results[str(ng)] = {"ngrid": ng, "error": str(e)[:300]}
    if os.environ.get("BENCH_512", "0") == "1":
        # dm-50-512 target geometry probe: 134M particles do not fit
        # one 16 GB v5e chip (the tree walk alone needs ~21 GB of
        # node table + sort payload); record the boundary.
        try:
            results["512"] = bench_geometry(512, nrep=2)
        except Exception as e:  # noqa: BLE001
            results["512"] = {"ngrid": 512, "error": str(e)[:300]}

    # headline: the largest geometry with a measured rate
    best = None
    for ng in sorted((int(k) for k in results), reverse=True):
        if "rate" in results[str(ng)]:
            best = results[str(ng)]
            break
    if best is None:
        print(json.dumps({"metric": "TreePM KDK step particle rate",
                          "value": 0.0, "unit": "particle-steps/sec",
                          "vs_baseline": 0.0,
                          "geometries": results}))
        return
    print(json.dumps({
        "metric": "TreePM KDK step particle rate "
                  f"({best['ngrid']}^3 DM, {best['nmesh']}^3 mesh, "
                  "1 chip)",
        "value": best["rate"],
        "unit": "particle-steps/sec",
        "vs_baseline": best["vs_baseline"],
        "geometries": {k: {kk: vv for kk, vv in v.items()
                           if kk != "compile_s"}
                       for k, v in results.items()},
    }))


if __name__ == "__main__":
    if os.environ.get("BENCH_GAS", "") == "1":
        bench_gas()
    else:
        main()
