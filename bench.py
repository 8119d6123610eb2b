"""Benchmark: particle-steps/sec for a full TreePM KDK step on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The step is the flagship computation: short-range Barnes-Hut tree force
(Morton octree build + fused-multipole walk + direct leaf interactions)
+ PM long-range force (CIC + FFT + Green's function + 4 transforms)
+ kick + drift, at 64^3 particles on a 128^3 mesh (the dm-50-512
benchmark geometry scaled to one chip's compile budget).

Baseline: MEASURED.  The reference's short-range tree path
(force_tree_full + grav_short_tree, the dominant TreePM cost) runs
unmodified single-rank via baseline/ref_tree_bench.c: 10,869
particle-steps/sec/core at 32^3 unclustered (8,360 clustered; 5,342 at
64^3 clustered), tree-only, i.e. an upper bound on the full-step rate.
That reproduces the earlier job-sizing estimate of ~1e4/core, so the
node constant stays 1e4 * 56 cores = 5.6e5 — the measured unclustered
upper bound (see BASELINE.md "Measured baseline").  vs_baseline = our
one-chip rate / that per-node rate.
"""

import json
import time

import numpy as np

REFERENCE_NODE_RATE = 5.6e5  # particle-steps/sec on a 56-core CPU node


def bench_gas():
    """Gas-step particle rate: SPH density (fused in-jit hsml loop) +
    hydro force + TreePM gravity at 64^3 gas (the lya-config geometry
    on one chip).  Steady-state: hsml is converged, so the density
    while_loop exits after ~2 iterations — the production per-step
    cost, not the cold-start bisection."""
    import os
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


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial
    from mpgadget_tpu.gravity.treepm import TreeGravity, tree_force
    from mpgadget_tpu.pm.gravity import _pm_force_kernel
    from mpgadget_tpu.integrate import drift, kick
    from mpgadget_tpu.particles import ParticleData

    import os
    # default geometry: 128^3 = 2.1M particles on a 256^3 mesh — the
    # largest point whose whole KDK step fits one fused graph; the
    # round-3 on-chip sweep measured (v5e):
    #   64^3  1.43M psteps/s (2.56x baseline)
    #   128^3 1.14M psteps/s (2.04x)
    #   256^3 0.88M psteps/s (1.58x, split tree/PM dispatch)
    ngrid = int(os.environ.get("BENCH_NGRID", 128))
    nmesh = 2 * ngrid
    boxsize = 50000.0 * ngrid / 64
    n = ngrid ** 3

    rng = np.random.RandomState(3)
    grid = np.indices((ngrid, ngrid, ngrid)).reshape(3, -1).T
    pos = np.mod((grid + rng.uniform(0, 0.3, (n, 3))) / ngrid * boxsize,
                 boxsize)
    pdata = ParticleData.from_numpy(
        pos, np.zeros((n, 3)), np.ones(n), np.ones(n, np.int32),
        np.arange(n) + 1, boxsize)
    from mpgadget_tpu.gravity.tree import TreeConfig
    from mpgadget_tpu.gravity.treewalk import WalkConfig
    gmax = int(os.environ.get("BENCH_GROUP", 256))
    wchunk = int(os.environ.get("BENCH_WCHUNK", 2048))
    tg = TreeGravity(boxsize=boxsize, nmesh=nmesh, asmth=1.5, rcut=6,
                     G=43007.1, softening=2.8 * boxsize / ngrid / 30,
                     tree_use_bh=0, with_potential=False,
                     tree_cfg=TreeConfig(group_max=gmax),
                     walk_cfg=WalkConfig(walk_chunk=wchunk))
    kw = tg.force_kwargs(n)

    # ONE jitted graph for BENCH_BATCH whole KDK steps (tree + PM +
    # kick + drift) via lax.scan: per-dispatch tunnel latency is
    # ~30ms, so a production loop fuses steps; donated buffers update
    # in place.
    # scanning 4 steps into one graph amortizes the ~30ms dispatch;
    # at >1M particles the 4x graph trips XLA scoped-vmem limits, so
    # large runs fall back to one step per dispatch
    batch = int(os.environ.get("BENCH_BATCH",
                               4 if n <= 2 ** 18 else 1))

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
            ipos, vel, amag = carry
            ipos, vel, amag = one_step(ipos, vel, mass, valid, amag)
            return (ipos, vel, amag), None

        (ipos, vel, amag), _ = jax.lax.scan(
            body, (ipos, vel, amag), None, length=batch)
        return ipos, vel, amag

    state = (pdata.ipos, pdata.vel, pdata.mass, pdata.valid,
             jnp.zeros(n, jnp.float32))

    if n > 2 ** 21:
        # 256^3+: the monolithic graph OOMs on XLA's padded FFT temp
        # (see pm/gravity.pm_force_split); run tree and PM as separate
        # programs and fuse only the cheap update.
        from mpgadget_tpu.pm.gravity import pm_force_split

        @jax.jit
        def tree_part(ipos, mass, valid, amag):
            return tree_force(ipos, mass, valid, amag, **kw).accel

        @jax.jit
        def update(ipos, vel, acc_tree, acc_pm):
            acc = acc_tree + acc_pm
            amag = jnp.sqrt(jnp.sum(acc * acc, axis=-1))
            vel = kick(vel, acc, 1e-6)
            ipos = drift(ipos, vel, 1e-6, 1.0 / boxsize)
            return ipos, vel, amag

        def step_big(ipos, vel, mass, valid, amag):
            acc_tree = tree_part(ipos, mass, valid, amag)
            acc_pm, _, _ = pm_force_split(ipos, mass, nmesh, boxsize,
                                          43007.1, 1.5)
            return update(ipos, vel, acc_tree, acc_pm)

        step = step_big
        batch = 1

    def run1(state):
        ipos, vel, amag = step(*state)
        return (ipos, vel, state[2], state[3], amag)

    # warmup/compile; a scalar fetch forces real execution (the axon
    # tunnel's block_until_ready is a no-op)
    state = run1(state)
    float(jnp.sum(state[1][0]))

    nrep = 6
    t0 = time.perf_counter()
    for _ in range(nrep):
        state = run1(state)
        float(jnp.sum(state[1][0]))
    dt = (time.perf_counter() - t0) / nrep / batch

    rate = n / dt
    print(json.dumps({
        "metric": "TreePM KDK step particle rate "
                  f"({ngrid}^3 DM, {nmesh}^3 mesh, 1 chip)",
        "value": rate,
        "unit": "particle-steps/sec",
        "vs_baseline": rate / REFERENCE_NODE_RATE,
    }))


if __name__ == "__main__":
    import os
    if os.environ.get("BENCH_GAS", "") == "1":
        bench_gas()
    else:
        main()
