"""Benchmark: particle-steps/sec for a full TreePM KDK step on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The step is the flagship computation: short-range Barnes-Hut tree force
(Morton octree build + fused-multipole walk + direct leaf interactions)
+ PM long-range force (CIC + FFT + Green's function + 4 transforms)
+ kick + drift, at 64^3 particles on a 128^3 mesh (the dm-50-512
benchmark geometry scaled to one chip's compile budget).

Baseline: the reference's dm-50-512 config (512^3 TreePM,
benchmarks/dm-50-512) is sized for ~30 min on 512 Haswell cores
(job.cori).  The reference cannot be built in this image (no MPI/GSL,
PFFT needs network), so the baseline constant is an estimate from that
job sizing: ~1e4 particle-steps/sec/core * 56 cores = 5.6e5
particle-steps/sec per modern CPU node.  vs_baseline = our one-chip
rate / that per-node rate.
"""

import json
import time

import numpy as np

REFERENCE_NODE_RATE = 5.6e5  # particle-steps/sec on a 56-core CPU node


def main():
    import jax
    import jax.numpy as jnp
    from mpgadget_tpu.gravity.treepm import TreeGravity
    from mpgadget_tpu.pm.gravity import _pm_force_kernel
    from mpgadget_tpu.integrate import drift, kick
    from mpgadget_tpu.particles import ParticleData

    ngrid = 64
    nmesh = 128
    boxsize = 50000.0
    n = ngrid ** 3

    rng = np.random.RandomState(3)
    grid = np.indices((ngrid, ngrid, ngrid)).reshape(3, -1).T
    pos = np.mod((grid + rng.uniform(0, 0.3, (n, 3))) / ngrid * boxsize,
                 boxsize)
    pdata = ParticleData.from_numpy(
        pos, np.zeros((n, 3)), np.ones(n), np.ones(n, np.int32),
        np.arange(n) + 1, boxsize)
    tg = TreeGravity(boxsize=boxsize, nmesh=nmesh, asmth=1.5, rcut=6,
                     G=43007.1, softening=2.8 * boxsize / ngrid / 30,
                     tree_use_bh=0, with_potential=False)

    def step(pdata):
        acc_tree = tg.compute(pdata)
        acc_pm, _, _ = _pm_force_kernel(
            pdata.ipos, pdata.mass, nmesh, boxsize, 43007.1, 1.5,
            compute_potential=False)
        vel = kick(pdata.vel, acc_tree + acc_pm, 1e-6)
        ipos = drift(pdata.ipos, vel, 1e-6, 1.0 / boxsize)
        return pdata.replace(ipos=ipos, vel=vel)

    # warmup/compile; a scalar fetch forces real execution (the axon
    # tunnel's block_until_ready is a no-op)
    pdata = step(pdata)
    float(jnp.sum(pdata.vel[0]))

    nrep = 4
    t0 = time.perf_counter()
    for _ in range(nrep):
        pdata = step(pdata)
        float(jnp.sum(pdata.vel[0]))
    dt = (time.perf_counter() - t0) / nrep

    rate = n / dt
    print(json.dumps({
        "metric": "TreePM KDK step particle rate "
                  "(64^3 DM, 128^3 mesh, 1 chip)",
        "value": rate,
        "unit": "particle-steps/sec",
        "vs_baseline": rate / REFERENCE_NODE_RATE,
    }))


if __name__ == "__main__":
    main()
