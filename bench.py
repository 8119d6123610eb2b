"""Benchmark: particle-steps/sec for the gravity step on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: MP-Gadget's dm-50-512 benchmark config (512^3 TreePM,
benchmarks/dm-50-512) is sized for ~30 min on 512 Haswell cores
(job.cori). The reference cannot be built in this image (no MPI/GSL and
PFFT needs network), so the baseline constant below is an estimate from
that job sizing: ~1e4 particle-steps/sec/core * 56 cores (one modern
node) = 5.6e5 particle-steps/sec/node. vs_baseline = our rate on ONE
TPU chip / that per-node rate.
"""

import json
import time

import numpy as np

REFERENCE_NODE_RATE = 5.6e5  # particle-steps/sec on a 56-core CPU node


def main():
    import jax
    import jax.numpy as jnp
    from mpgadget_tpu.pm.gravity import _pm_force_kernel
    from mpgadget_tpu.integrate import drift, kick

    ngrid = 128
    nmesh = 256
    boxsize = 50000.0
    n = ngrid ** 3

    @jax.jit
    def step(ipos, vel, mass):
        accel, _, _ = _pm_force_kernel(
            ipos, mass, nmesh, boxsize, 43007.1, 1.5,
            compute_potential=False)
        vel = kick(vel, accel, 1e-4)
        ipos = drift(ipos, vel, 1e-4, 1.0 / boxsize)
        # scalar output forces real execution when fetched (the axon
        # tunnel's block_until_ready is a no-op)
        return ipos, vel, jnp.sum(vel[0])

    rng = np.random.RandomState(3)
    # clustered-ish: lattice + random offsets
    grid = np.indices((ngrid, ngrid, ngrid)).reshape(3, -1).T
    ipos_f = (grid + rng.uniform(0, 0.3, (n, 3))) / ngrid
    ipos = jnp.asarray((ipos_f * 2.0 ** 32).astype(np.uint32))
    vel = jnp.zeros((n, 3), jnp.float32)
    mass = jnp.ones((n,), jnp.float32)

    # warmup/compile
    ipos, vel, s = step(ipos, vel, mass)
    float(s)

    nrep = 5
    t0 = time.perf_counter()
    for _ in range(nrep):
        ipos, vel, s = step(ipos, vel, mass)
        float(s)
    dt = (time.perf_counter() - t0) / nrep

    rate = n / dt
    print(json.dumps({
        "metric": "pm-step particle rate (128^3, 256^3 mesh, 1 chip)",
        "value": rate,
        "unit": "particle-steps/sec",
        "vs_baseline": rate / REFERENCE_NODE_RATE,
    }))


if __name__ == "__main__":
    main()
