"""On-chip A/B sweep of the treewalk tuning knobs.

Benches the short-range tree force alone (the dominant TreePM phase)
at BENCH_NGRID^3 particles across (group_size, walk_chunk) variants,
printing one line per config.  Use on the real TPU; see ROADMAP
"256^3 perf" for why these two knobs: walk_chunk bounds the node-table
working set per sequential chunk (cache residency of the node gathers)
and group_size trades gather count against multipole lane-work.

Usage: BENCH_NGRID=128 python tools/tpu_sweep.py "256:2048,256:512,512:2048"
"""

import os
import sys
import time
from dataclasses import replace

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from mpgadget_tpu.gravity.treepm import TreeGravity, tree_force
    from mpgadget_tpu.gravity.treewalk import WalkConfig
    from mpgadget_tpu.gravity.tree import TreeConfig

    ngrid = int(os.environ.get("BENCH_NGRID", 128))
    nmesh = 2 * ngrid
    boxsize = 50000.0 * ngrid / 64
    n = ngrid ** 3
    rng = np.random.RandomState(3)
    grid = np.indices((ngrid, ngrid, ngrid)).reshape(3, -1).T
    pos = np.mod((grid + rng.uniform(0, 0.3, (n, 3))) / ngrid * boxsize,
                 boxsize)
    ipos = jnp.asarray((pos / boxsize * 2.0 ** 32).astype(np.uint32))
    mass = jnp.ones(n, jnp.float32)
    valid = jnp.ones(n, bool)
    amag = jnp.zeros(n, jnp.float32)

    variants = sys.argv[1] if len(sys.argv) > 1 else \
        "256:2048,256:512,256:8192,512:2048,512:8192"
    for spec in variants.split(","):
        g, wc = (int(x) for x in spec.split(":"))
        tg = TreeGravity(boxsize=boxsize, nmesh=nmesh, asmth=1.5,
                         rcut=6, G=43007.1,
                         softening=2.8 * boxsize / ngrid / 30,
                         tree_use_bh=0, with_potential=False,
                         tree_cfg=TreeConfig(group_max=g),
                         walk_cfg=replace(WalkConfig(), walk_chunk=wc))
        kw = tg.force_kwargs(n)
        try:
            res = tree_force(ipos, mass, valid, amag, **kw)
            float(jnp.sum(res.accel[0]))
            nrep = 4
            t0 = time.perf_counter()
            for _ in range(nrep):
                res = tree_force(ipos, mass, valid, amag, **kw)
                float(jnp.sum(res.accel[0]))
            dt = (time.perf_counter() - t0) / nrep
            print(f"group={g} walk_chunk={wc}: {dt*1e3:.1f} ms "
                  f"({n/dt:.3e} psteps/s tree-only)", flush=True)
        except Exception as e:  # noqa: BLE001 - sweep survives OOMs
            print(f"group={g} walk_chunk={wc}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
