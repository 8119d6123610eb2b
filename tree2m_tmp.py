import time, numpy as np, jax, jax.numpy as jnp
from mpgadget_tpu.gravity.treepm import TreeGravity
from mpgadget_tpu.particles import ParticleData
rng=np.random.RandomState(5); n=128**3; box=50000.0
g=np.indices((128,128,128)).reshape(3,-1).T/128.0*box
pos=np.mod(g+rng.uniform(0,0.3*box/128,(n,3)),box)
pdata = ParticleData.from_numpy(pos, np.zeros((n,3)), np.ones(n), np.ones(n,np.int32), np.arange(n)+1, box)
tg = TreeGravity(boxsize=box, nmesh=256, asmth=1.5, rcut=6, G=1.0, softening=2.8*box/128/30, tree_use_bh=0, with_potential=False)
for k in range(3):
    t0=time.perf_counter(); acc=tg.compute(pdata); s=float(jnp.sum(acc[0]))
    print(f"tree compute (packed build, 32/128): {time.perf_counter()-t0:.1f}s", flush=True)
