import time, numpy as np, jax, jax.numpy as jnp
from mpgadget_tpu.gravity.treepm import TreeGravity
from mpgadget_tpu.pm.gravity import _pm_force_kernel
from mpgadget_tpu.integrate import drift, kick
from mpgadget_tpu.particles import ParticleData
ng=64; n=ng**3; box=50000.0
rng=np.random.RandomState(5)
g=np.indices((ng,ng,ng)).reshape(3,-1).T/ng*box
pos=np.mod(g+rng.uniform(0,0.3*box/ng,(n,3)),box)
pdata = ParticleData.from_numpy(pos, np.zeros((n,3)), np.ones(n), np.ones(n,np.int32), np.arange(n)+1, box)
tg = TreeGravity(boxsize=box, nmesh=2*ng, asmth=1.5, rcut=6, G=1.0, softening=2.8*box/ng/30, tree_use_bh=0, with_potential=False)
for k in range(3):
    t0=time.perf_counter()
    acc_t = tg.compute(pdata)
    acc_pm,_,_ = _pm_force_kernel(pdata.ipos, pdata.mass, 2*ng, box, 1.0, 1.5, compute_potential=False)
    vel = kick(pdata.vel, acc_t+acc_pm, 1e-4)
    ipos = drift(pdata.ipos, vel, 1e-4, 1.0/box)
    s=float(jnp.sum(vel[0]))
    dt=time.perf_counter()-t0
    print(f"treepm step 64^3: {dt:.2f}s -> {n/dt:.3e} psteps/s", flush=True)
