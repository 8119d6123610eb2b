import os, time, json
import numpy as np
import jax, jax.numpy as jnp

ngrid = int(os.environ.get("NG", 256)); nmesh = 2*ngrid
boxsize = 50000.0 * ngrid / 64; n = ngrid**3
from mpgadget_tpu.gravity.treepm import TreeGravity, tree_force
from mpgadget_tpu.pm.gravity import pm_force_split
from mpgadget_tpu.gravity.tree import TreeConfig
from mpgadget_tpu.gravity.treewalk import WalkConfig
from mpgadget_tpu.integrate import drift, kick
rng = np.random.RandomState(3)
grid = np.indices((ngrid,)*3).reshape(3,-1).T
pos = np.mod((grid + rng.uniform(0,0.3,(n,3)))/ngrid*boxsize, boxsize)
ipos = jnp.asarray((pos/boxsize*2.0**32).astype(np.uint32))
mass = jnp.ones(n, jnp.float32); valid = jnp.ones(n, bool)
vel = jnp.zeros((n,3), jnp.float32); amag = jnp.zeros(n, jnp.float32)
gmax=int(os.environ.get("G",256)); wchunk=int(os.environ.get("W",2048))
tg = TreeGravity(boxsize=boxsize, nmesh=nmesh, asmth=1.5, rcut=6,
                 G=43007.1, softening=2.8*boxsize/ngrid/30,
                 tree_use_bh=0, with_potential=False,
                 tree_cfg=TreeConfig(group_max=gmax),
                 walk_cfg=WalkConfig(walk_chunk=wchunk))
kw = tg.force_kwargs(n)

@jax.jit
def tree_part(ipos, mass, valid, amag):
    return tree_force(ipos, mass, valid, amag, **kw).accel

@jax.jit
def update(ipos, vel, acc_tree, acc_pm):
    acc = acc_tree + acc_pm
    amag = jnp.sqrt(jnp.sum(acc*acc, axis=-1))
    vel = kick(vel, acc, 1e-6)
    ipos = drift(ipos, vel, 1e-6, 1.0/boxsize)
    return ipos, vel, amag

for it in range(5):
    t0=time.perf_counter()
    at = tree_part(ipos, mass, valid, amag); float(jnp.sum(at[0]))
    t1=time.perf_counter()
    ap,_,_ = pm_force_split(ipos, mass, nmesh, boxsize, 43007.1, 1.5); float(jnp.sum(ap[0]))
    t2=time.perf_counter()
    ipos, vel, amag = update(ipos, vel, at, ap); float(jnp.sum(vel[0]))
    t3=time.perf_counter()
    print(json.dumps({"it":it,"tree":t1-t0,"pm":t2-t1,"upd":t3-t2}), flush=True)
