import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from mpgadget_tpu.gravity.tree import build_tree
from mpgadget_tpu.gravity import treewalk as tw
from mpgadget_tpu.ops.morton import morton_key
from mpgadget_tpu.particles import ParticleData
rng=np.random.RandomState(5); n=128**3; box=1.0
g=np.indices((128,128,128)).reshape(3,-1).T/128.0
pos=np.mod(g+rng.uniform(0,0.3/128,(n,3)),1.0)
pdata = ParticleData.from_numpy(pos, np.zeros((n,3)), np.ones(n), np.ones(n,np.int32), np.arange(n)+1, box)
keys = morton_key(pdata.ipos)
keys2 = jnp.where(pdata.valid, keys, ~jnp.uint64(0))
perm = jnp.argsort(keys2)
ks = keys2[perm]; ip=pdata.ipos[perm]; ms=pdata.mass[perm]; vs=pdata.valid[perm]
tree = build_tree(ks, ip, ms, vs, 16, 18, 2*n+64, group_max=64)
pos_box = ip.astype(jnp.float32)*jnp.float32(2.0**-32)
gout = tw.make_target_groups(tree, pos_box, jnp.full(n,jnp.inf,jnp.float32), 8*n//64+64, 64)
leaf_nodes, gc, gh, amin, ngr, ovf = gout

@partial(jax.jit, static_argnames=())
def count_walk(leaf_nodes, gc, gh, rcut, th2):
    packed = jnp.concatenate([tree.center, tree.length[:,None], tree.mass[:,None]], axis=1)
    meta = tree.skip | jnp.where(tree.is_leaf, jnp.int32(-2**31), jnp.int32(0))
    rcut2 = rcut*rcut
    def walk(self_node, center, half):
        active = self_node < tree.n_nodes
        def cond(st): return st[0] < tree.n_nodes
        def body(st):
            i, nn, nl, nv = st
            row = packed[i]; mt = meta[i]
            c = row[:3]; ln=row[3]
            dc = jnp.abs((c-center) - jnp.round(c-center))
            dmin = jnp.maximum(dc - half - 0.5*ln, 0.0)
            r2min = jnp.sum(dmin*dmin)
            discard = r2min > rcut2
            bh_open = ln*ln > th2*r2min
            inside = jnp.all(dc < half + 0.6*ln)
            must = bh_open | inside | (r2min<=0)
            leaf = mt < 0; skip = mt & jnp.int32(0x7FFFFFFF)
            use_node = (~discard)&(~must); rec=(~discard)&must&leaf
            descend = (~discard)&must&(~leaf)
            one=jnp.int32(1); zero=jnp.int32(0)
            nn = nn + jnp.where(use_node, one, zero)
            nl = nl + jnp.where(rec, one, zero)
            nv = nv + one
            i = jnp.where(descend, i+one, skip).astype(jnp.int32)
            return (i, nn, nl, nv)
        start = jnp.where(active, jnp.int32(0), tree.n_nodes.astype(jnp.int32))
        return jax.lax.while_loop(cond, body, (start, jnp.int32(0), jnp.int32(0), jnp.int32(0)))
    return jax.vmap(walk)(leaf_nodes, gc, gh)

def t(name, f):
    r=f(); _=np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    t0=time.perf_counter(); r=f(); _=np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    print(f"{name}: {time.perf_counter()-t0:.2f}s", flush=True)
    return r
out = t("count-only walk", lambda: count_walk(leaf_nodes, gc, gh, jnp.float32(6*1.5/256), jnp.float32(0.81)))
i, nn, nl, nv = out
print("visits mean/max:", float(nv.mean()), int(nv.max()), "nn:", float(nn.mean()), "nl:", float(nl.mean()), flush=True)
