import time, numpy as np, jax, jax.numpy as jnp
from mpgadget_tpu.gravity.tree import build_tree
from mpgadget_tpu.gravity import treewalk as tw
from mpgadget_tpu.ops.morton import morton_key
from mpgadget_tpu.particles import ParticleData
rng=np.random.RandomState(5); n=128**3; box=1.0
g=np.indices((128,128,128)).reshape(3,-1).T/128.0
pos=np.mod(g+rng.uniform(0,0.3/128,(n,3)),1.0)
pdata = ParticleData.from_numpy(pos, np.zeros((n,3)), np.ones(n), np.ones(n,np.int32), np.arange(n)+1, box)
def t(name, f):
    r=f(); _=np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    t0=time.perf_counter(); r=f(); _=np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    print(f"{name}: {time.perf_counter()-t0:.2f}s", flush=True)
    return r
keys = t("morton", lambda: morton_key(pdata.ipos))
keys2 = jnp.where(pdata.valid, keys, ~jnp.uint64(0))
perm = t("argsort", lambda: jnp.argsort(keys2))
ks = keys2[perm]; ip=pdata.ipos[perm]; ms=pdata.mass[perm]; vs=pdata.valid[perm]
tree = t("build", lambda: build_tree(ks, ip, ms, vs, 16, 18, 2*n+64, group_max=64))
print("n_nodes:", int(tree.n_nodes), flush=True)
pos_box = ip.astype(jnp.float32)*jnp.float32(2.0**-32)
cfg = tw.WalkConfig(node_list_max=512, leaf_list_max=128)
gout = t("groups", lambda: tw.make_target_groups(tree, pos_box, jnp.full(n,jnp.inf,jnp.float32), 8*n//64+64, 64))
leaf_nodes, gc, gh, amin, ngr, ovf = gout
print("ngroups:", int(ngr), flush=True)
aold = jnp.zeros(gc.shape[0], jnp.float32)
o = t("traverse", lambda: tw.traverse(tree, leaf_nodes, gc, gh, aold, cfg, jnp.float32(6*1.5/256), jnp.float32(0.81), False))
print("nn mean/max:", float(o[1].mean()), int(o[1].max()), "nl:", float(o[3].mean()), int(o[3].max()), flush=True)
ev = lambda: tw.evaluate(tree, pos_box, ms, vs, leaf_nodes, o[0], o[1], o[2], o[3], cfg, 64, jnp.float32(256/3.0), jnp.float32(1.0/(2.8/128/30)), jnp.float32(6*1.5/256), with_potential=False)
t("evaluate", ev)
