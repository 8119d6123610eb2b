"""Generic neighbor-pair reduction engine over the Morton octree.

The TPU-native analog of the reference's treewalk ngbiter machinery
(treewalk.c:930-1270): every neighbor-loop module (SPH density, hydro
force, FOF, black holes, winds, metal return) supplies a *pair function*
evaluated on dense (target-group x source) blocks; the engine handles
neighbor finding (tree traversal with per-node hmax for symmetric
searches), gathering, masking and reduction.

Usage:
    nbr = NeighborLists(tree, pos_box, radii per group, ...)   # traverse
    out = pair_reduce(pair_fn, nbr, tree, pos_box, target_feats,
                      source_feats, reducers)

pair_fn(dx, r, tmask, smask, tfeat, sfeat) -> dict of arrays shaped
(B, G, S) to be reduced over S with the per-key reducer ('sum'/'max').
dx is source - target (box units, min-image).
"""

from dataclasses import dataclass
from functools import partial
from typing import Callable, Dict

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


def _wrap(d):
    return d - jnp.round(d)


@partial(jax.jit, static_argnames=("leaf_cap",))
def compact_leaves(tree, leaf_cap):
    """DFS-ordered compacted leaf list (i32[leaf_cap], count, overflow)."""
    C = tree.capacity
    iota = jnp.arange(C, dtype=jnp.int32)
    is_leaf = tree.is_leaf & (iota < tree.n_nodes)
    order = jnp.argsort(~is_leaf, stable=True).astype(jnp.int32)
    n_leaves = jnp.sum(is_leaf.astype(jnp.int32))
    leaves = jnp.where(jnp.arange(leaf_cap) < n_leaves,
                       order[:leaf_cap], C - 1).astype(jnp.int32)
    return leaves, n_leaves, n_leaves > leaf_cap


@partial(jax.jit, static_argnames=("leaf_max",))
def node_hmax(tree, leaf_ids, n_leaves, hsml_sorted, leaf_max):
    """Max Hsml over every node's particles (force_update_hmax analog).

    Per-leaf max by direct gather, then per-node via a sparse
    (doubling) table over the DFS-ordered leaf array.
    Returns f32[C] hmax per node (0 where no gas).
    """
    n = hsml_sorted.shape[0]
    L = leaf_ids.shape[0]
    off = jnp.arange(leaf_max, dtype=jnp.int32)
    ps = tree.pstart[leaf_ids]
    pc = tree.pcount[leaf_ids]
    idx = jnp.clip(ps[:, None] + off[None, :], 0, n - 1)
    mask = (off[None, :] < pc[:, None]) \
        & (jnp.arange(L)[:, None] < n_leaves)
    lh = jnp.max(jnp.where(mask, hsml_sorted[idx], 0.0), axis=1)

    # sparse (doubling) table: tab[k][i] = max lh[i : i+2^k]
    levels = max(1, int(np.ceil(np.log2(max(L, 2)))))
    tabs = [lh]
    cur = lh
    for k in range(levels):
        shifted = jnp.concatenate(
            [cur[1 << k:], jnp.zeros(min(1 << k, L), jnp.float32)])
        cur = jnp.maximum(cur, shifted)
        tabs.append(cur)
    tab = jnp.stack(tabs)  # (levels+1, L)

    def range_max(lo, hi):
        """max lh[lo:hi] (hi > lo), vectorized: two overlapping
        2^floor(log2(span)) blocks."""
        span = jnp.maximum(hi - lo, 1)
        k = jnp.clip(jnp.floor(jnp.log2(span.astype(jnp.float32))
                               ).astype(jnp.int32), 0, levels)
        a = tab[k, jnp.clip(lo, 0, L - 1)]
        b = tab[k, jnp.clip(hi - (1 << k), 0, L - 1)]
        return jnp.maximum(a, b)

    # node -> leaf interval via searchsorted over leaf DFS indices
    leaf_dfs = jnp.where(jnp.arange(L) < n_leaves, leaf_ids,
                         jnp.int32(2 ** 30))
    C = tree.capacity
    node_iota = jnp.arange(C, dtype=jnp.int32)
    lo = jnp.searchsorted(leaf_dfs, node_iota, side="left").astype(
        jnp.int32)
    hi = jnp.searchsorted(leaf_dfs, tree.skip, side="left").astype(
        jnp.int32)
    hm = jnp.where(hi > lo, range_max(lo, jnp.maximum(hi, lo + 1)), 0.0)
    return hm


@struct.dataclass
class NeighborLists:
    leaf_idx: jnp.ndarray    # i32[ngroups, LL] source-leaf node ids
    n_leaves: jnp.ndarray    # i32[ngroups]
    overflow: jnp.ndarray    # bool[ngroups]
    group_nodes: jnp.ndarray  # i32[ngroups]


@partial(jax.jit, static_argnames=("leaf_list_max", "symmetric"))
def find_neighbors(tree, group_nodes, group_center, group_half,
                   group_radius, hmax, leaf_list_max, symmetric=True):
    """Collect source leaves intersecting each group's search volume.

    Search volume: distance from the group bbox < group_radius
    (asymmetric) or < max(group_radius, node hmax) (symmetric, the
    NGB_TREEFIND_SYMMETRIC analog, treewalk.h:13-16).
    """
    LL = leaf_list_max
    hm = hmax if symmetric else tree.length  # placeholder when unused
    packed = jnp.concatenate(
        [tree.center, tree.length[:, None], hm[:, None]], axis=1)
    meta = tree.skip | jnp.where(tree.is_leaf, jnp.int32(-2 ** 31),
                                 jnp.int32(0))

    def walk(self_node, center, half, radius):
        active = self_node < tree.n_nodes

        def cond(st):
            return st[0] < tree.n_nodes

        def body(st):
            i, nl, leaves, ovf = st
            row = packed[i]
            mt = meta[i]
            c = row[:3]
            ln = row[3]
            dc = jnp.abs(_wrap(c - center))
            dmin = jnp.maximum(dc - half - 0.5 * ln, 0.0)
            r2min = jnp.sum(dmin * dmin)
            reach = jnp.maximum(radius, row[4]) if symmetric else radius
            near = r2min < reach * reach
            leaf = mt < 0
            skip = mt & jnp.int32(0x7FFFFFFF)
            rec = near & leaf
            descend = near & (~leaf)
            leaves = leaves.at[jnp.where(rec, nl, LL)].set(i, mode="drop")
            one = jnp.int32(1)
            nl = nl + jnp.where(rec & (nl < LL), one, jnp.int32(0))
            ovf = ovf | (rec & (nl >= LL))
            i = jnp.where(descend, i + one, skip).astype(jnp.int32)
            return (i, nl, leaves, ovf)

        start = jnp.where(active, jnp.int32(0),
                          tree.n_nodes.astype(jnp.int32))
        st = (start, jnp.int32(0),
              jnp.full(LL, tree.capacity, jnp.int32), False)
        i, nl, leaves, ovf = jax.lax.while_loop(cond, body, st)
        return leaves, nl, ovf

    leaves, nl, ovf = jax.vmap(walk)(group_nodes, group_center,
                                     group_half, group_radius)
    return NeighborLists(leaf_idx=leaves, n_leaves=nl, overflow=ovf,
                         group_nodes=group_nodes)


def pair_reduce(pair_fn, nbr: NeighborLists, tree, pos_box,
                target_feats: Dict, source_feats: Dict,
                reducers: Dict[str, str], group_max: int,
                leaf_eval_max: int, group_batch: int = 512,
                leaf_chunk: int = 8):
    """Evaluate pair_fn over all (target particle, source particle)
    pairs implied by the neighbor lists and reduce over sources.

    target_feats: dict of f32[N] or [N,k] arrays (sorted particle order)
    gathered per target; source_feats likewise gathered per source.
    Returns dict of [N] or [N,k] arrays in sorted particle order.
    """
    n = pos_box.shape[0]
    ngroups = nbr.leaf_idx.shape[0]
    G = group_max
    LE = leaf_eval_max
    LL = nbr.leaf_idx.shape[1]

    safe_nodes = jnp.minimum(nbr.group_nodes, tree.capacity - 1)
    tps = tree.pstart[safe_nodes]
    tpc = jnp.where(nbr.group_nodes < tree.n_nodes,
                    tree.pcount[safe_nodes], 0)
    offg = jnp.arange(G, dtype=jnp.int32)
    tidx = jnp.clip(tps[:, None] + offg[None, :], 0, n - 1)
    tmask = offg[None, :] < tpc[:, None]

    lstart = tree.pstart[nbr.leaf_idx]
    lcount = tree.pcount[nbr.leaf_idx]
    lvalid = jnp.arange(LL)[None, :] < nbr.n_leaves[:, None]
    lcount = jnp.where(lvalid, lcount, 0)

    offe = jnp.arange(LE, dtype=jnp.int32)

    def gather_feats(feats, idx, axis):
        """Gather and pre-broadcast: targets get a trailing source axis
        (B,G,1[,k]), sources a target axis (B,1,S[,k]), so pair
        functions are plain elementwise math over (B,G,S[,k])."""
        out = {}
        for k, v in feats.items():
            g = v[idx]
            if axis == "target":
                g = g[:, :, None] if v.ndim == 1 else g[:, :, None, :]
            else:
                g = g[:, None, :] if v.ndim == 1 else g[:, None, :, :]
            out[k] = g
        return out

    def eval_batch(args):
        tidx_b, tmask_b, lstart_b, lcount_b = args
        tpos = pos_box[tidx_b]                     # (B, G, 3)
        tfeat = gather_feats(target_feats, tidx_b, "target")

        def init_out(shape_ref):
            out = {}
            for k, red in reducers.items():
                out[k] = jnp.zeros(shape_ref, jnp.float32) if red == "sum" \
                    else jnp.full(shape_ref, -jnp.inf, jnp.float32)
            return out

        out0 = init_out(tpos.shape[:2])

        def chunk(carry, sl):
            out = carry
            ls = jax.lax.dynamic_slice_in_dim(lstart_b, sl, leaf_chunk,
                                              axis=1)
            lc = jax.lax.dynamic_slice_in_dim(lcount_b, sl, leaf_chunk,
                                              axis=1)
            src = ls[:, :, None] + offe[None, None, :]
            smask = offe[None, None, :] < lc[:, :, None]
            src = jnp.clip(src, 0, n - 1)
            S = leaf_chunk * LE
            srcf = src.reshape(src.shape[0], S)
            smaskf = smask.reshape(src.shape[0], S)
            spos = pos_box[srcf]                  # (B, S, 3)
            sfeat = gather_feats(source_feats, srcf, "source")
            dx = _wrap(spos[:, None, :, :] - tpos[:, :, None, :])
            r = jnp.sqrt(jnp.sum(dx * dx, axis=-1))
            contrib = pair_fn(dx, r, tmask_b[:, :, None],
                              smaskf[:, None, :], tfeat, sfeat)
            for k, red in reducers.items():
                c = contrib[k].astype(jnp.float32)
                c = jnp.where(tmask_b[:, :, None] & smaskf[:, None, :],
                              c, 0.0 if red == "sum" else -jnp.inf)
                if red == "sum":
                    out[k] = out[k] + jnp.sum(c, axis=2)
                else:
                    out[k] = jnp.maximum(out[k], jnp.max(c, axis=2))
            return out, None

        out, _ = jax.lax.scan(chunk, out0,
                              jnp.arange(0, LL, leaf_chunk))
        return out

    B = group_batch
    nb = (ngroups + B - 1) // B
    pad = nb * B - ngroups

    def padarr(a):
        if pad == 0:
            return a.reshape((nb, B) + a.shape[1:])
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)).reshape(
            (nb, B) + a.shape[1:])

    out = jax.lax.map(eval_batch, (padarr(tidx), padarr(tmask),
                                   padarr(lstart), padarr(lcount)))
    # back to particles
    pj = jnp.arange(n, dtype=jnp.int32)
    search_ps = jnp.where(nbr.group_nodes < tree.n_nodes, tps, n + 1)
    gid = jnp.clip(jnp.searchsorted(search_ps, pj, side="right") - 1,
                   0, ngroups - 1).astype(jnp.int32)
    slot = pj - tps[gid]
    covered = (slot >= 0) & (slot < jnp.minimum(tpc[gid], G))
    result = {}
    for k, red in reducers.items():
        flat = out[k].reshape(-1, G)[:ngroups]
        v = flat[gid, jnp.clip(slot, 0, G - 1)]
        fill = 0.0 if red == "sum" else -jnp.inf
        result[k] = jnp.where(covered, v, fill)
    return result


# converged leaf-list capacities per (shape) key: every distinct
# leaf_list_max is a distinct compiled graph (LL is a shape), and on
# the remote-TPU tunnel each compile costs 40-100s — so remember what
# worked and jump straight there on later calls (measured: a cold
# 64k-particle SPH density was 520s, almost all retry recompiles; warm
# it is 3.1s).
_LL_CACHE = {}


def find_neighbors_auto(tree, group_nodes, group_center, group_half,
                        group_radius, hmax, ll0, symmetric,
                        cache_key=None, grow=4, max_attempts=5):
    """find_neighbors with overflow retry and capacity memoization.

    Returns (NeighborLists, ll_used); raises on persistent overflow."""
    if cache_key is not None:
        ll0 = max(ll0, _LL_CACHE.get(cache_key, ll0))
    ll = ll0
    for _ in range(max_attempts):
        nbr = find_neighbors(tree, group_nodes, group_center,
                             group_half, group_radius, hmax, ll,
                             symmetric=symmetric)
        if not bool(jnp.any(nbr.overflow)):
            if cache_key is not None:
                _LL_CACHE[cache_key] = ll
            return nbr, ll
        ll *= grow
    raise RuntimeError(
        f"neighbor list overflow at capacity {ll // grow}")
