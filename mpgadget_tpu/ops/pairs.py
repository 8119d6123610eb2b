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


@struct.dataclass
class PackedSources:
    """Sub-row-packed per-leaf source buffer (make_leaf_sources analog
    for the generic pair engine, treewalk.c:930 gather side).

    packed[s] = [x*sub | y*sub | z*sub | valid*sub | col_0*sub | ...]
    where s indexes sub-rows: each leaf's particle range padded up to a
    multiple of ``sub`` aligned slots.  A block's source fetch becomes
    ONE contiguous row gather instead of a per-element random gather
    (the measured ~4x pathology on v5e, see gravity/treewalk.py).
    """
    packed: jnp.ndarray          # f32[sr_cap, (4+F)*sub]
    node_first_sub: jnp.ndarray  # i32[C]
    node_nsub: jnp.ndarray       # i32[C]
    overflow: jnp.ndarray        # bool


@partial(jax.jit, static_argnames=("nleaf_cap", "sr_cap", "sub"))
def pack_sources(tree, pos_box, valid_sorted, cols, nleaf_cap, sr_cap,
                 sub=8):
    """Build a PackedSources buffer for the sorted particle arrays.

    cols: f32[N, F] extra source-feature columns (sorted order).
    Padding slots and invalid particles carry valid=0.
    """
    n = pos_box.shape[0]
    C = tree.capacity
    F = cols.shape[1]
    iota_c = jnp.arange(C, dtype=jnp.int32)
    is_leaf = tree.is_leaf & (iota_c < tree.n_nodes) & (tree.pcount > 0)
    rank = jnp.cumsum(is_leaf.astype(jnp.int32)) - 1
    nleaf = jnp.sum(is_leaf.astype(jnp.int32))
    leaf_nodes = jnp.zeros(nleaf_cap, jnp.int32).at[
        jnp.where(is_leaf, rank, nleaf_cap)].set(iota_c, mode="drop")
    lrow = jnp.arange(nleaf_cap, dtype=jnp.int32)
    lok = lrow < nleaf
    pc = jnp.where(lok, tree.pcount[leaf_nodes], 0)
    n_sub = ((pc + (sub - 1)) // sub).astype(jnp.int32)
    first_sub = (jnp.cumsum(n_sub) - n_sub).astype(jnp.int32)
    total_sub = first_sub[-1] + n_sub[-1]
    overflow = (nleaf > nleaf_cap) | (total_sub > sr_cap)

    # sub-row -> leaf by scatter + forward fill
    dest = jnp.where(n_sub > 0, jnp.minimum(first_sub, sr_cap), sr_cap)
    mark = jnp.zeros(sr_cap, jnp.int32).at[dest].max(lrow, mode="drop")
    lof = jax.lax.cummax(mark)
    srow = jnp.arange(sr_cap, dtype=jnp.int32)
    off = srow - first_sub[lof]
    sstart = tree.pstart[leaf_nodes[lof]] + sub * off
    cnt = jnp.clip(pc[lof] - sub * off, 0, sub)
    cnt = jnp.where(srow < total_sub, cnt, 0)

    idx = jnp.clip(sstart[:, None]
                   + jnp.arange(sub, dtype=jnp.int32)[None, :], 0, n - 1)
    ok = (jnp.arange(sub, dtype=jnp.int32)[None, :] < cnt[:, None]) \
        & valid_sorted[idx]
    vflag = ok.astype(jnp.float32)
    parts = [pos_box[idx, 0], pos_box[idx, 1], pos_box[idx, 2], vflag]
    for f in range(F):
        parts.append(jnp.where(ok, cols[idx, f], 0.0))
    packed = jnp.concatenate(parts, axis=1)      # (SR, (4+F)*sub)

    node_first_sub = jnp.zeros(C, jnp.int32).at[leaf_nodes].set(
        jnp.where(lok, first_sub, 0), mode="drop")
    node_nsub = jnp.zeros(C, jnp.int32).at[leaf_nodes].set(
        jnp.where(lok, n_sub, 0), mode="drop")
    return PackedSources(packed=packed, node_first_sub=node_first_sub,
                         node_nsub=node_nsub, overflow=overflow)


def pair_reduce_packed(pair_fn, nbr: NeighborLists, tree,
                       ps: PackedSources, pos_box, target_feats: Dict,
                       source_spec, reducers: Dict[str, str],
                       group_max: int, src_cap: int, sub: int = 8,
                       group_batch: int = 256, chunk: int = 256):
    """pair_reduce over a PackedSources buffer.

    Per group the recorded source leaves' sub-rows are compacted into a
    dense src_cap-slot buffer (sub-row granularity) and fetched with ONE
    row gather, then pair_fn is evaluated on (B, G, CH) chunks.

    source_spec: tuple of (name, width) — how to reassemble the packed
    feature columns into the sfeat dict (width 1 -> (B,1,S); width 3 ->
    (B,1,S,3)).  Column order must match the cols passed to
    pack_sources.  Returns (result dict in sorted particle order,
    overflow bool[ngroups]).
    """
    n = pos_box.shape[0]
    ngroups = nbr.leaf_idx.shape[0]
    G = group_max
    LL = nbr.leaf_idx.shape[1]
    S = src_cap
    assert S % sub == 0
    SS = S // sub
    SR = ps.packed.shape[0]
    nF = 4 + sum(w for _, w in source_spec)

    safe_nodes = jnp.minimum(nbr.group_nodes, tree.capacity - 1)
    tps = tree.pstart[safe_nodes]
    tpc = jnp.where(nbr.group_nodes < tree.n_nodes,
                    tree.pcount[safe_nodes], 0)
    offg = jnp.arange(G, dtype=jnp.int32)
    tidx = jnp.clip(tps[:, None] + offg[None, :], 0, n - 1)
    tmask = offg[None, :] < tpc[:, None]

    # group's leaf list -> sub-row slots (scatter + forward fill, the
    # evaluate_leaves compaction at sub-row granularity)
    safe_leaf = jnp.minimum(nbr.leaf_idx, tree.capacity - 1)
    in_list = (jnp.arange(LL)[None, :] < nbr.n_leaves[:, None]) \
        & (nbr.leaf_idx < tree.n_nodes)
    lsub = jnp.where(in_list, ps.node_nsub[safe_leaf], 0)   # (ngr, LL)
    lfirst = ps.node_first_sub[safe_leaf]
    prefix = jnp.cumsum(lsub, axis=1) - lsub
    total = prefix[:, -1] + lsub[:, -1]
    overflow = (total > SS) | nbr.overflow

    rows = jnp.arange(ngroups, dtype=jnp.int32)[:, None]
    dest = jnp.where(lsub > 0, jnp.minimum(prefix, SS), SS)
    mark = jnp.zeros((ngroups, SS), jnp.int32).at[rows, dest].max(
        jnp.broadcast_to(jnp.arange(LL, dtype=jnp.int32)[None, :],
                         (ngroups, LL)), mode="drop")
    lid = jax.lax.cummax(mark, axis=1)
    s_iota = jnp.arange(SS, dtype=jnp.int32)[None, :]
    take = jnp.take_along_axis
    srow = (take(lfirst, lid, axis=1)
            + (s_iota - take(prefix, lid, axis=1)))
    src_ok = s_iota < jnp.minimum(total, SS)[:, None]
    srow = jnp.clip(srow, 0, SR - 1)

    def gather_tfeats(idx):
        out = {}
        for k, v in target_feats.items():
            g = v[idx]
            out[k] = g[:, :, None] if v.ndim == 1 else g[:, :, None, :]
        return out

    CH = chunk if S % chunk == 0 else S

    def eval_batch(args):
        tidx_b, tmask_b, srow_b, srcok_b = args
        B = tidx_b.shape[0]
        tpos = pos_box[tidx_b]                    # (B, G, 3)
        tfeat = gather_tfeats(tidx_b)
        rows4 = ps.packed[srow_b]                 # (B, SS, nF*sub)
        comps = jnp.moveaxis(
            rows4.reshape(B, SS, nF, sub), 2, 1)  # (B, nF, SS, sub)
        comps = comps.reshape(B, nF, S)
        # zero the valid flag for slots beyond the compacted total
        okf = jnp.repeat(srcok_b, sub, axis=1)    # (B, S)
        valid = comps[:, 3] * okf
        spos = jnp.stack([comps[:, 0], comps[:, 1], comps[:, 2]],
                         axis=-1)                 # (B, S, 3)

        def init_out():
            out = {}
            for k, red in reducers.items():
                out[k] = (jnp.zeros((B, G), jnp.float32) if red == "sum"
                          else jnp.full((B, G), -jnp.inf, jnp.float32))
            return out

        def chunk_step(carry, sl):
            out = carry
            cut = lambda a: jax.lax.dynamic_slice_in_dim(a, sl, CH, 1)
            sp = jax.lax.dynamic_slice_in_dim(spos, sl, CH, 1)
            sm = cut(valid) > 0.5                 # (B, CH)
            sfeat = {}
            ci = 4
            for name, w in source_spec:
                if w == 1:
                    sfeat[name] = cut(comps[:, ci])[:, None, :]
                else:
                    sfeat[name] = jnp.stack(
                        [cut(comps[:, ci + j]) for j in range(w)],
                        axis=-1)[:, None, :, :]
                ci += w
            dx = _wrap(sp[:, None, :, :] - tpos[:, :, None, :])
            r = jnp.sqrt(jnp.sum(dx * dx, axis=-1))
            contrib = pair_fn(dx, r, tmask_b[:, :, None],
                              sm[:, None, :], tfeat, sfeat)
            pmask = tmask_b[:, :, None] & sm[:, None, :]
            for k, red in reducers.items():
                c = contrib[k].astype(jnp.float32)
                c = jnp.where(pmask, c, 0.0 if red == "sum" else -jnp.inf)
                if red == "sum":
                    out[k] = out[k] + jnp.sum(c, axis=2)
                else:
                    out[k] = jnp.maximum(out[k], jnp.max(c, axis=2))
            return out, None

        out, _ = jax.lax.scan(chunk_step, init_out(),
                              jnp.arange(0, S, CH))
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
                                   padarr(srow), padarr(src_ok)))
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
    return result, overflow


def flatten_source_feats(feats: Dict):
    """(cols f32[N,F], source_spec) from a dict of [N]/[N,3] arrays.

    Column order is the dict's insertion order; vector features occupy
    consecutive columns.  Feed cols to pack_sources and source_spec to
    pair_reduce_packed."""
    cols = []
    spec = []
    for k, v in feats.items():
        v = jnp.asarray(v, jnp.float32)
        if v.ndim == 1:
            cols.append(v[:, None])
            spec.append((k, 1))
        else:
            cols.append(v)
            spec.append((k, v.shape[1]))
    return jnp.concatenate(cols, axis=1), tuple(spec)


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
