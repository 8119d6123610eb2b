"""Vectorized Barnes-Hut traversal and force evaluation.

TPU-native replacement for the reference's treewalk engine + short-range
gravity visitor (libgadget/treewalk.c, gravshort-tree.c): instead of
per-particle recursive walks with an MPI export/import protocol, the
*tree leaves* act as target groups — each leaf holds <= leaf_max
Morton-adjacent particles, so its bounding box is tight by construction.
Every leaf runs a stackless preorder walk over the skip-pointer tree
(descend = i+1, reject/accept = skip[i]) recording bounded interaction
lists, which are then evaluated densely — regular shapes, VPU-friendly,
no recursion.

Because the tree is stored in DFS preorder, leaves appear in particle
order: particle -> leaf is a searchsorted over leaf pstart values, and
results come back to particles by a single gather.

Opening criteria mirror shall_we_open_node (gravshort-tree.c:221-245):
relative acceleration (mass*len^2 > r^4*aold), Barnes-Hut angle
fallback/cap, and the "inside" guard — made conservative at group level
by using the nearest distance from the leaf's particle bounding box and
the leaf-minimum aold.
"""

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .shortrange import (shortrange_force_window, shortrange_pot_window,
                         softened_force_factor, softened_pot_factor)


@dataclass(frozen=True)
class WalkConfig:
    leaf_cap_factor: int = 2    # leaf-group capacity = N // factor + 64
    node_list_max: int = 256
    leaf_list_max: int = 64
    # max particles gathered per leaf entry; MUST be >= the tree's
    # leaf_max or direct interactions are silently dropped
    leaf_eval_max: int = 32
    group_batch: int = 1024     # leaf groups evaluated per map step


def _wrap(d):
    """Minimum-image for box-unit coordinates."""
    return d - jnp.round(d)


@partial(jax.jit, static_argnames=("group_cap", "group_max"))
def make_target_groups(tree, pos_box, amag_sorted, group_cap, group_max):
    """Compact target-group node list + per-group bbox and min |aold|.

    Group nodes are the highest tree nodes with count <= group_max
    (tree.is_group): true octree cells, so their bounding boxes are
    tight.  Returns (group_nodes i32[group_cap] — node index, sentinel
    for padding, center f32[group_cap,3], half f32[group_cap,3],
    amin f32[group_cap], n_groups, overflow).
    """
    leaf_cap = group_cap
    leaf_max = group_max
    C = tree.capacity
    iota = jnp.arange(C, dtype=jnp.int32)
    in_use = iota < tree.n_nodes
    is_leaf = tree.is_group & in_use
    # stable compaction of group indices (DFS order preserved)
    order = jnp.argsort(~is_leaf, stable=True).astype(jnp.int32)
    n_leaves = jnp.sum(is_leaf.astype(jnp.int32))
    leaf_nodes = jnp.where(jnp.arange(leaf_cap) < n_leaves,
                           order[:leaf_cap], C - 1).astype(jnp.int32)
    overflow = n_leaves > leaf_cap

    n = pos_box.shape[0]
    off = jnp.arange(leaf_max, dtype=jnp.int32)
    ps = tree.pstart[leaf_nodes]
    pc = tree.pcount[leaf_nodes]
    idx = jnp.clip(ps[:, None] + off[None, :], 0, n - 1)
    mask = off[None, :] < pc[:, None]
    p = pos_box[idx]
    # min-image-safe bbox: anchor on the first particle
    anchor = p[:, :1, :]
    rel = _wrap(p - anchor)
    rel = jnp.where(mask[:, :, None], rel, 0.0)
    lo = jnp.min(rel, axis=1)
    hi = jnp.max(rel, axis=1)
    center = anchor[:, 0, :] + 0.5 * (lo + hi)
    half = 0.5 * (hi - lo)
    am = jnp.where(mask, amag_sorted[idx], jnp.inf)
    amin = jnp.min(am, axis=1)
    amin = jnp.where(jnp.isfinite(amin), amin, 0.0)
    # padding groups: mark with a sentinel so traversal starts done
    pad = jnp.arange(leaf_cap) >= n_leaves
    return (jnp.where(pad, jnp.int32(2 ** 30), leaf_nodes), center,
            half, amin, n_leaves, overflow)


@partial(jax.jit, static_argnames=("cfg",))
def traverse(tree, leaf_nodes, group_center, group_half, group_aold,
             cfg: WalkConfig, rcut, bh_angle2, use_bh):
    """Record per-leaf-group interaction lists.

    group_aold: ErrTolForceAcc * min |old accel| over the group, in
    box-unit force units; <= 0 means use BH opening.

    The walk is gather-bound on TPU, so per-node data is packed into ONE
    f32 row (center, len, mass) + ONE i32 row (skip | leaf flag): two
    gathers per visited node instead of six.
    """
    LN = cfg.node_list_max
    LL = cfg.leaf_list_max
    rcut2 = rcut * rcut
    packed = jnp.concatenate(
        [tree.center, tree.length[:, None], tree.mass[:, None]], axis=1)
    # skip pointer in the low 31 bits, leaf flag in the sign bit
    meta = tree.skip | jnp.where(tree.is_leaf, jnp.int32(-2 ** 31),
                                 jnp.int32(0))

    def walk(self_node, center, half, aold):
        active_group = self_node < tree.n_nodes

        def cond(st):
            return st[0] < tree.n_nodes

        def body(st):
            i, nn, nl, nodes, leaves, ovf = st
            row = packed[i]
            mt = meta[i]
            c = row[:3]
            ln = row[3]
            m = row[4]
            leaf = mt < 0
            skip = mt & jnp.int32(0x7FFFFFFF)
            dc = jnp.abs(_wrap(c - center))
            dmin = jnp.maximum(dc - half - 0.5 * ln, 0.0)
            r2min = jnp.sum(dmin * dmin)
            discard = r2min > rcut2
            rel_open = m * ln * ln > r2min * r2min * aold
            bh_open = ln * ln > bh_angle2 * r2min
            # relative mode still opens at the max BH angle cap
            # (gravshort-tree.c:227-233); caller passes the proper theta^2
            crit_open = jnp.where(use_bh | (aold <= 0),
                                  bh_open, rel_open | bh_open)
            inside = jnp.all(dc < half + 0.6 * ln)
            must_open = crit_open | inside | (r2min <= 0)
            use_node = (~discard) & (~must_open)
            rec_leaf = (~discard) & must_open & leaf
            descend = (~discard) & must_open & (~leaf)
            nodes = nodes.at[jnp.where(use_node, nn, LN)].set(
                i, mode="drop")
            leaves = leaves.at[jnp.where(rec_leaf, nl, LL)].set(
                i, mode="drop")
            one = jnp.int32(1)
            zero = jnp.int32(0)
            nn = nn + jnp.where(use_node & (nn < LN), one, zero)
            nl = nl + jnp.where(rec_leaf & (nl < LL), one, zero)
            ovf = ovf | (use_node & (nn >= LN)) | (rec_leaf & (nl >= LL))
            i = jnp.where(descend, i + one, skip).astype(jnp.int32)
            return (i, nn, nl, nodes, leaves, ovf)

        start = jnp.where(active_group, jnp.int32(0),
                          tree.n_nodes.astype(jnp.int32))
        st0 = (start, jnp.int32(0), jnp.int32(0),
               jnp.full(LN, tree.capacity, jnp.int32),
               jnp.full(LL, tree.capacity, jnp.int32), False)
        i, nn, nl, nodes, leaves, ovf = jax.lax.while_loop(cond, body, st0)
        return nodes, nn, leaves, nl, ovf

    return jax.vmap(walk)(leaf_nodes, group_center, group_half,
                          group_aold)


@partial(jax.jit, static_argnames=("cfg", "leaf_max", "with_potential"))
def evaluate(tree, pos_box, mass_sorted, valid_sorted, leaf_nodes,
             node_idx, n_nodes, leaf_idx, n_leaves, cfg: WalkConfig,
             leaf_max, rs_inv, h_inv, rcut, with_potential=True):
    """Dense evaluation of recorded interaction lists.

    Targets are the particles of each leaf group (padded to leaf_max).
    All geometry in box units; returns (accel f32[N,3], pot f32[N]) in
    box-unit force units (caller multiplies by G/box^2 and G/box),
    mapped back to sorted-particle order.
    """
    n = pos_box.shape[0]
    ngroups = leaf_nodes.shape[0]
    G = leaf_max
    offg = jnp.arange(G, dtype=jnp.int32)
    safe_nodes = jnp.minimum(leaf_nodes, tree.capacity - 1)
    tps = tree.pstart[safe_nodes]
    tpc = jnp.where(leaf_nodes < tree.n_nodes,
                    tree.pcount[safe_nodes], 0)
    tidx = jnp.clip(tps[:, None] + offg[None, :], 0, n - 1)
    tgt = pos_box[tidx]                    # (ngroups, G, 3)

    ncom = tree.com[node_idx]              # (ngroups, LN, 3)
    nmass = jnp.where(
        jnp.arange(cfg.node_list_max)[None, :] < n_nodes[:, None],
        tree.mass[node_idx], 0.0)

    lstart = tree.pstart[leaf_idx]         # (ngroups, LL)
    lcount = tree.pcount[leaf_idx]
    lmask = (jnp.arange(cfg.leaf_list_max)[None, :]
             < n_leaves[:, None])
    lcount = jnp.where(lmask, lcount, 0)

    LE = cfg.leaf_eval_max
    off = jnp.arange(LE, dtype=jnp.int32)

    def eval_batch(args):
        tgt_b, ncom_b, nmass_b, lstart_b, lcount_b = args
        # --- multipole part: (B, G, LN) ---
        dx = _wrap(ncom_b[:, None, :, :] - tgt_b[:, :, None, :])
        r = jnp.sqrt(jnp.sum(dx * dx, axis=-1))
        fac = softened_force_factor(r, h_inv) \
            * shortrange_force_window(r, rs_inv) * nmass_b[:, None, :]
        fac = jnp.where(r < rcut, fac, 0.0)
        acc = jnp.sum(fac[..., None] * dx, axis=2)
        if with_potential:
            pw = softened_pot_factor(r, h_inv) \
                * shortrange_pot_window(r, rs_inv) * nmass_b[:, None, :]
            pw = jnp.where(r < rcut, pw, 0.0)
            pot = jnp.sum(pw, axis=2)
        else:
            pot = jnp.zeros(tgt_b.shape[:2], jnp.float32)

        # --- leaf (direct) part: chunk over the leaf list ---
        LL = cfg.leaf_list_max
        CH = 16  # leaves per chunk

        def leaf_chunk(carry, sl):
            acc, pot = carry
            ls = jax.lax.dynamic_slice_in_dim(lstart_b, sl, CH, axis=1)
            lc = jax.lax.dynamic_slice_in_dim(lcount_b, sl, CH, axis=1)
            src = ls[:, :, None] + off[None, None, :]   # (B, CH, LE)
            smask = off[None, None, :] < lc[:, :, None]
            src = jnp.clip(src, 0, n - 1)
            spos = pos_box[src]                          # (B, CH, LE, 3)
            sm = jnp.where(smask & valid_sorted[src],
                           mass_sorted[src], 0.0)
            d = _wrap(spos.reshape(spos.shape[0], -1, 3)[:, None, :, :]
                      - tgt_b[:, :, None, :])            # (B,G,CH*LE,3)
            rr = jnp.sqrt(jnp.sum(d * d, axis=-1))
            mm = sm.reshape(sm.shape[0], -1)[:, None, :]
            ff = softened_force_factor(rr, h_inv) \
                * shortrange_force_window(rr, rs_inv) * mm
            ff = jnp.where(rr < rcut, ff, 0.0)
            acc = acc + jnp.sum(ff[..., None] * d, axis=2)
            if with_potential:
                pp = softened_pot_factor(rr, h_inv) \
                    * shortrange_pot_window(rr, rs_inv) * mm
                pp = jnp.where((rr > 0) & (rr < rcut), pp, 0.0)
                pot = pot + jnp.sum(pp, axis=2)
            return (acc, pot), None

        (acc, pot), _ = jax.lax.scan(
            leaf_chunk, (acc, pot), jnp.arange(0, LL, CH))
        return acc, pot

    B = cfg.group_batch
    nb = (ngroups + B - 1) // B
    pad = nb * B - ngroups

    def padarr(a):
        if pad == 0:
            return a.reshape((nb, B) + a.shape[1:])
        padding = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, padding).reshape((nb, B) + a.shape[1:])

    acc_g, pot_g = jax.lax.map(
        eval_batch, (padarr(tgt), padarr(ncom), padarr(nmass),
                     padarr(lstart), padarr(lcount)))
    acc_g = acc_g.reshape(-1, G, 3)[:ngroups]
    pot_g = pot_g.reshape(-1, G)[:ngroups]

    # map back: particle j belongs to the leaf group covering it.
    # Leaves partition particles contiguously & in DFS (= particle)
    # order, so group-of-particle = searchsorted over group pstart.
    pj = jnp.arange(n, dtype=jnp.int32)
    search_ps = jnp.where(leaf_nodes < tree.n_nodes, tps, n + 1)
    gid = jnp.clip(jnp.searchsorted(search_ps, pj, side="right") - 1,
                   0, ngroups - 1).astype(jnp.int32)
    slot = pj - tps[gid]
    covered = (slot >= 0) & (slot < jnp.minimum(tpc[gid], G))
    acc = jnp.where(covered[:, None],
                    acc_g[gid, jnp.clip(slot, 0, G - 1)], 0.0)
    pot = jnp.where(covered, pot_g[gid, jnp.clip(slot, 0, G - 1)], 0.0)
    return acc, pot


@partial(jax.jit, static_argnames=("cfg", "leaf_max",
                                   "with_potential"))
def traverse_fused(tree, pos_box, leaf_nodes, group_center, group_half,
                  group_aold, cfg: WalkConfig, leaf_max, rcut, bh_angle2,
                  use_bh, rs_inv, h_inv, with_potential=False):
    """Traversal with *fused* multipole evaluation.

    Recording per-node interaction lists costs ~5x the walk itself in
    scatter traffic (measured on v5e), so accepted multipoles are
    instead applied to the group's targets inline: the accumulators are
    dense per-lane arrays updated every iteration (no scatter).  Only
    the short leaf list (direct interactions) is still recorded.

    Returns (acc f32[ngroups, leaf_max, 3], pot, leaf_idx, n_leaves,
    overflow) in box-unit force units.
    """
    LL = cfg.leaf_list_max
    rcut2 = rcut * rcut
    G = leaf_max
    n = pos_box.shape[0]
    packed = jnp.concatenate(
        [tree.center, tree.length[:, None], tree.mass[:, None],
         tree.com], axis=1)
    meta = tree.skip | jnp.where(tree.is_leaf, jnp.int32(-2 ** 31),
                                 jnp.int32(0))
    offg = jnp.arange(G, dtype=jnp.int32)

    def walk(self_node, center, half, aold):
        active_group = self_node < tree.n_nodes
        safe = jnp.minimum(self_node, tree.capacity - 1)
        tps = tree.pstart[safe]
        tpc = jnp.where(active_group, tree.pcount[safe], 0)
        tidx = jnp.clip(tps + offg, 0, n - 1)
        tmask = offg < tpc
        tpos = pos_box[tidx]                      # (G, 3)

        def cond(st):
            return st[0] < tree.n_nodes

        def body(st):
            i, nl, leaves, ovf, acc, pot = st
            row = packed[i]
            mt = meta[i]
            c = row[:3]
            ln = row[3]
            m = row[4]
            com = row[5:8]
            leaf = mt < 0
            skip = mt & jnp.int32(0x7FFFFFFF)
            dc = jnp.abs(_wrap(c - center))
            dmin = jnp.maximum(dc - half - 0.5 * ln, 0.0)
            r2min = jnp.sum(dmin * dmin)
            discard = r2min > rcut2
            rel_open = m * ln * ln > r2min * r2min * aold
            bh_open = ln * ln > bh_angle2 * r2min
            crit_open = jnp.where(use_bh | (aold <= 0),
                                  bh_open, rel_open | bh_open)
            inside = jnp.all(dc < half + 0.6 * ln)
            must_open = crit_open | inside | (r2min <= 0)
            use_node = (~discard) & (~must_open)
            rec_leaf = (~discard) & must_open & leaf
            descend = (~discard) & must_open & (~leaf)
            # fused multipole: node com/mass on all G targets
            dx = _wrap(com[None, :] - tpos)       # (G, 3)
            r = jnp.sqrt(jnp.sum(dx * dx, axis=-1))
            from .shortrange import (shortrange_force_window,
                                     shortrange_pot_window,
                                     softened_force_factor,
                                     softened_pot_factor)
            w = jnp.where(use_node & (r < rcut),
                          m * softened_force_factor(r, h_inv)
                          * shortrange_force_window(r, rs_inv), 0.0)
            acc = acc + w[:, None] * dx
            if with_potential:
                pw = jnp.where(use_node & (r < rcut),
                               m * softened_pot_factor(r, h_inv)
                               * shortrange_pot_window(r, rs_inv), 0.0)
                pot = pot + pw
            leaves = leaves.at[jnp.where(rec_leaf, nl, LL)].set(
                i, mode="drop")
            one = jnp.int32(1)
            nl = nl + jnp.where(rec_leaf & (nl < LL), one, jnp.int32(0))
            ovf = ovf | (rec_leaf & (nl >= LL))
            i = jnp.where(descend, i + one, skip).astype(jnp.int32)
            return (i, nl, leaves, ovf, acc, pot)

        start = jnp.where(active_group, jnp.int32(0),
                          tree.n_nodes.astype(jnp.int32))
        st0 = (start, jnp.int32(0),
               jnp.full(LL, tree.capacity, jnp.int32), False,
               jnp.zeros((G, 3), jnp.float32), jnp.zeros(G, jnp.float32))
        i, nl, leaves, ovf, acc, pot = jax.lax.while_loop(cond, body,
                                                          st0)
        return acc, pot, leaves, nl, ovf

    return jax.vmap(walk)(leaf_nodes, group_center, group_half,
                          group_aold)


@partial(jax.jit, static_argnames=("cfg", "leaf_max", "with_potential"))
def evaluate_leaves(tree, pos_box, mass_sorted, valid_sorted, leaf_nodes,
                    leaf_idx, n_leaves, acc0, pot0, cfg: WalkConfig,
                    leaf_max, rs_inv, h_inv, rcut, with_potential=True):
    """Direct (leaf) interactions added to the fused-walk accumulators,
    then mapped back to sorted-particle order."""
    n = pos_box.shape[0]
    ngroups = leaf_nodes.shape[0]
    G = leaf_max
    offg = jnp.arange(G, dtype=jnp.int32)
    safe_nodes = jnp.minimum(leaf_nodes, tree.capacity - 1)
    tps = tree.pstart[safe_nodes]
    tpc = jnp.where(leaf_nodes < tree.n_nodes,
                    tree.pcount[safe_nodes], 0)
    tidx = jnp.clip(tps[:, None] + offg[None, :], 0, n - 1)
    tgt = pos_box[tidx]

    lstart = tree.pstart[leaf_idx]
    lcount = tree.pcount[leaf_idx]
    lmask = (jnp.arange(cfg.leaf_list_max)[None, :]
             < n_leaves[:, None])
    lcount = jnp.where(lmask, lcount, 0)
    LE = cfg.leaf_eval_max
    off = jnp.arange(LE, dtype=jnp.int32)

    def eval_batch(args):
        tgt_b, lstart_b, lcount_b, acc_b, pot_b = args
        LL = cfg.leaf_list_max
        CH = 16

        def leaf_chunk(carry, sl):
            acc, pot = carry
            ls = jax.lax.dynamic_slice_in_dim(lstart_b, sl, CH, axis=1)
            lc = jax.lax.dynamic_slice_in_dim(lcount_b, sl, CH, axis=1)
            src = ls[:, :, None] + off[None, None, :]
            smask = off[None, None, :] < lc[:, :, None]
            src = jnp.clip(src, 0, n - 1)
            spos = pos_box[src]
            sm = jnp.where(smask & valid_sorted[src],
                           mass_sorted[src], 0.0)
            d = _wrap(spos.reshape(spos.shape[0], -1, 3)[:, None, :, :]
                      - tgt_b[:, :, None, :])
            rr = jnp.sqrt(jnp.sum(d * d, axis=-1))
            mm = sm.reshape(sm.shape[0], -1)[:, None, :]
            ff = softened_force_factor(rr, h_inv) \
                * shortrange_force_window(rr, rs_inv) * mm
            ff = jnp.where(rr < rcut, ff, 0.0)
            acc = acc + jnp.sum(ff[..., None] * d, axis=2)
            if with_potential:
                pp = softened_pot_factor(rr, h_inv) \
                    * shortrange_pot_window(rr, rs_inv) * mm
                pp = jnp.where((rr > 0) & (rr < rcut), pp, 0.0)
                pot = pot + jnp.sum(pp, axis=2)
            return (acc, pot), None

        (acc, pot), _ = jax.lax.scan(
            leaf_chunk, (acc_b, pot_b), jnp.arange(0, LL, CH))
        return acc, pot

    B = cfg.group_batch
    nb = (ngroups + B - 1) // B
    pad = nb * B - ngroups

    def padarr(a):
        if pad == 0:
            return a.reshape((nb, B) + a.shape[1:])
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)).reshape(
            (nb, B) + a.shape[1:])

    acc_g, pot_g = jax.lax.map(
        eval_batch, (padarr(tgt), padarr(lstart), padarr(lcount),
                     padarr(acc0), padarr(pot0)))
    acc_g = acc_g.reshape(-1, G, 3)[:ngroups]
    pot_g = pot_g.reshape(-1, G)[:ngroups]

    pj = jnp.arange(n, dtype=jnp.int32)
    search_ps = jnp.where(leaf_nodes < tree.n_nodes, tps, n + 1)
    gid = jnp.clip(jnp.searchsorted(search_ps, pj, side="right") - 1,
                   0, ngroups - 1).astype(jnp.int32)
    slot = pj - tps[gid]
    covered = (slot >= 0) & (slot < jnp.minimum(tpc[gid], G))
    acc = jnp.where(covered[:, None],
                    acc_g[gid, jnp.clip(slot, 0, G - 1)], 0.0)
    pot = jnp.where(covered, pot_g[gid, jnp.clip(slot, 0, G - 1)], 0.0)
    return acc, pot
