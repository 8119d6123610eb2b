"""Vectorized Barnes-Hut traversal and force evaluation.

TPU-native replacement for the reference's treewalk engine + short-range
gravity visitor (libgadget/treewalk.c, gravshort-tree.c): instead of
per-particle recursive walks with an MPI export/import protocol, the
targets are **blocks of G consecutive Morton-sorted particles**.  Blocks
are Morton-local so their bounding boxes are tight; being fixed-size
they give 100% lane occupancy, the target gather is a reshape, and
results map back to particles by the inverse reshape (no searchsorted,
no compaction — both measured hotspots of the round-1 node-group
design).

Each block runs a stackless preorder walk over the skip-pointer tree
(descend = i+1, reject/accept = skip[i]).  Accepted multipoles are
evaluated *inside* the walk on the block's G targets (recording
interaction lists costs ~5x the walk in scatter traffic, measured on
v5e); only opened leaves (direct interactions) are recorded, and their
particle ranges are then compacted into a dense per-block source buffer
(no per-leaf padding) and evaluated as block-dense pair interactions.

Opening criteria mirror shall_we_open_node (gravshort-tree.c:221-245):
relative acceleration (mass*len^2 > r^4*aold), Barnes-Hut angle
fallback/cap, and the "inside" guard — made conservative at block level
by using the nearest distance from the block's particle bounding box
and the block-minimum aold.
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
    leaf_list_max: int = 512    # opened leaves recorded per block
    src_cap: int = 4096         # direct-source slots per block (sub-row
    #                             compacted; must be a multiple of sub)
    walk_chunk: int = 2048      # blocks per sequential walk chunk
    #                             (0 = all blocks in one vmapped loop;
    #                             inert when nb <= walk_chunk, i.e. up
    #                             to 64^3 at G=256).  Two effects at
    #                             scale: (1) a vmapped while_loop runs
    #                             every lane until the SLOWEST block
    #                             finishes — chunking bounds each chunk
    #                             by its own local max; (2) a chunk of
    #                             Morton-adjacent blocks touches a far
    #                             smaller node working set per
    #                             iteration, so the per-step node-row
    #                             gathers stay cache-resident (at 256^3
    #                             the 86MB node table no longer fits
    #                             anywhere; measured constant ~990
    #                             steps/block means the gathers are the
    #                             only thing that scales superlinearly).
    sub: int = 8                # sub-row width: leaves are padded to
    #                             ceil(count/sub)*sub aligned slots
    nleaf_frac: float = 0.15    # leaf-table capacity = frac * N + 256
    sr_frac: float = 0.16       # sub-row capacity  = frac * N + 256
    group_batch: int = 512      # blocks evaluated per map step
    chunk: int = 512            # source slots per scan chunk
    use_pallas: bool = True     # Pallas pair kernel on TPU (jnp else)
    # legacy (node-group engine in ops/pairs.py keeps its own config)
    leaf_eval_max: int = 32


def _on_tpu():
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _wrap(d):
    """Minimum-image for box-unit coordinates."""
    return d - jnp.round(d)


@partial(jax.jit, static_argnames=("group_size",))
def make_block_groups(pos_box, valid_s, amag_s, group_size):
    """Fixed-size target blocks over the Morton-sorted particle array.

    Returns (tpos f32[nb,G,3], center f32[nb,3], half f32[nb,3],
    amin f32[nb], active bool[nb]).  Invalid particles sit at the tail
    of the sort, so partially/fully invalid blocks are only at the end.
    """
    n = pos_box.shape[0]
    G = group_size
    assert n % G == 0, "particle capacity must be a multiple of group size"
    nb = n // G
    p = pos_box.reshape(nb, G, 3)
    mask = valid_s.reshape(nb, G)
    anchor = p[:, :1, :]
    rel = _wrap(p - anchor)
    rel = jnp.where(mask[:, :, None], rel, 0.0)
    lo = jnp.min(rel, axis=1)
    hi = jnp.max(rel, axis=1)
    center = anchor[:, 0, :] + 0.5 * (lo + hi)
    half = 0.5 * (hi - lo)
    am = jnp.where(mask, amag_s.reshape(nb, G), jnp.inf)
    amin = jnp.min(am, axis=1)
    amin = jnp.where(jnp.isfinite(amin), amin, 0.0)
    active = jnp.any(mask, axis=1)
    return p, center, half, amin, active


@partial(jax.jit, static_argnames=("cfg", "with_potential", "rcut",
                                   "bh_angle2", "rs_inv", "h_inv",
                                   "use_bh", "count_steps"))
def traverse_fused(tree, tpos, center, half, aold, active,
                   cfg: WalkConfig, rcut, bh_angle2, use_bh, rs_inv,
                   h_inv, with_potential=False, count_steps=False):
    """Skip-pointer walk per block with fused multipole evaluation.

    aold: ErrTolForceAcc * min |old accel| over the block, in box-unit
    force units; <= 0 means use BH opening.  Per-node data is packed
    into ONE f32 row (center, len, mass, com) + ONE i32 row
    (skip | leaf flag): two gathers per visited node.

    Returns (acc f32[nb,3,G] component-major, pot f32[nb,G], leaf_idx
    i32[nb,LL], n_leaves i32[nb], overflow bool[nb]) in box-unit force
    units.
    """
    LL = cfg.leaf_list_max
    rcut2 = rcut * rcut
    # meta (skip | leaf flag) rides in the f32 row as a bitcast lane:
    # ONE 36-byte row gather per visited node instead of two gathers
    # (each gather costs ~10 ns/row at 16.7M on v5e, independent of
    # row width)
    meta_i = tree.skip | jnp.where(tree.is_leaf, jnp.int32(-2 ** 31),
                                   jnp.int32(0))
    packed = jnp.concatenate(
        [tree.center, tree.length[:, None], tree.mass[:, None],
         tree.com, jax.lax.bitcast_convert_type(
             meta_i, jnp.float32)[:, None]], axis=1)

    def walk(tpos_b, center_b, half_b, aold_b, active_b):
        def cond(st):
            return st[0] < tree.n_nodes

        def body(st):
            i, nl, leaves, ovf, acc, pot, nst = st
            row = packed[i]
            mt = jax.lax.bitcast_convert_type(row[8], jnp.int32)
            c = row[:3]
            ln = row[3]
            m = row[4]
            com = row[5:8]
            leaf = mt < 0
            skip = mt & jnp.int32(0x7FFFFFFF)
            dc = jnp.abs(_wrap(c - center_b))
            dmin = jnp.maximum(dc - half_b - 0.5 * ln, 0.0)
            r2min = jnp.sum(dmin * dmin)
            discard = r2min > rcut2
            rel_open = m * ln * ln > r2min * r2min * aold_b
            bh_open = ln * ln > bh_angle2 * r2min
            # relative mode still opens at the max BH angle cap
            # (gravshort-tree.c:227-233)
            crit_open = jnp.where(use_bh | (aold_b <= 0),
                                  bh_open, rel_open | bh_open)
            inside = jnp.all(dc < half_b + 0.6 * ln)
            must_open = crit_open | inside | (r2min <= 0)
            use_node = (~discard) & (~must_open)
            rec_leaf = (~discard) & must_open & leaf
            descend = (~discard) & must_open & (~leaf)
            # fused multipole: node com/mass applied to all G targets.
            # Component-separate layout: (G,) rows keep G (not 3) in
            # the TPU lane dimension.
            dx = _wrap(com[0] - tpos_b[0])
            dy = _wrap(com[1] - tpos_b[1])
            dz = _wrap(com[2] - tpos_b[2])
            r = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            w = jnp.where(use_node & (r < rcut),
                          m * softened_force_factor(r, h_inv)
                          * shortrange_force_window(r, rs_inv), 0.0)
            acc = (acc[0] + w * dx, acc[1] + w * dy, acc[2] + w * dz)
            if with_potential:
                pw = jnp.where(use_node & (r < rcut),
                               m * softened_pot_factor(r, h_inv)
                               * shortrange_pot_window(r, rs_inv), 0.0)
                pot = pot + pw
            leaves = leaves.at[jnp.where(rec_leaf, nl, LL)].set(
                i, mode="drop")
            one = jnp.int32(1)
            ovf = ovf | (rec_leaf & (nl >= LL))
            nl = nl + jnp.where(rec_leaf & (nl < LL), one, jnp.int32(0))
            i = jnp.where(descend, i + one, skip).astype(jnp.int32)
            if count_steps:
                nst = nst + one
            return (i, nl, leaves, ovf, acc, pot, nst)

        G = tpos_b.shape[1]
        start = jnp.where(active_b, jnp.int32(0),
                          tree.n_nodes.astype(jnp.int32))
        zg = jnp.zeros(G, jnp.float32)
        st0 = (start, jnp.int32(0),
               jnp.full(LL, tree.capacity, jnp.int32), False,
               (zg, zg, zg), zg, jnp.int32(0))
        i, nl, leaves, ovf, acc, pot, nst = jax.lax.while_loop(
            cond, body, st0)
        if count_steps:
            return jnp.stack(acc, axis=0), pot, leaves, nl, ovf, nst
        return jnp.stack(acc, axis=0), pot, leaves, nl, ovf

    # tpos in component-major (nb, 3, G) layout
    args = (jnp.swapaxes(tpos, 1, 2), center, half, aold, active)
    walk_v = jax.vmap(walk)
    CW = cfg.walk_chunk
    nb = tpos.shape[0]
    if CW and nb > CW and nb % CW == 0:
        # sequential chunks: a vmapped while_loop runs EVERY lane until
        # the slowest block finishes, so one big vmap costs
        # nb * max_steps; chunking costs sum_c CW * max_steps(c), and
        # Morton-adjacent blocks do similar work, so each chunk max is
        # close to its mean (the measured walk-lane imbalance fix).
        resh = lambda a: a.reshape((nb // CW, CW) + a.shape[1:])
        out = jax.lax.map(lambda xs: walk_v(*xs),
                          tuple(map(resh, args)))
        return jax.tree_util.tree_map(
            lambda a: a.reshape((nb,) + a.shape[2:]), out)
    return walk_v(*args)


@partial(jax.jit, static_argnames=("nleaf_cap", "sr_cap", "sub"))
def make_leaf_sources(tree, pos_box, mass_sorted, valid_sorted,
                      nleaf_cap, sr_cap, sub=8):
    """Sub-row-padded leaf source buffers, built once per tree.

    Each leaf's particle range is padded up to a multiple of ``sub``
    aligned slots and packed as one f32 row [x*sub, y*sub, z*sub,
    m*sub] per sub-row — so a block's source fetch in
    :func:`evaluate_leaves` is a ROW gather of 16*sub-byte contiguous
    rows instead of the per-element random gather that dominated the
    round-1 profile (~4x the pair-kernel cost on v5e).  Padding slots
    carry zero mass.

    Returns (packed f32[sr_cap, 4*sub], node_first_sub i32[C],
    node_nsub i32[C], overflow).
    """
    n = pos_box.shape[0]
    C = tree.capacity
    iota_c = jnp.arange(C, dtype=jnp.int32)
    is_leaf = tree.is_leaf & (iota_c < tree.n_nodes) & (tree.pcount > 0)
    rank = jnp.cumsum(is_leaf.astype(jnp.int32)) - 1
    nleaf = jnp.sum(is_leaf.astype(jnp.int32))
    # compact leaf list by scatter (cheaper than a C-sized sort)
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
    lof = jax.lax.cummax(mark)                           # (SR,)
    srow = jnp.arange(sr_cap, dtype=jnp.int32)
    off = srow - first_sub[lof]
    sstart = tree.pstart[leaf_nodes[lof]] + sub * off
    cnt = jnp.clip(pc[lof] - sub * off, 0, sub)
    cnt = jnp.where(srow < total_sub, cnt, 0)

    idx = jnp.clip(sstart[:, None]
                   + jnp.arange(sub, dtype=jnp.int32)[None, :], 0, n - 1)
    ok = (jnp.arange(sub, dtype=jnp.int32)[None, :] < cnt[:, None])
    sm = jnp.where(ok & valid_sorted[idx], mass_sorted[idx], 0.0)
    packed = jnp.concatenate(
        [pos_box[idx, 0], pos_box[idx, 1], pos_box[idx, 2], sm],
        axis=1)                                          # (SR, 4*sub)

    # node-indexed sub-row tables for the walk's recorded leaf ids
    node_first_sub = jnp.zeros(C, jnp.int32).at[leaf_nodes].set(
        jnp.where(lok, first_sub, 0), mode="drop")
    node_nsub = jnp.zeros(C, jnp.int32).at[leaf_nodes].set(
        jnp.where(lok, n_sub, 0), mode="drop")
    return packed, node_first_sub, node_nsub, overflow


@partial(jax.jit, static_argnames=("cfg", "with_potential", "rs_inv",
                                   "h_inv", "rcut"))
def evaluate_leaves(tree, leaf_src, tpos, leaf_idx, n_leaves, acc0,
                    pot0, cfg: WalkConfig, rs_inv, h_inv, rcut,
                    with_potential=True):
    """Direct (leaf) interactions added to the fused-walk accumulators.

    The opened leaves' sub-rows (see :func:`make_leaf_sources`) are
    compacted into a dense per-block source buffer of cfg.src_cap
    slots; compaction runs at sub-row granularity (src_cap//sub
    entries) and the fetch is one row gather of packed 4*sub-f32 rows.

    leaf_src: result tuple of make_leaf_sources.
    Returns (acc f32[N,3], pot f32[N], overflow bool[nb]) in sorted
    particle order (reshape of the block results).
    """
    packed, node_first_sub, node_nsub, _ = leaf_src
    nb, G, _ = tpos.shape
    n = nb * G
    LL = cfg.leaf_list_max
    sub = cfg.sub
    S = cfg.src_cap
    assert S % sub == 0
    SS = S // sub                   # sub-row slots per block
    SR = packed.shape[0]

    safe_leaf = jnp.minimum(leaf_idx, tree.capacity - 1)
    in_list = (jnp.arange(LL)[None, :] < n_leaves[:, None]) \
        & (leaf_idx < tree.n_nodes)
    lsub = jnp.where(in_list, node_nsub[safe_leaf], 0)    # (nb, LL)
    lfirst = node_first_sub[safe_leaf]
    prefix = jnp.cumsum(lsub, axis=1) - lsub              # exclusive
    total = prefix[:, -1] + lsub[:, -1]
    overflow = total > SS

    # slot -> (leaf-list position, offset) by scatter + forward fill
    rows = jnp.arange(nb, dtype=jnp.int32)[:, None]
    dest = jnp.where(lsub > 0, jnp.minimum(prefix, SS), SS)
    mark = jnp.zeros((nb, SS), jnp.int32).at[rows, dest].max(
        jnp.broadcast_to(jnp.arange(LL, dtype=jnp.int32)[None, :],
                         (nb, LL)), mode="drop")
    lid = jax.lax.cummax(mark, axis=1)                    # (nb, SS)
    s_iota = jnp.arange(SS, dtype=jnp.int32)[None, :]
    take = jnp.take_along_axis
    srow = (take(lfirst, lid, axis=1)
            + (s_iota - take(prefix, lid, axis=1)))
    src_ok = s_iota < jnp.minimum(total, SS)[:, None]
    srow = jnp.clip(srow, 0, SR - 1)

    # ONE row gather of contiguous 16*sub-byte rows, then unpack to
    # component-separate (SoA) arrays: S stays in the lane dimension
    rows4 = packed[srow]                                  # (nb, SS, 4*sub)
    rows4 = jnp.moveaxis(
        rows4.reshape(nb, SS, 4, sub), 2, 1)              # (nb, 4, SS, sub)
    sx = rows4[:, 0].reshape(nb, S)
    sy = rows4[:, 1].reshape(nb, S)
    sz = rows4[:, 2].reshape(nb, S)
    smass = jnp.where(
        jnp.broadcast_to(src_ok[:, :, None], (nb, SS, sub)),
        rows4[:, 3], 0.0).reshape(nb, S)
    tx = tpos[:, :, 0]                                     # (nb, G)
    ty = tpos[:, :, 1]
    tz = tpos[:, :, 2]

    if cfg.use_pallas and _on_tpu():
        from .pairkernel import block_pair_accumulate
        acc_b, pot = block_pair_accumulate(
            tx, ty, tz, sx, sy, sz, smass, acc0, pot0,
            float(rs_inv), float(h_inv), float(rcut),
            chunk=cfg.chunk, with_potential=with_potential)
        acc = jnp.swapaxes(acc_b, 1, 2).reshape(n, 3)
        return acc, pot.reshape(n), overflow

    CH = min(cfg.chunk, S)
    if S % CH:
        CH = S   # avoid a clamped (overlapping) final dynamic slice

    def eval_batch(args):
        tx_b, ty_b, tz_b, sx_b, sy_b, sz_b, sm_b, acc, pot = args
        ax, ay, az = acc[:, 0], acc[:, 1], acc[:, 2]       # (B, G)

        def chunk(carry, sl):
            ax, ay, az, pot = carry
            cut = lambda a: jax.lax.dynamic_slice_in_dim(a, sl, CH, 1)
            dx = _wrap(cut(sx_b)[:, None, :] - tx_b[:, :, None])
            dy = _wrap(cut(sy_b)[:, None, :] - ty_b[:, :, None])
            dz = _wrap(cut(sz_b)[:, None, :] - tz_b[:, :, None])
            sm = cut(sm_b)[:, None, :]
            rr = jnp.sqrt(dx * dx + dy * dy + dz * dz)     # (B, G, CH)
            ff = softened_force_factor(rr, h_inv) \
                * shortrange_force_window(rr, rs_inv) * sm
            ff = jnp.where(rr < rcut, ff, 0.0)
            ax = ax + jnp.sum(ff * dx, axis=2)
            ay = ay + jnp.sum(ff * dy, axis=2)
            az = az + jnp.sum(ff * dz, axis=2)
            if with_potential:
                pp = softened_pot_factor(rr, h_inv) \
                    * shortrange_pot_window(rr, rs_inv) * sm
                pp = jnp.where((rr > 0) & (rr < rcut), pp, 0.0)
                pot = pot + jnp.sum(pp, axis=2)
            return (ax, ay, az, pot), None

        (ax, ay, az, pot), _ = jax.lax.scan(chunk, (ax, ay, az, pot),
                                            jnp.arange(0, S, CH))
        return jnp.stack([ax, ay, az], axis=1), pot

    B = min(cfg.group_batch, nb)
    nbt = (nb + B - 1) // B
    pad = nbt * B - nb

    def padarr(a):
        if pad == 0:
            return a.reshape((nbt, B) + a.shape[1:])
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)).reshape(
            (nbt, B) + a.shape[1:])

    acc_g, pot_g = jax.lax.map(
        eval_batch, (padarr(tx), padarr(ty), padarr(tz),
                     padarr(sx), padarr(sy), padarr(sz), padarr(smass),
                     padarr(acc0), padarr(pot0)))
    # acc_g: (nbt, B, 3, G) -> particle-major (n, 3)
    acc = jnp.swapaxes(acc_g.reshape(-1, 3, G)[:nb], 1, 2).reshape(n, 3)
    pot = pot_g.reshape(-1, G)[:nb].reshape(n)
    return acc, pot, overflow


@partial(jax.jit, static_argnames=("group_cap", "group_max"))
def make_target_groups(tree, pos_box, amag_sorted, group_cap, group_max):
    """Compact target-group node list + per-group bbox and min |aold|.

    Node-group variant kept for the SPH/FOF/BH pair engine
    (ops/pairs.py): group nodes are the highest tree nodes with count
    <= group_max (tree.is_group) — true octree cells, so their
    bounding boxes are tight.  Returns (group_nodes i32[group_cap] —
    node index, sentinel for padding, center f32[group_cap,3], half
    f32[group_cap,3], amin f32[group_cap], n_groups, overflow).
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
