"""Slab domain decomposition, particle exchange and ghost strips.

TPU-native analog of the reference's domain/exchange machinery
(libgadget/domain.c, exchange.c:105-191): the box is split into S
x-slabs over the device-mesh axis; each shard owns the particles whose
x coordinate falls in its slab.  The adaptive Peano top-tree with
work balancing becomes a fixed geometric split (particle capacities
absorb imbalance; a count-balanced split via sampled splitters can be
layered on later), and the iterated alltoallv of particle structs
becomes ONE fixed-capacity `lax.all_to_all` per field with masked
rows as garbage (slots "GC" = the compaction sort).

Ghost strips replace the treewalk export/import protocol
(treewalk.c:325-902): because the short-range force is cut off at
rcut << slab width, a shard needs only the neighbor particles within
rcut of its slab faces.  Those strips are exchanged wholesale and
appended to the local arrays as source-only rows — the reference's
"pseudo particle" concept (forcetree.h:69-74) with the topology made
trivial by the slab cut.

Everything here runs inside shard_map over a 1-D mesh axis.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .collectives import axis_size, ring_shift


def slab_of(ipos, log2_shards):
    """Owning shard of each particle: top bits of the x coordinate."""
    return (ipos[:, 0] >> jnp.uint32(32 - log2_shards)).astype(jnp.int32)


def owner_of(ipos, boundaries):
    """Owning shard under arbitrary slab boundaries (uint32[S] left
    edges, ascending, boundaries[0] == 0) — the count-balanced
    domain_decompose analog (domain.c:106)."""
    return (jnp.searchsorted(boundaries, ipos[:, 0], side="right")
            - 1).astype(jnp.int32)


def count_histogram(ipos, valid, axis_name, bits=12):
    """Global histogram of the top ``bits`` of x (psum over shards);
    the host turns this into count-balanced splitters."""
    idx = (ipos[:, 0] >> jnp.uint32(32 - bits)).astype(jnp.int32)
    h = jnp.zeros(1 << bits, jnp.int32).at[
        jnp.where(valid, idx, 1 << bits)].add(1, mode="drop")
    return lax.psum(h, axis_name)


def balanced_boundaries(hist, n_shards):
    """Count-balanced left edges from a global x histogram (host-side
    numpy).  Splits at histogram-bin granularity so each slab holds
    ~total/S particles (sampled-splitter analog of the reference's
    cost-balanced topleaf assignment, domain.c:145-257)."""
    hist = np.asarray(hist, np.int64)
    bits = int(np.log2(hist.shape[0]))
    csum = np.cumsum(hist)
    total = int(csum[-1])
    targets = np.arange(n_shards, dtype=np.float64) * total / n_shards
    idx = np.searchsorted(csum, targets, side="left")
    b = (idx.astype(np.uint64) << (32 - bits)).astype(np.uint32)
    b[0] = 0
    # ensure strictly increasing (degenerate empty slabs collapse onto
    # the next bin edge; owner_of still routes consistently)
    for s in range(1, n_shards):
        if b[s] <= b[s - 1]:
            b[s] = b[s - 1] + 1
    return b


def exchange_by_dest(arrays, dest, valid, axis_name, bucket_cap):
    """Route rows to the shard named by ``dest`` (i32[n_loc], 0..S-1)
    through ONE fixed-capacity ``lax.all_to_all`` per field — the core
    of the alltoallv struct exchange (exchange.c:105-191) shared by the
    domain exchange and the distributed sort.

    Returns (arrays_out, valid_out, overflow) with the same local
    capacity; rows beyond capacity or per-bucket cap are flagged, not
    silently dropped."""
    S = axis_size(axis_name)
    n_loc = valid.shape[0]
    E = bucket_cap
    dest = jnp.where(valid, dest, 2 ** 30)
    perm = jnp.argsort(dest)                     # stable
    dest_s = dest[perm]
    iota = jnp.arange(n_loc, dtype=jnp.int32)
    # first sorted index of each row's own dest bucket
    row_off = jnp.searchsorted(dest_s, dest_s, side="left").astype(
        jnp.int32)
    slot = iota - row_off
    ok = (dest_s < 2 ** 30) & (slot < E)
    send_overflow = jnp.any((dest_s < 2 ** 30) & (slot >= E))
    dst_flat = jnp.where(ok, dest_s * E + slot, S * E)

    # receive capacity: S*E slots arrive; the output must keep EXACTLY
    # n_loc rows (the caller's fixed local capacity).  When S*E < n_loc
    # (small meshes / small bucket caps) pad the receive side so
    # ``order2[:n_loc]`` cannot silently SHRINK the arrays — shrinking
    # produced a trace-time shape error at S<=2 and would otherwise
    # drop rows.
    n_rx_pad = max(0, n_loc - S * E)
    send_valid = jnp.zeros(S * E, bool).at[dst_flat].set(
        ok, mode="drop")
    recv_valid = lax.all_to_all(send_valid, axis_name, 0, 0, tiled=True)
    if n_rx_pad:
        recv_valid = jnp.concatenate(
            [recv_valid, jnp.zeros(n_rx_pad, bool)])
    total = jnp.sum(recv_valid.astype(jnp.int32))
    recv_overflow = total > n_loc
    order2 = jnp.argsort(~recv_valid)            # valid rows first
    keep = order2[:n_loc]
    valid_out = recv_valid[keep]

    def move(leaf):
        send = jnp.zeros((S * E,) + leaf.shape[1:], leaf.dtype)
        send = send.at[dst_flat].set(leaf[perm], mode="drop")
        recv = lax.all_to_all(send, axis_name, 0, 0, tiled=True)
        if n_rx_pad:
            recv = jnp.concatenate(
                [recv, jnp.zeros((n_rx_pad,) + leaf.shape[1:],
                                 leaf.dtype)])
        return recv[keep]

    arrays_out = jax.tree_util.tree_map(move, arrays)
    return arrays_out, valid_out, send_overflow | recv_overflow


def exchange_to_slabs(arrays, ipos, valid, axis_name, log2_shards,
                      bucket_cap, boundaries=None):
    """Move rows to their owning x-slab shard (domain_exchange analog).

    arrays: pytree of row arrays (n_loc leading dim) — must include
    ipos itself if it should travel.

    boundaries: optional uint32[S] left edges for count-balanced
    ownership; defaults to the fixed geometric split.
    """
    own = (owner_of(ipos, boundaries) if boundaries is not None
           else slab_of(ipos, log2_shards))
    return exchange_by_dest(arrays, own, valid, axis_name, bucket_cap)


def geometric_boundaries(log2_shards):
    """uint32[S] left edges of the fixed geometric x-slab split."""
    S = 1 << log2_shards
    return jnp.arange(S, dtype=jnp.uint32) * jnp.uint32(2 ** 32 // S)


def interval_dist_u32(x, lo, hi):
    """Circular uint32 distance from x to the interval [lo, hi).

    0 when inside; otherwise the shorter wrap-around distance to
    either edge.  All arguments uint32; arithmetic wraps mod 2^32."""
    length = hi - lo
    off = x - lo
    inside = off < length
    d_before = jnp.uint32(0) - off        # lo - x, wrapped
    d_after = off - length                # x - hi, wrapped
    return jnp.where(inside, jnp.uint32(0),
                     jnp.minimum(d_before, d_after))


def ghost_strips_multi(arrays, ipos, valid, axis_name, boundaries,
                       width_box, ghost_cap, hops):
    """K-hop ghost exchange over arbitrary slab boundaries.

    The reference's treewalk exports reach ANY rank (treewalk.c:325);
    the round-2 single-hop constraint (slab width > strip width) is
    lifted by exchanging with ring neighbors up to ``hops`` away: shard
    j sends, for each k in 1..hops and each direction, the rows within
    ``width_box`` of shard (j±k)'s interval.

    boundaries: uint32[S] replicated left edges, interval s =
    [boundaries[s], boundaries[(s+1) % S]) on the x ring — supports
    count-balanced (non-geometric) splits (domain.c:106 analog).
    Returns (ghosts pytree with <= 2*hops*ghost_cap rows, gvalid,
    overflow).  hops must satisfy: the union of the 2*hops ring
    neighbors' intervals covers every point within width_box of the
    local interval (the caller sizes hops from the minimum slab
    width).
    """
    S = axis_size(axis_name)
    s = lax.axis_index(axis_name)
    w = (jnp.minimum(jnp.asarray(width_box, jnp.float64) * (2.0 ** 32),
                     2.0 ** 31).astype(jnp.uint32)
         if isinstance(width_box, jnp.ndarray)
         else jnp.uint32(min(int(float(width_box) * 2.0 ** 32),
                             2 ** 31)))
    x = ipos[:, 0]

    def pack_for(tgt):
        lo = boundaries[tgt]
        hi = boundaries[(tgt + 1) % S]
        d = interval_dist_u32(x, lo, hi)
        mask = valid & (d < w) & (d > 0)
        order = jnp.argsort(~mask)
        keep = order[:ghost_cap]
        ovf = jnp.sum(mask.astype(jnp.int32)) > ghost_cap
        sel = jax.tree_util.tree_map(lambda a: a[keep], arrays)
        return sel, mask[keep], ovf

    parts, oks, ovf = [], [], False
    for k in range(1, hops + 1):
        signs = (+1, -1) if (2 * k) % S != 0 else (+1,)
        for sign in signs:
            tgt = jax.lax.rem(s + jnp.int32(sign * k)
                              + jnp.int32(S), jnp.int32(S))
            sel, ok, o = pack_for(tgt)
            # ring_shift(+k): I receive from shard s-k, which packed
            # rows for (s-k)+k = me.
            parts.append(jax.tree_util.tree_map(
                lambda a: ring_shift(a, axis_name, sign * k), sel))
            oks.append(ring_shift(ok, axis_name, sign * k))
            ovf = ovf | o
    ghosts = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *parts)
    gvalid = jnp.concatenate(oks)
    return ghosts, gvalid, ovf


def ghost_strips(arrays, ipos, valid, axis_name, log2_shards,
                 rcut_box, ghost_cap):
    """Source-only ghost rows from both slab neighbors.

    Returns (ghost_arrays pytree with 2*ghost_cap rows, ghost_valid,
    overflow).  Requires slab width > rcut_box (asserted by caller —
    the round-2 single-hop constraint; deeper meshes need multi-hop
    strips).
    """
    S = axis_size(axis_name)
    s = lax.axis_index(axis_name)
    step = jnp.uint32(2 ** 32 // (1 << log2_shards))
    # strip width may be traced (e.g. the SPH hmax-dependent width)
    rc = jnp.minimum(
        jnp.asarray(rcut_box, jnp.float64) * (2.0 ** 32),
        2.0 ** 31).astype(jnp.uint32) \
        if isinstance(rcut_box, jnp.ndarray) else \
        jnp.uint32(min(int(rcut_box * 2.0 ** 32), 2 ** 31))
    x = ipos[:, 0]
    right_edge = (s + 1).astype(jnp.uint32) * step   # wraps for last
    left_edge = s.astype(jnp.uint32) * step
    in_right = valid & (x >= right_edge - rc)
    in_left = valid & (x < left_edge + rc)

    def pack(mask):
        order = jnp.argsort(~mask)
        keep = order[:ghost_cap]
        ovf = jnp.sum(mask.astype(jnp.int32)) > ghost_cap
        sel = jax.tree_util.tree_map(lambda a: a[keep], arrays)
        return sel, mask[keep], ovf

    right_sel, right_ok, ovf_r = pack(in_right)
    left_sel, left_ok, ovf_l = pack(in_left)
    # my right strip becomes my RIGHT neighbor's left-ghosts, i.e. I
    # receive ghosts from my left neighbor's right strip.
    from_left = jax.tree_util.tree_map(
        lambda a: ring_shift(a, axis_name, +1), right_sel)
    ok_from_left = ring_shift(right_ok, axis_name, +1)
    from_right = jax.tree_util.tree_map(
        lambda a: ring_shift(a, axis_name, -1), left_sel)
    ok_from_right = ring_shift(left_ok, axis_name, -1)

    ghosts = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=0),
        from_left, from_right)
    gvalid = jnp.concatenate([ok_from_left, ok_from_right])
    return ghosts, gvalid, ovf_r | ovf_l
