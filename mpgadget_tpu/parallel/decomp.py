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


def exchange_to_slabs(arrays, ipos, valid, axis_name, log2_shards,
                      bucket_cap):
    """Move rows to their owning x-slab shard (domain_exchange analog).

    arrays: pytree of row arrays (n_loc leading dim) — must include
    ipos itself if it should travel.  Returns (arrays_out, valid_out,
    overflow) with the same local capacity; rows beyond capacity or
    per-bucket cap are flagged, not silently dropped.
    """
    S = axis_size(axis_name)
    n_loc = valid.shape[0]
    E = bucket_cap
    dest = jnp.where(valid, slab_of(ipos, log2_shards), 2 ** 30)
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

    send_valid = jnp.zeros(S * E, bool).at[dst_flat].set(
        ok, mode="drop")
    recv_valid = lax.all_to_all(send_valid, axis_name, 0, 0, tiled=True)
    total = jnp.sum(recv_valid.astype(jnp.int32))
    recv_overflow = total > n_loc
    order2 = jnp.argsort(~recv_valid)            # valid rows first
    keep = order2[:n_loc]
    valid_out = recv_valid[keep]

    def move(leaf):
        send = jnp.zeros((S * E,) + leaf.shape[1:], leaf.dtype)
        send = send.at[dst_flat].set(leaf[perm], mode="drop")
        recv = lax.all_to_all(send, axis_name, 0, 0, tiled=True)
        return recv[keep]

    arrays_out = jax.tree_util.tree_map(move, arrays)
    return arrays_out, valid_out, send_overflow | recv_overflow


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
    rc = jnp.uint32(min(int(rcut_box * 2.0 ** 32), 2 ** 31))
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
