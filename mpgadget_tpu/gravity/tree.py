"""Sparse Morton-prefix octree over sorted particles.

TPU-native redesign of the reference's pointer-based threaded octree
(libgadget/forcetree.c): because particles are kept Morton-sorted, every
octree node is a *contiguous particle range*, so the tree is built
bottom-up with scans (cumulative sums / min / max) instead of pointer
insertion:

* a node at level L exists wherever the 3L-bit key prefix changes,
  pruned below leaves (parent count <= LEAF_MAX);
* node moments (mass, center of mass) are prefix-sum differences over
  the sorted particle arrays — no scatter in the hot path;
* nodes are stored in depth-first (preorder) order — obtained by sorting
  (key_start, level) — so traversal is stackless: "descend" is i+1,
  "skip subtree" is a precomputed skip pointer
  (skip[i] = first node with key_start >= key_end[i]).

The reference's sibling/father links and NextNode threading
(forcetree.h:29-66) collapse into this single skip array.
"""

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.morton import morton_key, MORTON_BITS

KEY_BITS = 3 * MORTON_BITS  # 63


@dataclass(frozen=True)
class TreeConfig:
    leaf_max: int = 32       # make a leaf when count <= this
    group_max: int = 256     # target-block size for the treewalk
    #                          (v5e sweep: 256 beats 128/512 by ~20%)
    max_level: int = 15      # deepest split level (<= MORTON_BITS)
    node_factor: float = 0.35  # node capacity = factor * N + 64
    #                            (uniform boxes use ~0.14N; overflow
    #                            retry doubles toward 2.0)


@jax.tree_util.register_pytree_node_class
@dataclass
class Tree:
    """Fixed-capacity node arrays in DFS preorder."""
    key_start: jnp.ndarray   # uint64[C] Morton range start (63-bit space)
    level: jnp.ndarray       # int32[C]
    pstart: jnp.ndarray      # int32[C] first particle (sorted order)
    pcount: jnp.ndarray      # int32[C]
    mass: jnp.ndarray        # f32[C]
    com: jnp.ndarray         # f32[C,3] box units [0,1)
    center: jnp.ndarray      # f32[C,3] geometric cell center, box units
    length: jnp.ndarray      # f32[C] cell side, box units
    is_leaf: jnp.ndarray     # bool[C]
    is_group: jnp.ndarray    # bool[C]: treewalk target group node
    skip: jnp.ndarray        # int32[C] DFS skip pointer
    n_nodes: jnp.ndarray     # int32 scalar
    overflow: jnp.ndarray    # bool scalar: capacity exceeded

    def tree_flatten(self):
        fields = (self.key_start, self.level, self.pstart, self.pcount,
                  self.mass, self.com, self.center, self.length,
                  self.is_leaf, self.is_group, self.skip, self.n_nodes,
                  self.overflow)
        return fields, None

    @classmethod
    def tree_unflatten(cls, aux, fields):
        return cls(*fields)

    @property
    def capacity(self):
        return self.key_start.shape[0]


def _range_sum_maker(x, chunk=4096):
    """Two-level prefix sums for range-sum queries with N-independent
    error: f32 cumsum within chunks + exact f64 chunk offsets.

    A plain f32 cumsum-diff loses ~N*eps absolute accuracy (fatal for
    small nodes at N ~ 1e8); here the error is bounded by ~chunk*eps of
    the local magnitude.  Returns range_sum(starts, ends) -> f32 sums of
    x[starts:ends] (x may be [N] or [N,k])."""
    n = x.shape[0]
    nc = (n + chunk - 1) // chunk
    pad = nc * chunk - n
    if pad:
        x = jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
    xc = x.reshape((nc, chunk) + x.shape[1:])
    inner_incl = jnp.cumsum(xc, axis=1)
    chunk_tot = jnp.sum(xc.astype(jnp.float64), axis=1)
    off = jnp.concatenate([
        jnp.zeros((1,) + chunk_tot.shape[1:], jnp.float64),
        jnp.cumsum(chunk_tot, axis=0)])
    inner_excl = (inner_incl - xc).reshape((nc * chunk,) + x.shape[1:])

    def prefix(i):
        """Exclusive prefix S(i) as (chunk_offset f64, inner f32)."""
        c = i // chunk
        r = i % chunk
        inner = inner_excl[jnp.clip(i, 0, nc * chunk - 1)]
        inner = jnp.where(
            (r == 0)[(...,) + (None,) * (x.ndim - 1)]
            if x.ndim > 1 else (r == 0), 0.0, inner)
        return off[c], inner

    def range_sum(starts, ends):
        off_s, in_s = prefix(starts)
        off_e, in_e = prefix(ends)
        return (off_e - off_s).astype(jnp.float32) + (in_e - in_s)

    return range_sum


def _run_bounds(flags):
    """For boolean run-start flags over a sorted array, return for every
    element the (start, end) indices of its run. Scan-based, no scatter."""
    n = flags.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    starts = jax.lax.cummax(jnp.where(flags, iota, 0))
    # run end = next run's start; reverse cummin of next-start markers
    nxt = jnp.where(flags, iota, n)
    ends = jnp.flip(jax.lax.cummin(jnp.flip(
        jnp.concatenate([nxt[1:], jnp.array([n], jnp.int32)]))))
    return starts, ends


@partial(jax.jit, static_argnames=("leaf_max", "group_max", "max_level",
                                   "capacity"))
def build_tree(keys, ipos, mass, valid, leaf_max, max_level, capacity,
               group_max=64):
    """Build the octree from SORTED Morton keys.

    keys: uint64[N] sorted (invalid particles must hold key ~0 i.e. all
    ones so they cluster at the end); ipos: uint32[N,3] fixed-point
    positions in the same sorted order; mass zeroed for invalid
    particles.  All geometry is in box units [0,1).
    """
    n = keys.shape[0]
    pos_box = ipos.astype(jnp.float32) * jnp.float32(2.0 ** -32)
    mass = jnp.where(valid, mass, 0.0)
    mass_sum = _range_sum_maker(mass)
    mpos_sum = _range_sum_maker(mass[:, None] * pos_box)
    nvalid = jnp.sum(valid.astype(jnp.int32))

    C = capacity
    key_start_g = jnp.full(C, ~jnp.uint64(0))
    fdata = jnp.zeros((C, 8), jnp.float32)   # mass com3 center3 length
    idata = jnp.zeros((C, 4), jnp.int32)     # level pstart pcount flags
    offset = jnp.int32(0)
    parent_internal = jnp.ones(n, bool)  # root is internal
    parent_small = jnp.zeros(n, bool)    # parent count <= group_max
    iota = jnp.arange(n, dtype=jnp.int32)

    for lev in range(0, max_level + 1):
        shift = np.uint64(3 * (MORTON_BITS - lev))
        prefix = keys >> shift
        if lev == 0:
            flags = iota == 0
        else:
            flags = jnp.concatenate([
                jnp.ones(1, bool), prefix[1:] != prefix[:-1]])
        starts, ends = _run_bounds(flags)
        count = ends - starts
        # candidate nodes: run starts, within the valid-particle range,
        # whose parent was internal
        cand = flags & (iota < nvalid) & parent_internal
        node_count = count
        node_is_leaf = (node_count <= leaf_max) | (lev == max_level)
        # target group: first node on the root path with count<=group_max
        node_is_group = ((node_count <= group_max) | (lev == max_level)) \
            & ~parent_small[starts]
        # compact into the global arrays: position = offset + rank
        rank = jnp.cumsum(cand.astype(jnp.int32)) - 1
        dest = jnp.where(cand, offset + rank, C)  # C = dropped
        nm = mass_sum(starts, ends)
        com = mpos_sum(starts, ends) / jnp.maximum(nm, 1e-30)[:, None]
        # geometric cell center: exact from the run-start particle's
        # integer position (it lies inside the cell by construction)
        side = jnp.float32(1.0 / (1 << lev))
        cell = (ipos[starts] >> jnp.uint32(32 - lev)).astype(jnp.float32) \
            if lev > 0 else jnp.zeros((n, 3), jnp.float32)
        center = (cell + 0.5) * side
        com = jnp.where(nm[:, None] > 0, com, center)

        frow = jnp.concatenate(
            [nm[:, None], com, center,
             jnp.full((n, 1), side, jnp.float32)], axis=1)
        irow = jnp.stack(
            [jnp.full(n, lev, jnp.int32), starts, node_count,
             node_is_leaf.astype(jnp.int32)
             + 2 * (node_is_group & cand).astype(jnp.int32)], axis=1)
        key_start_g = key_start_g.at[dest].set(prefix << shift,
                                               mode="drop")
        fdata = fdata.at[dest].set(frow, mode="drop")
        idata = idata.at[dest].set(irow, mode="drop")
        offset = offset + jnp.sum(cand.astype(jnp.int32))
        # children exist only under internal nodes
        parent_internal = _broadcast_from_start(
            jnp.where(cand, ~node_is_leaf, False), flags)
        parent_small = _broadcast_from_start(
            jnp.where(flags, parent_small[starts]
                      | (count <= group_max), False), flags)

    n_nodes = offset
    overflow = n_nodes > C

    # DFS preorder: sort by (key_start, level); padding (key ~0) sinks
    ks, lv, perm = jax.lax.sort(
        (key_start_g, idata[:, 0], jnp.arange(C, dtype=jnp.int32)),
        num_keys=2)
    fdata = fdata[perm]
    idata = idata[perm]
    out = dict(
        key_start=ks, level=idata[:, 0], pstart=idata[:, 1],
        pcount=idata[:, 2], mass=fdata[:, 0], com=fdata[:, 1:4],
        center=fdata[:, 4:7], length=fdata[:, 7],
        is_leaf=(idata[:, 3] & 1) > 0, is_group=(idata[:, 3] & 2) > 0)

    # skip pointer: first node with key_start >= my key_end
    span = (jnp.uint64(1)
            << (jnp.uint64(3) * (MORTON_BITS - out["level"]).astype(
                jnp.uint64)))
    key_end = out["key_start"] + span
    skip = jnp.searchsorted(out["key_start"], key_end,
                            side="left").astype(jnp.int32)
    skip = jnp.minimum(skip, n_nodes)

    return Tree(key_start=out["key_start"], level=out["level"],
                pstart=out["pstart"], pcount=out["pcount"],
                mass=out["mass"], com=out["com"], center=out["center"],
                length=out["length"], is_leaf=out["is_leaf"],
                is_group=out["is_group"], skip=skip,
                n_nodes=n_nodes, overflow=overflow)


def _broadcast_from_start(value_at_start, flags):
    """Propagate a value set at run-start positions to the whole run
    (forward fill along the sorted axis)."""
    iota = jnp.arange(flags.shape[0], dtype=jnp.int32)
    start_idx = jax.lax.cummax(jnp.where(flags, iota, 0))
    return value_at_start[start_idx]


def sort_by_morton(ipos, *arrays):
    """Sort particle arrays by Morton key; returns (keys_sorted, perm,
    sorted_arrays...). Invalid-particle handling is the caller's job
    (set their keys to ~0 before calling if needed)."""
    keys = morton_key(ipos)
    perm = jnp.argsort(keys)
    return keys[perm], perm, tuple(a[perm] for a in arrays)
