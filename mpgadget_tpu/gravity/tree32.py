"""Morton-prefix octree build on uint32 key pairs, all levels at once.

Second-generation TPU build of the force tree (replaces the per-level
scatter loop in tree.py for the gravity path).  Two redesigns, both
driven by v5e profiling:

* **No 64-bit integers.**  TPUs emulate u64; keys are an (hi, lo) pair
  of uint32 words covering 16 octree levels (48 bits): ``hi`` holds
  levels 1..10 (30 bits), ``lo`` levels 11..16 (18 bits).  Sorting is
  a two-key ``lax.sort``; prefix tests are u32 shifts.

* **All levels in one shot.**  The reference builds its octree by
  pointer insertion (forcetree.c:481); tree.py round 1 looped over
  levels with per-level scatters.  Here the whole structure falls out
  of closed-form scans:

  - ``lca[i]`` = number of leading octree levels shared by sorted keys
    ``i-1`` and ``i`` (u32 xor + shift tests).  Position i starts a
    run at every level ``L > lca[i]``.
  - run bounds per (level, position) = two batched scans over a
    (levels, N) matrix — vectorized across levels, no level recursion,
    because the pruning rule "node exists iff parent count >
    leaf_max" is closed-form: counts are monotone along a root path,
    so the node levels alive at position i form one contiguous range
    [lca[i]+1, P[i]].
  - node enumeration = one cumsum of per-position node counts plus ONE
    N-row scatter of run markers; the per-node fields (count, mass,
    center-of-mass, center, flags, skip pointer) are then gathered in
    DFS order after a single (hi, lo|level) two-key sort.

Node semantics (ranges, DFS preorder, skip pointers, group marking)
are identical to tree.py, and the result is returned as the same
``Tree`` pytree so the walk code is shared.  Reference provenance:
forcetree.c:197 (force_tree_build), forcetree.h:29-66 (node layout).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .tree import Tree, _range_sum_maker

MAX_LEVEL32 = 16


def _spread10(x):
    """Spread the low 10 bits: b9..b0 -> b9 0 0 b8 ... 0 0 b0 (uint32)."""
    x = x.astype(jnp.uint32) & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def morton_key32(ipos):
    """(hi, lo) uint32 Morton words from fixed-point positions [N,3].

    hi = levels 1..10 (top 30 bits of the 48-bit key), lo = levels
    11..16 (18 bits).  Equivalent to the top 48 bits of
    ops.morton.morton_key up to the per-level grouping.
    """
    c = [(ipos[:, a] >> jnp.uint32(16)).astype(jnp.uint32) for a in range(3)]
    hi = ((_spread10(c[0] >> jnp.uint32(6)) << jnp.uint32(2))
          | (_spread10(c[1] >> jnp.uint32(6)) << jnp.uint32(1))
          | _spread10(c[2] >> jnp.uint32(6)))
    lo = ((_spread10(c[0] & jnp.uint32(63)) << jnp.uint32(2))
          | (_spread10(c[1] & jnp.uint32(63)) << jnp.uint32(1))
          | _spread10(c[2] & jnp.uint32(63)))
    return hi, lo


KEY_INVALID_HI = jnp.uint32(0xFFFFFFFF)  # sorts after every real key


def sort_by_morton32(ipos, valid):
    """Morton sort on the (hi, lo) pair; invalid rows sink to the end.

    Returns (hi_s, lo_s, perm).
    """
    hi, lo = morton_key32(ipos)
    hi = jnp.where(valid, hi, KEY_INVALID_HI)
    lo = jnp.where(valid, lo, jnp.uint32(0xFFFFFFFF))
    n = hi.shape[0]
    hi_s, lo_s, perm = jax.lax.sort(
        (hi, lo, jnp.arange(n, dtype=jnp.int32)), num_keys=2)
    return hi_s, lo_s, perm


def sort_by_morton32_payload(ipos, valid, payload):
    """Morton sort carrying payload columns through the sort itself.

    A multi-operand ``lax.sort`` costs ~10 ms per extra 16.7M column on
    v5e, while a post-sort ``a[perm]`` gather costs ~175 ms — so large-N
    callers pass every per-particle field as payload instead of
    permuting (measured 0.6 s -> 0.2 s at 256^3).

    Returns (hi_s, lo_s, perm, ipos_s, valid_s, payload_s).
    """
    hi, lo = morton_key32(ipos)
    hi = jnp.where(valid, hi, KEY_INVALID_HI)
    lo = jnp.where(valid, lo, jnp.uint32(0xFFFFFFFF))
    n = hi.shape[0]
    ops = (hi, lo, jnp.arange(n, dtype=jnp.int32),
           ipos[:, 0], ipos[:, 1], ipos[:, 2],
           valid.astype(jnp.uint8)) + tuple(payload)
    out = jax.lax.sort(ops, num_keys=2)
    hi_s, lo_s, perm = out[0], out[1], out[2]
    ipos_s = jnp.stack(out[3:6], axis=1)
    valid_s = out[6].astype(bool)
    return hi_s, lo_s, perm, ipos_s, valid_s, out[7:]


def _lca_levels(hi, lo, max_level):
    """lca[i] = #levels shared by keys i-1 and i (lca[0] = 0)."""
    xh = hi ^ jnp.roll(hi, 1)
    xl = lo ^ jnp.roll(lo, 1)
    agree = jnp.zeros(hi.shape, jnp.int32)
    for L in range(1, min(max_level, 10) + 1):
        agree += (xh >> jnp.uint32(30 - 3 * L) == 0).astype(jnp.int32)
    if max_level > 10:
        hi_same = xh == 0
        for L in range(11, max_level + 1):
            agree += (hi_same
                      & (xl >> jnp.uint32(48 - 3 * L) == 0)).astype(
                          jnp.int32)
    return agree.at[0].set(0)


def _run_bounds_batched(flags):
    """(L, N) run-start flags -> per-position (start, end) along axis 1."""
    L, n = flags.shape
    iota = jnp.arange(n, dtype=jnp.int32)[None, :]
    starts = jax.lax.cummax(jnp.where(flags, iota, 0), axis=1)
    nxt = jnp.where(flags, iota, n)
    nxt = jnp.concatenate([nxt[:, 1:], jnp.full((L, 1), n, jnp.int32)],
                          axis=1)
    ends = jnp.flip(jax.lax.cummin(jnp.flip(nxt, 1), axis=1), 1)
    return starts, ends


@partial(jax.jit, static_argnames=("leaf_max", "group_max", "max_level",
                                   "capacity"))
def build_tree32(hi, lo, ipos_s, mass_s, valid_s, leaf_max, max_level,
                 capacity, group_max=64):
    """Build the octree from SORTED (hi, lo) Morton words.

    Same contract as tree.build_tree (invalid rows must be key-maxed and
    sorted to the tail, mass zeroed for invalid) but on u32 key pairs.
    """
    assert max_level <= MAX_LEVEL32
    n = hi.shape[0]
    C = capacity
    NL = max_level  # levels 1..NL as rows 0..NL-1
    mass = jnp.where(valid_s, mass_s, 0.0)
    pos_box = ipos_s.astype(jnp.float32) * jnp.float32(2.0 ** -32)
    # one fused [N,4] prefix table: the (start, end) lookups become two
    # 16-byte row gathers instead of eight scalar-gather passes
    m4_sum = _range_sum_maker(
        jnp.concatenate([mass[:, None], mass[:, None] * pos_box],
                        axis=1))
    nvalid = jnp.sum(valid_s.astype(jnp.int32))

    lca = _lca_levels(hi, lo, max_level)                    # (N,)
    levels = jnp.arange(1, NL + 1, dtype=jnp.int32)[:, None]
    flags = lca[None, :] < levels                           # (NL, N)
    starts, ends = _run_bounds_batched(flags)
    ends = jnp.minimum(ends, nvalid)                        # clamp to valid
    counts = ends - starts                                  # (NL, N)

    # contiguous alive-level range per position: [lca+1, P]
    internal = counts > leaf_max
    P = jnp.where(nvalid > leaf_max,
                  1 + jnp.sum(internal[:NL - 1].astype(jnp.int32), axis=0),
                  0)                                        # (N,)
    base = lca + 1
    n_i = jnp.clip(jnp.minimum(P, NL) - base + 1, 0)
    n_i = jnp.where(jnp.arange(n) < nvalid, n_i, 0)

    offs = jnp.cumsum(n_i) - n_i                            # exclusive
    total = jnp.int32(offs[-1] + n_i[-1] + 1)               # +1 root
    overflow = total > C

    # one N-row scatter of run markers; forward-fill recovers the rest
    dest = jnp.where(n_i > 0, 1 + offs, C).astype(jnp.int32)
    pos_of = jnp.full(C, 0, jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    drow = jnp.zeros(C, jnp.int32).at[dest].set(dest, mode="drop")
    pos_of = jax.lax.cummax(pos_of)
    drow = jax.lax.cummax(drow)
    row = jnp.arange(C, dtype=jnp.int32)
    level = jnp.where(row == 0, 0, base[pos_of] + (row - drow))
    pstart = jnp.where(row == 0, 0, pos_of)
    in_use = row < total
    level = jnp.where(in_use, level, 0)

    # node key prefix at its level (hi covers 1..10, lo 11..16)
    sh_hi = jnp.uint32(jnp.clip(30 - 3 * level, 0, 31))
    khi = jnp.where(level > 0, (hi[pstart] >> sh_hi) << sh_hi,
                    jnp.uint32(0))
    sh_lo = jnp.uint32(jnp.clip(48 - 3 * level, 0, 18))
    klo = jnp.where(level > 10,
                    (lo[pstart] >> sh_lo) << sh_lo, jnp.uint32(0))
    khi = jnp.where(in_use, khi, jnp.uint32(0xFFFFFFFF))
    klo_lev = jnp.where(in_use, (klo << jnp.uint32(5))
                        | level.astype(jnp.uint32),
                        jnp.uint32(0xFFFFFFFF))

    khi, klo_lev, pstart, crow = jax.lax.sort(
        (khi, klo_lev, pstart, row), num_keys=2)
    row_ok = row < total
    level = jnp.where(row_ok, (klo_lev & jnp.uint32(31)).astype(jnp.int32),
                      0)
    pstart = jnp.where(row_ok, pstart, n)

    # per-node fields, gathered in DFS order
    flat = jnp.clip(level - 1, 0, NL - 1) * n + jnp.clip(pstart, 0, n - 1)
    end_n = jnp.where(level > 0, ends.ravel()[flat], nvalid)
    end_n = jnp.where(row_ok, end_n, n)
    pcount = jnp.maximum(end_n - pstart, 0)
    flatp = jnp.clip(level - 2, 0, NL - 1) * n + jnp.clip(pstart, 0, n - 1)
    parent_cnt = jnp.where(level > 1, counts.ravel()[flatp], nvalid + 1)
    # root's "parent" count = nvalid+1 > group_max guarantees marking

    s4 = m4_sum(pstart, end_n)
    nm = s4[:, 0]
    com = s4[:, 1:4] / jnp.maximum(nm, 1e-30)[:, None]
    side = jnp.exp2(-level.astype(jnp.float32))
    shift = jnp.uint32(jnp.clip(32 - level, 0, 31))
    cell = (ipos_s[jnp.clip(pstart, 0, n - 1)]
            >> shift[:, None]).astype(jnp.float32)
    cell = jnp.where((level > 0)[:, None], cell, 0.0)
    center = (cell + 0.5) * side[:, None]
    com = jnp.where(nm[:, None] > 0, com, center)

    is_leaf = ((pcount <= leaf_max) | (level == max_level)) & row_ok
    is_group = (((pcount <= group_max) | (level == max_level))
                & (parent_cnt > group_max)) & row_ok

    # skip pointer in O(1): in DFS preorder the node after subtree
    # (s, L) is the SHALLOWEST node starting at particle e = s+count,
    # whose construction row is 1 + offs[e] — no binary search (a
    # 5.9M-node searchsorted costs ~23 gather rounds ~ 1.4 s on v5e).
    # Map construction rows -> sorted rows through the carried crow.
    new_of_old = jnp.zeros(C, jnp.int32).at[crow].set(
        row, mode="promise_in_bounds", unique_indices=True)
    e = pstart + pcount
    e_safe = jnp.clip(e, 0, n - 1)
    erow_old = jnp.clip(1 + offs[e_safe], 0, C - 1).astype(jnp.int32)
    skip = jnp.where((e < nvalid) & row_ok,
                     new_of_old[erow_old], total).astype(jnp.int32)
    skip = jnp.minimum(skip, total)

    return Tree(key_start=khi, level=level, pstart=pstart, pcount=pcount,
                mass=jnp.where(row_ok, nm, 0.0), com=com, center=center,
                length=side, is_leaf=is_leaf, is_group=is_group,
                skip=skip, n_nodes=total, overflow=overflow)
