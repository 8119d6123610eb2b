"""Small collective helpers used by the sharded (multi-chip) path.

The multi-chip design follows SURVEY §2.2: MPI alltoallv / Isend
patterns of the reference (exchange.c, petapm.c, treewalk.c) become
XLA collectives over a `jax.sharding.Mesh` axis inside `shard_map` —
`all_to_all` for the pencil-FFT transpose and the particle exchange,
neighbor shifts for ghost/halo planes, `psum` for reductions.
"""

import jax
import jax.numpy as jnp
from jax import lax


def axis_size(axis_name):
    return lax.psum(1, axis_name)


def ring_shift(x, axis_name, shift):
    """Value of ``x`` held by shard ``(i - shift) mod S``.

    ring_shift(x, n, +1) == each shard receives its LEFT neighbor's x.
    Implemented as all_gather + dynamic index: lax.ppermute currently
    miscompiles under single-process SPMD lowering in this JAX build
    ("sources and destinations must be unique" — replica groups of
    size 1), and the payloads here (halo planes / ghost strips) are
    small.  Swap to ppermute when fixed upstream.
    """
    s = lax.axis_index(axis_name).astype(jnp.int32)
    n = jnp.int32(axis_size(axis_name))
    g = lax.all_gather(x, axis_name, axis=0, tiled=False)
    idx = jax.lax.rem(s - jnp.int32(shift) + n, n)
    return lax.dynamic_index_in_dim(g, idx, axis=0, keepdims=False)
