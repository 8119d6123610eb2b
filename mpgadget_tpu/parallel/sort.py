"""Distributed sort over the device-mesh axis (the mpsort analog).

TPU-native replacement for the reference's vendored massively-parallel
histogram sort (depends/mpsort, used by FOF group ordering and
snapshot-IO layout, fof.c / petaio.c): sampled splitters + one
fixed-capacity ``lax.all_to_all`` bucket exchange + a local sort.

After ``sharded_sort`` every key on shard s is <= every key on shard
s+1 and each shard's valid rows are locally sorted and compacted to
the front — i.e. the concatenation over shards is the globally sorted
sequence.  Balance is approximate (sampled splitters; the bucket_cap
headroom absorbs the sampling error) and overflow is reported, not
dropped — the caller retries with a bigger cap, like every other
capacity in the sharded stack.

Runs inside shard_map over a 1-D mesh axis.
"""

import jax
import jax.numpy as jnp
from jax import lax

from .collectives import axis_size
from .decomp import exchange_by_dest


def _sort_key(keys, valid):
    """Keys with invalid rows forced to the maximum (sort to tail)."""
    maxval = jnp.array(jnp.iinfo(keys.dtype).max, keys.dtype) \
        if jnp.issubdtype(keys.dtype, jnp.integer) \
        else jnp.array(jnp.inf, keys.dtype)
    return jnp.where(valid, keys, maxval)


def global_splitters(keys, valid, axis_name, n_samples=64):
    """S-1 replicated splitter keys from per-shard quantile samples
    (the histogram-refinement step of mpsort, collapsed to one round:
    n_samples per shard bounds the balance error by ~1/n_samples)."""
    S = axis_size(axis_name)
    n_loc = keys.shape[0]
    ks = jnp.sort(_sort_key(keys, valid))
    nv = jnp.sum(valid.astype(jnp.int32))
    # quantile positions over the VALID prefix of the local sort
    q = (jnp.arange(n_samples, dtype=jnp.int32) * nv) // n_samples
    samples = ks[jnp.clip(q, 0, n_loc - 1)]
    # weight empty shards out by pushing their samples to the max
    samples = jnp.where(nv > 0, samples, _sort_key(samples,
                                                   jnp.zeros((), bool)))
    allsamp = jnp.sort(lax.all_gather(samples, axis_name).reshape(-1))
    total = S * n_samples
    pos = (jnp.arange(1, S, dtype=jnp.int32) * total) // S
    return allsamp[pos]


def sharded_sort(keys, arrays, valid, axis_name, bucket_cap,
                 n_samples=64):
    """Globally sort (keys, payload arrays) over the mesh axis.

    keys: integer or float row keys; arrays: pytree of payload columns
    (need not include keys).  Returns (keys_out, arrays_out, valid_out,
    overflow): shard-monotone, locally sorted, valid rows compacted to
    the front of each shard.
    """
    splitters = global_splitters(keys, valid, axis_name, n_samples)
    dest = jnp.searchsorted(splitters, keys, side="right").astype(
        jnp.int32)
    (keys_x, arrays_x), valid_x, ovf = exchange_by_dest(
        (keys, arrays), dest, valid, axis_name, bucket_cap)
    ovf = lax.psum(ovf.astype(jnp.int32), axis_name) > 0
    order = jnp.argsort(_sort_key(keys_x, valid_x))
    keys_out = keys_x[order]
    valid_out = valid_x[order]
    arrays_out = jax.tree_util.tree_map(lambda a: a[order], arrays_x)
    return keys_out, arrays_out, valid_out, ovf
