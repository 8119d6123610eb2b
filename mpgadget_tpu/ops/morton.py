"""Morton (Z-order) keys from fixed-point positions.

The reference orders particles by a 63-bit Peano-Hilbert key
(libgadget/utils/peano.{c,h}, 21 bits/dim) to drive domain decomposition,
the distributed sort and the octree.  Here the space-filling curve is the
Morton order: it shares the crucial property that every octree node is a
contiguous key range (3 bits per level), while being computable with a
handful of vectorized integer ops — ideal for the TPU VPU.  Locality of
Morton is slightly worse than Hilbert; the shard balance is restored by
splitting shards at equal particle counts rather than equal key spans.

Keys are built from the top 21 bits per axis of the uint32 fixed-point
positions and returned as a single uint64 (63 bits used).
"""

import jax.numpy as jnp

MORTON_BITS = 21  # bits per dimension


def _spread_bits_21(x):
    """Spread the low 21 bits of x so there are two zero bits between
    consecutive bits: b20..b0 -> b20 0 0 b19 0 0 ... b0 (uint64)."""
    x = x.astype(jnp.uint64) & jnp.uint64(0x1FFFFF)
    x = (x | (x << 32)) & jnp.uint64(0x1F00000000FFFF)
    x = (x | (x << 16)) & jnp.uint64(0x1F0000FF0000FF)
    x = (x | (x << 8)) & jnp.uint64(0x100F00F00F00F00F)
    x = (x | (x << 4)) & jnp.uint64(0x10C30C30C30C30C3)
    x = (x | (x << 2)) & jnp.uint64(0x1249249249249249)
    return x


def morton_key(ipos):
    """63-bit Morton key from uint32 fixed-point positions [N,3].

    The key's 3-bit groups from the top are octree child indices, so an
    octree node at level L is the contiguous range of keys sharing the
    top 3L bits.
    """
    x = _spread_bits_21(ipos[:, 0] >> (32 - MORTON_BITS))
    y = _spread_bits_21(ipos[:, 1] >> (32 - MORTON_BITS))
    z = _spread_bits_21(ipos[:, 2] >> (32 - MORTON_BITS))
    return (x << 2) | (y << 1) | z


def _compact_bits_21(x):
    """Inverse of _spread_bits_21."""
    x = x.astype(jnp.uint64) & jnp.uint64(0x1249249249249249)
    x = (x | (x >> 2)) & jnp.uint64(0x10C30C30C30C30C3)
    x = (x | (x >> 4)) & jnp.uint64(0x100F00F00F00F00F)
    x = (x | (x >> 8)) & jnp.uint64(0x1F0000FF0000FF)
    x = (x | (x >> 16)) & jnp.uint64(0x1F00000000FFFF)
    x = (x | (x >> 32)) & jnp.uint64(0x1FFFFF)
    return x


def morton_decode(key):
    """Morton key -> 21-bit cell coordinates [N,3] (uint32)."""
    key = key.astype(jnp.uint64)
    x = _compact_bits_21(key >> 2)
    y = _compact_bits_21(key >> 1)
    z = _compact_bits_21(key)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.uint32)
