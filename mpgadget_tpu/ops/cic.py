"""Cloud-in-cell deposit and readout on a periodic mesh.

Replaces the reference's region-based pm_iterate CIC machinery
(libgadget/petapm.c:260-360): with fixed-point positions the cell index
and intra-cell fraction are an exact shift/mask, and the deposit is a
scatter-add (readout a gather) over the full local mesh.  Multi-device
sharding is layered on top in parallel/ (deposit locally, reduce over the
mesh axis), not here.

Indices are flattened to 1D (cell = (ix*n + iy)*n + iz) before the
scatter/gather: XLA lowers 1D scatters onto TPU far better than 3D
ones, and the 8 CIC corners become 8 adds on the same flat index
stream.  The vector readout gathers all force components in one pass.
"""

from functools import partial
import jax
import jax.numpy as jnp


def cell_and_frac(ipos, nmesh: int):
    """Exact CIC corner cell index and fraction from uint32 positions.

    Returns (cell int32 [N,3] in [0,nmesh), frac f32 [N,3] in [0,1)).
    Power-of-two meshes use a pure shift/mask; any other nmesh uses an
    exact 64-bit fixed-point multiply (cell = floor(x * nmesh)).
    """
    if nmesh & (nmesh - 1) == 0:
        shift = 32 - (int(nmesh).bit_length() - 1)
        cell = (ipos >> jnp.uint32(shift)).astype(jnp.int32)
        frac_bits = ipos & jnp.uint32((1 << shift) - 1)
        frac = frac_bits.astype(jnp.float32) * jnp.float32(
            1.0 / (1 << shift))
    else:
        scaled = ipos.astype(jnp.uint64) * jnp.uint64(nmesh)
        cell = (scaled >> jnp.uint64(32)).astype(jnp.int32)
        frac = (scaled & jnp.uint64(0xFFFFFFFF)).astype(jnp.float32) \
            * jnp.float32(2.0 ** -32)
    return cell, frac


def _corner_indices_weights(ipos, nmesh: int):
    """Yield (flat_index i32[N], weight f32[N]) for the 8 CIC corners."""
    cell, frac = cell_and_frac(ipos, nmesh)
    # int32 flat indices overflow at nmesh >= 1291 (1291^3 > 2^31);
    # promote to int64 there (slower gathers, only hit by huge meshes)
    idt = jnp.int32 if nmesh < 1291 else jnp.int64
    n = idt(nmesh)
    # (cell + d) % n via mask for power-of-two, else mod
    pow2 = nmesh & (nmesh - 1) == 0
    for dx in (0, 1):
        wx = (1.0 - frac[:, 0]) if dx == 0 else frac[:, 0]
        ix = cell[:, 0].astype(idt) + dx
        ix = (ix & (n - 1)) if pow2 else (ix % n)
        for dy in (0, 1):
            wy = (1.0 - frac[:, 1]) if dy == 0 else frac[:, 1]
            iy = cell[:, 1].astype(idt) + dy
            iy = (iy & (n - 1)) if pow2 else (iy % n)
            for dz in (0, 1):
                wz = (1.0 - frac[:, 2]) if dz == 0 else frac[:, 2]
                iz = cell[:, 2].astype(idt) + dz
                iz = (iz & (n - 1)) if pow2 else (iz % n)
                yield (ix * n + iy) * n + iz, wx * wy * wz


def cic_deposit(ipos, weights, nmesh: int, mesh=None):
    """Scatter-add particle weights onto a periodic nmesh^3 mesh.

    weights: f32[N] (set 0 for invalid particles).
    """
    if mesh is None:
        flat = jnp.zeros(nmesh ** 3, jnp.float32)
    else:
        flat = mesh.reshape(-1)
    for idx, w in _corner_indices_weights(ipos, nmesh):
        flat = flat.at[idx].add(weights * w, mode="promise_in_bounds")
    return flat.reshape(nmesh, nmesh, nmesh)


def cic_readout(mesh, ipos):
    """Trilinear (CIC) interpolation of mesh values at particle positions."""
    nmesh = mesh.shape[0]
    flatm = mesh.reshape(-1)
    out = jnp.zeros(ipos.shape[0], mesh.dtype)
    for idx, w in _corner_indices_weights(ipos, nmesh):
        out = out + flatm[idx] * w
    return out


def cic_readout_vec(meshes, ipos):
    """CIC interpolation of k stacked meshes (nmesh, nmesh, nmesh, k)
    at particle positions in one gather pass; returns [N, k]."""
    nmesh = meshes.shape[0]
    k = meshes.shape[-1]
    flatm = meshes.reshape(-1, k)
    out = jnp.zeros((ipos.shape[0], k), meshes.dtype)
    for idx, w in _corner_indices_weights(ipos, nmesh):
        out = out + flatm[idx] * w[:, None]
    return out
