"""Cloud-in-cell deposit and readout on a periodic mesh.

Replaces the reference's region-based pm_iterate CIC machinery
(libgadget/petapm.c:260-360): with fixed-point positions the cell index
and intra-cell fraction are an exact shift/mask, and the deposit is a
scatter-add (readout a gather) over the full local mesh.  Multi-device
sharding is layered on top in parallel/ (deposit locally, reduce over the
mesh axis), not here.
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


def cic_deposit(ipos, weights, nmesh: int, mesh=None):
    """Scatter-add particle weights onto a periodic nmesh^3 mesh.

    weights: f32[N] (set 0 for invalid particles).
    """
    cell, frac = cell_and_frac(ipos, nmesh)
    if mesh is None:
        mesh = jnp.zeros((nmesh, nmesh, nmesh), jnp.float32)
    n = jnp.int32(nmesh)
    for dx in (0, 1):
        wx = (1.0 - frac[:, 0]) if dx == 0 else frac[:, 0]
        ix = (cell[:, 0] + dx) % n
        for dy in (0, 1):
            wy = (1.0 - frac[:, 1]) if dy == 0 else frac[:, 1]
            iy = (cell[:, 1] + dy) % n
            for dz in (0, 1):
                wz = (1.0 - frac[:, 2]) if dz == 0 else frac[:, 2]
                iz = (cell[:, 2] + dz) % n
                mesh = mesh.at[ix, iy, iz].add(
                    weights * wx * wy * wz, mode="drop")
    return mesh


def cic_readout(mesh, ipos):
    """Trilinear (CIC) interpolation of mesh values at particle positions."""
    nmesh = mesh.shape[0]
    cell, frac = cell_and_frac(ipos, nmesh)
    n = jnp.int32(nmesh)
    out = jnp.zeros(ipos.shape[0], mesh.dtype)
    for dx in (0, 1):
        wx = (1.0 - frac[:, 0]) if dx == 0 else frac[:, 0]
        ix = (cell[:, 0] + dx) % n
        for dy in (0, 1):
            wy = (1.0 - frac[:, 1]) if dy == 0 else frac[:, 1]
            iy = (cell[:, 1] + dy) % n
            for dz in (0, 1):
                wz = (1.0 - frac[:, 2]) if dz == 0 else frac[:, 2]
                iz = (cell[:, 2] + dz) % n
                out = out + mesh[ix, iy, iz] * (wx * wy * wz)
    return out
