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


def _cell_frac_col(x, nmesh: int):
    """(cell i32[N], frac f32[N]) for ONE coordinate column.

    1-D arrays only: on TPU a rank-2 (N, 3) intermediate is tiled to
    (8, 128) lanes — a 42x padding blow-up that alone OOMs a 256^3
    run; column-wise the kernel stays in compact 1-D layouts."""
    if nmesh & (nmesh - 1) == 0:
        shift = 32 - (int(nmesh).bit_length() - 1)
        cell = (x >> jnp.uint32(shift)).astype(jnp.int32)
        frac = (x & jnp.uint32((1 << shift) - 1)).astype(jnp.float32) \
            * jnp.float32(1.0 / (1 << shift))
    else:
        scaled = x.astype(jnp.uint64) * jnp.uint64(nmesh)
        cell = (scaled >> jnp.uint64(32)).astype(jnp.int32)
        frac = (scaled & jnp.uint64(0xFFFFFFFF)).astype(jnp.float32) \
            * jnp.float32(2.0 ** -32)
    return cell, frac


def cell_and_frac(ipos, nmesh: int):
    """Exact CIC corner cell index and fraction from uint32 positions.

    Returns (cell int32 [N,3] in [0,nmesh), frac f32 [N,3] in [0,1)).
    Power-of-two meshes use a pure shift/mask; any other nmesh uses an
    exact 64-bit fixed-point multiply (cell = floor(x * nmesh)).
    """
    cells, fracs = zip(*[_cell_frac_col(ipos[:, c], nmesh)
                         for c in range(3)])
    return jnp.stack(cells, axis=1), jnp.stack(fracs, axis=1)


def _corner_indices_weights(ipos, nmesh: int):
    """Yield (flat_index i32[N], weight f32[N]) for the 8 CIC corners.

    All intermediates are 1-D (see _cell_frac_col)."""
    (cx, fx) = _cell_frac_col(ipos[:, 0], nmesh)
    (cy, fy) = _cell_frac_col(ipos[:, 1], nmesh)
    (cz, fz) = _cell_frac_col(ipos[:, 2], nmesh)
    # int32 flat indices overflow at nmesh >= 1291 (1291^3 > 2^31);
    # promote to int64 there (slower gathers, only hit by huge meshes)
    idt = jnp.int32 if nmesh < 1291 else jnp.int64
    n = idt(nmesh)
    pow2 = nmesh & (nmesh - 1) == 0
    for dx in (0, 1):
        wx = (1.0 - fx) if dx == 0 else fx
        ix = cx.astype(idt) + dx
        ix = (ix & (n - 1)) if pow2 else (ix % n)
        for dy in (0, 1):
            wy = (1.0 - fy) if dy == 0 else fy
            iy = cy.astype(idt) + dy
            iy = (iy & (n - 1)) if pow2 else (iy % n)
            for dz in (0, 1):
                wz = (1.0 - fz) if dz == 0 else fz
                iz = cz.astype(idt) + dz
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
