"""Distributed pencil FFT + PM gravity on an x-slab-sharded mesh.

TPU-native equivalent of the reference's PFFT pencil engine
(libgadget/petapm.c:105-357): the mesh is sharded along x over the
device mesh axis; the 3D r2c transform is staged as

    rfft(z) . fft(y)  [local]  ->  all_to_all x<->y (ICI)  ->  fft(x)

so each stage is a dense local FFT and the single transpose is one
`lax.all_to_all` — exactly the pencil alltoallv of petapm.c:278-320,
but emitted as an XLA collective.  The k-space transfer functions are
shared with the single-chip kernel (pm/gravity.py:potential_transfer_
fac / force_transfer_fac), so the Green's function cannot drift
between the two paths.

All functions below run *inside* shard_map over a 1-D mesh axis.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..pm.gravity import (potential_transfer_fac, force_transfer_fac,
                          _sinc)
from .collectives import axis_size, ring_shift
from ..ops.cic import cell_and_frac


def _kmodes_slab(nmesh, ny_loc, s):
    """Integer k modes for the (kx full, ky local slice, kz half) layout
    after the forward pencil transform on shard s."""
    kx = jnp.fft.fftfreq(nmesh, 1.0 / nmesh).astype(jnp.float32)
    ky_full = jnp.fft.fftfreq(nmesh, 1.0 / nmesh).astype(jnp.float32)
    ky = lax.dynamic_slice_in_dim(ky_full, s * ny_loc, ny_loc)
    kz = jnp.arange(nmesh // 2 + 1, dtype=jnp.float32)
    return (kx[:, None, None], ky[None, :, None], kz[None, None, :])


def _deconv_slab(kx, ky, kz, nmesh):
    f = 1.0
    for k in (kx, ky, kz):
        ss = _sinc(k * (np.pi / nmesh))
        f = f / (ss * ss)
    return f


def pencil_r2c(local_mesh, axis_name):
    """(nx_loc, N, N) real slab -> (N, ny_loc, N//2+1) complex pencil."""
    rho = jnp.fft.rfft(local_mesh, axis=2)
    rho = jnp.fft.fft(rho, axis=1)
    rho = lax.all_to_all(rho, axis_name, split_axis=1, concat_axis=0,
                         tiled=True)
    return jnp.fft.fft(rho, axis=0)


def pencil_c2r(pencil, axis_name):
    """(N, ny_loc, N//2+1) complex pencil -> (nx_loc, N, N) real slab."""
    out = jnp.fft.ifft(pencil, axis=0)
    out = lax.all_to_all(out, axis_name, split_axis=0, concat_axis=1,
                         tiled=True)
    out = jnp.fft.ifft(out, axis=1)
    return jnp.fft.irfft(out, axis=2)


def cic_deposit_slab(ipos, weights, nmesh, axis_name):
    """CIC deposit of *slab-local* particles onto the local x-slab.

    Particles MUST belong to this shard's x range (exchange first);
    the +1 CIC corner that crosses the right boundary lands in a halo
    plane that is shifted to the right neighbor and added there
    (petapm.c region/layout analog with a single halo cell).
    """
    S = axis_size(axis_name)
    s = lax.axis_index(axis_name)
    nx_loc = nmesh // S
    cell, frac = cell_and_frac(ipos, nmesh)
    ix_loc = cell[:, 0] - s * nx_loc   # in [0, nx_loc) for owned rows
    n = jnp.int32(nmesh)
    buf = jnp.zeros((nx_loc + 1) * nmesh * nmesh, jnp.float32)
    for dx in (0, 1):
        wx = (1.0 - frac[:, 0]) if dx == 0 else frac[:, 0]
        ix = ix_loc + dx                      # [0, nx_loc]
        ok = (ix_loc >= 0) & (ix_loc < nx_loc)
        for dy in (0, 1):
            wy = (1.0 - frac[:, 1]) if dy == 0 else frac[:, 1]
            iy = (cell[:, 1] + dy) % n
            for dz in (0, 1):
                wz = (1.0 - frac[:, 2]) if dz == 0 else frac[:, 2]
                iz = (cell[:, 2] + dz) % n
                flat = (ix * n + iy) * n + iz
                flat = jnp.where(ok, flat, (nx_loc + 1) * nmesh * nmesh)
                buf = buf.at[flat].add(weights * wx * wy * wz,
                                       mode="drop")
    buf = buf.reshape(nx_loc + 1, nmesh, nmesh)
    halo_from_left = ring_shift(buf[-1], axis_name, +1)
    return buf[:nx_loc].at[0].add(halo_from_left)


def cic_readout_slab(local_mesh, ipos, axis_name):
    """CIC readout from an x-slab mesh (+1 halo plane from the right).

    local_mesh: (nx_loc, N, N) or (nx_loc, N, N, k) stacked meshes.
    """
    S = axis_size(axis_name)
    s = lax.axis_index(axis_name)
    nmesh = local_mesh.shape[1]
    nx_loc = nmesh // S
    first = ring_shift(local_mesh[0], axis_name, -1)
    ext = jnp.concatenate([local_mesh, first[None]], axis=0)
    vec = ext.ndim == 4
    k = ext.shape[-1] if vec else 1
    flatm = ext.reshape(-1, k) if vec else ext.reshape(-1, 1)
    cell, frac = cell_and_frac(ipos, nmesh)
    ix_loc = cell[:, 0] - s * nx_loc
    n = jnp.int32(nmesh)
    out = jnp.zeros((ipos.shape[0], k), jnp.float32)
    ok = (ix_loc >= 0) & (ix_loc < nx_loc)
    for dx in (0, 1):
        wx = (1.0 - frac[:, 0]) if dx == 0 else frac[:, 0]
        ix = jnp.clip(ix_loc + dx, 0, nx_loc)
        for dy in (0, 1):
            wy = (1.0 - frac[:, 1]) if dy == 0 else frac[:, 1]
            iy = (cell[:, 1] + dy) % n
            for dz in (0, 1):
                wz = (1.0 - frac[:, 2]) if dz == 0 else frac[:, 2]
                iz = (cell[:, 2] + dz) % n
                flat = (ix * n + iy) * n + iz
                w = jnp.where(ok, wx * wy * wz, 0.0)
                out = out + flatm[flat] * w[:, None]
    return out if vec else out[:, 0]


def pm_force_slab(ipos, weights, nmesh, boxsize, gconst, asmth,
                  axis_name, compute_potential=False):
    """Sharded PM gravity: deposit -> pencil FFT -> Green's fn ->
    3 (4) inverse transforms -> stacked readout.

    ipos/weights are the shard-local particle rows (already exchanged
    to their x-slab).  Returns (accel [n_loc,3], potential [n_loc] or
    None) in internal units, identical to pm/gravity._pm_force_kernel
    on one device.
    """
    S = axis_size(axis_name)
    s = lax.axis_index(axis_name)
    ny_loc = nmesh // S
    mesh_slab = cic_deposit_slab(ipos, weights, nmesh, axis_name)
    rho_k = pencil_r2c(mesh_slab, axis_name)

    kx, ky, kz = _kmodes_slab(nmesh, ny_loc, s)
    k2 = kx * kx + ky * ky + kz * kz
    deconv = _deconv_slab(kx, ky, kz, nmesh)
    pot_k = rho_k * potential_transfer_fac(
        k2, deconv, nmesh, boxsize, gconst, asmth).astype(jnp.complex64)

    meshes = []
    for kk in (kx, ky, kz):
        fk = pot_k * (1j * force_transfer_fac(kk, nmesh, boxsize)
                      ).astype(jnp.complex64)
        meshes.append(pencil_c2r(fk, axis_name))
    stacked = jnp.stack(meshes, axis=-1).astype(jnp.float32)
    accel = cic_readout_slab(stacked, ipos, axis_name)
    pot = None
    if compute_potential:
        pot_mesh = pencil_c2r(pot_k, axis_name).astype(jnp.float32)
        pot = cic_readout_slab(pot_mesh, ipos, axis_name)
    return accel, pot
