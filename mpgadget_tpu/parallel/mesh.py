"""Device-mesh sharding for the simulation state.

TPU-native replacement for the reference's MPI domain machinery
(domain.c, exchange.c): particle arrays are sharded over a 1-D
`jax.sharding.Mesh` axis ("shard"); the PM mesh is sharded over its
x-axis.  XLA/GSPMD inserts the ICI collectives (reduce-scatter for the
CIC deposit, all-gathers around the FFT) — there is no explicit
communicator management.

Domain balance: particles are kept Morton-sorted, so an equal-count
split over shards is a contiguous space-filling-curve decomposition —
the analog of domain_assign_topleaves_balanced with equal particle cost.
"""

from functools import partial
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sim_mesh(devices=None, axis="shard"):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def shard_particles(pdata, mesh, axis="shard"):
    """Place particle arrays row-sharded over the mesh axis."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        if x.ndim >= 1 and x.shape[0] % mesh.size == 0:
            return jax.device_put(x, NamedSharding(
                mesh, P(axis, *([None] * (x.ndim - 1)))))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, pdata)


def sharded_pm_step(mesh, nmesh, boxsize, gconst, asmth, axis="shard"):
    """Build a jitted sharded KDK step closure: one full PM gravity +
    kick-drift-kick over the device mesh.

    Shardings: particles row-sharded; the FFT mesh sharded over x-slabs
    between deposit and FFT (GSPMD chooses the collectives).
    """
    from ..ops.cic import cic_deposit, cic_readout
    from ..pm.gravity import _kmodes, _deconv, _diff_kernel

    pspec = NamedSharding(mesh, P(axis))
    pspec2 = NamedSharding(mesh, P(axis, None))
    mspec = NamedSharding(mesh, P(axis, None, None))
    repl = NamedSharding(mesh, P())

    def step(ipos, vel, mass, dkick, ddrift):
        inv_box = jnp.float32(1.0 / boxsize)
        # deposit: local scatter + cross-device reduction onto x-slabs
        mesh_arr = cic_deposit(ipos, mass, nmesh)
        mesh_arr = jax.lax.with_sharding_constraint(mesh_arr, mspec)
        rho_k = jnp.fft.rfftn(mesh_arr)
        kx, ky, kz = _kmodes(nmesh)
        k2 = kx * kx + ky * ky + kz * kz
        deconv = _deconv(nmesh)
        asmth2 = (2.0 * np.pi * asmth / nmesh) ** 2
        k2safe = jnp.where(k2 == 0, 1.0, k2)
        fac = (-gconst * float(nmesh) ** 3 / (np.pi * boxsize)
               * jnp.exp(-k2 * asmth2) / k2safe * deconv * deconv)
        fac = jnp.where(k2 == 0, 0.0, fac)
        pot_k = rho_k * fac
        accel = []
        for kk in (kx, ky, kz):
            w_ = kk * (2.0 * np.pi / nmesh)
            force_mesh = jnp.fft.irfftn(
                pot_k * (1j * (-_diff_kernel(w_) * (nmesh / boxsize))))
            force_mesh = jax.lax.with_sharding_constraint(force_mesh,
                                                          mspec)
            accel.append(cic_readout(force_mesh, ipos))
        accel = jnp.stack(accel, axis=-1)
        # KDK pieces
        vel = vel + accel * jnp.float32(dkick)
        disp = vel * (jnp.float32(ddrift) * inv_box)
        dint = jnp.round(disp * jnp.float32(2.0 ** 32)).astype(jnp.int32)
        ipos = ipos + dint.astype(jnp.uint32)
        return ipos, vel

    return jax.jit(
        step,
        in_shardings=(pspec2, pspec2, pspec, repl, repl),
        out_shardings=(pspec2, pspec2))
