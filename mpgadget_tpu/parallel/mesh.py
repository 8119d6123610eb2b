"""Device-mesh sharding for the simulation state.

TPU-native replacement for the reference's MPI domain machinery
(domain.c, exchange.c): particle arrays are sharded over a 1-D
`jax.sharding.Mesh` axis; the PM mesh is sharded over its x-axis.

Two levels of the stack live in parallel/:
* explicit shard_map kernels — pencil FFT (pfft.py), slab exchange +
  ghosts (decomp.py), and the full sharded TreePM step (treepm.py);
* this module: mesh/bind helpers plus a GSPMD-annotated PM-only step
  (XLA chooses the collectives from sharding constraints) used as a
  cross-check against the explicit pencil path.
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
    """Place particle arrays row-sharded over the mesh axis.

    Multi-host: every process passes the same full host array (the
    reference reads the same snapshot on every rank before the domain
    scatter, petaio.c:33-68); shards are materialized per process from
    the local slice via make_array_from_callback, so nothing is sent
    over DCN at load time."""
    multi = jax.process_count() > 1

    def put(x):
        if x.ndim >= 1 and x.shape[0] % mesh.size == 0:
            sh = NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
        else:
            sh = NamedSharding(mesh, P())
        if multi:
            x_np = np.asarray(x)
            return jax.make_array_from_callback(
                x_np.shape, sh, lambda idx: x_np[idx])
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, pdata)


def fetch_global(x):
    """Host numpy view of a possibly multi-process global array
    (outputs/final state only — not per step)."""
    if jax.process_count() > 1 and not x.is_fully_replicated:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(
            x, tiled=True))
    return np.asarray(x)


def sharded_pm_step(mesh, nmesh, boxsize, gconst, asmth, axis="shard"):
    """GSPMD-annotated PM KDK step (particles row-sharded, FFT mesh
    slab-sharded; XLA inserts the collectives).  The k-space math is
    the shared single-chip transfer (pm/gravity.py) so this cannot
    drift from the real kernel; the explicit pencil-FFT path lives in
    parallel/pfft.py."""
    from ..ops.cic import cic_deposit, cic_readout_vec
    from ..pm.gravity import (_kmodes, _deconv, potential_transfer_fac,
                              force_transfer_fac)

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
        pot_k = rho_k * potential_transfer_fac(
            k2, deconv, nmesh, boxsize, gconst, asmth)
        meshes = []
        for kk in (kx, ky, kz):
            fm = jnp.fft.irfftn(
                pot_k * (1j * force_transfer_fac(kk, nmesh, boxsize)))
            meshes.append(jax.lax.with_sharding_constraint(fm, mspec))
        accel = cic_readout_vec(jnp.stack(meshes, axis=-1), ipos)
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
