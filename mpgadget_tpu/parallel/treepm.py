"""Multi-device TreePM step: slab domains + ghosts + pencil-FFT PM.

The full short+long-range KDK step sharded over a 1-D
`jax.sharding.Mesh` axis (SURVEY §2.2 mapping):

  reference mechanism                  TPU-native equivalent here
  -----------------------------------  ------------------------------
  domain_decompose (domain.c)          x-slab ownership by position bits
  domain_exchange alltoallv            fixed-capacity lax.all_to_all
                                       (decomp.exchange_to_slabs)
  treewalk export/import (treewalk.c)  ghost strips of width rcut
                                       (decomp.ghost_strips)
  PFFT pencil alltoallv (petapm.c)     lax.all_to_all pencil transpose
                                       (pfft.pm_force_slab)

Each shard then runs the SAME single-chip kernels (sort, tree32 build,
block walk, dense leaf eval) on its local+ghost rows — the single-chip
path is the unit of reuse, not a fork.

Constraint (single-hop ghosts): slab width must exceed rcut, i.e.
n_shards < nmesh / (rcut_cells); deeper meshes need multi-hop strips.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..gravity.treepm import tree_force
from ..integrate import drift, kick
from .decomp import exchange_to_slabs, ghost_strips
from .pfft import pm_force_slab


def make_sim_mesh(devices):
    """1-D device mesh over the slab axis."""
    return Mesh(np.asarray(devices), ("x",))


def sharded_treepm_step(mesh, *, nmesh, boxsize, gconst, asmth, rcut,
                        softening, err_tol_force_acc, n_local,
                        tree_kwargs, ghost_frac=0.5, bucket_frac=1.0):
    """Build the jitted sharded step function.

    Returns step(ipos, vel, mass, valid, amag, dkick, ddrift) ->
    (ipos, vel, amag, overflow), all particle arrays sharded P('x')
    on their leading axis with n_local rows per shard.
    """
    S = mesh.devices.size
    log2s = int(np.log2(S))
    assert 1 << log2s == S, "shard count must be a power of two"
    rcut_box = rcut * asmth / nmesh
    assert 1.0 / S > rcut_box, (
        "slab width must exceed rcut (single-hop ghosts): "
        f"1/{S} <= {rcut_box}")
    ghost_cap = max(256, int(n_local * ghost_frac))
    bucket_cap = max(64, int(n_local * bucket_frac))
    g_over_box2 = jnp.float32(gconst / boxsize ** 2)

    def step_local(ipos, vel, mass, valid, amag, pid, dkick, ddrift):
        # 1. domain exchange: every row to its x-slab owner
        (ipos, vel, mass, amag, pid), valid, x_ovf = exchange_to_slabs(
            (ipos, vel, mass, amag, pid), ipos, valid, "x", log2s,
            bucket_cap)
        mass = jnp.where(valid, mass, 0.0)

        # 2. ghost strips (sources only) from both neighbors
        (g_ipos, g_mass), g_valid, g_ovf = ghost_strips(
            (ipos, mass), ipos, valid, "x", log2s, rcut_box, ghost_cap)

        ipos_all = jnp.concatenate([ipos, g_ipos], axis=0)
        mass_all = jnp.concatenate([mass, g_mass], axis=0)
        valid_all = jnp.concatenate([valid, g_valid], axis=0)
        amag_all = jnp.concatenate(
            [amag, jnp.zeros(g_ipos.shape[0], jnp.float32)], axis=0)

        # 3. local tree force over local+ghost rows (local rows first)
        res = tree_force(ipos_all, mass_all, valid_all, amag_all,
                         **tree_kwargs)
        acc_tree = res.accel[:n_local]

        # 4. sharded PM long-range force
        acc_pm, _ = pm_force_slab(ipos, jnp.where(valid, mass, 0.0),
                                  nmesh, boxsize, gconst, asmth, "x")

        acc = acc_tree + acc_pm
        amag = jnp.sqrt(jnp.sum(acc * acc, axis=-1))
        vel = kick(vel, acc, dkick)
        ipos = drift(ipos, vel, ddrift, 1.0 / boxsize)
        # overflow bitmask: 1 = exchange, 2 = ghosts, 4 = tree walk
        ovf = (x_ovf.astype(jnp.int32)
               + 2 * g_ovf.astype(jnp.int32)
               + 4 * res.overflow.astype(jnp.int32))
        return (ipos, vel, mass, valid, amag, pid,
                lax.psum(ovf, "x"))

    sharded = shard_map(
        step_local, mesh=mesh,
        in_specs=(P("x"), P("x"), P("x"), P("x"), P("x"), P("x"),
                  P(), P()),
        out_specs=(P("x"), P("x"), P("x"), P("x"), P("x"), P("x"),
                   P()),
        check_vma=False)
    return jax.jit(sharded)
