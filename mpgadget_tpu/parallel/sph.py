"""Sharded SPH: density + hydro force over slab domains with ghosts.

The reference serves every neighbor-loop module through the same
treewalk export/import machinery (treewalk.c:325-902, used by
density.c:235 and hydra.c:154).  Here the same role is played by ghost
strips (decomp.ghost_strips) whose width is the GLOBAL maximum
smoothing length (psum-max over shards) with a bisection-growth margin
— the symmetric-search hmax semantics (treewalk.h:13-16): a local
particle i must see any j (possibly remote) with r_ij < max(h_i, h_j),
which a strip of width max-h covers from both sides.

Each shard then runs the SAME single-chip fused kernels
(sph/density._density_all, sph/hydra._hydro_all) on its local+ghost
rows with targets restricted to local gas; convergence and capacity
flags are psum'd so the host driver can widen capacities and retry.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..sph.density import _density_all, DensityParams
from ..sph.hydra import _hydro_all, HydroParams
from .decomp import ghost_strips_multi, geometric_boundaries


def _strip_width(hsml, valid_gas, axis_name, rcut_box, margin):
    """Global max smoothing length (box units) with margin, at least
    rcut_box; the ghost-strip width for symmetric SPH searches."""
    local_max = jnp.max(jnp.where(valid_gas, hsml, 0.0))
    global_max = lax.pmax(local_max, axis_name)
    return jnp.maximum(global_max * margin, rcut_box)


def sharded_sph_density(mesh, *, n_local, ghost_cap, par: DensityParams,
                        boxsize, log2s, caps, rcut_box=0.0,
                        margin=1.6, hops=1):
    """Build the jitted sharded density fn.

    Returns fn(ipos, vel, mass, valid_gas, hsml, entvar) with all
    arrays sharded P('x') (n_local rows per shard) ->
    (result dict P('x'), flags dict replicated).  caps: dict with
    nleaf/sr/ll/src static capacities for the per-shard fused solve.
    margin: ghost strips are this factor wider than the global max
    hsml, covering bisection growth (1.26 per step) plus slack; if any
    local hsml converges beyond strip/margin the 'strip' flag is set
    and the caller must re-run (analogous to the reference re-export
    per hsml iteration, treewalk.c:1270).
    """
    inv_box = 1.0 / boxsize

    def local(ipos, vel, mass, valid_gas, hsml, entvar):
        w = _strip_width(hsml * jnp.float32(inv_box), valid_gas, "x",
                         jnp.float32(rcut_box), jnp.float32(margin))
        bounds = geometric_boundaries(log2s)
        (g_ipos, g_vel, g_mass, g_hsml, g_ev), g_ok, g_ovf = \
            ghost_strips_multi((ipos, vel, mass, hsml, entvar), ipos,
                               valid_gas, "x", bounds, w, ghost_cap,
                               hops)
        ng = g_ipos.shape[0]
        cat = lambda a, b: jnp.concatenate([a, b], axis=0)
        ipos_a = cat(ipos, g_ipos)
        vel_a = cat(vel, g_vel)
        mass_a = cat(mass, g_mass)
        hsml_a = cat(hsml, g_hsml)
        ev_a = cat(entvar, g_ev)
        valid_a = cat(valid_gas, g_ok)
        tmask = cat(jnp.ones(n_local, bool), jnp.zeros(ng, bool))
        res, flags = _density_all(
            ipos_a, mass_a, valid_a, hsml_a, vel_a, vel_a, ev_a,
            tmask, par, boxsize, caps["group"], caps["nleaf"],
            caps["sr"], caps["ll"], caps["src"], True, True, True)
        out = {k: v[:n_local] for k, v in res.items()
               if k != "iterations"}
        # converged values only depend on the FINAL evaluation, so the
        # correctness bound is final hsml <= strip width; flag one
        # 1.26-growth-step earlier to catch borderline cases.
        strip_bad = jnp.any(
            valid_gas & (out["hsml"] * jnp.float32(inv_box * 1.26)
                         > w))
        fl = {k: lax.psum(v.astype(jnp.int32), "x")
              for k, v in {**flags, "ghost": g_ovf,
                           "strip": strip_bad}.items()}
        return out, fl

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("x"), P("x"), P("x"), P("x"), P("x"), P("x")),
        out_specs=({k: P("x") for k in
                    ("hsml", "numngb", "density", "egy_wt_density",
                     "dhsml_density_factor", "dhsml_egy_factor",
                     "div_vel", "curl_vel", "dt_hsml")},
                   {k: P() for k in ("group", "pack", "pair", "ghost",
                                     "strip")}),
        check_vma=False)
    return jax.jit(fn)


def sharded_hydro(mesh, *, n_local, ghost_cap, par: HydroParams,
                  boxsize, log2s, caps, margin=1.05, hops=1):
    """Build the jitted sharded hydro-force fn.

    fn(ipos, vel, mass, valid_gas, hsml, entvar, density,
    egy_wt_density, div_vel, curl_vel, dhsml_egy_factor, atime,
    hubble, dloga) -> (result dict P('x'), flags replicated).  hsml is
    already converged, so the strip only needs the global max hsml
    (no bisection growth margin)."""
    inv_box = 1.0 / boxsize

    def local(ipos, vel, mass, valid_gas, hsml, entvar, density,
              egywt, divv, curlv, dhsml_egy, atime, hubble, dloga):
        w = _strip_width(hsml * jnp.float32(inv_box), valid_gas, "x",
                         jnp.float32(0.0), jnp.float32(margin))
        arrays = (ipos, vel, mass, hsml, entvar, density, egywt,
                  divv, curlv, dhsml_egy)
        bounds = geometric_boundaries(log2s)
        ghosts, g_ok, g_ovf = ghost_strips_multi(
            arrays, ipos, valid_gas, "x", bounds, w, ghost_cap, hops)
        ng = ghosts[0].shape[0]
        cat = lambda a, b: jnp.concatenate([a, b], axis=0)
        (ipos_a, vel_a, mass_a, hsml_a, ev_a, rho_a, egy_a, dv_a,
         cv_a, dh_a) = tuple(cat(a, g) for a, g in zip(arrays, ghosts))
        valid_a = cat(valid_gas, g_ok)
        res, flags = _hydro_all(
            ipos_a, mass_a, valid_a, hsml_a, vel_a, ev_a, rho_a,
            egy_a, dv_a, cv_a, dh_a, atime, hubble, dloga, par,
            boxsize, caps["group"], caps["nleaf"], caps["sr"],
            caps["ll"], caps["src"])
        out = {k: v[:n_local] for k, v in res.items()}
        fl = {k: lax.psum(v.astype(jnp.int32), "x")
              for k, v in {**flags, "ghost": g_ovf}.items()}
        return out, fl

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("x"),) * 11 + (P(), P(), P()),
        out_specs=({k: P("x") for k in
                    ("hydro_accel", "dt_entropy", "max_signal_vel",
                     "pressure")},
                   {k: P() for k in ("group", "pack", "pair",
                                     "ghost")}),
        check_vma=False)
    return jax.jit(fn)


def density_caps(n_rows, par):
    """Static capacity dict for the per-shard fused density solve."""
    return {"group": min((8 * n_rows) // par.group_max + 64,
                         n_rows + 64),
            "nleaf": n_rows // 2 + 64,
            "sr": n_rows // par.sub + n_rows // 2 + 128,
            "ll": par.leaf_list_max,
            "src": par.src_cap}
