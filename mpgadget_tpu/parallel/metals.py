"""Sharded stellar metal return (metal_return.c:423-500 at scale).

The single-chip :func:`mpgadget_tpu.physics.metal_return.
metal_return_step` is GATHER-formulated in its spread pass (gas
targets gather from star sources), so the slab version needs no
write-back of remote contributions: each shard runs the identical
kernel on its local rows + ghost strips, and local gas rows receive
every star within reach.

Correctness of the ghost STARS' normalisation (pass A recomputes each
star's kernel norm locally) requires that a ghost star's FULL kernel
support be covered by the local+ghost gas: a star within w of my slab
reaches gas out to w + h, so the strip width is 2x the global maximum
star smoothing length (x margin for the bisection's 1.26 growth) —
the symmetric-search hmax rule (treewalk.h:13-16) applied twice.
Ghost-star results are discarded; every star's bookkeeping is written
by its owning shard from the same globally-consistent data.
"""

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..physics import metal_return as mrmod
from ..physics.stars import StarData
from .decomp import ghost_strips_multi


def build_sharded_metal_return(mesh, *, n_local, ghost_cap, hops,
                               age_table, params, boxsize,
                               margin=1.6, ll_static=512):
    """Build the jitted sharded metal-return program.

    fn(st, bounds, atime0, atime1) with st a dict of P('x') arrays
    {ipos, mass, hsml, density, gas_mask, star_mask, star_hsml,
    metals, birth_metallicity, formation_time, total_mass_returned,
    last_enrichment_myr} -> (updates dict P('x'), flags replicated):
    updates {mass, metals, metallicity?, star_hsml,
    total_mass_returned, last_enrichment_myr}.
    """
    inv_box = 1.0 / boxsize

    def local(st, bounds, atime0, atime1):
        gas = st["gas_mask"]
        star = st["star_mask"]
        include = gas | star
        # strip width: 2 x global max star hsml (+ gas hsml for the
        # count pass) x bisection margin
        hstar = jnp.where(star, st["star_hsml"], 0.0)
        hgas = jnp.where(gas, st["hsml"], 0.0)
        hmax = lax.pmax(jnp.max(jnp.maximum(hstar, hgas)), "x")
        w = 2.0 * hmax * jnp.float32(inv_box * margin)
        keys = ("ipos", "mass", "hsml", "density", "gas_mask",
                "star_mask", "star_hsml", "metals",
                "birth_metallicity", "formation_time",
                "total_mass_returned", "last_enrichment_myr")
        payload = tuple(st[k] for k in keys)
        ghosts, g_ok, g_ovf = ghost_strips_multi(
            payload, st["ipos"], include, "x", bounds, w, ghost_cap,
            hops)
        gh = dict(zip(keys, ghosts))
        cat = lambda k: jnp.concatenate([st[k], gh[k]], axis=0)
        n_rows = st["ipos"].shape[0] + ghosts[0].shape[0]
        gas_a = jnp.concatenate([gas, gh["gas_mask"] & g_ok])
        star_a = jnp.concatenate([star, gh["star_mask"] & g_ok])
        stars_a = StarData.zeros(n_rows).replace(
            formation_time=cat("formation_time"),
            metallicity=cat("birth_metallicity"),
            metals=cat("metals"),
            total_mass_returned=cat("total_mass_returned"),
            last_enrichment_myr=cat("last_enrichment_myr"))
        out = mrmod.metal_return_step(
            cat("ipos"), cat("mass"), cat("hsml"), cat("density"),
            gas_a, star_a, cat("star_hsml"), stars_a, cat("metals"),
            atime0, atime1, age_table, boxsize, params,
            ll_static=ll_static)
        nl = n_local
        new_star_h = out["star_hsml"][:nl]
        # flag if any local star's converged kernel outgrew half the
        # strip (ghost-star norms would then be missing support)
        strip_bad = jnp.any(
            star & (new_star_h * jnp.float32(inv_box * 1.26 * 2.0)
                    > w))
        upd = {
            "mass": jnp.where(gas, out["gas_mass"][:nl],
                              jnp.where(star, out["star_mass"][:nl],
                                        st["mass"])),
            "metals": jnp.where(gas[:, None],
                                out["gas_metals"][:nl], st["metals"]),
            "star_hsml": jnp.where(star, new_star_h,
                                   st["star_hsml"]),
            "total_mass_returned": jnp.where(
                star, out["total_mass_returned"][:nl],
                st["total_mass_returned"]),
            "last_enrichment_myr": jnp.where(
                star, out["last_enrichment_myr"][:nl],
                st["last_enrichment_myr"]),
        }
        # the quadrature runs in f64 under x64 (as in the single-chip
        # apply_metal_return, which casts back); the state MUST stay
        # f32 — an f64 mass column poisons the walk's packed node rows
        upd = {k: v.astype(st[k].dtype) for k, v in upd.items()}
        # conservation stats from LOCAL rows only (the step's own
        # totals also count ghost-star copies once per neighbor shard)
        ret_loc = jnp.sum(jnp.where(
            star, out["total_mass_returned"][:nl]
            - st["total_mass_returned"], 0.0))
        rec_loc = jnp.sum(jnp.where(
            gas, out["gas_mass"][:nl] - st["mass"], 0.0))
        flags = {
            "ghost": lax.psum((g_ovf | out["ngb_overflow"]).astype(
                jnp.int32), "x"),
            "strip": lax.psum(strip_bad.astype(jnp.int32), "x"),
            "returned": lax.psum(ret_loc, "x"),
            "received": lax.psum(rec_loc, "x"),
        }
        return upd, flags

    in_spec = ({k: P("x") for k in
                ("ipos", "mass", "hsml", "density", "gas_mask",
                 "star_mask", "star_hsml", "metals",
                 "birth_metallicity", "formation_time",
                 "total_mass_returned", "last_enrichment_myr")},
               P(), P(), P())
    out_spec = ({k: P("x") for k in
                 ("mass", "metals", "star_hsml",
                  "total_mass_returned", "last_enrichment_myr")},
                {k: P() for k in ("ghost", "strip", "returned",
                                  "received")})
    fn = shard_map(local, mesh=mesh, in_specs=in_spec,
                   out_specs=out_spec, check_vma=False)
    return jax.jit(fn)
