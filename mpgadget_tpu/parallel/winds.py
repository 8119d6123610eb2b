"""Sharded neighbor-search wind models vs08/ofjt10
(winds_and_feedback, winds.c:299-567 at scale).

Same TPU-native shape as :mod:`parallel.blackhole`: the kick SOURCES
(stars formed this step) are few, so each shard packs its local new
stars into fixed-capacity slots, ``lax.all_gather``s them, and runs
dense local-rows x global-star passes — capacity-free w.r.t. kernel
reach, exactly the treewalk-exports-reach-any-rank semantics
(treewalk.c:325) without ghost strips.

Three phases, mirroring the single-device
:func:`physics.winds.winds_via_neighbors`:
  1. per-star sums, psum'd: total eligible-gas weight inside the
     star's kernel (sfr_wind_weight, winds.c:299-318) and — for the
     halo model — the DM velocity-dispersion sums at the star's
     position (veldisp.c:35-76).
  2. per-gas: stochastic hits via the pair-ID hash, resolved to the
     NEAREST hitting star (winds.c:320-345).
  3. wind_do_kick on the hit gas (winds.c:454-489).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..utils import constants as C
from ..physics.winds import (WindParams, WIND_DECOUPLE_SPH,
                             WIND_USE_HALO, get_wind_kick,
                             winds_decouple_update, _pair_uniform)
from ..physics.sfr import _id_uniform


def _tree_add(a, b):
    return jax.tree_util.tree_map(lambda x, y: x + y, a, b)


def build_sharded_winds(mesh, *, n_local, nstar_cap, par: WindParams,
                        boxsize, mean_sep, vdisp_radius_fac=2.0,
                        chunk=2048):
    """Build the jitted sharded neighbor-wind step.

    fn(st, scal) -> (upd dict P('x'), stats replicated): st holds
    {ipos, vel, mass, valid, pid, ptype, hsml, entropy, density,
    delay_time, gas_mask, formation_time}; scal holds {atime, dtime,
    aform_min, rng_wind}.  New stars are rows with ptype==4 and
    formation_time >= aform_min (spawned/converted since the interval
    opened; spawn_rows stamps the spawn-time scale factor).  Returns
    updates for vel/entropy/delay_time and stats {n_new, n_kicked,
    ovf}.
    """
    S = int(mesh.devices.size)
    G = S * nstar_cap
    L = float(boxsize)
    halo = bool(par.model & WIND_USE_HALO)
    vdisp_r = vdisp_radius_fac * mean_sep
    ck = chunk
    while n_local % ck:
        ck //= 2
    n_chunks = n_local // ck

    def local(st, scal):
        atime = scal["atime"]
        valid = st["valid"]
        gas = st["gas_mask"] & valid
        # stars formed inside (aform_min, now] are the kick sources;
        # the hierarchical loop spawns at substep scale factors, so a
        # simple == atime check would miss mid-interval stars
        new_star = valid & (st["ptype"] == 4) \
            & (st["formation_time"] >= scal["aform_min"])
        eligible = gas & (st["delay_time"] <= 0)
        is_dm = valid & (st["ptype"] == 1)
        rows = jnp.arange(n_local, dtype=jnp.int32)

        order = jnp.argsort(jnp.where(new_star, rows, n_local)
                            )[:nstar_cap]
        slot_ok = new_star[order]
        ovf = jnp.sum(new_star.astype(jnp.int32)) > nstar_cap

        def gat(a):
            packed = jnp.where(
                slot_ok.reshape((nstar_cap,) + (1,) * (a.ndim - 1)),
                a[order], jnp.zeros((), a.dtype))
            return lax.all_gather(packed, "x").reshape(
                (G,) + a.shape[1:])

        # slot_ok is ALREADY packed (length nstar_cap) — gat() would
        # re-index it with ROW indices and clamp out-of-bounds, so
        # gather it directly (same fix as parallel/blackhole.py).
        ok_g = lax.all_gather(slot_ok, "x").reshape(G)
        ipos_g = gat(st["ipos"])
        hsml_g = jnp.where(ok_g, gat(st["hsml"]), 0.0)
        mass_g = gat(st["mass"])
        # reduced ids stay exact in the pair hash (winds.c:548 analog,
        # same reduction as the single-device f32 feature path)
        pid24 = (st["pid"] & 0xFFFFFF).astype(jnp.uint32)
        pid_g = gat(pid24)

        def row_chunks(*arrays):
            return tuple(a.reshape((n_chunks, ck) + a.shape[1:])
                         for a in arrays)

        def pair_r(ipos_c):
            d = (ipos_c[:, None, :] - ipos_g[None, :, :]).astype(
                jnp.int32).astype(jnp.float32) * jnp.float32(2.0 ** -32)
            return jnp.sqrt(jnp.sum(d * d, axis=-1)) * jnp.float32(L)

        # ---- pass 1: per-star sums ----
        def sums_chunk(args):
            ipos_c, m_c, v_c, elig_c, dm_c = args
            r = pair_r(ipos_c)
            inw = (r < hsml_g[None, :]) & ok_g[None, :] \
                & elig_c[:, None]
            out = {"w": jnp.sum(jnp.where(inw, m_c[:, None], 0.0),
                                axis=0)}
            if halo:
                nw = jnp.where((r < jnp.float32(vdisp_r))
                               & ok_g[None, :] & dm_c[:, None],
                               jnp.float32(1.0), jnp.float32(0.0))
                out["vd_n"] = jnp.sum(nw, axis=0)
                out["vd_v"] = jnp.sum(nw[..., None] * v_c[:, None, :],
                                      axis=0)
                out["vd_v2"] = jnp.sum(
                    nw * jnp.sum(v_c * v_c, axis=-1)[:, None], axis=0)
            return out

        zero = {"w": jnp.zeros(G, jnp.float32)}
        if halo:
            zero.update(vd_n=jnp.zeros(G, jnp.float32),
                        vd_v=jnp.zeros((G, 3), jnp.float32),
                        vd_v2=jnp.zeros(G, jnp.float32))
        xs = row_chunks(st["ipos"], jnp.where(valid, st["mass"], 0.0),
                        st["vel"], eligible, is_dm)
        sums, _ = lax.scan(
            lambda c, x: (_tree_add(c, sums_chunk(x)), None), zero, xs)
        sums = lax.psum(sums, "x")

        if halo:
            cnt = jnp.maximum(sums["vd_n"], 1.0)
            vm2 = jnp.sum(sums["vd_v"] ** 2, axis=-1) / cnt ** 2
            vdisp_g = jnp.sqrt(jnp.maximum(
                sums["vd_v2"] / cnt - vm2, 0.0) / 3.0)
        else:
            # fixed-efficiency (vs08): kick speed is vdisp-independent
            # but star_ok still requires a positive dispersion in the
            # single-device path; use the wind speed scale
            vdisp_g = jnp.full(G, jnp.float32(max(par.wind_speed,
                                                  1e-3)))
        wvel_g, windeff_g, utherm_g = get_wind_kick(par, vdisp_g,
                                                    atime)
        p_g = windeff_g * mass_g / jnp.maximum(sums["w"], 1e-30)
        star_ok = ok_g & (sums["w"] > 0) & (wvel_g > 0) \
            & (vdisp_g > 0)
        wv_g = jnp.where(star_ok, wvel_g, 0.0)
        ut_g = jnp.where(star_ok, utherm_g, 0.0)
        BIGR = jnp.float32(4.0 * L)

        # ---- pass 2: per-gas nearest hitting star + kick gather ----
        def gas_chunk(args):
            ipos_c, elig_c, tid_c = args
            r = pair_r(ipos_c)
            u = _pair_uniform(pid_g[None, :], tid_c[:, None])
            hit = (r < hsml_g[None, :]) & star_ok[None, :] \
                & elig_c[:, None] & (u < p_g[None, :])
            rkey = jnp.where(hit, BIGR - r, -jnp.inf)
            best = jnp.max(rkey, axis=1)
            sel = hit & (jnp.abs(rkey - best[:, None]) < 1e-9)
            nsel = jnp.sum(sel.astype(jnp.float32), axis=1)
            v = jnp.sum(jnp.where(sel, wv_g[None, :], 0.0), axis=1)
            ut = jnp.sum(jnp.where(sel, ut_g[None, :], 0.0), axis=1)
            return v, ut, nsel

        xs2 = row_chunks(st["ipos"], eligible, pid24)
        _, (v_r, ut_r, n_r) = lax.scan(
            lambda c, x: (c, gas_chunk(x)), 0, xs2)
        nsel = jnp.maximum(n_r.reshape(n_local), 1.0)
        v_g = v_r.reshape(n_local) / nsel
        utg = ut_r.reshape(n_local) / nsel
        kicked = (n_r.reshape(n_local) > 0) & eligible

        # ---- wind_do_kick (winds.c:454-489) ----
        key = scal["rng_wind"]
        ids = st["pid"]
        u1 = _id_uniform(key, ids + 3)
        u2 = _id_uniform(key, ids + 4)
        costh = 2 * u1 - 1
        sinth = jnp.sqrt(jnp.maximum(1 - costh ** 2, 0.0))
        phi = 2 * np.pi * u2
        direction = jnp.stack([sinth * jnp.cos(phi),
                               sinth * jnp.sin(phi), costh], axis=-1)
        vel = st["vel"] + jnp.where(kicked[:, None],
                                    v_g[:, None] * direction, 0.0)
        a3inv = 1.0 / atime ** 3
        enttou = (jnp.maximum(st["density"], 1e-30) * a3inv) \
            ** C.GAMMA_MINUS1 / C.GAMMA_MINUS1
        entropy = st["entropy"] + jnp.where(
            kicked, utg / jnp.maximum(enttou, 1e-30), 0.0)
        if par.model & WIND_DECOUPLE_SPH \
                and par.max_free_travel_time > 0:
            delay = par.free_travel_length / jnp.maximum(
                v_g / atime, 1e-30)
            delay = jnp.minimum(delay, par.max_free_travel_time)
            delay_time = jnp.where(kicked, delay, st["delay_time"])
        else:
            delay_time = st["delay_time"]
        # advance decoupling timers / density recoupling every step
        # (winds_evolve, winds.c:113-136)
        delay_time = winds_decouple_update(
            par, delay_time, st["density"], scal["dtime"], atime)
        delay_time = jnp.where(gas, delay_time, st["delay_time"])

        upd = {"vel": vel, "entropy": entropy,
               "delay_time": delay_time}
        stats = {
            "n_new": jnp.sum(ok_g.astype(jnp.int32)),
            "n_kicked": lax.psum(jnp.sum(kicked.astype(jnp.int32)),
                                 "x"),
            "ovf": lax.psum(ovf.astype(jnp.int32), "x"),
        }
        return upd, stats

    st_keys = ("ipos", "vel", "mass", "valid", "pid", "ptype", "hsml",
               "entropy", "density", "delay_time", "gas_mask",
               "formation_time")
    fn = shard_map(
        local, mesh=mesh,
        in_specs=({k: P("x") for k in st_keys},
                  {k: P() for k in ("atime", "dtime", "aform_min",
                                    "rng_wind")}),
        out_specs=({k: P("x") for k in
                    ("vel", "entropy", "delay_time")},
                   {k: P() for k in ("n_new", "n_kicked", "ovf")}),
        check_vma=False)
    return jax.jit(fn)
