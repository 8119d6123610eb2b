"""Galactic winds (libgadget/winds.c + veldisp.c).

Wind models as flag combinations (winds.c:60-100):
* sh03  = subgrid + decouple + fixed efficiency
* vs08  = fixed efficiency
* ofjt10 = halo (velocity-dispersion scaled) + decouple (default)

The subgrid model kicks the star-forming gas itself after star
formation (winds_make_after_sf, winds.c:572-589); the halo model scales
the wind speed with the local DM velocity dispersion (veldisp.c), which
here is a vectorized neighbor-pair reduction over the DM tree.
Decoupled particles (DelayTime > 0) skip hydro forces and recouple by
time or density (winds.c:113-136).
"""

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import constants as C
from .sfr import _id_uniform

WIND_SUBGRID = 1
WIND_DECOUPLE_SPH = 2
WIND_USE_HALO = 4
WIND_FIXED_EFFICIENCY = 8


@dataclass
class WindParams:
    model: int = WIND_USE_HALO | WIND_DECOUPLE_SPH  # ofjt10
    efficiency: float = 2.0          # WindEfficiency
    energy_fraction: float = 1.0     # WindEnergyFraction
    sigma0: float = 353.0            # km/s
    speed_factor: float = 3.7
    free_travel_length: float = 20.0
    free_travel_dens_fac: float = 0.1
    min_wind_velocity: float = 0.0
    thermal_factor: float = 0.0
    max_free_travel_time: float = 60.0  # Myr (converted by init)
    # derived
    wind_speed: float = 0.0
    free_travel_dens_thresh: float = 0.0


def init_winds(par: WindParams, factor_sn, egy_spec_sn,
               phys_dens_thresh, unit_time_in_s):
    """init_winds (winds.c:87-102)."""
    par.wind_speed = np.sqrt(2 * par.energy_fraction * factor_sn
                             * egy_spec_sn / (1 - factor_sn))
    par.max_free_travel_time = (par.max_free_travel_time
                                * C.SEC_PER_MEGAYEAR / unit_time_in_s)
    par.free_travel_dens_thresh = par.free_travel_dens_fac \
        * phys_dens_thresh
    if par.model & WIND_FIXED_EFFICIENCY:
        par.wind_speed /= np.sqrt(par.efficiency)
    return par


def get_wind_kick(par: WindParams, vdisp, atime):
    """(vel, windeff, utherm) per particle (get_wind_params,
    winds.c:497-511).  vdisp in internal velocity units."""
    vphys = vdisp / atime
    utherm = par.thermal_factor * 1.5 * vphys * vphys
    if par.model & WIND_FIXED_EFFICIENCY:
        windeff = jnp.full_like(vdisp, par.efficiency)
        vel = jnp.full_like(vdisp, par.wind_speed * atime)
    else:  # halo model
        windeff = par.sigma0 ** 2 / (vphys * vphys + 2 * utherm + 1e-30)
        vel = par.speed_factor * vdisp
    vel = jnp.maximum(vel, par.min_wind_velocity * atime)
    return vel, windeff, utherm


def winds_subgrid(par: WindParams, key, *, sm, mass, pid, vdisp, vel,
                  entropy, density, delay_time, eligible, atime):
    """Subgrid wind kicks after star formation (winds_make_after_sf +
    wind_do_kick, winds.c:454-589), vectorized.

    sm: stellar mass formed this step per particle. Returns updated
    (vel, entropy, delay_time, kicked mask)."""
    wvel, windeff, utherm = get_wind_kick(par, vdisp, atime)
    pw = windeff * sm / jnp.maximum(mass, 1e-30)
    prob = 1 - jnp.exp(-pw)
    draw = _id_uniform(key, pid + 2)
    kicked = eligible & (draw < prob) & (wvel > 0)
    # isotropic direction from per-ID deviates
    u1 = _id_uniform(key, pid + 3)
    u2 = _id_uniform(key, pid + 4)
    costheta = 2 * u1 - 1
    sintheta = jnp.sqrt(jnp.maximum(1 - costheta ** 2, 0.0))
    phi = 2 * np.pi * u2
    direction = jnp.stack([sintheta * jnp.cos(phi),
                           sintheta * jnp.sin(phi), costheta], axis=-1)
    vel_new = vel + jnp.where(kicked[:, None],
                              wvel[:, None] * direction, 0.0)
    a3inv = 1.0 / atime ** 3
    enttou = (density * a3inv) ** C.GAMMA_MINUS1 / C.GAMMA_MINUS1
    ent_new = entropy + jnp.where(kicked,
                                  utherm / jnp.maximum(enttou, 1e-30),
                                  0.0)
    if par.model & WIND_DECOUPLE_SPH and par.max_free_travel_time > 0:
        delay = par.free_travel_length / jnp.maximum(
            wvel / atime, 1e-30)
        delay = jnp.minimum(delay, par.max_free_travel_time)
        delay_new = jnp.where(kicked, delay, delay_time)
    else:
        delay_new = delay_time
    return vel_new, ent_new, delay_new, kicked


def winds_decouple_update(par: WindParams, delay_time, density, dtime,
                          atime):
    """Advance the decoupling timers and recouple by density
    (winds.c:113-136)."""
    delay = jnp.maximum(delay_time - dtime, 0.0)
    a3inv = 1.0 / atime ** 3
    recouple = density * a3inv < par.free_travel_dens_thresh
    return jnp.where(recouple, 0.0, delay)


def dm_velocity_dispersion(ipos, vel, mass, is_dm, is_gas, boxsize,
                           mean_sep, nsearch_radius=2.0,
                           radius_per_particle=None):
    """1D DM velocity dispersion around gas particles
    (winds_find_vel_disp, veldisp.c): a neighbor-pair reduction of
    sum(v), sum(v^2), count over DM within the search radius.

    radius_per_particle: optional f32[N] per-TARGET radius in internal
    units (e.g. each BH's own Hsml, veldisp.c:60-76); overrides the
    fixed nsearch_radius*mean_sep."""
    from ..ops import pairs
    from ..gravity.tree import build_tree
    from ..gravity.treewalk import make_target_groups
    from ..ops.morton import morton_key

    n = ipos.shape[0]
    keys = morton_key(ipos)
    # the tree must CONTAIN the gas rows so they can be targets;
    # sources are filtered to DM inside the pair function (round-1
    # built the tree over DM only, which silently computed the
    # dispersion at DM positions instead of the gas)
    include = is_dm | is_gas
    keys_in = jnp.where(include, keys, ~jnp.uint64(0))
    perm = jnp.argsort(keys_in)
    inv = jnp.argsort(perm)
    ipos_s = ipos[perm]
    valid_s = include[perm]
    pos_box = ipos_s.astype(jnp.float32) * jnp.float32(2.0 ** -32)
    cap = 2 * n + 64
    tree = build_tree(keys_in[perm], ipos_s, mass[perm], valid_s,
                      16, 18, cap, group_max=32)
    group_cap = min((8 * n) // 32 + 64, n + 64)
    leaf_nodes, gc, gh, _, ngr, _ = make_target_groups(
        tree, pos_box, jnp.full(n, jnp.inf, jnp.float32), group_cap, 32)
    if radius_per_particle is not None:
        rad_s = radius_per_particle[perm] * jnp.float32(1.0 / boxsize)
        # per-group search radius = max member radius
        safe_nodes = jnp.minimum(leaf_nodes, tree.capacity - 1)
        tps = tree.pstart[safe_nodes]
        offg = jnp.arange(32, dtype=jnp.int32)
        tidx = jnp.clip(tps[:, None] + offg[None, :], 0, n - 1)
        tpc = jnp.where(leaf_nodes < tree.n_nodes,
                        tree.pcount[safe_nodes], 0)
        tm = offg[None, :] < tpc[:, None]
        gradius = jnp.max(jnp.where(tm, rad_s[tidx], 0.0), axis=1)
    else:
        radius = nsearch_radius * mean_sep / boxsize
        rad_s = jnp.full(n, radius, jnp.float32)
        gradius = jnp.full(gc.shape[0], radius, jnp.float32)
    nbr, _ = pairs.find_neighbors_auto(
        tree, leaf_nodes, gc, gh, gradius, None, 96, symmetric=False,
        cache_key=("vdisp", n))

    def pair_fn(dx, r, tmask, smask, tfeat, sfeat):
        near = (r < tfeat["rad"]) & (sfeat["isdm"] > 0)
        w = jnp.where(near, 1.0, 0.0)
        return {"n": w,
                "vx": w * sfeat["v"][..., 0],
                "vy": w * sfeat["v"][..., 1],
                "vz": w * sfeat["v"][..., 2],
                "v2": w * jnp.sum(sfeat["v"] ** 2, axis=-1)}

    out = pairs.pair_reduce(
        pair_fn, nbr, tree, pos_box, {"rad": rad_s},
        {"v": vel[perm], "isdm": is_dm[perm].astype(jnp.float32)},
        {k: "sum" for k in ("n", "vx", "vy", "vz", "v2")}, 32, 16)
    cnt = jnp.maximum(out["n"], 1.0)
    vmean2 = (out["vx"] ** 2 + out["vy"] ** 2 + out["vz"] ** 2) \
        / cnt ** 2
    var3d = jnp.maximum(out["v2"] / cnt - vmean2, 0.0)
    vdisp = jnp.sqrt(var3d / 3.0)
    return vdisp[inv]


def _pair_uniform(a_ids, b_ids):
    """Deterministic uniform in [0,1) from two particle-ID arrays
    (the reference's get_random_number(I->ID + P[other].ID) analog,
    winds.c:548): a splitmix-style integer hash of the ID sum."""
    x = (a_ids + b_ids).astype(jnp.uint32)
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7feb352d)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x846ca68b)
    x = x ^ (x >> jnp.uint32(16))
    return x.astype(jnp.float32) * jnp.float32(2.0 ** -32)


def winds_via_neighbors(par: WindParams, key, *, ipos, mass, hsml, pid,
                        vel, entropy, density, delay_time, is_gas,
                        new_star, star_vdisp, boxsize, atime):
    """Non-subgrid wind kicks: gas NEIGHBORS of newly formed stars are
    stochastically ejected (winds_and_feedback + sfr_wind_weight/
    feedback ngbiters, winds.c:299-567).

    Three pair passes through the shared engine, all on one tree over
    gas + new stars: (1) per-star total gas weight inside its Hsml;
    (2) per-gas nearest hitting star (kick candidates are resolved to
    the closest star, winds.c:320-345); (3) that star's kick
    velocity/heat gathered to the gas.  Returns (vel, entropy,
    delay_time, kicked mask)."""
    from ..ops import pairs
    from ..ops.morton import morton_key
    from ..gravity.tree import build_tree
    from ..gravity.treewalk import make_target_groups

    n = ipos.shape[0]
    include = is_gas | new_star
    keys = morton_key(ipos)
    keys = jnp.where(include, keys, ~jnp.uint64(0))
    perm = jnp.argsort(keys)
    inv = jnp.argsort(perm)
    ipos_s = ipos[perm]
    include_s = include[perm]
    pos_box = ipos_s.astype(jnp.float32) * jnp.float32(2.0 ** -32)
    cap = 2 * n + 64
    G = 32
    tree = build_tree(keys[perm], ipos_s, mass[perm], include_s,
                      16, 18, cap, group_max=G)
    group_cap = min((8 * n) // G + 64, n + 64)
    leaf_nodes, gc, gh, _, ngr, _ = make_target_groups(
        tree, pos_box, jnp.full(n, jnp.inf, jnp.float32), group_cap, G)
    inv_box = 1.0 / boxsize

    is_gas_s = is_gas[perm]
    new_star_s = new_star[perm]
    eligible_s = is_gas_s & (delay_time[perm] <= 0)
    gmass_s = jnp.where(eligible_s, mass[perm], 0.0)
    hsml_s = jnp.where(new_star_s, hsml[perm], 0.0) * inv_box
    # ids reduced mod 2^24 so they stay exact in f32 pair features
    pid_s = (pid[perm] & jnp.int64(0xFFFFFF)).astype(jnp.uint32)

    safe_nodes = jnp.minimum(leaf_nodes, tree.capacity - 1)
    tps = tree.pstart[safe_nodes]
    offg = jnp.arange(G, dtype=jnp.int32)
    tidx = jnp.clip(tps[:, None] + offg[None, :], 0, n - 1)
    tpc = jnp.where(leaf_nodes < tree.n_nodes,
                    tree.pcount[safe_nodes], 0)
    tm = offg[None, :] < tpc[:, None]
    gradius = jnp.max(jnp.where(tm, hsml_s[tidx], 0.0), axis=1)

    # -- pass 1: per-star total gas weight (sfr_wind_weight, wk=1) ----
    def weight_fn(dx, r, tmask, smask, tfeat, sfeat):
        inside = (r < tfeat["hsml"]) & (sfeat["gm"] > 0)
        return {"w": jnp.where(inside, sfeat["gm"], 0.0)}

    nbr, ll = pairs.find_neighbors_auto(
        tree, leaf_nodes, gc, gh, gradius, None, 256, symmetric=False,
        cache_key=("wind_weight", n))
    out = pairs.pair_reduce(
        weight_fn, nbr, tree, pos_box, {"hsml": hsml_s},
        {"gm": gmass_s}, {"w": "sum"}, G, 16)
    total_weight_s = out["w"]

    # -- pass 2+3: gas <- star candidate kicks --------------------------
    lf_ids, n_lf, _ = pairs.compact_leaves(tree, cap)
    hmax = pairs.node_hmax(tree, lf_ids, n_lf, hsml_s, 16)
    wvel_s, windeff_s, utherm_s = get_wind_kick(
        par, jnp.where(new_star_s, star_vdisp[perm], 0.0), atime)
    p_s = windeff_s * mass[perm] / jnp.maximum(total_weight_s, 1e-30)
    star_ok_s = new_star_s & (total_weight_s > 0) & (wvel_s > 0) \
        & (star_vdisp[perm] > 0)

    def hit(r, tfeat, sfeat):
        u = _pair_uniform(sfeat["sid"].astype(jnp.uint32),
                          tfeat["tid"].astype(jnp.uint32))
        return ((r < sfeat["hsml"]) & (sfeat["ok"] > 0)
                & (tfeat["elig"] > 0) & (u < sfeat["p"]))

    BIGR = jnp.float32(4.0)

    def near_fn(dx, r, tmask, smask, tfeat, sfeat):
        h = hit(r, tfeat, sfeat)
        return {"rkey": jnp.where(h, BIGR - r, -jnp.inf)}

    nbr2, _ = pairs.find_neighbors_auto(
        tree, leaf_nodes, gc, gh,
        jnp.zeros(gc.shape[0], jnp.float32), hmax, ll, symmetric=True,
        cache_key=("wind_kick", n))
    # float ID features: pair_uniform needs integer-ish values; pass
    # the uint32 ids bit-cast through float32 is lossy, so use two
    # feature arrays holding the low/high 16 bits exactly.
    tidf = pid_s.astype(jnp.float32)
    tfeats = {"tid": tidf, "elig": eligible_s.astype(jnp.float32)}
    sfeats = {"sid": tidf, "hsml": hsml_s,
              "ok": star_ok_s.astype(jnp.float32), "p": p_s}
    out2 = pairs.pair_reduce(near_fn, nbr2, tree, pos_box, tfeats,
                             sfeats, {"rkey": "max"}, G, 16)
    rkey_s = out2["rkey"]

    def kick_fn(dx, r, tmask, smask, tfeat, sfeat):
        h = hit(r, tfeat, sfeat)
        sel = h & (jnp.abs((BIGR - r) - tfeat["rkey"]) < 1e-9)
        w = sel.astype(jnp.float32)
        return {"v": w * sfeat["v"], "ut": w * sfeat["ut"],
                "n": w}

    tfeats2 = dict(tfeats)
    tfeats2["rkey"] = rkey_s
    sfeats2 = dict(sfeats)
    sfeats2["v"] = jnp.where(star_ok_s, wvel_s, 0.0)
    sfeats2["ut"] = jnp.where(star_ok_s, utherm_s, 0.0)
    out3 = pairs.pair_reduce(kick_fn, nbr2, tree, pos_box, tfeats2,
                             sfeats2, {"v": "sum", "ut": "sum",
                                       "n": "sum"}, G, 16)
    nsel = jnp.maximum(out3["n"], 1.0)
    v_g = (out3["v"] / nsel)[inv]
    ut_g = (out3["ut"] / nsel)[inv]
    kicked = (out3["n"] > 0)[inv] & is_gas & (delay_time <= 0)

    # -- wind_do_kick, vectorized (winds.c:454-489) -------------------
    ids32 = pid.astype(jnp.int64)
    u1 = _id_uniform(key, ids32 + 3)
    u2 = _id_uniform(key, ids32 + 4)
    costheta = 2 * u1 - 1
    sintheta = jnp.sqrt(jnp.maximum(1 - costheta ** 2, 0.0))
    phi = 2 * np.pi * u2
    direction = jnp.stack([sintheta * jnp.cos(phi),
                           sintheta * jnp.sin(phi), costheta], axis=-1)
    vel_new = vel + jnp.where(kicked[:, None], v_g[:, None] * direction,
                              0.0)
    a3inv = 1.0 / atime ** 3
    enttou = (density * a3inv) ** C.GAMMA_MINUS1 / C.GAMMA_MINUS1
    ent_new = entropy + jnp.where(
        kicked, ut_g / jnp.maximum(enttou, 1e-30), 0.0)
    if par.model & WIND_DECOUPLE_SPH and par.max_free_travel_time > 0:
        delay = par.free_travel_length / jnp.maximum(v_g / atime, 1e-30)
        delay = jnp.minimum(delay, par.max_free_travel_time)
        delay_new = jnp.where(kicked, delay, delay_time)
    else:
        delay_new = delay_time
    return vel_new, ent_new, delay_new, kicked
