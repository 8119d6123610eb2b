"""Black holes: Bondi accretion, gas swallowing, thermal feedback,
mergers, FOF seeding (libgadget/blackhole.c, fof_seed in fof.c).

Design: the per-BH neighbor sums (density, smoothed entropy, gas
velocity, feedback weights) run through the shared pair engine with BH
targets and gas sources (the reference's two BH treewalks,
blackhole.c:216-360).  Swallowing marks gas stochastically with
p = (M_BH - M_dyn) wk / rho (blackhole.c:577-614).  Operations over the
BH set itself (mergers, swallowed-mass bookkeeping, seeding) run on the
host: black holes are few, and these are O(N_BH) scalar updates.
"""

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..utils import constants as C
from .sfr import _id_uniform


@dataclass
class BHParams:
    accretion_factor: float = 100.0
    eddington_factor: float = 2.1
    feedback_factor: float = 0.05
    seed_mass: float = 2e-5
    ngb_factor: float = 2.0
    min_fof_mass_for_seed: float = 2.0
    min_mstar_for_seed: float = 5e-4
    seed_bh_dyn_mass: float = -1.0
    reposition_enabled: bool = False
    kinetic_on: bool = False
    merge_grav_bound: bool = True
    # dynamical friction (bhdynfric.c set_blackhole_dynfric_params)
    dynfric_method: int = 0     # 0 off, 1 stars, 2 +DM, 3 +gas
    df_boost: float = 1.0
    df_bmax: float = 20.0
    # kinetic feedback (gadget/params.c:232-239)
    ke_eddington_thr_factor: float = 0.05
    ke_eddington_m_factor: float = 0.002
    ke_eddington_m_pivot: float = 0.05
    ke_eddington_m_index: float = 2.0
    ke_eff_rho_factor: float = 0.05
    ke_eff_cap: float = 0.05
    ke_inj_energy_thr: float = 5.0
    ke_sfr_crit_overdensity: float = 57.7


@struct.dataclass
class BhData:
    """Aligned per-particle BH fields (bh_particle_data analog,
    slotsmanager.h:29-68)."""
    bh_mass: jnp.ndarray      # f32[N] subgrid mass
    mdot: jnp.ndarray         # f32[N]
    bh_density: jnp.ndarray   # f32[N] gas density at the BH
    mtrack: jnp.ndarray       # f32[N]
    formation_time: jnp.ndarray  # f32[N]
    count_progs: jnp.ndarray  # int32[N]
    df_accel: jnp.ndarray     # f32[N,3] dynamical friction accel
    kinetic_energy: jnp.ndarray  # f32[N] stored KineticFdbkEnergy
    vdisp: jnp.ndarray        # f32[N] 1D DM velocity dispersion
    min_pot_pos: jnp.ndarray  # f32[N,3] potential-minimum position

    @classmethod
    def zeros(cls, n):
        z = jnp.zeros((n,), jnp.float32)
        return cls(bh_mass=z, mdot=z, bh_density=z, mtrack=z,
                   formation_time=z,
                   count_progs=jnp.zeros((n,), jnp.int32),
                   df_accel=jnp.zeros((n, 3), jnp.float32),
                   kinetic_energy=z, vdisp=z,
                   min_pot_pos=jnp.zeros((n, 3), jnp.float32))


def _bh_pair_setup(ipos, mass, hsml, include, is_bh, boxsize):
    """Shared engine setup for BH-target neighbor passes: tree over
    `include` particles, target groups, neighbor lists with each
    group's search radius = max BH hsml among its members.  Returns
    (tree, nbr, perm, inv, pos_box)."""
    from ..ops import pairs
    from ..ops.morton import morton_key
    from ..gravity.tree import build_tree
    from ..gravity.treewalk import make_target_groups

    n = ipos.shape[0]
    keys = morton_key(ipos)
    keys = jnp.where(include, keys, ~jnp.uint64(0))
    perm = jnp.argsort(keys)
    inv = jnp.argsort(perm)
    ipos_s = ipos[perm]
    pos_box = ipos_s.astype(jnp.float32) * jnp.float32(2.0 ** -32)
    cap = 2 * n + 64
    tree = build_tree(keys[perm], ipos_s, mass[perm], include[perm],
                      16, 18, cap, group_max=32)
    group_cap = min((8 * n) // 32 + 64, n + 64)
    leaf_nodes, gc, gh, _, _, _ = make_target_groups(
        tree, pos_box, jnp.full(n, jnp.inf, jnp.float32), group_cap, 32)

    hs = (hsml * jnp.float32(1.0 / boxsize))[perm]
    hs = jnp.where(is_bh[perm], hs, 0.0)
    offg = jnp.arange(32, dtype=jnp.int32)
    safe = jnp.minimum(leaf_nodes, tree.capacity - 1)
    tps = tree.pstart[safe]
    tpc = jnp.where(leaf_nodes < tree.n_nodes, tree.pcount[safe], 0)
    tidx = jnp.clip(tps[:, None] + offg[None, :], 0, n - 1)
    tm = offg[None, :] < tpc[:, None]
    gradius = jnp.max(jnp.where(tm, hs[tidx], 0.0), axis=1)
    nbr, _ = pairs.find_neighbors_auto(
        tree, leaf_nodes, gc, gh, gradius, None, 64, symmetric=False,
        cache_key=("bh_pair", n))
    return tree, nbr, perm, inv, pos_box


def bh_neighbor_sums(ipos, mass, hsml, velpred, entropy, is_bh, is_gas,
                     boxsize, kernel_type=2):
    """BH accretion treewalk sums (blackhole_accretion_ngbiter):
    per-BH rho, smoothed entropy, mass-weighted gas velocity, feedback
    weight sum (spline+mass weighting), enclosed gas mass (MgasEnc for
    kinetic feedback, blackhole.c:643-648).  Returns dict [N] arrays
    (nonzero only at BH rows)."""
    from ..ops import pairs
    from ..sph import kernels as K

    include = is_bh | is_gas
    tree, nbr, perm, inv, pos_box = _bh_pair_setup(
        ipos, mass, hsml, include, is_bh, boxsize)
    L = boxsize

    def pair_fn(dx, r, tmask, smask, tfeat, sfeat):
        ri = r * L
        h = tfeat["hsml"]
        inside = (ri < h) & (tfeat["isbh"] > 0) & (sfeat["isgas"] > 0)
        hinv = 1.0 / jnp.maximum(h, 1e-30)
        wk = jnp.where(inside, K.kernel_wk(ri * hinv, hinv, kernel_type),
                       0.0)
        mj = sfeat["mass"]
        return {"rho": mj * wk,
                "fbweight": mj * wk,
                "ent": mj * wk * sfeat["entropy"],
                "vx": mj * wk * sfeat["v"][..., 0],
                "vy": mj * wk * sfeat["v"][..., 1],
                "vz": mj * wk * sfeat["v"][..., 2],
                "mgas": jnp.where(inside, mj, 0.0)}

    out = pairs.pair_reduce(
        pair_fn, nbr, tree, pos_box,
        {"hsml": hsml[perm], "isbh": is_bh[perm].astype(jnp.float32)},
        {"mass": jnp.where(is_gas[perm], mass[perm], 0.0),
         "v": velpred[perm], "entropy": entropy[perm],
         "isgas": is_gas[perm].astype(jnp.float32)},
        {k: "sum" for k in ("rho", "fbweight", "ent", "vx", "vy",
                            "vz", "mgas")}, 32, 16)
    return {k: v[inv] for k, v in out.items()}


def bh_dynfric_sums(ipos, mass, hsml, velpred, is_bh, src_mask,
                    boxsize, kernel_type=2):
    """Dynamical-friction environment sums
    (blackhole_dynfric_ngbiter, bhdynfric.c:233-270): kernel-weighted
    density, mean velocity and mean squared velocity of the background
    (stars / +DM / +gas per BH_DynFrictionMethod) around each BH.
    Returns dict [N]: rho, vel[N,3], rmsvel (already normalized)."""
    from ..ops import pairs
    from ..sph import kernels as K

    include = is_bh | src_mask
    tree, nbr, perm, inv, pos_box = _bh_pair_setup(
        ipos, mass, hsml, include, is_bh, boxsize)
    L = boxsize

    def pair_fn(dx, r, tmask, smask, tfeat, sfeat):
        ri = r * L
        h = tfeat["hsml"]
        inside = (ri < h) & (tfeat["isbh"] > 0) & (sfeat["issrc"] > 0)
        hinv = 1.0 / jnp.maximum(h, 1e-30)
        wk = jnp.where(inside,
                       K.kernel_wk(ri * hinv, hinv, kernel_type), 0.0)
        mwk = sfeat["mass"] * wk
        v = sfeat["v"]
        return {"rho": mwk,
                "vx": mwk * v[..., 0], "vy": mwk * v[..., 1],
                "vz": mwk * v[..., 2],
                "v2": mwk * jnp.sum(v * v, axis=-1)}

    out = pairs.pair_reduce(
        pair_fn, nbr, tree, pos_box,
        {"hsml": hsml[perm], "isbh": is_bh[perm].astype(jnp.float32)},
        {"mass": jnp.where(src_mask[perm], mass[perm], 0.0),
         "v": velpred[perm],
         "issrc": src_mask[perm].astype(jnp.float32)},
        {k: "sum" for k in ("rho", "vx", "vy", "vz", "v2")}, 32, 16)
    rho = out["rho"][inv]
    safe = jnp.maximum(rho, 1e-30)
    vel = jnp.stack([out["vx"][inv], out["vy"][inv],
                     out["vz"][inv]], axis=-1) / safe[:, None]
    rmsvel = jnp.sqrt(jnp.maximum(out["v2"][inv] / safe, 0.0))
    return {"rho": rho, "vel": vel, "rmsvel": rmsvel}


def dynfric_accel(rho, vel_sur, rmsvel, mass_dyn, vel, atime, G,
                  bmax=20.0, boost=1.0):
    """Chandrasekhar dynamical friction in the Gizmo form
    (blackhole_compute_dfaccel, bhdynfric.c:84-145):
      a_DF = -4 pi G^2 M rho ln(Lambda) f(x) dv / |dv|^3 * a * boost
      f(x) = erf(x) - 2 x exp(-x^2)/sqrt(pi),  x = |dv|/(sqrt2 sigma/3)
      Lambda = 1 + bmax |dv_phys|^2 / (G M).
    All in internal (comoving) units; returns accel [N,3]."""
    dv = vel - vel_sur
    bhvel = jnp.sqrt(jnp.sum(dv * dv, axis=-1))
    sigma = jnp.maximum(rmsvel / 3.0, 1e-30)
    x = bhvel / (np.sqrt(2.0) * sigma)
    # erf via the same exp approximation as the reference
    a_erf = 8 * (np.pi - 3) / (3 * np.pi * (4.0 - np.pi))
    x2 = x * x
    erf_x = jnp.sqrt(jnp.maximum(
        1 - jnp.exp(-x2 * (4 / np.pi + a_erf * x2)
                    / (1 + a_erf * x2)), 0.0))
    f_of_x = jnp.maximum(erf_x - 2 * x / np.sqrt(np.pi)
                         * jnp.exp(-x2), 0.0)
    lam = 1.0 + bmax * (bhvel / atime) ** 2 \
        / (G * jnp.maximum(mass_dyn, 1e-30))
    pref = jnp.where(
        (rho > 0) & (bhvel > 0),
        -4 * np.pi * G * G * mass_dyn * rho * jnp.log(lam) * f_of_x
        / jnp.maximum(bhvel, 1e-30) ** 3 * atime * boost, 0.0)
    return pref[:, None] * dv


def kinetic_update(par: BHParams, bh_mass, mdot, bh_density, vdisp,
                   mgas_enc, ke_energy, dtime, unit_time_in_s,
                   hubble_param, rho_crit_baryon, unit_velocity):
    """AGN kinetic channel bookkeeping (blackhole.c:437-467):
    accumulate dE = eps mdot c^2 dt while the Eddington ratio is below
    the (mass-dependent) threshold; flag release when the stored energy
    exceeds BHKE_InjEnergyThr x (1/2) VDisp^2 Mgas_enc.
    Returns (ke_energy_new, keflag) with keflag 0/1/2."""
    meddington = (4 * np.pi * C.GRAVITY * C.LIGHTCGS * C.PROTONMASS
                  / (0.1 * C.LIGHTCGS ** 2 * C.THOMPSON)) * bh_mass \
        * unit_time_in_s / hubble_param
    edd_ratio = mdot / jnp.maximum(meddington, 1e-30)
    lam_thresh = jnp.minimum(
        par.ke_eddington_thr_factor,
        par.ke_eddington_m_factor
        * (bh_mass / par.ke_eddington_m_pivot)
        ** par.ke_eddington_m_index)
    accumulating = edd_ratio < lam_thresh
    rho_sfr = par.ke_sfr_crit_overdensity * rho_crit_baryon
    eps = jnp.minimum(bh_density / rho_sfr / par.ke_eff_rho_factor,
                      par.ke_eff_cap)
    de = eps * mdot * dtime * (C.LIGHTCGS / unit_velocity) ** 2
    ke_new = jnp.where(accumulating, ke_energy + de, ke_energy)
    thresh = 0.5 * vdisp * vdisp * mgas_enc * par.ke_inj_energy_thr
    release = (vdisp > 0) & (ke_new > thresh)
    keflag = jnp.where(release, 2,
                       jnp.where(accumulating, 1, 0)).astype(jnp.int32)
    return ke_new, keflag


def bh_mergers(par: BHParams, *, pos, vel, accel, df_accel, pid,
               is_bh, boxsize, atime, softening):
    """BH-BH mergers (blackhole_accretion_ngbiter BH branch,
    blackhole.c:495-560 + check_grav_bound :163-181).

    Host-side O(N_BH^2): BHs are few and the swallow-ID resolution is
    inherently sequential.  Two BHs merge when r < 2 x softening
    (2 FORCE_SOFTENING/2.8) and, with MergeGravBound, when
    KE/a^2 + (da.dx)/a <= 0.  The larger ID swallows; a swallower that
    is itself swallowed forwards its prey (SwallowID chain).
    Returns (merge mask [N] of swallowed rows, swallower row per
    swallowed, updated host arrays dict) -- caller applies them.
    """
    rows = np.nonzero(np.asarray(is_bh))[0]
    nb = len(rows)
    out = {"swallowed": np.zeros(0, np.int64),
           "swallower": np.zeros(0, np.int64)}
    if nb < 2:
        return out
    p = np.asarray(pos, np.float64)[rows]
    v = np.asarray(vel, np.float64)[rows]
    a_full = (np.asarray(accel, np.float64)
              + np.asarray(df_accel, np.float64))[rows]
    ids = np.asarray(pid)[rows]
    dx = p[:, None, :] - p[None, :, :]
    dx -= np.round(dx / boxsize) * boxsize
    r = np.linalg.norm(dx, axis=-1)
    close = (r < 2 * softening) & ~np.eye(nb, dtype=bool)
    if par.merge_grav_bound:
        dv = v[:, None, :] - v[None, :, :]
        da = a_full[:, None, :] - a_full[None, :, :]
        ke = 0.5 * np.sum(dv * dv, axis=-1) / atime ** 2
        pe = np.sum(da * dx, axis=-1) / atime
        close &= (ke + pe) <= 0
    # larger ID swallows smaller (blackhole.c:545-552)
    swallower_of = np.full(nb, -1, np.int64)
    order = np.argsort(-ids.astype(np.int64), kind="stable")
    for i in order:            # big IDs claim prey first
        for j in range(nb):
            if close[i, j] and ids[i] > ids[j] \
                    and swallower_of[j] < 0 and swallower_of[i] < 0:
                swallower_of[j] = i
    # collapse chains (a swallowed swallower cannot happen given the
    # swallower_of[i] < 0 guard above, but keep it robust)
    for j in range(nb):
        k = swallower_of[j]
        while k >= 0 and swallower_of[k] >= 0:
            k = swallower_of[k]
        swallower_of[j] = k
    sw = np.nonzero(swallower_of >= 0)[0]
    out["swallowed"] = rows[sw]
    out["swallower"] = rows[swallower_of[sw]]
    return out


def bondi_accretion(par: BHParams, bh_mass, rho_com, entropy_sm,
                    gasvel, vel, atime, G, unit_time_in_s, hubble_param,
                    dtime):
    """Bondi-Hoyle rate with Eddington cap
    (blackhole_accretion_postprocess, blackhole.c:373-414)."""
    a3inv = 1.0 / atime ** 3
    meddington = (4 * np.pi * C.GRAVITY * C.LIGHTCGS * C.PROTONMASS
                  / (0.1 * C.LIGHTCGS ** 2 * C.THOMPSON)) * bh_mass \
        * unit_time_in_s / hubble_param
    safe_rho = jnp.maximum(rho_com, 1e-30)
    ent = entropy_sm / safe_rho
    vgas = gasvel / safe_rho[:, None]
    cs = jnp.sqrt(C.GAMMA * jnp.maximum(ent, 0.0)
                  * safe_rho ** C.GAMMA_MINUS1) \
        * atime ** (-1.5 * C.GAMMA_MINUS1)
    bhvel = jnp.sqrt(jnp.sum((vel - vgas) ** 2, axis=-1)) / atime
    norm = (cs * cs + bhvel * bhvel) ** 1.5
    mdot = jnp.where(
        (rho_com > 0) & (norm > 0),
        4 * np.pi * par.accretion_factor * G * G * bh_mass * bh_mass
        * (rho_com * a3inv) / jnp.maximum(norm, 1e-30), 0.0)
    if par.eddington_factor > 0:
        mdot = jnp.minimum(mdot, par.eddington_factor * meddington)
    return mdot, mdot * dtime


def swallow_and_feedback(par: BHParams, key, *, ipos, mass, hsml,
                         entropy, density, is_bh, is_gas, pid, bh_mass,
                         mdot, bh_density, fbweight, boxsize, atime,
                         dtime, unit_velocity, uu_in_cgs,
                         kernel_type=2, ke_energy=None, keflag=None,
                         mtrack=None):
    """Gas-side pass: stochastic swallowing + thermal feedback
    (blackhole_feedback_ngbiter, blackhole.c:577-614, 843-868).

    Each gas particle sums its swallow probability and injected energy
    over neighboring BHs (sources).  Returns (swallowed mask, du per
    gas, swallower bh row (sorted-by-|ID| max), per-BH swallowed
    mass/momentum accumulated on host by the caller)."""
    from ..ops import pairs
    from ..ops.morton import morton_key
    from ..gravity.tree import build_tree
    from ..gravity.treewalk import make_target_groups
    from ..sph import kernels as K

    n = ipos.shape[0]
    include = is_bh | is_gas
    keys = morton_key(ipos)
    keys = jnp.where(include, keys, ~jnp.uint64(0))
    perm = jnp.argsort(keys)
    inv = jnp.argsort(perm)
    ipos_s = ipos[perm]
    pos_box = ipos_s.astype(jnp.float32) * jnp.float32(2.0 ** -32)
    cap = 2 * n + 64
    tree = build_tree(keys[perm], ipos_s, mass[perm], include[perm],
                      16, 18, cap, group_max=32)
    group_cap = min((8 * n) // 32 + 64, n + 64)
    leaf_nodes, gc, gh, _, _, _ = make_target_groups(
        tree, pos_box, jnp.full(n, jnp.inf, jnp.float32), group_cap, 32)
    # search radius: BH hsml via node hmax (symmetric search so gas
    # targets find BHs with larger hsml)
    leaf_ids, n_leaves, _ = pairs.compact_leaves(tree, group_cap * 4)
    hm = pairs.node_hmax(
        tree, leaf_ids, n_leaves,
        jnp.where(is_bh[perm], hsml[perm] / boxsize, 0.0), 16)
    nbr, _ = pairs.find_neighbors_auto(
        tree, leaf_nodes, gc, gh,
        jnp.zeros(gc.shape[0], jnp.float32), hm, 64, symmetric=True,
        cache_key=("bh_feedback", n))

    L = boxsize
    fb_energy = par.feedback_factor * 0.1 * mdot * dtime \
        * (C.LIGHTCGS / unit_velocity) ** 2
    if keflag is not None:
        # kinetic channel suppresses thermal feedback this step
        # (blackhole.c:928-933)
        fb_energy = jnp.where(keflag > 0, 0.0, fb_energy)
    ke_rel = jnp.zeros_like(fb_energy) if ke_energy is None else \
        jnp.where((keflag == 2) if keflag is not None else False,
                  ke_energy, 0.0)

    def pair_fn(dx, r, tmask, smask, tfeat, sfeat):
        ri = r * L
        h = sfeat["hsml"]
        near = (ri < h) & (sfeat["isbh"] > 0) & (tfeat["isgas"] > 0)
        hinv = 1.0 / jnp.maximum(h, 1e-30)
        wk = jnp.where(near, K.kernel_wk(ri * hinv, hinv, kernel_type),
                       0.0)
        # swallow probability (blackhole.c:590-594)
        p = jnp.where(sfeat["bhrho"] > 0,
                      jnp.maximum(sfeat["bhmass"] - sfeat["mdyn"], 0.0)
                      * wk / jnp.maximum(sfeat["bhrho"], 1e-30), 0.0)
        # thermal energy share (blackhole.c:843-846)
        du = jnp.where(sfeat["fbw"] > 0,
                       sfeat["fbe"] * tfeat["mass"] * wk
                       / jnp.maximum(sfeat["fbw"], 1e-30), 0.0) \
            / jnp.maximum(tfeat["mass"], 1e-30)
        # kinetic kick speed (blackhole.c:870-880)
        dv = jnp.where(sfeat["bhrho"] > 0,
                       jnp.sqrt(2.0 * sfeat["ke"] * wk
                                / jnp.maximum(sfeat["bhrho"], 1e-30)),
                       0.0)
        return {"p": p, "du": du, "dv": dv,
                "bhrow": jnp.where(near, sfeat["row"], -1.0)}

    rows = jnp.arange(n, dtype=jnp.float32)[perm]
    # sub-resolution accretion: while Mtrack < SeedBHDynMass the
    # swallow probability uses Mtrack, not the dynamical mass
    # (blackhole.c:583-588)
    mdyn = mass
    if mtrack is not None and par.seed_bh_dyn_mass > 0:
        mdyn = jnp.where(is_bh & (mtrack < par.seed_bh_dyn_mass),
                         mtrack, mass)
    out = pairs.pair_reduce(
        pair_fn, nbr, tree, pos_box,
        {"isgas": is_gas[perm].astype(jnp.float32),
         "mass": mass[perm]},
        {"hsml": jnp.where(is_bh, hsml, 0.0)[perm],
         "isbh": is_bh[perm].astype(jnp.float32),
         "bhmass": bh_mass[perm], "mdyn": mdyn[perm],
         "bhrho": bh_density[perm], "fbw": fbweight[perm],
         "fbe": fb_energy[perm], "ke": ke_rel[perm], "row": rows},
        {"p": "sum", "du": "sum", "dv": "sum", "bhrow": "max"}, 32, 16)
    p = out["p"][inv]
    du = out["du"][inv]
    dv = out["dv"][inv]
    bhrow = out["bhrow"][inv].astype(jnp.int32)
    # random unit direction per gas particle (get_random_dir analog)
    u1 = _id_uniform(jax.random.fold_in(key, 11), pid)
    u2 = _id_uniform(jax.random.fold_in(key, 13), pid)
    ct = 2.0 * u1 - 1.0
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    phi = 2.0 * np.pi * u2
    kick = dv[:, None] * jnp.stack(
        [st * jnp.cos(phi), st * jnp.sin(phi), ct], axis=-1)
    draw = _id_uniform(key, pid)
    swallowed = is_gas & (draw < p) & (bhrow >= 0)
    # cap injected temperature at 5e8 K (add_injected_BH_energy)
    u_to_temp = (4 / (8 - 5 * (1 - C.HYDROGEN_MASSFRAC))) \
        * C.PROTONMASS / C.BOLTZMANN * C.GAMMA_MINUS1 * uu_in_cgs
    a3inv = 1.0 / atime ** 3
    enttou = (density * a3inv) ** C.GAMMA_MINUS1 / C.GAMMA_MINUS1
    u_new = entropy * enttou + du
    u_new = jnp.minimum(u_new, 5.0e8 / u_to_temp)
    ent_new = jnp.where(is_gas & (du > 0),
                        u_new / jnp.maximum(enttou, 1e-30), entropy)
    kick = jnp.where(is_gas[:, None], kick, 0.0)
    return swallowed, ent_new, bhrow, kick


def seed_black_holes(par: BHParams, cat, pdata, bh: BhData, sph,
                     atime):
    """FOF-based seeding (fof_seed, fof.c + run.c:626-630): halos above
    the mass/stellar-mass thresholds without a BH get one, converting
    the densest gas member.  Host-side over the (small) group catalog.
    Returns (pdata, bh, n_seeded)."""
    gi = cat["group_index"]
    ngroups = cat["ngroups"]
    if ngroups == 0:
        return pdata, bh, 0
    ptype = np.asarray(pdata.ptype)
    valid = np.asarray(pdata.valid)
    masses = cat["masses"]
    mstar = cat["mass_by_type"][:, 4]
    has_bh = np.zeros(ngroups, bool)
    sel_bh = valid & (ptype == 5) & (gi >= 0)
    if sel_bh.any():
        has_bh[np.unique(gi[sel_bh])] = True
    eligible = (masses > par.min_fof_mass_for_seed) \
        & (mstar > par.min_mstar_for_seed) & (~has_bh)
    dens = np.asarray(sph.density) if sph is not None else \
        np.asarray(pdata.mass)
    new_bh_rows = []
    for g in np.nonzero(eligible)[0]:
        members = np.nonzero((gi == g) & valid & (ptype == 0))[0]
        if len(members) == 0:
            continue
        new_bh_rows.append(members[np.argmax(dens[members])])
    if not new_bh_rows:
        return pdata, bh, 0
    rows = jnp.asarray(np.array(new_bh_rows))
    pdata = pdata.replace(
        ptype=pdata.ptype.at[rows].set(5))
    bh = bh.replace(
        bh_mass=bh.bh_mass.at[rows].set(par.seed_mass),
        mtrack=bh.mtrack.at[rows].set(pdata.mass[rows]),
        formation_time=bh.formation_time.at[rows].set(atime))
    if par.seed_bh_dyn_mass > 0:
        # fixed seed dynamical mass (blackhole_make, blackhole.c:1100)
        pdata = pdata.replace(
            mass=pdata.mass.at[rows].set(par.seed_bh_dyn_mass))
    return pdata, bh, len(new_bh_rows)


def bh_minpot(ipos, hsml, potential, vel, src_mask, is_bh, boxsize):
    """Minimum-potential neighbor per BH within its kernel
    (blackhole_minpot_ngbiter, bhdynfric.c:199-231): two pair passes —
    an argmin key pass over -Potential, then a gather of the matching
    neighbor's position/velocity.

    Returns (minpot_pos f32[N,3] internal units, minpot_vel f32[N,3],
    found bool[N]) with rows valid where is_bh."""
    from ..ops import pairs

    n = ipos.shape[0]
    include = src_mask | is_bh
    tree, nbr, perm, inv, pos_box = _bh_pair_setup(
        ipos, jnp.ones(n, jnp.float32), hsml, include, is_bh, boxsize)
    inv_box = 1.0 / boxsize
    hsml_s = jnp.where(is_bh, hsml, 0.0)[perm] * inv_box
    pot_s = potential[perm]
    src_s = src_mask[perm].astype(jnp.float32)

    BIG = jnp.float32(1e30)

    def key_fn(dx, r, tmask, smask, tfeat, sfeat):
        near = (r < tfeat["hsml"]) & (sfeat["src"] > 0)
        return {"negpot": jnp.where(near, -sfeat["pot"], -BIG)}

    out1 = pairs.pair_reduce(
        key_fn, nbr, tree, pos_box, {"hsml": hsml_s},
        {"pot": pot_s, "src": src_s},
        {"negpot": "max"}, 32, 16)
    minpot_s = -out1["negpot"]

    def sel_fn(dx, r, tmask, smask, tfeat, sfeat):
        near = (r < tfeat["hsml"]) & (sfeat["src"] > 0)
        sel = near & (sfeat["pot"] <= tfeat["minpot"] + 1e-30)
        w = sel.astype(jnp.float32)
        # positions relative to the target (periodic-safe), vel direct
        res = {"n": w}
        for k in range(3):
            res[f"dx{k}"] = w * dx[..., k]
            res[f"v{k}"] = w * sfeat["vel"][..., k]
        return res

    red = {"n": "sum"}
    red.update({f"dx{k}": "sum" for k in range(3)})
    red.update({f"v{k}": "sum" for k in range(3)})
    out2 = pairs.pair_reduce(
        sel_fn, nbr, tree, pos_box,
        {"hsml": hsml_s, "minpot": minpot_s},
        {"pot": pot_s, "src": src_s, "vel": vel[perm]}, red, 32, 16)
    cnt = jnp.maximum(out2["n"], 1.0)
    dxm = jnp.stack([out2[f"dx{k}"] / cnt for k in range(3)], axis=-1)
    vm = jnp.stack([out2[f"v{k}"] / cnt for k in range(3)], axis=-1)
    pos_min_box = jnp.mod(pos_box + dxm, 1.0)
    found = (out2["n"] > 0)[inv] & is_bh
    return (pos_min_box[inv] * boxsize, vm[inv], found)


def apply_mtrack_accretion(mass, mtrack, acc_mass, acc_mom, vel,
                           is_bh, seed_bh_dyn_mass):
    """Route swallowed gas mass into Mtrack or the dynamical mass
    (blackhole_feedback_postprocess, blackhole.c:960-978), on device.

    Returns (mass, mtrack, vel)."""
    newvel = jnp.where(
        (acc_mass > 0)[:, None],
        (vel * mass[:, None] + acc_mom)
        / jnp.maximum(mass + acc_mass, 1e-30)[:, None], vel)
    dyn = seed_bh_dyn_mass
    if dyn <= 0:
        return mass + jnp.where(is_bh, acc_mass, 0.0), mtrack, newvel
    seed_regime = is_bh & (mtrack + acc_mass < dyn)
    transition = is_bh & (~seed_regime) & (mtrack < dyn)
    regular = is_bh & (mtrack >= dyn)
    new_mass = jnp.where(transition, mtrack + acc_mass,
                         jnp.where(regular, mass + acc_mass, mass))
    new_mtrack = jnp.where(seed_regime, mtrack + acc_mass,
                           jnp.where(transition, dyn, mtrack))
    return new_mass, new_mtrack, newvel
