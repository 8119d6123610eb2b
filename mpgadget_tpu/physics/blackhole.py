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
    kinetic_on: bool = False
    merge_grav_bound: bool = True


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

    @classmethod
    def zeros(cls, n):
        z = jnp.zeros((n,), jnp.float32)
        return cls(bh_mass=z, mdot=z, bh_density=z, mtrack=z,
                   formation_time=z,
                   count_progs=jnp.zeros((n,), jnp.int32))


def bh_neighbor_sums(ipos, mass, hsml, velpred, entropy, is_bh, is_gas,
                     boxsize, kernel_type=2):
    """BH accretion treewalk sums (blackhole_accretion_ngbiter):
    per-BH rho, smoothed entropy, mass-weighted gas velocity, feedback
    weight sum (spline+mass weighting).  Returns dict [N] arrays
    (nonzero only at BH rows)."""
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

    inv_box = 1.0 / boxsize
    hs = (hsml * jnp.float32(inv_box))[perm]
    hs = jnp.where(is_bh[perm], hs, 0.0)
    offg = jnp.arange(32, dtype=jnp.int32)
    safe = jnp.minimum(leaf_nodes, tree.capacity - 1)
    tps = tree.pstart[safe]
    tpc = jnp.where(leaf_nodes < tree.n_nodes, tree.pcount[safe], 0)
    tidx = jnp.clip(tps[:, None] + offg[None, :], 0, n - 1)
    tm = offg[None, :] < tpc[:, None]
    gradius = jnp.max(jnp.where(tm, hs[tidx], 0.0), axis=1)
    ll = 64
    for _ in range(4):
        nbr = pairs.find_neighbors(tree, leaf_nodes, gc, gh, gradius,
                                   None, ll, symmetric=False)
        if not bool(jnp.any(nbr.overflow)):
            break
        ll *= 2

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
                "vz": mj * wk * sfeat["v"][..., 2]}

    out = pairs.pair_reduce(
        pair_fn, nbr, tree, pos_box,
        {"hsml": hsml[perm], "isbh": is_bh[perm].astype(jnp.float32)},
        {"mass": jnp.where(is_gas[perm], mass[perm], 0.0),
         "v": velpred[perm], "entropy": entropy[perm],
         "isgas": is_gas[perm].astype(jnp.float32)},
        {k: "sum" for k in ("rho", "fbweight", "ent", "vx", "vy",
                            "vz")}, 32, 16)
    return {k: v[inv] for k, v in out.items()}


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
                         kernel_type=2):
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
    ll = 64
    for _ in range(4):
        nbr = pairs.find_neighbors(tree, leaf_nodes, gc, gh,
                                   jnp.zeros(gc.shape[0], jnp.float32),
                                   hm, ll, symmetric=True)
        if not bool(jnp.any(nbr.overflow)):
            break
        ll *= 2

    L = boxsize
    fb_energy = par.feedback_factor * 0.1 * mdot * dtime \
        * (C.LIGHTCGS / unit_velocity) ** 2

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
        return {"p": p, "du": du,
                "bhrow": jnp.where(near, sfeat["row"], -1.0)}

    rows = jnp.arange(n, dtype=jnp.float32)[perm]
    out = pairs.pair_reduce(
        pair_fn, nbr, tree, pos_box,
        {"isgas": is_gas[perm].astype(jnp.float32),
         "mass": mass[perm]},
        {"hsml": jnp.where(is_bh, hsml, 0.0)[perm],
         "isbh": is_bh[perm].astype(jnp.float32),
         "bhmass": bh_mass[perm], "mdyn": mass[perm],
         "bhrho": bh_density[perm], "fbw": fbweight[perm],
         "fbe": fb_energy[perm], "row": rows},
        {"p": "sum", "du": "sum", "bhrow": "max"}, 32, 16)
    p = out["p"][inv]
    du = out["du"][inv]
    bhrow = out["bhrow"][inv].astype(jnp.int32)
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
    return swallowed, ent_new, bhrow


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
    return pdata, bh, len(new_bh_rows)
