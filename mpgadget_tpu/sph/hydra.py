"""SPH hydro force — the "second SPH loop" (libgadget/hydra.c).

Pressure force in both density-entropy and pressure-entropy
(density-independent) formulations with grad-h correction terms, the
Monaghan artificial viscosity with the Balsara switch and the Gadget
viscosity limiter, signal-velocity tracking and entropy generation
(hydra.c:25-528).  Pair math runs in internal units (distances converted
from the box-unit engine at entry).
"""

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import kernels as K
from ..ops import pairs
from ..gravity.tree import build_tree
from ..gravity.treewalk import make_target_groups
from ..ops.morton import morton_key
from ..utils.constants import GAMMA, GAMMA_MINUS1


@dataclass(frozen=True)
class HydroParams:
    kernel_type: int = K.QUINTIC
    art_bulk_visc: float = 0.75
    density_independent: bool = True
    density_contrast_limit: float = 100.0
    group_max: int = 32
    leaf_list_max: int = 192
    leaf_eval_max: int = 16       # legacy engine granularity (unused)
    src_cap: int = 2048           # packed source slots per group
    sub: int = 8


def pressure_pred(eom_density, entvarpred):
    """P = (EntVar * rho_eom)^gamma (hydra.c PressurePred)."""
    x = jnp.maximum(entvarpred * eom_density, 0.0)
    return x ** GAMMA


def _hydro_pair_fn(par: HydroParams, boxsize, fac_mu, fac_vsic_fix,
                   hubble_a2, dloga):
    ktype = par.kernel_type
    L = boxsize

    def fn(dx, r, tmask, smask, tfeat, sfeat):
        ri = r * L
        hi = tfeat["hsml"]
        hj = sfeat["hsml"]
        in_i = ri < hi
        in_j = ri < hj
        act = (in_i | in_j) & (ri > 0)
        dwk_i = jnp.where(in_i, K.kernel_dwk(
            ri / jnp.maximum(hi, 1e-30), 1.0 / jnp.maximum(hi, 1e-30),
            ktype), 0.0)
        dwk_j = jnp.where(in_j, K.kernel_dwk(
            ri / jnp.maximum(hj, 1e-30), 1.0 / jnp.maximum(hj, 1e-30),
            ktype), 0.0)

        mj = sfeat["mass"]
        P_j = sfeat["pressure"]
        eom_j = jnp.maximum(sfeat["eomdensity"], 1e-30)
        rho_j = jnp.maximum(sfeat["density"], 1e-30)
        p_over_rho2_j = P_j / (eom_j * eom_j)
        cs_j = jnp.sqrt(GAMMA * P_j / eom_j)
        cs_i = tfeat["soundspeed"]

        dv = tfeat["velpred"] - sfeat["velpred"]
        dist = -dx * L
        vdotr = jnp.sum(dist * dv, axis=-1)
        vdotr2 = vdotr + hubble_a2 * ri * ri

        vsig_pair = cs_i + cs_j

        # artificial viscosity (Gadget-2 paper eq 13-14)
        rinv = jnp.where(ri > 0, 1.0 / jnp.maximum(ri, 1e-30), 0.0)
        mu_ij = fac_mu * vdotr2 * rinv
        rho_ij = 0.5 * (tfeat["density"] + rho_j)
        vsig_visc = cs_i + cs_j - 3.0 * mu_ij
        f2 = jnp.abs(sfeat["divvel"]) / (
            jnp.abs(sfeat["divvel"]) + sfeat["curlvel"]
            + 0.0001 * cs_j / fac_mu / jnp.maximum(hj, 1e-30))
        visc = (0.25 * par.art_bulk_visc * vsig_visc * (-mu_ij)
                / jnp.maximum(rho_ij, 1e-30) * (tfeat["f1"] + f2))
        # viscosity limiter (hydra.c:462-472)
        mi = tfeat["mass"]
        denom = 0.5 * (mi + mj) * (dwk_i + dwk_j) * ri * (2 * dloga)
        cap = 0.5 * fac_vsic_fix * vdotr2 / jnp.where(
            jnp.abs(denom) > 0, denom, -1e30)
        visc = jnp.where((dloga > 0) & ((dwk_i + dwk_j) < 0),
                         jnp.minimum(visc, cap), visc)
        visc = jnp.where(vdotr2 < 0, visc, 0.0)
        vsig = jnp.where(vdotr2 < 0, jnp.maximum(vsig_pair, vsig_visc),
                         vsig_pair)

        hfc_visc = 0.5 * mj * visc * (dwk_i + dwk_j) * rinv
        hfc = hfc_visc
        ev_i = jnp.maximum(tfeat["entvarpred"], 1e-30)
        ev_j = jnp.maximum(sfeat["entvarpred"], 1e-30)
        if par.density_independent:
            # pressure-entropy leading term (hydra.c:478-486)
            hfc = hfc + mj * (
                dwk_i * tfeat["p_over_rho2"] * ev_j / ev_i
                + dwk_j * p_over_rho2_j * ev_i / ev_j) * rinv
            if par.density_contrast_limit >= 0:
                rr1 = tfeat["egyrho"] / jnp.maximum(tfeat["density"],
                                                    1e-30)
                rr2 = eom_j / rho_j
                if par.density_contrast_limit > 0:
                    rr1 = jnp.minimum(rr1, par.density_contrast_limit)
                    rr2 = jnp.minimum(rr2, par.density_contrast_limit)
            else:
                rr1 = jnp.zeros_like(hfc)
                rr2 = jnp.zeros_like(hfc)
        else:
            rr1 = 1.0
            rr2 = 1.0
        # grad-h corrected Lagrangian term (hydra.c:497-500)
        hfc = hfc + mj * (
            tfeat["p_over_rho2"] * tfeat["dhsml"] * dwk_i * rr1
            + p_over_rho2_j * sfeat["dhsml"] * dwk_j * rr2) * rinv

        hfc = jnp.where(act, hfc, 0.0)
        hfc_visc = jnp.where(act, hfc_visc, 0.0)
        return {
            "accx": -hfc * dist[..., 0],
            "accy": -hfc * dist[..., 1],
            "accz": -hfc * dist[..., 2],
            "dtent": 0.5 * hfc_visc * vdotr2,
            "maxsig": jnp.where(act, vsig, -jnp.inf),
        }
    return fn


@partial(jax.jit, static_argnames=("par", "group_cap", "nleaf_cap",
                                   "sr_cap", "ll", "src_cap",
                                   "boxsize"))
def _hydro_all(ipos, mass, valid_gas, hsml, velpred, entvarpred,
               density, egy_wt_density, div_vel, curl_vel,
               dhsml_egy_factor, atime, hubble, dloga,
               par: HydroParams, boxsize, group_cap, nleaf_cap,
               sr_cap, ll, src_cap):
    """Whole hydro-force loop as one graph (sort, tree, symmetric
    neighbor search with node hmax, packed pair reduction)."""
    n = ipos.shape[0]
    keys = morton_key(ipos)
    keys = jnp.where(valid_gas, keys, ~jnp.uint64(0))
    perm = jnp.argsort(keys)
    inv = jnp.argsort(perm)
    ipos_s = ipos[perm]
    valid_s = valid_gas[perm]
    pos_box = ipos_s.astype(jnp.float32) * jnp.float32(2.0 ** -32)

    cap = 2 * n + 64
    tree = build_tree(keys[perm], ipos_s, mass[perm], valid_s, 16, 18,
                      cap, group_max=par.group_max)
    leaf_nodes, gc, gh, _, ngr, govf = make_target_groups(
        tree, pos_box, jnp.full(n, jnp.inf, jnp.float32), group_cap,
        par.group_max)

    # hmax per node for the symmetric search
    leaf_ids, n_leaves, lovf = pairs.compact_leaves(tree, group_cap * 4)
    hmax = pairs.node_hmax(tree, leaf_ids, n_leaves,
                           jnp.where(valid_s, hsml[perm], 0.0)
                           * jnp.float32(1.0 / boxsize), 16)

    eomdensity = egy_wt_density if par.density_independent else density
    pressure = pressure_pred(eomdensity, entvarpred)
    cs = jnp.sqrt(GAMMA * pressure / jnp.maximum(eomdensity, 1e-30))
    fac_mu = atime ** (3 * (GAMMA - 1) / 2) / atime
    fac_vsic_fix = hubble * atime ** (3 * GAMMA_MINUS1)
    hubble_a2 = hubble * atime * atime
    f1 = jnp.abs(div_vel) / (jnp.abs(div_vel) + curl_vel
                             + 0.0001 * cs / jnp.maximum(hsml, 1e-30)
                             / fac_mu)
    p_over_rho2 = pressure / jnp.maximum(eomdensity, 1e-30) ** 2

    def s(x):
        return x[perm]

    target_feats = {
        "hsml": s(hsml), "velpred": s(velpred), "mass": s(mass),
        "density": s(density), "soundspeed": s(cs), "f1": s(f1),
        "p_over_rho2": s(p_over_rho2), "entvarpred": s(entvarpred),
        "egyrho": s(egy_wt_density), "dhsml": s(dhsml_egy_factor),
    }
    source_feats = {
        "hsml": s(hsml), "velpred": s(velpred),
        "mass": jnp.where(valid_s, s(mass), 0.0),
        "density": s(density), "eomdensity": s(eomdensity),
        "pressure": s(pressure), "divvel": s(div_vel),
        "curlvel": s(curl_vel), "entvarpred": s(entvarpred),
        "dhsml": s(dhsml_egy_factor),
    }
    cols, spec = pairs.flatten_source_feats(source_feats)
    packed = pairs.pack_sources(tree, pos_box, valid_s, cols,
                                nleaf_cap, sr_cap, par.sub)

    inv_box = 1.0 / boxsize
    G = par.group_max
    offg = jnp.arange(G, dtype=jnp.int32)
    safe_nodes = jnp.minimum(leaf_nodes, tree.capacity - 1)
    tps = tree.pstart[safe_nodes]
    tpc = jnp.where(leaf_nodes < tree.n_nodes,
                    tree.pcount[safe_nodes], 0)
    tidx = jnp.clip(tps[:, None] + offg[None, :], 0, n - 1)
    tm = offg[None, :] < tpc[:, None]
    hsml_box = s(hsml) * jnp.float32(inv_box)
    gradius = jnp.max(jnp.where(tm, hsml_box[tidx], 0.0), axis=1)

    nbr = pairs.find_neighbors(tree, leaf_nodes, gc, gh, gradius, hmax,
                               ll, symmetric=True)

    pair_fn = _hydro_pair_fn(par, boxsize, fac_mu, fac_vsic_fix,
                             hubble_a2, dloga)
    reducers = {"accx": "sum", "accy": "sum", "accz": "sum",
                "dtent": "sum", "maxsig": "max"}
    out, povf = pairs.pair_reduce_packed(
        pair_fn, nbr, tree, packed, pos_box, target_feats, spec,
        reducers, G, src_cap, par.sub)

    accel = jnp.stack([out["accx"], out["accy"], out["accz"]],
                      axis=-1)[inv]
    # entropy change rate (hydro_postprocess, hydra.c:516-527)
    dtent = out["dtent"][inv] * GAMMA_MINUS1 / (
        hubble_a2 * jnp.maximum(density, 1e-30) ** GAMMA_MINUS1)
    maxsig = out["maxsig"][inv]
    maxsig = jnp.where(jnp.isfinite(maxsig), maxsig, 0.0)
    accel = jnp.where(valid_gas[:, None], accel, 0.0)
    dtent = jnp.where(valid_gas, dtent, 0.0)
    result = {"hydro_accel": accel, "dt_entropy": dtent,
              "max_signal_vel": maxsig, "pressure": pressure}
    flags = {"group": govf, "pack": packed.overflow,
             "pair": jnp.any(povf)}
    return result, flags


_CAP_CACHE = {}


def hydro_force(ipos, mass, valid_gas, hsml, velpred, entvarpred,
                density, egy_wt_density, div_vel, curl_vel,
                dhsml_egy_factor, par: HydroParams, boxsize, atime,
                hubble, dloga):
    """Hydro accelerations + DtEntropy + MaxSignalVel for gas particles.

    All inputs in internal units, input particle order.  Returns dict in
    the input order: hydro_accel [N,3], dt_entropy [N] (entropy units
    per dloga), max_signal_vel [N], pressure [N].
    """
    n = ipos.shape[0]
    group_cap = min((8 * n) // par.group_max + 64, n + 64)
    key = ("hydra", n, par.group_max, par.kernel_type)
    caps = _CAP_CACHE.setdefault(
        key, {"ll": par.leaf_list_max, "src": par.src_cap,
              "nleaf": n // 2 + 64,
              "sr": n // par.sub + n // 2 + 128})
    caps["ll"] = max(caps["ll"], par.leaf_list_max)
    caps["src"] = max(caps["src"], par.src_cap)
    for _ in range(6):
        result, flags = _hydro_all(
            ipos, mass, valid_gas, hsml, velpred, entvarpred, density,
            egy_wt_density, div_vel, curl_vel, dhsml_egy_factor,
            jnp.float32(atime), jnp.float32(hubble),
            jnp.float32(dloga), par, float(boxsize), group_cap,
            caps["nleaf"], caps["sr"], caps["ll"], caps["src"])
        if bool(flags["group"]):
            raise RuntimeError("hydro group capacity exceeded")
        if bool(flags["pack"]):
            caps["nleaf"] = min(2 * caps["nleaf"], 2 * n + 64)
            caps["sr"] = min(2 * caps["sr"], 3 * n + 128)
            continue
        if bool(flags["pair"]):
            caps["ll"] *= 2
            caps["src"] *= 2
            continue
        return result
    raise RuntimeError("hydro_force: capacity retries exhausted")
