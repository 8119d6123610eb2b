"""SPH density loop with adaptive smoothing lengths.

The reference's "first SPH loop" (libgadget/density.c): for every gas
particle, kernel-weighted density, DhsmlDensityFactor (grad-h term),
velocity divergence/curl, and the pressure-entropy EgyWtDensity; the
smoothing length is bisected until the effective neighbor number hits
DesNumNgb +- MaxNumNgbDeviation (treewalk_do_hsml_loop analog — here a
host loop re-traversing only while any particle is unconverged).
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


@dataclass
class DensityParams:
    kernel_type: int = K.QUINTIC
    eta: float = 1.0              # DensityResolutionEta
    max_ngb_deviation: float = 2.0
    min_hsml: float = 0.0
    max_iter: int = 40
    group_max: int = 32
    leaf_list_max: int = 192
    leaf_eval_max: int = 16

    @property
    def desnumngb(self):
        return K.desnumngb(self.eta, self.kernel_type)


def _density_pair_fn(ktype):
    def fn(dx, r, tmask, smask, tfeat, sfeat):
        hinv = 1.0 / jnp.maximum(tfeat["hsml"], 1e-30)
        u = r * hinv
        inside = (u < 1.0)
        wk = jnp.where(inside, K.kernel_wk(u, hinv, ktype), 0.0)
        dwk = jnp.where(inside, K.kernel_dwk(u, hinv, ktype), 0.0)
        mj = sfeat["mass"]
        # Ngb = wk * kernel volume = wk * 4/3 pi H^3
        ngb = wk * K.NORM_COEFF / jnp.maximum(hinv ** 3, 1e-30)
        dW = K.kernel_dW(u, wk, dwk, hinv)
        rinv = jnp.where(r > 0, 1.0 / jnp.maximum(r, 1e-30), 0.0)
        fac = mj * dwk * rinv
        dv = tfeat["vel"] - sfeat["velpred"]
        # dist in the reference convention: target - source = -dx
        dist = -dx
        div = -fac * jnp.sum(dist * dv, axis=-1)
        rot = jnp.cross(dv, dist)
        out = {
            "ngb": ngb,
            "rho": mj * wk,
            "dhsml": mj * dW,
            "egyrho": mj * sfeat["entvarpred"] * wk,
            "dhsmlegy": mj * sfeat["entvarpred"] * dW,
            "div": div,
            "rotx": fac * rot[..., 0],
            "roty": fac * rot[..., 1],
            "rotz": fac * rot[..., 2],
        }
        return out
    return fn


def sph_density(ipos, mass, valid_gas, hsml, vel, velpred, entvarpred,
                par: DensityParams, boxsize,
                update_hsml=True, do_egy_density=True,
                target_mask=None):
    """Compute densities over gas particles (any order); returns dict of
    arrays in the INPUT particle order + converged hsml.

    valid_gas: bool[N] — gas particles to include.
    velpred/entvarpred: predicted source quantities (input order).
    target_mask: optional bool[N] — only these particles drive the
    hsml bisection (active-set stepping); others keep their hsml and
    the caller merges their outputs.
    """
    n = ipos.shape[0]
    keys = morton_key(ipos)
    keys = jnp.where(valid_gas, keys, ~jnp.uint64(0))
    perm = jnp.argsort(keys)
    inv = jnp.argsort(perm)
    ipos_s = ipos[perm]
    mass_s = mass[perm]
    valid_s = valid_gas[perm]
    hsml_s = hsml[perm]
    pos_box = ipos_s.astype(jnp.float32) * jnp.float32(2.0 ** -32)

    cap = 2 * n + 64
    tree = build_tree(keys[perm], ipos_s, mass_s, valid_s, 16, 18, cap,
                      group_max=par.group_max)
    group_cap = min((8 * n) // par.group_max + 64, n + 64)
    leaf_nodes, gc, gh, _, ngr, govf = make_target_groups(
        tree, pos_box, jnp.full(n, jnp.inf, jnp.float32), group_cap,
        par.group_max)
    if bool(govf):
        raise RuntimeError("density group capacity exceeded")

    inv_box = 1.0 / boxsize
    desngb = par.desnumngb
    dev = par.max_ngb_deviation

    left = jnp.zeros(n, jnp.float32)
    right = jnp.full(n, jnp.inf, jnp.float32)
    if target_mask is not None:
        done = ~(valid_s & target_mask[perm])
    else:
        done = ~valid_s
    source_feats = {
        "mass": jnp.where(valid_s, mass_s, 0.0),
        "velpred": velpred[perm],
        "entvarpred": entvarpred[perm],
    }
    pair_fn = _density_pair_fn(par.kernel_type)
    reducers = {k: "sum" for k in ("ngb", "rho", "dhsml", "egyrho",
                                   "dhsmlegy", "div", "rotx", "roty",
                                   "rotz")}
    out = None
    G = par.group_max
    safe_nodes = jnp.minimum(leaf_nodes, tree.capacity - 1)
    tps = tree.pstart[safe_nodes]

    for it in range(par.max_iter):
        hsml_box = hsml_s * inv_box
        # per-group search radius = max target Hsml (asymmetric search)
        offg = jnp.arange(G, dtype=jnp.int32)
        tidx = jnp.clip(tps[:, None] + offg[None, :], 0, n - 1)
        tpc = jnp.where(leaf_nodes < tree.n_nodes,
                        tree.pcount[safe_nodes], 0)
        tm = offg[None, :] < tpc[:, None]
        gradius = jnp.max(jnp.where(tm, hsml_box[tidx], 0.0), axis=1)

        nbr, _ = pairs.find_neighbors_auto(
            tree, leaf_nodes, gc, gh, gradius, None,
            par.leaf_list_max, symmetric=False,
            cache_key=("sph_density", n, par.group_max))
        target_feats = {"hsml": hsml_box, "vel": vel[perm]}
        out = pairs.pair_reduce(
            pair_fn, nbr, tree, pos_box, target_feats, source_feats,
            reducers, G, par.leaf_eval_max)

        if not update_hsml:
            break
        # bisection (density_check_neighbours, density.c:591-660)
        numngb = out["ngb"]
        converged = (jnp.abs(numngb - desngb) <= dev) | done
        low = numngb < desngb - dev
        high = numngb > desngb + dev
        left = jnp.where(low & ~done, hsml_box, left)
        right = jnp.where(high & ~done, hsml_box, right)
        # geometric-mean-of-cubes step where bracketed; else *1.26 / /1.26
        have_both = (right < jnp.inf) & (left > 0)
        h_new = jnp.where(
            have_both,
            (0.5 * (left ** 3 + right ** 3)) ** (1.0 / 3.0),
            jnp.where(low, hsml_box * 1.26, hsml_box / 1.26))
        h_new = jnp.clip(h_new, par.min_hsml * inv_box, 0.45)
        hsml_s = jnp.where(converged, hsml_s, h_new * boxsize)
        done = converged
        if bool(jnp.all(done)):
            break

    # postprocess (density_postprocess, density.c:532-588)
    rho = out["rho"]
    safe_rho = jnp.maximum(rho, 1e-30)
    hsml_box = hsml_s * inv_box
    dhsml = out["dhsml"] * hsml_box / (3.0 * safe_rho)
    dhsml_factor = 1.0 / (1.0 + dhsml)
    entpred_t = entvarpred[perm]
    egyrho = out["egyrho"]
    if do_egy_density:
        dhsml_egy = out["dhsmlegy"] * hsml_box \
            / (3.0 * jnp.maximum(egyrho, 1e-30))
        dhsml_egy = -dhsml_egy * dhsml_factor
        egy_wt_density = egyrho / jnp.maximum(entpred_t, 1e-30)
    else:
        dhsml_egy = dhsml_factor
        egy_wt_density = rho
    # div/curl were accumulated with box-unit kernels and distances:
    # dW ~ L^4, dist ~ 1/L, rho ~ L^3 -> extra factor L vs internal
    div_vel = out["div"] / safe_rho * jnp.float32(inv_box)
    curl = jnp.sqrt(out["rotx"] ** 2 + out["roty"] ** 2
                    + out["rotz"] ** 2) / safe_rho * jnp.float32(inv_box)
    dt_hsml = (1.0 / 3.0) * div_vel * hsml_s

    def unsort(x):
        return x[inv]

    # density units: pair sums used box-unit W -> convert to internal
    vol_fac = jnp.float32(inv_box ** 3)
    return {
        "hsml": unsort(hsml_s),
        "numngb": unsort(out["ngb"]),
        "density": unsort(rho) * vol_fac,
        "egy_wt_density": unsort(egy_wt_density) * vol_fac,
        "dhsml_density_factor": unsort(dhsml_factor),
        "dhsml_egy_factor": unsort(dhsml_egy),
        "div_vel": unsort(div_vel),
        "curl_vel": unsort(curl),
        "dt_hsml": unsort(dt_hsml),
        "iterations": it + 1,
    }
