"""SPH density loop with adaptive smoothing lengths.

The reference's "first SPH loop" (libgadget/density.c): for every gas
particle, kernel-weighted density, DhsmlDensityFactor (grad-h term),
velocity divergence/curl, and the pressure-entropy EgyWtDensity; the
smoothing length is bisected until the effective neighbor number hits
DesNumNgb +- MaxNumNgbDeviation (treewalk_do_hsml_loop analog,
density.c:591-660).

TPU-native design: the WHOLE solve — Morton sort, tree build, source
packing, the hsml bisection as a ``lax.while_loop`` re-traversing only
groups with unconverged targets, and postprocessing — is ONE jitted
graph.  The previous host-loop design dispatched a fresh graph per
bisection iteration, which on the remote-TPU tunnel made a 32^3 gas
init take >45 min; this compiles once and runs device-side.  Sources
are sub-row packed (ops/pairs.pack_sources) so the per-group fetch is a
contiguous row gather.
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


@dataclass(frozen=True)
class DensityParams:
    kernel_type: int = K.QUINTIC
    eta: float = 1.0              # DensityResolutionEta
    max_ngb_deviation: float = 2.0
    min_hsml: float = 0.0
    max_iter: int = 40
    group_max: int = 32
    leaf_list_max: int = 192
    leaf_eval_max: int = 16       # legacy engine granularity (unused)
    src_cap: int = 2048           # packed source slots per group
    sub: int = 8

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


_REDUCERS = {k: "sum" for k in ("ngb", "rho", "dhsml", "egyrho",
                                "dhsmlegy", "div", "rotx", "roty",
                                "rotz")}


def _prep(ipos, mass, valid_gas, par, group_cap, nleaf_cap, sr_cap,
          cols_of):
    """Shared sort / tree / groups / pack preamble (traced code)."""
    n = ipos.shape[0]
    keys = morton_key(ipos)
    keys = jnp.where(valid_gas, keys, ~jnp.uint64(0))
    perm = jnp.argsort(keys)
    inv = jnp.argsort(perm)
    ipos_s = ipos[perm]
    mass_s = mass[perm]
    valid_s = valid_gas[perm]
    pos_box = ipos_s.astype(jnp.float32) * jnp.float32(2.0 ** -32)
    cap = 2 * n + 64
    tree = build_tree(keys[perm], ipos_s, mass_s, valid_s, 16, 18, cap,
                      group_max=par.group_max)
    leaf_nodes, gc, gh, _, ngr, govf = make_target_groups(
        tree, pos_box, jnp.full(n, jnp.inf, jnp.float32), group_cap,
        par.group_max)
    cols, spec = pairs.flatten_source_feats(cols_of(perm, valid_s))
    packed = pairs.pack_sources(tree, pos_box, valid_s, cols, nleaf_cap,
                                sr_cap, par.sub)
    return (perm, inv, pos_box, tree, valid_s, leaf_nodes, gc, gh,
            packed, spec, govf)


@partial(jax.jit, static_argnames=("par", "group_cap", "nleaf_cap",
                                   "sr_cap", "ll", "src_cap", "boxsize",
                                   "update_hsml", "do_egy_density",
                                   "has_target_mask"))
def _density_all(ipos, mass, valid_gas, hsml, vel, velpred, entvarpred,
                 target_mask, par: DensityParams, boxsize, group_cap,
                 nleaf_cap, sr_cap, ll, src_cap, update_hsml,
                 do_egy_density, has_target_mask):
    """Whole density solve as one graph.  Returns (result dict in input
    order, overflow flags dict)."""
    n = ipos.shape[0]

    def cols_of(perm, valid_s):
        return {"mass": jnp.where(valid_s, mass[perm], 0.0),
                "velpred": velpred[perm],
                "entvarpred": entvarpred[perm]}

    (perm, inv, pos_box, tree, valid_s, leaf_nodes, gc, gh, packed,
     spec, govf) = _prep(ipos, mass, valid_gas, par, group_cap,
                         nleaf_cap, sr_cap, cols_of)

    inv_box = 1.0 / boxsize
    desngb = par.desnumngb
    dev = par.max_ngb_deviation
    G = par.group_max
    hsml_s = hsml[perm]
    vel_s = vel[perm]

    if has_target_mask:
        done0 = ~(valid_s & target_mask[perm])
    else:
        done0 = ~valid_s

    safe_nodes = jnp.minimum(leaf_nodes, tree.capacity - 1)
    tps = tree.pstart[safe_nodes]
    tpc = jnp.where(leaf_nodes < tree.n_nodes,
                    tree.pcount[safe_nodes], 0)
    offg = jnp.arange(G, dtype=jnp.int32)
    tidx = jnp.clip(tps[:, None] + offg[None, :], 0, n - 1)
    tm = offg[None, :] < tpc[:, None]

    pair_fn = _density_pair_fn(par.kernel_type)

    def one_pass(hsml_box, eval_mask):
        """Traverse + pair-reduce for groups with any eval_mask target.

        Groups whose targets are all excluded get radius 0, which makes
        the traversal skip the whole tree (near is false at the root)."""
        gradius = jnp.max(
            jnp.where(tm & eval_mask[tidx], hsml_box[tidx], 0.0), axis=1)
        nbr = pairs.find_neighbors(tree, leaf_nodes, gc, gh, gradius,
                                   None, ll, symmetric=False)
        target_feats = {"hsml": hsml_box, "vel": vel_s}
        out, ovf = pairs.pair_reduce_packed(
            pair_fn, nbr, tree, packed, pos_box, target_feats, spec,
            _REDUCERS, G, src_cap, par.sub)
        return out, jnp.any(ovf)

    zero_out = {k: jnp.zeros(n, jnp.float32) for k in _REDUCERS}
    min_h_box = jnp.float32(par.min_hsml * inv_box)

    def body(st):
        (it, hsml_box, left, right, done, out, ovf) = st
        undone = ~done
        out_new, ovf_i = one_pass(hsml_box, undone)
        out = {k: jnp.where(done, out[k], out_new[k])
               for k in _REDUCERS}
        numngb = out_new["ngb"]
        if update_hsml:
            converged = (jnp.abs(numngb - desngb) <= dev) | done
            low = numngb < desngb - dev
            high = numngb > desngb + dev
            left = jnp.where(low & undone, hsml_box, left)
            right = jnp.where(high & undone, hsml_box, right)
            have_both = (right < jnp.inf) & (left > 0)
            h_new = jnp.where(
                have_both,
                (0.5 * (left ** 3 + right ** 3)) ** (1.0 / 3.0),
                jnp.where(low, hsml_box * 1.26, hsml_box / 1.26))
            h_new = jnp.clip(h_new, min_h_box, 0.45)
            hsml_box = jnp.where(converged, hsml_box, h_new)
            done = converged
        else:
            done = jnp.ones_like(done)
        return (it + 1, hsml_box, left, right, done, out,
                ovf | ovf_i)

    def cond(st):
        return (st[0] < par.max_iter) & ~jnp.all(st[4])

    st0 = (jnp.int32(0), hsml_s * jnp.float32(inv_box),
           jnp.zeros(n, jnp.float32), jnp.full(n, jnp.inf, jnp.float32),
           done0, zero_out, jnp.bool_(False))
    it, hsml_box, _, _, _, out, ovf = jax.lax.while_loop(cond, body, st0)
    hsml_s = hsml_box * jnp.float32(boxsize)

    # postprocess (density_postprocess, density.c:532-588)
    rho = out["rho"]
    safe_rho = jnp.maximum(rho, 1e-30)
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

    vol_fac = jnp.float32(inv_box ** 3)
    result = {
        "hsml": unsort(hsml_s),
        "numngb": unsort(out["ngb"]),
        "density": unsort(rho) * vol_fac,
        "egy_wt_density": unsort(egy_wt_density) * vol_fac,
        "dhsml_density_factor": unsort(dhsml_factor),
        "dhsml_egy_factor": unsort(dhsml_egy),
        "div_vel": unsort(div_vel),
        "curl_vel": unsort(curl),
        "dt_hsml": unsort(dt_hsml),
        "iterations": it,
    }
    flags = {"group": govf, "pack": packed.overflow, "pair": ovf}
    return result, flags


# converged capacities per call-site key (see ops/pairs._LL_CACHE)
_CAP_CACHE = {}


def _capacities(n, par, key):
    group_cap = min((8 * n) // par.group_max + 64, n + 64)
    base = {"ll": par.leaf_list_max, "src": par.src_cap,
            "nleaf": n // 2 + 64,
            "sr": n // par.sub + n // 2 + 128}
    c = _CAP_CACHE.setdefault(key, base)
    # never below the configured floor
    c["ll"] = max(c["ll"], par.leaf_list_max)
    c["src"] = max(c["src"], par.src_cap)
    return group_cap, c


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
    key = ("sph_density", n, par.group_max, par.kernel_type)
    group_cap, caps = _capacities(n, par, key)
    tmask = (jnp.zeros(n, bool) if target_mask is None
             else jnp.asarray(target_mask))
    for _ in range(6):
        result, flags = _density_all(
            ipos, mass, valid_gas, hsml, vel, velpred, entvarpred,
            tmask, par, float(boxsize), group_cap, caps["nleaf"],
            caps["sr"], caps["ll"], caps["src"], bool(update_hsml),
            bool(do_egy_density), target_mask is not None)
        if bool(flags["group"]):
            raise RuntimeError("density group capacity exceeded")
        if bool(flags["pack"]):
            caps["nleaf"] = min(2 * caps["nleaf"], 2 * n + 64)
            caps["sr"] = min(2 * caps["sr"], 3 * n + 128)
            continue
        if bool(flags["pair"]):
            caps["ll"] *= 2
            caps["src"] *= 2
            continue
        result["iterations"] = int(result["iterations"])
        return result
    raise RuntimeError("sph_density: capacity retries exhausted")
