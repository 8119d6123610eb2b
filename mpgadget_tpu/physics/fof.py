"""Friends-of-friends halo finder.

TPU-native redesign of libgadget/fof.c: the reference links halos with
iterative minimum-label propagation treewalks plus cross-rank merges
(fof_fof, fof.c:158-330); here the same minimum-label iteration runs as
vectorized neighbor-pair reductions over the Morton octree, accelerated
by pointer jumping (label = label[label]), which converges in
O(log(halo diameter)) rounds.  Catalog compilation (group sizes, masses,
centers of mass, velocities; fof_compile_catalogue, fof.c:874) becomes a
sort-by-label + run-boundary reduction.

Secondary linking (attaching stars/BH to the nearest primary,
fof.c:1175-1260) is a nearest-primary search with a packed
(distance, label) min reduction.
"""

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import pairs
from ..ops.morton import morton_key
from ..gravity.tree import build_tree
from ..gravity.treewalk import make_target_groups


@dataclass
class FOFParams:
    linking_length: float = 0.2   # of mean primary separation
    min_group_length: int = 32
    primary_link_types: int = 2   # bitmask, default DM
    secondary_link_types: int = 1 + 16 + 32
    group_max: int = 32
    leaf_list_max: int = 64
    leaf_eval_max: int = 16
    max_rounds: int = 64


def _min_label_round(tree, nbr, pos_box, labels_s, valid_s, ll_box, cfg):
    """One neighbor min-label sweep: for each particle the minimum label
    among neighbors within the linking length (including itself)."""

    def pair_fn(dx, r, tmask, smask, tfeat, sfeat):
        near = r < ll_box
        lab = jnp.where(near, sfeat["label"], jnp.inf)
        return {"minlab": -lab}  # max reducer on negation = min

    out = pairs.pair_reduce(
        pair_fn, nbr, tree, pos_box,
        {}, {"label": jnp.where(valid_s, labels_s.astype(jnp.float32),
                                jnp.inf)},
        {"minlab": "max"}, cfg.group_max, cfg.leaf_eval_max)
    newlab = -out["minlab"]
    good = jnp.isfinite(newlab)
    return jnp.where(valid_s & good,
                     jnp.minimum(labels_s, newlab.astype(jnp.int32)),
                     labels_s)


def fof_label(ipos, valid_primary, boxsize, linking_length,
              cfg: FOFParams = None):
    """Label connected components; returns int32[N] labels in the input
    order (label = index of the minimum member in sorted order;
    non-primary particles get -1)."""
    cfg = cfg or FOFParams()
    n = ipos.shape[0]
    keys = morton_key(ipos)
    keys = jnp.where(valid_primary, keys, ~jnp.uint64(0))
    perm = jnp.argsort(keys)
    inv = jnp.argsort(perm)
    ipos_s = ipos[perm]
    valid_s = valid_primary[perm]
    pos_box = ipos_s.astype(jnp.float32) * jnp.float32(2.0 ** -32)

    cap = 2 * n + 64
    tree = build_tree(keys[perm], ipos_s,
                      jnp.ones(n, jnp.float32), valid_s, 16, 18, cap,
                      group_max=cfg.group_max)
    group_cap = min((8 * n) // cfg.group_max + 64, n + 64)
    leaf_nodes, gc, gh, _, ngr, govf = make_target_groups(
        tree, pos_box, jnp.full(n, jnp.inf, jnp.float32), group_cap,
        cfg.group_max)

    ll_box = linking_length / boxsize
    gradius = jnp.full(gc.shape[0], ll_box, jnp.float32)
    nbr, _ = pairs.find_neighbors_auto(
        tree, leaf_nodes, gc, gh, gradius, None, cfg.leaf_list_max,
        symmetric=False, cache_key=("fof_primary", n))

    labels = jnp.where(valid_s, jnp.arange(n, dtype=jnp.int32), n)
    for it in range(cfg.max_rounds):
        new = _min_label_round(tree, nbr, pos_box, labels, valid_s,
                               jnp.float32(ll_box), cfg)
        # pointer jumping: labels point at particles; chase twice
        new = jnp.minimum(new, new[jnp.clip(new, 0, n - 1)])
        new = jnp.minimum(new, new[jnp.clip(new, 0, n - 1)])
        if bool(jnp.all(new == labels)):
            break
        labels = new
    # canonicalize: full pointer-jump to the root
    for _ in range(8):
        labels = jnp.minimum(labels, labels[jnp.clip(labels, 0, n - 1)])

    out = jnp.where(valid_s, labels, -1)
    return out[inv], perm, inv


def fof_secondary(ipos, is_secondary, is_primary, labels_primary,
                  boxsize, linking_length, cfg: FOFParams = None,
                  max_expand=6):
    """Attach each secondary particle (star/BH/gas per
    secondary_link_types) to the group of its nearest primary
    (fof_secondary, fof.c:1175-1260).

    The reference expands each secondary's search radius until a
    primary is found; here the radius starts at the linking length and
    doubles up to max_expand times (a secondary farther than
    2^6 linking lengths from every primary is deep in the field, where
    its nearest primary is ungrouped anyway).  Returns int32[N] labels
    in input order (-1 where unattached / not secondary).
    """
    cfg = cfg or FOFParams()
    n = ipos.shape[0]
    include = is_secondary | is_primary
    keys = morton_key(ipos)
    keys = jnp.where(include, keys, ~jnp.uint64(0))
    perm = jnp.argsort(keys)
    inv = jnp.argsort(perm)
    ipos_s = ipos[perm]
    pos_box = ipos_s.astype(jnp.float32) * jnp.float32(2.0 ** -32)
    sec_s = is_secondary[perm]
    prim_s = is_primary[perm]
    lab_s = labels_primary[perm]

    cap = 2 * n + 64
    tree = build_tree(keys[perm], ipos_s, jnp.ones(n, jnp.float32),
                      include[perm], 16, 18, cap,
                      group_max=cfg.group_max)
    group_cap = min((8 * n) // cfg.group_max + 64, n + 64)
    leaf_nodes, gc, gh, _, _, _ = make_target_groups(
        tree, pos_box, jnp.full(n, jnp.inf, jnp.float32), group_cap,
        cfg.group_max)

    ll_box = jnp.float32(linking_length / boxsize)
    # features: primary labels (inf for non-primaries so min skips them)
    src_lab = jnp.where(prim_s, lab_s.astype(jnp.float32), jnp.inf)

    rmin = jnp.full(n, jnp.inf, jnp.float32)    # sorted order
    attach = jnp.full(n, -1, jnp.int32)
    radius = ll_box
    for _ in range(max_expand):
        need = sec_s & ~jnp.isfinite(rmin)
        if not bool(jnp.any(need)):
            break
        gradius = jnp.full(gc.shape[0], radius, jnp.float32)
        nbr, _ = pairs.find_neighbors_auto(
            tree, leaf_nodes, gc, gh, gradius, None,
            cfg.leaf_list_max, symmetric=False,
            cache_key=("fof_secondary", n))
        rad = radius

        def pair_fn_r(dx, r, tmask, smask, tfeat, sfeat, rad=rad):
            # nearest primary distance (exclude self-pairs at r=0 of
            # primaries; secondaries are never primaries here)
            ok = (r < rad) & (sfeat["lab"] < jnp.inf)
            return {"negr": jnp.where(ok, -r, -jnp.inf)}

        out = pairs.pair_reduce(
            pair_fn_r, nbr, tree, pos_box, {}, {"lab": src_lab},
            {"negr": "max"}, cfg.group_max, cfg.leaf_eval_max)
        rmin_new = -out["negr"]
        found = sec_s & jnp.isfinite(rmin_new) & ~jnp.isfinite(rmin)
        rmin = jnp.where(found, rmin_new, rmin)

        rtol = rmin * jnp.float32(1.0 + 1e-5) + jnp.float32(1e-12)

        def pair_fn_l(dx, r, tmask, smask, tfeat, sfeat):
            ok = (r <= tfeat["rtol"]) & (sfeat["lab"] < jnp.inf)
            return {"minlab": jnp.where(ok, -sfeat["lab"], -jnp.inf)}

        out2 = pairs.pair_reduce(
            pair_fn_l, nbr, tree, pos_box, {"rtol": rtol},
            {"lab": src_lab}, {"minlab": "max"},
            cfg.group_max, cfg.leaf_eval_max)
        lab_new = -out2["minlab"]
        good = found & jnp.isfinite(lab_new)
        attach = jnp.where(good, lab_new.astype(jnp.int32), attach)
        radius = radius * 2

    return attach[inv]


def fof_catalog(ipos, vel, mass, ptype, valid, boxsize, mean_sep,
                cfg: FOFParams = None, sfr=None):
    """Full FOF: label, filter by minimum length, compile group table.

    Returns dict of host arrays sorted by descending group mass
    (fof_compile_catalogue analog): lengths, masses, CM positions (in
    internal units), velocities, per-type masses/lengths; plus the
    per-particle group index (-1 for ungrouped), input order.
    """
    cfg = cfg or FOFParams()
    ll = cfg.linking_length * mean_sep
    primary = valid & (((1 << ptype.astype(jnp.int32))
                        & cfg.primary_link_types) > 0)
    labels, perm, inv = fof_label(ipos, primary, boxsize, ll, cfg)

    secondary = valid & ~primary & (((1 << ptype.astype(jnp.int32))
                                     & cfg.secondary_link_types) > 0)
    if bool(jnp.any(secondary)):
        sec_lab = fof_secondary(ipos, secondary, primary, labels,
                                boxsize, ll, cfg)
        labels = jnp.where(secondary, sec_lab, labels)

    # host-side catalog compilation (runs once per output)
    lab = np.asarray(labels)
    good = lab >= 0
    uniq, grp_idx, counts = np.unique(lab[good], return_inverse=True,
                                      return_counts=True)
    full_grp = np.full(lab.shape, -1, np.int64)
    full_grp[good] = grp_idx

    keep = counts >= cfg.min_group_length
    # re-index kept groups
    newid = np.full(len(uniq), -1, np.int64)
    newid[keep] = np.arange(keep.sum())
    grp_of_particle = np.where(full_grp >= 0, newid[full_grp], -1)

    ngroups = int(keep.sum())
    m = np.asarray(mass, np.float64)
    v = np.asarray(vel, np.float64)
    t = np.asarray(ptype)
    pos = np.asarray(ipos, np.float64) * (boxsize / 2.0 ** 32)

    masses = np.zeros(ngroups)
    lengths = np.zeros(ngroups, np.int64)
    cm = np.zeros((ngroups, 3))
    vcm = np.zeros((ngroups, 3))
    mass_by_type = np.zeros((ngroups, 6))
    len_by_type = np.zeros((ngroups, 6), np.int64)
    sfr_tot = np.zeros(ngroups)
    sel = grp_of_particle >= 0
    g = grp_of_particle[sel]
    np.add.at(masses, g, m[sel])
    np.add.at(lengths, g, 1)
    # periodic-safe CM: average offsets from the first member
    first = np.zeros(ngroups, np.int64)
    idx_sel = np.nonzero(sel)[0]
    first_seen = {}
    for i_, gg in zip(idx_sel, g):
        if gg not in first_seen:
            first_seen[gg] = i_
    anchors = np.array([first_seen[k] for k in range(ngroups)]) \
        if ngroups else np.zeros(0, np.int64)
    if ngroups:
        d = pos[sel] - pos[anchors[g]]
        d -= np.round(d / boxsize) * boxsize
        np.add.at(cm, g, m[sel, None] * d)
        cm /= masses[:, None]
        cm += pos[anchors]
        cm = np.mod(cm, boxsize)
        np.add.at(vcm, g, m[sel, None] * v[sel])
        vcm /= masses[:, None]
        for tt in range(6):
            ts = sel & (t == tt)
            if ts.any():
                np.add.at(mass_by_type[:, tt], grp_of_particle[ts],
                          m[ts])
                np.add.at(len_by_type[:, tt], grp_of_particle[ts], 1)
        if sfr is not None:
            s = np.asarray(sfr, np.float64)
            np.add.at(sfr_tot, g, s[sel])
    # sort by descending mass (reference sorts catalog)
    order = np.argsort(-masses, kind="stable")
    if ngroups:
        remap = np.full(ngroups, -1, np.int64)
        remap[order] = np.arange(ngroups)
        grp_of_particle = np.where(
            grp_of_particle >= 0,
            remap[np.clip(grp_of_particle, 0, None)], -1)
    return {
        "ngroups": ngroups,
        "lengths": lengths[order],
        "masses": masses[order],
        "cm": cm[order],
        "vel": vcm[order],
        "mass_by_type": mass_by_type[order],
        "len_by_type": len_by_type[order],
        "sfr": sfr_tot[order],
        "group_index": grp_of_particle,
    }
