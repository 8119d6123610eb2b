"""Distributed friends-of-friends over the slab decomposition.

TPU-native redesign of the reference's distributed FOF
(libgadget/fof.c): the reference links primaries with iterative
treewalks whose exports hop ranks until no label changes
(fof_fof, fof.c:158-330), compiles the catalog with an mpsort by
minID (fof_compile_catalogue, fof.c:874), and attaches secondaries to
the nearest primary (fof_secondary, fof.c:1175).

Here each round is ONE jitted sharded program:

1. ghost strips carry (position, current global label) of primary
   rows within the linking length of neighboring slabs
   (decomp.ghost_strips_multi — the export/import analog);
2. each shard finds the connected components of its local+ghost rows
   with an in-graph min-label iteration — a neighbor min-ROW sweep
   through the shared pair engine plus pointer jumping.  The pair
   reduction runs on row INDICES (< 2^24 per shard, exact in f32);
   the global labels flow through exact int32 segment minima keyed by
   the component roots, so label width is never limited by the f32
   mantissa;
3. the psum'd count of changed local labels tells the host to
   iterate; convergence takes O(#slabs a cluster spans) rounds.

Catalog compilation replaces the mpsort-by-minID with per-component
partial sums routed to the label's OWNER shard (label // n_local —
each label is the global row id of the group's minimum member) through
the same fixed-capacity all_to_all as the domain exchange; the owner
reduces partials into root-row accumulators and the packed group table
is allgathered (it is small: groups >= min_group_length only).

Periodic centers of mass use the circular mean (atan2 of
mass-weighted phases) rather than the reference's first-member
anchor; for any group small against the box the two agree to
O((size/box)^2 * size).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..ops import pairs
from ..ops.morton import morton_key
from ..gravity.tree import build_tree
from ..gravity.treewalk import make_target_groups
from .decomp import ghost_strips_multi, exchange_by_dest


def _setup_pairs(ipos_a, include, n_rows, ll_box, group_max, group_cap,
                 ll_cap, radius=None):
    """Sort by Morton key, build the octree and neighbor lists over
    local+ghost rows (the per-shard half of the treewalk)."""
    keys = morton_key(ipos_a)
    keys = jnp.where(include, keys, ~jnp.uint64(0))
    perm = jnp.argsort(keys)
    inv = jnp.argsort(perm)
    ipos_s = ipos_a[perm]
    inc_s = include[perm]
    pos_box = ipos_s.astype(jnp.float32) * jnp.float32(2.0 ** -32)
    cap = 2 * n_rows + 64
    tree = build_tree(keys[perm], ipos_s, jnp.ones(n_rows, jnp.float32),
                      inc_s, 16, 18, cap, group_max=group_max)
    leaf_nodes, gc, gh, _, ngr, govf = make_target_groups(
        tree, pos_box, jnp.full(n_rows, jnp.inf, jnp.float32),
        group_cap, group_max)
    rad = jnp.full(gc.shape[0], ll_box if radius is None else radius,
                   jnp.float32)
    nbr = pairs.find_neighbors(tree, leaf_nodes, gc, gh, rad, None,
                               ll_cap, symmetric=False)
    nbr_ovf = jnp.any(nbr.overflow) | govf
    return tree, nbr, perm, inv, pos_box, inc_s, nbr_ovf


def _components(tree, nbr, pos_box, inc_s, n_rows, ll_box, group_max,
                leaf_eval, max_iter=64):
    """Connected components of the local+ghost graph: returns i32
    comp[n_rows] (sorted space) — the min member row (sorted index) of
    each component.  Row indices < 2^24 stay exact through the f32
    pair reduction; excluded rows point at themselves."""
    iota = jnp.arange(n_rows, dtype=jnp.int32)

    def sweep(lab):
        labf = jnp.where(inc_s, lab.astype(jnp.float32), jnp.inf)

        def pair_fn(dx, r, tmask, smask, tfeat, sfeat):
            near = r < ll_box
            return {"m": jnp.where(near, -sfeat["lab"], -jnp.inf)}

        out = pairs.pair_reduce(
            pair_fn, nbr, tree, pos_box, {}, {"lab": labf},
            {"m": "max"}, group_max, leaf_eval)
        new = -out["m"]
        good = jnp.isfinite(new)
        return jnp.where(inc_s & good,
                         jnp.minimum(lab, new.astype(jnp.int32)), lab)

    def body(st):
        lab, it, _ = st
        new = sweep(lab)
        # pointer jumping (labels are row indices here)
        new = jnp.minimum(new, new[jnp.clip(new, 0, n_rows - 1)])
        new = jnp.minimum(new, new[jnp.clip(new, 0, n_rows - 1)])
        changed = jnp.any(new != lab)
        return new, it + 1, changed

    def cond(st):
        _, it, changed = st
        return changed & (it < max_iter)

    lab, _, _ = lax.while_loop(cond, body, (iota, jnp.int32(0),
                                            jnp.bool_(True)))
    # canonicalize to the root
    for _ in range(5):
        lab = jnp.minimum(lab, lab[jnp.clip(lab, 0, n_rows - 1)])
    return lab


def build_fof_round(mesh, *, n_local, ghost_cap, hops, ll_box,
                    group_max=32, leaf_eval=16, ll_cap=64):
    """One global label round: ghost exchange + local components +
    exact int32 label minima.  fn(st, bounds) -> (labels' P('x'),
    {changed, ovf} replicated).

    st: {ipos P('x') u32[n,3], prim P('x') bool, label P('x') i32}.
    label holds global row gids (shard * n_local + row); rows not yet
    labeled carry their own gid.
    """
    def local(st, bounds):
        ipos, prim, label = st["ipos"], st["prim"], st["label"]
        (g_ipos, g_lab), g_ok, g_ovf = ghost_strips_multi(
            (ipos, label), ipos, prim, "x", bounds,
            jnp.float32(ll_box), ghost_cap, hops)
        cat = lambda a, b: jnp.concatenate([a, b], axis=0)
        ipos_a = cat(ipos, g_ipos)
        lab_a = cat(label, g_lab)
        inc_a = cat(prim, g_ok)
        n_rows = int(ipos_a.shape[0])
        group_cap = min((8 * n_rows) // group_max + 64, n_rows + 64)
        tree, nbr, perm, inv, pos_box, inc_s, nbr_ovf = _setup_pairs(
            ipos_a, inc_a, n_rows, jnp.float32(ll_box), group_max,
            group_cap, ll_cap)
        comp = _components(tree, nbr, pos_box, inc_s, n_rows,
                           jnp.float32(ll_box), group_max, leaf_eval)
        # exact global-label minimum per component (int32 scatter)
        lab_s = jnp.where(inc_s, lab_a[perm], jnp.int32(2 ** 31 - 1))
        cmin = jnp.full(n_rows, 2 ** 31 - 1, jnp.int32).at[comp].min(
            lab_s)
        lab_new_s = jnp.where(inc_s, cmin[comp], lab_s)
        lab_new = lab_new_s[inv][:n_local]
        lab_out = jnp.where(prim, jnp.minimum(label, lab_new), label)
        changed = lax.psum(jnp.sum((lab_out != label).astype(
            jnp.int32)), "x")
        ovf = lax.psum((g_ovf | nbr_ovf).astype(jnp.int32), "x")
        return lab_out, {"changed": changed, "ovf": ovf}

    fn = shard_map(
        local, mesh=mesh,
        in_specs=({"ipos": P("x"), "prim": P("x"), "label": P("x")},
                  P()),
        out_specs=(P("x"), {"changed": P(), "ovf": P()}),
        check_vma=False)
    return jax.jit(fn)


def build_fof_secondary(mesh, *, n_local, ghost_cap, hops, ll_box,
                        max_expand=6, group_max=32, leaf_eval=16,
                        ll_cap=128):
    """Attach secondaries to the nearest primary's group
    (fof_secondary, fof.c:1175 at scale).  The search radius doubles
    from the linking length up to 2^(max_expand-1) ll, capped by the
    ghost-strip width (a secondary farther than that from every
    primary is deep in the field, where its nearest primary is
    ungrouped anyway).

    fn(st, bounds) -> (labels P('x') i32 with secondaries attached,
    {ovf} replicated).  st: {ipos, prim, sec, label}.
    """
    w_box = float(ll_box) * (2.0 ** (max_expand - 1))

    def local(st, bounds):
        ipos, prim, sec = st["ipos"], st["prim"], st["sec"]
        label = st["label"]
        (g_ipos, g_lab, g_prim), g_ok, g_ovf = ghost_strips_multi(
            (ipos, label, prim), ipos, prim, "x", bounds,
            jnp.float32(w_box), ghost_cap, hops)
        cat = lambda a, b: jnp.concatenate([a, b], axis=0)
        ipos_a = cat(ipos, g_ipos)
        lab_a = cat(label, g_lab)
        prim_a = cat(prim, g_prim & g_ok)
        inc_a = cat(prim | sec, g_ok)
        n_rows = int(ipos_a.shape[0])
        group_cap = min((8 * n_rows) // group_max + 64, n_rows + 64)
        tree, nbr, perm, inv, pos_box, inc_s, nbr_ovf = _setup_pairs(
            ipos_a, inc_a, n_rows, jnp.float32(w_box), group_max,
            group_cap, ll_cap, radius=jnp.float32(w_box))
        prim_s = prim_a[perm]
        sec_s = cat(sec, jnp.zeros(g_ok.shape[0], bool))[perm]
        lab_s = lab_a[perm]
        iota = jnp.arange(n_rows, dtype=jnp.int32)
        rowf = jnp.where(prim_s, iota.astype(jnp.float32), jnp.inf)

        rmin = jnp.full(n_rows, jnp.inf, jnp.float32)
        attach_row = jnp.full(n_rows, -1, jnp.int32)
        radius = jnp.float32(ll_box)
        for _ in range(max_expand):
            rad = radius

            def pair_fn(dx, r, tmask, smask, tfeat, sfeat, rad=rad):
                ok = (r < rad) & jnp.isfinite(sfeat["row"])
                return {"negr": jnp.where(ok, -r, -jnp.inf)}

            out = pairs.pair_reduce(
                pair_fn, nbr, tree, pos_box, {}, {"row": rowf},
                {"negr": "max"}, group_max, leaf_eval)
            rnew = -out["negr"]
            found = sec_s & jnp.isfinite(rnew) & ~jnp.isfinite(rmin)
            rmin = jnp.where(found, rnew, rmin)
            rtol = rmin * jnp.float32(1 + 1e-5) + jnp.float32(1e-12)

            def pair_fn2(dx, r, tmask, smask, tfeat, sfeat):
                ok = (r <= tfeat["rtol"]) & jnp.isfinite(sfeat["row"])
                return {"mrow": jnp.where(ok, -sfeat["row"],
                                          -jnp.inf)}

            out2 = pairs.pair_reduce(
                pair_fn2, nbr, tree, pos_box, {"rtol": rtol},
                {"row": rowf}, {"mrow": "max"}, group_max, leaf_eval)
            row_new = -out2["mrow"]
            good = found & jnp.isfinite(row_new)
            attach_row = jnp.where(good, row_new.astype(jnp.int32),
                                   attach_row)
            radius = radius * 2

        att_lab = lab_s[jnp.clip(attach_row, 0, n_rows - 1)]
        lab_out_s = jnp.where(sec_s & (attach_row >= 0), att_lab,
                              lab_s)
        lab_out = lab_out_s[inv][:n_local]
        lab_out = jnp.where(sec, lab_out, label)
        ovf = lax.psum((g_ovf | nbr_ovf).astype(jnp.int32), "x")
        return lab_out, {"ovf": ovf}

    fn = shard_map(
        local, mesh=mesh,
        in_specs=({"ipos": P("x"), "prim": P("x"), "sec": P("x"),
                   "label": P("x")}, P()),
        out_specs=(P("x"), {"ovf": P()}),
        check_vma=False)
    return jax.jit(fn)


# catalog partial-sum column layout (per group):
# 0 m | 1:4 m*cos | 4:7 m*sin | 7:10 m*v | 10:16 m_by_type |
# 16 sfr | 17:23 count_by_type | 23 count
_NCOLS = 24


def build_fof_counts(mesh, *, n_local, qual_cap, min_group_length):
    """Global member count per label and the qualifying-label set.

    Labels ARE global row ids, so ownership is implicit: each shard
    scatter-adds its members into a dense (S*n_local,) count vector
    and ONE psum_scatter hands every shard the totals for its owned
    labels — no run packing, no overflow paths (the dense analog of
    the reference's minID mpsort count, fof.c:874).

    fn(label P('x'), valid P('x')) -> (qual_labels replicated
    i32[S*qual_cap] (sorted ascending, padded 2^31-1), n_qual, ovf).
    """
    S = int(mesh.devices.size)

    def local(label, valid):
        s_idx = lax.axis_index("x")
        grouped = valid & (label >= 0)
        dense = jnp.zeros(S * n_local, jnp.int32).at[
            jnp.where(grouped, label, S * n_local)].add(1, mode="drop")
        counts = lax.psum_scatter(dense, "x", scatter_dimension=0,
                                  tiled=True)
        qual = counts >= min_group_length
        n_qual_loc = jnp.sum(qual.astype(jnp.int32))
        ovf = n_qual_loc > qual_cap
        pick = jnp.argsort(~qual)[:qual_cap]
        glab = jnp.where(jnp.arange(qual_cap) < n_qual_loc,
                         (s_idx * n_local + pick).astype(jnp.int32),
                         jnp.int32(2 ** 31 - 1))
        all_lab = jnp.sort(lax.all_gather(glab, "x").reshape(-1))
        return (all_lab, lax.psum(n_qual_loc, "x"),
                lax.psum(ovf.astype(jnp.int32), "x"))

    fn = shard_map(
        local, mesh=mesh, in_specs=(P("x"), P("x")),
        out_specs=(P(), P(), P()), check_vma=False)
    return jax.jit(fn)


def build_fof_catalog(mesh, *, n_local, group_cap, bucket_cap,
                      with_sfr=False, with_bh=False):
    """Per-group reductions routed to the label's owner shard
    (fof_compile_catalogue, fof.c:874, with the mpsort replaced by the
    fixed-capacity all_to_all of the domain exchange).

    fn(st, qual_labels) -> (groups replicated dict, flags replicated):
    st holds {label P('x') i32 (-1 = ungrouped), mass, vel, ptype,
    valid, ipos [, sfr] [, density, gas_mask]}; qual_labels is the
    replicated sorted qualifying-label table from build_fof_counts —
    rows whose label is not in it are skipped, so group_cap only needs
    to cover the QUALIFYING labels present per shard.  groups: packed
    arrays of the group table (each (S*group_cap,) replicated, valid
    where label >= 0): label, the _NCOLS sums, has_bh, seed_gid,
    seed_density.  The host finalizes with ``finalize_catalog``.
    """
    S = int(mesh.devices.size)
    two_pi = 2.0 * np.pi

    def local(st, qual_labels):
        label, valid = st["label"], st["valid"]
        n = label.shape[0]
        s_idx = lax.axis_index("x")
        pos = jnp.clip(jnp.searchsorted(qual_labels, label), 0,
                       qual_labels.shape[0] - 1)
        grouped = valid & (label >= 0) & (qual_labels[pos] == label)
        # ---- local per-label partial sums via a label sort ----------
        order = jnp.argsort(jnp.where(grouped, label, 2 ** 31 - 1))
        lab_s = label[order]
        ok_s = grouped[order]
        iota = jnp.arange(n, dtype=jnp.int32)
        is_start = ok_s & ((iota == 0) | (lab_s != jnp.roll(lab_s, 1)))
        run_of_row = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        run_of_row = jnp.where(ok_s, run_of_row, group_cap)
        n_runs = jnp.sum(is_start.astype(jnp.int32))
        run_ovf = n_runs > group_cap
        run_ok = jnp.arange(group_cap) < n_runs
        start_idx = jnp.nonzero(is_start, size=group_cap,
                                fill_value=n - 1)[0]
        run_lab = lab_s[start_idx]

        m = jnp.where(grouped, st["mass"], 0.0)[order]
        theta = (st["ipos"].astype(jnp.float32)
                 * jnp.float32(two_pi / 2.0 ** 32))[order]
        vel = st["vel"][order]
        t = jnp.where(grouped, st["ptype"], 6)[order]
        onehot = (t[:, None] == jnp.arange(6)[None, :]).astype(
            jnp.float32)
        cols = [m[:, None], m[:, None] * jnp.cos(theta),
                m[:, None] * jnp.sin(theta), m[:, None] * vel,
                m[:, None] * onehot]
        if with_sfr:
            cols.append(jnp.where(ok_s, st["sfr"][order],
                                  0.0)[:, None])
        else:
            cols.append(jnp.zeros((n, 1), jnp.float32))
        cols.append(onehot * ok_s[:, None])
        cols.append(ok_s.astype(jnp.float32)[:, None])
        vals = jnp.concatenate(cols, axis=1)           # (n, _NCOLS)
        # exact segment sums by scatter-add into run slots (no global
        # cumsum: f32 cancellation over millions of rows is avoided)
        seg = jnp.zeros((group_cap + 1, _NCOLS), jnp.float32).at[
            run_of_row].add(jnp.where(ok_s[:, None], vals, 0.0),
                            mode="drop")[:group_cap]

        # BH presence + densest-gas seed candidate per run
        if with_bh:
            bh_s = (jnp.where(grouped, st["ptype"], 0) == 5)[order]
            dens = jnp.where(grouped & st["gas_mask"],
                             st["density"], -1.0)[order]
            run_bh = jnp.zeros(group_cap + 1, jnp.int32).at[
                run_of_row].add(bh_s.astype(jnp.int32),
                                mode="drop")[:group_cap]
            dmax = jnp.full(group_cap + 1, -1.0, jnp.float32).at[
                run_of_row].max(dens, mode="drop")[:group_cap]
            gid_row = (s_idx * n_local + iota[order]).astype(jnp.int32)
            hit = (dens >= dmax[jnp.clip(run_of_row, 0,
                                         group_cap - 1)]) \
                & (dens > 0) & ok_s
            gmin = jnp.full(group_cap + 1, 2 ** 31 - 1, jnp.int32).at[
                jnp.where(hit, run_of_row, group_cap)].min(
                gid_row, mode="drop")[:group_cap]
        else:
            run_bh = jnp.zeros(group_cap, jnp.int32)
            dmax = jnp.full(group_cap, -1.0, jnp.float32)
            gmin = jnp.full(group_cap, 2 ** 31 - 1, jnp.int32)

        # ---- route partials to the label's owner shard --------------
        dest = jnp.where(run_ok, run_lab // n_local, S)
        payload = {"lab": run_lab, "seg": seg, "bh": run_bh,
                   "dmax": dmax, "gmin": gmin}
        rcap = group_cap * min(S, 8)

        def padto(a):
            return jnp.concatenate(
                [a, jnp.zeros((rcap - group_cap,) + a.shape[1:],
                              a.dtype)], axis=0)

        payload = jax.tree_util.tree_map(padto, payload)
        pvalid = jnp.concatenate(
            [run_ok, jnp.zeros(rcap - group_cap, bool)])
        pdest = jnp.concatenate(
            [dest, jnp.full(rcap - group_cap, S, jnp.int32)])
        recv, rvalid, x_ovf = exchange_by_dest(
            payload, pdest, pvalid, "x", bucket_cap)

        # ---- owner-side reduction into root-row accumulators --------
        rrow = jnp.where(rvalid, recv["lab"] - s_idx * n_local,
                         n_local)
        rrow = jnp.clip(rrow, 0, n_local)
        acc = jnp.zeros((n_local + 1, _NCOLS), jnp.float32).at[
            rrow].add(jnp.where(rvalid[:, None], recv["seg"], 0.0))
        acc_bh = jnp.zeros(n_local + 1, jnp.int32).at[rrow].add(
            jnp.where(rvalid, recv["bh"], 0))
        acc_dmax = jnp.full(n_local + 1, -1.0, jnp.float32).at[
            rrow].max(jnp.where(rvalid, recv["dmax"], -1.0))
        hit2 = rvalid & (recv["dmax"] >= acc_dmax[rrow])
        acc_gmin = jnp.full(n_local + 1, 2 ** 31 - 1, jnp.int32).at[
            jnp.where(hit2, rrow, n_local)].min(recv["gmin"],
                                                mode="drop")

        # ---- pack owned groups, allgather ----------------------------
        # (all accumulated labels already passed the qualifying
        # filter, so count > 0 == qualifying group)
        counts = acc[:n_local, -1]
        qual = counts > 0
        own_order = jnp.argsort(-counts)[:group_cap]
        g_ovf = jnp.sum(qual.astype(jnp.int32)) > group_cap
        keep = qual[own_order]
        glab = jnp.where(
            keep, (s_idx * n_local + own_order).astype(jnp.int32), -1)
        gvals = jnp.where(keep[:, None], acc[own_order], 0.0)
        groups = {
            "label": lax.all_gather(glab, "x").reshape(-1),
            "vals": lax.all_gather(gvals, "x").reshape(-1, _NCOLS),
            "has_bh": lax.all_gather(
                jnp.where(keep, acc_bh[own_order], 0), "x"
                ).reshape(-1),
            "seed_density": lax.all_gather(
                jnp.where(keep, acc_dmax[own_order], -1.0), "x"
                ).reshape(-1),
            "seed_gid": lax.all_gather(
                jnp.where(keep, acc_gmin[own_order], 2 ** 31 - 1),
                "x").reshape(-1),
        }
        flags = {"run_ovf": lax.psum(run_ovf.astype(jnp.int32), "x"),
                 "x_ovf": lax.psum(x_ovf.astype(jnp.int32), "x"),
                 "pack_ovf": lax.psum(g_ovf.astype(jnp.int32), "x")}
        return groups, flags

    st_keys = ["label", "mass", "vel", "ptype", "valid", "ipos"]
    if with_sfr:
        st_keys.append("sfr")
    if with_bh:
        st_keys += ["density", "gas_mask"]
    fn = shard_map(
        local, mesh=mesh,
        in_specs=({k: P("x") for k in st_keys}, P()),
        out_specs=({k: P() for k in ("label", "vals", "has_bh",
                                     "seed_density", "seed_gid")},
                   {k: P() for k in ("run_ovf", "x_ovf",
                                     "pack_ovf")}),
        check_vma=False)
    return jax.jit(fn)


def finalize_catalog(groups, boxsize, min_group_length):
    """Host-side catalog from the allgathered group table: filter by
    minimum length, order by descending mass (the reference sorts the
    catalog, fof.c:1127).  Returns (cat dict in the physics/fof.py
    layout minus group_index, sorted_labels i32[ngroups] in catalog
    order, seeding extras)."""
    vals = np.asarray(groups["vals"], np.float64)
    counts = np.rint(vals[:, 23]).astype(np.int64)
    keep = counts >= min_group_length
    vals = vals[keep]
    counts = counts[keep]
    labels = np.asarray(groups["label"])[keep]
    has_bh = np.asarray(groups["has_bh"])[keep] > 0
    seed_gid = np.asarray(groups["seed_gid"])[keep]
    seed_density = np.asarray(groups["seed_density"])[keep]
    masses = vals[:, 0]
    order = np.argsort(-masses, kind="stable")
    vals = vals[order]
    counts = counts[order]
    masses = masses[order]
    ang = np.arctan2(vals[:, 4:7], vals[:, 1:4])   # (-pi, pi]
    cm = np.mod(ang / (2 * np.pi), 1.0) * boxsize
    vcm = vals[:, 7:10] / np.maximum(masses[:, None], 1e-30)
    cat = {
        "ngroups": int(keep.sum()),
        "lengths": counts,
        "masses": masses,
        "cm": cm,
        "vel": vcm,
        "mass_by_type": vals[:, 10:16],
        "len_by_type": np.rint(vals[:, 17:23]).astype(np.int64),
        "sfr": vals[:, 16],
    }
    return cat, labels[order], {
        "has_bh": has_bh[order],
        "seed_gid": seed_gid[order],
        "seed_density": seed_density[order],
    }


def _global_iota(mesh, n_local):
    """Sharded global row-id array: shard s holds
    [s*n_local, (s+1)*n_local)."""
    from jax.sharding import NamedSharding
    S = int(mesh.devices.size)
    sh = NamedSharding(mesh, P("x"))
    x = np.arange(S * n_local, dtype=np.int32)
    if jax.process_count() > 1:
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])
    return jax.device_put(jnp.asarray(x), sh)


def _hops_for(bounds, width_box, S):
    """Ring hops so the union of +-k neighbor slabs covers width_box
    from any slab face (decomp.ghost_strips_multi contract)."""
    b = np.asarray(bounds, np.uint64)
    widths = np.diff(np.append(b, np.uint64(2 ** 32))).astype(
        np.float64) / 2.0 ** 32
    wmin = max(float(widths.min()), 1.0 / 2.0 ** 32)
    hops = int(np.ceil(float(width_box) / wmin))
    return max(1, min(hops, S // 2 if S > 1 else 1))


def sharded_fof(mesh, st, bounds, *, boxsize, mean_sep, n_local,
                params, max_rounds=None, verbose=False, cache=None):
    """Host orchestration of the distributed FOF (runfof, run.c:813 +
    fof_fof, fof.c:158-330 at scale): label rounds to convergence,
    secondary attach, member counts, catalog compilation.

    st: dict of sharded P('x') arrays {ipos, vel, mass, ptype, valid
    [, sfr, density, gas_mask]}; bounds: uint32[S] slab left edges
    (host numpy); params: physics.fof.FOFParams.

    Returns (cat, sorted_labels, extras, labels): cat/extras as
    ``finalize_catalog``; labels is the per-row group label array
    P('x') (global min-member gid, -1 ungrouped) for group-index
    lookups and PIG output.  ``cache``: optional dict reused across
    sync points to keep compiled programs warm.
    """
    S = int(mesh.devices.size)
    # the min-label sweep carries SORTED-SPACE row indices through the
    # f32 pair reduction (_components docstring): exact only below
    # 2^24.  n_rows = n_local + ghosts <= 2*n_local (ghost_cap is
    # clamped to n_local), so guard the worst case loudly instead of
    # silently corrupting labels (fof.c:158-330 has no such limit —
    # use more shards to stay under it).
    if 2 * n_local > (1 << 24):
        raise ValueError(
            f"sharded FOF: {n_local} rows/shard can exceed the 2^24 "
            "f32-exact row-index limit of the pair reduction once "
            "ghost strips are appended; rerun with more shards "
            f"(need n_local <= {1 << 23})")
    cache = cache if cache is not None else {}
    ll = params.linking_length * mean_sep
    ll_box = ll / boxsize
    valid = st["valid"]
    ptype = st["ptype"]
    prim = valid & (((1 << ptype.astype(jnp.int32))
                     & params.primary_link_types) > 0)
    sec = valid & ~prim & (((1 << ptype.astype(jnp.int32))
                            & params.secondary_link_types) > 0)
    gid = _global_iota(mesh, n_local)
    label = jnp.where(prim, gid, -1)
    bounds_dev = jnp.asarray(bounds)

    bp = cache.setdefault("bp", {
        "ghost_cap": max(256, n_local // 8), "ll_cap": 64})
    hops = _hops_for(bounds, ll_box, S)
    if max_rounds is None:
        max_rounds = 4 * S + 8

    def get(name, builder, **kw):
        key = (name,) + tuple(sorted(kw.items()))
        if key not in cache:
            cache[key] = builder(mesh, n_local=n_local, **kw)
        return cache[key]

    stf = {"ipos": st["ipos"], "prim": prim, "label": label}
    for rnd in range(max_rounds):
        fn = get("round", build_fof_round, ghost_cap=bp["ghost_cap"],
                 hops=hops, ll_box=ll_box, ll_cap=bp["ll_cap"])
        label_new, fl = fn(stf, bounds_dev)
        if int(fl["ovf"]):
            bp["ghost_cap"] = min(2 * bp["ghost_cap"], n_local)
            bp["ll_cap"] *= 2
            continue
        stf["label"] = label_new
        if int(fl["changed"]) == 0:
            break
    else:
        raise RuntimeError("sharded FOF: label rounds did not "
                           f"converge in {max_rounds}")
    label = stf["label"]

    if bool(jnp.any(sec)):
        w_box = ll_box * 2.0 ** 5
        hops_s = _hops_for(bounds, w_box, S)
        for _ in range(4):
            fn = get("secondary", build_fof_secondary,
                     ghost_cap=bp["ghost_cap"], hops=hops_s,
                     ll_box=ll_box, ll_cap=max(bp["ll_cap"], 128))
            label_new, fl = fn({"ipos": st["ipos"], "prim": prim,
                                "sec": sec, "label": label},
                               bounds_dev)
            if not int(fl["ovf"]):
                label = label_new
                break
            bp["ghost_cap"] = min(2 * bp["ghost_cap"], n_local)
            bp["ll_cap"] *= 2
        else:
            raise RuntimeError("sharded FOF: secondary attach "
                               "capacity retries exhausted")

    # qualifying labels (counts include attached secondaries)
    qual_cap = cache.setdefault(
        "qual_cap", max(64, n_local // max(params.min_group_length,
                                           1)))
    for _ in range(4):
        fn = get("counts", build_fof_counts, qual_cap=qual_cap,
                 min_group_length=params.min_group_length)
        qual_labels, n_qual, ovf = fn(label, valid)
        if not int(ovf):
            break
        qual_cap = min(2 * qual_cap, n_local)
        cache["qual_cap"] = qual_cap
    else:
        raise RuntimeError("sharded FOF: qualifying-label overflow")

    with_sfr = "sfr" in st
    with_bh = "density" in st and "gas_mask" in st
    group_cap = cache.setdefault("group_cap",
                                 max(64, 2 * int(n_qual) // S + 16))
    cst = {"label": label, "mass": st["mass"], "vel": st["vel"],
           "ptype": ptype, "valid": valid, "ipos": st["ipos"]}
    if with_sfr:
        cst["sfr"] = st["sfr"]
    if with_bh:
        cst["density"] = st["density"]
        cst["gas_mask"] = st["gas_mask"]
    for _ in range(6):
        fn = get("catalog", build_fof_catalog, group_cap=group_cap,
                 bucket_cap=max(group_cap, 64), with_sfr=with_sfr,
                 with_bh=with_bh)
        groups, fl = fn(cst, qual_labels)
        if not any(int(fl[k]) for k in ("run_ovf", "x_ovf",
                                        "pack_ovf")):
            break
        group_cap = min(2 * group_cap, n_local)
        cache["group_cap"] = group_cap
    else:
        raise RuntimeError("sharded FOF: catalog capacity retries "
                           "exhausted")

    cat, sorted_labels, extras = finalize_catalog(
        groups, boxsize, params.min_group_length)
    return cat, sorted_labels, extras, label


def build_group_index(mesh, *, n_local):
    """Per-row catalog rank from the (replicated, catalog-ordered)
    label table: fn(label P('x'), sorted_cat_labels replicated i32) ->
    group_index P('x') i32 (-1 ungrouped) — the per-particle GrNr
    (fof.c:1127-1133)."""
    def local(label, cat_labels, cat_rank):
        pos = jnp.searchsorted(cat_labels, label)
        pos = jnp.clip(pos, 0, cat_labels.shape[0] - 1)
        hit = (label >= 0) & (cat_labels[pos] == label)
        return jnp.where(hit, cat_rank[pos], -1)

    fn = shard_map(
        local, mesh=mesh, in_specs=(P("x"), P(), P()),
        out_specs=P("x"), check_vma=False)
    return jax.jit(fn)


def build_seed_convert(mesh, *, n_local):
    """Convert the chosen gas rows to freshly-seeded black holes
    (blackhole_make via fof_seed, fof.c + blackhole.c:1100 at scale):
    fn(st, seed_gids replicated i32 (sorted, padded with 2^31-1),
    scal) -> updates for ptype/mass/bh columns on matching rows."""
    def local(st, seed_gids, scal):
        s_idx = lax.axis_index("x")
        n = st["ptype"].shape[0]
        gid = s_idx * n_local + jnp.arange(n, dtype=jnp.int32)
        pos = jnp.clip(jnp.searchsorted(seed_gids, gid), 0,
                       seed_gids.shape[0] - 1)
        hit = (seed_gids[pos] == gid) & st["valid"]
        upd = {
            "ptype": jnp.where(hit, 5, st["ptype"]),
            "gas_mask": st["gas_mask"] & ~hit,
            "bh_mass": jnp.where(hit, scal["seed_mass"],
                                 st["bh_mass"]),
            "bh_mtrack": jnp.where(hit, st["mass"],
                                   st["bh_mtrack"]),
            "mass": jnp.where(
                hit & (scal["seed_dyn_mass"] > 0),
                scal["seed_dyn_mass"], st["mass"]),
            "formation_time": jnp.where(
                hit, scal["atime"], st["formation_time"]),
        }
        n_seeded = lax.psum(jnp.sum(hit.astype(jnp.int32)), "x")
        return upd, n_seeded

    st_keys = ("ptype", "gas_mask", "bh_mass", "bh_mtrack", "mass",
               "valid", "formation_time")
    fn = shard_map(
        local, mesh=mesh,
        in_specs=({k: P("x") for k in st_keys}, P(),
                  {k: P() for k in ("seed_mass", "seed_dyn_mass",
                                    "atime")}),
        out_specs=({k: P("x") for k in
                    ("ptype", "gas_mask", "bh_mass", "bh_mtrack",
                     "mass", "formation_time")}, P()),
        check_vma=False)
    return jax.jit(fn)
