"""Production sharded KDK step: gas+DM TreePM over balanced slabs.

The round-2 sharded path (parallel/treepm.py) was a bare DM-only KDK
with geometric slabs and single-hop ghosts.  This module is the
production analog of the reference run loop's per-step machinery
(run.c:358-800): count-balanced slab boundaries (domain.c:106),
K-hop ghost strips (treewalk.c exports reach any rank), the full
gas+DM force stack (tree + pencil-FFT PM + SPH density + hydro), the
half-kick/drift/half-kick structure with entropy integration
(timestep.c apply_half_kick / apply_hydro_half_kick), and psum'd
timestep statistics so the host policy never mirrors particle arrays.

Everything runs inside ONE jitted shard_map step; the host loop in
`Simulation.run_sharded` supplies kick/drift factors, recomputes the
balanced boundaries from the returned x-histogram, and rebuilds the
step (memoized) when capacities or hop counts must grow.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..gravity.treepm import tree_force
from ..integrate import drift, kick
from ..utils.constants import GAMMA, GAMMA_MINUS1
from .collectives import axis_size, ring_shift
from .decomp import (exchange_to_slabs, ghost_strips_multi, owner_of,
                     count_histogram)
from .pfft import pm_force_slab, cic_deposit_slab, cic_readout_slab


def pm_force_multi(ipos, weights, nmesh, boxsize, gconst, asmth,
                   axis_name, hops, nu_logk=None, nu_fac=None,
                   nbins=0, with_potential=False):
    """Sharded PM force for rows that may live up to ``hops`` geometric
    slabs away from their holder (count-balanced ownership).

    Capacity-free: each shard ring-gathers the (ipos, weights) rows of
    its 2*hops ring neighbors, deposits/reads out ONLY the rows inside
    its own geometric mesh slab (the existing ok-masked slab kernels,
    pfft.py:68-133), and ring-returns the accel chunks; every row's
    accel arrives as exactly one non-zero contribution.  hops=0 is the
    strictly-geometric case (== pm_force_slab).

    nu_logk/nu_fac: optional neutrino linear-response table — modes
    are scaled by interp(log k) exactly like the single-chip kernel
    (potential_transfer, gravpm.c:415-436).  nbins > 0 additionally
    bins the in-line total-matter power spectrum per slab and psums
    the bins (powerspectrum_add_mode at scale); returns
    (accel, (p, n, k, norm) or None) — plus per-row PM potential when
    ``with_potential`` (one extra inverse FFT; the pdata.potential
    analog used by BH min-pot repositioning).
    """
    from ..pm.gravity import (potential_transfer_fac,
                              force_transfer_fac, _bin_reduce)
    from .pfft import (_kmodes_slab, _deconv_slab, pencil_r2c,
                       pencil_c2r)
    S = axis_size(axis_name)
    s = lax.axis_index(axis_name)
    ny_loc = nmesh // S

    shifts = [0]
    for k in range(1, hops + 1):
        shifts.append(+k)
        if (2 * k) % S != 0:
            shifts.append(-k)
    chunks = [(ipos, weights)]
    for sh in shifts[1:]:
        chunks.append((ring_shift(ipos, axis_name, sh),
                       ring_shift(weights, axis_name, sh)))
    ipos_all = jnp.concatenate([c[0] for c in chunks], axis=0)
    w_all = jnp.concatenate([c[1] for c in chunks], axis=0)

    mesh_slab = cic_deposit_slab(ipos_all, w_all, nmesh, axis_name)
    rho_k = pencil_r2c(mesh_slab, axis_name)
    kx, ky, kz = _kmodes_slab(nmesh, ny_loc, s)
    k2 = kx * kx + ky * ky + kz * kz
    deconv = _deconv_slab(kx, ky, kz, nmesh)
    if nu_logk is not None:
        kmag = jnp.sqrt(k2) * jnp.float32(2 * np.pi / boxsize)
        fac_nu = jnp.interp(jnp.log(jnp.maximum(kmag, 1e-30)),
                            nu_logk, nu_fac)
        rho_k = rho_k * jnp.where(k2 > 0, fac_nu,
                                  1.0).astype(jnp.complex64)
    pk = None
    if nbins:
        m2 = (rho_k.real ** 2 + rho_k.imag ** 2) * deconv * deconv
        w = jnp.where((kz == 0) | (kz == nmesh // 2),
                      jnp.float32(1.0), jnp.float32(2.0)) \
            * jnp.ones_like(k2)
        binsperunit = (nbins - 1) / np.log(np.sqrt(3.0) * nmesh / 2.0)
        kint = jnp.floor(binsperunit * 0.5 * jnp.log(
            jnp.maximum(k2, 1e-30))).astype(jnp.int32)
        kint = jnp.where(k2 == 0, nbins, kint)
        keff = jnp.sqrt(k2)
        p_b, n_b, k_b = _bin_reduce(
            kint.ravel(), nbins, (w * m2).ravel(), w.ravel(),
            (w * keff).ravel())
        # the zero mode lives on the shard holding ky=0 (s == 0)
        norm = lax.psum(jnp.where(s == 0, rho_k[0, 0, 0].real ** 2,
                                  0.0), axis_name)
        pk = (lax.psum(p_b, axis_name), lax.psum(n_b, axis_name),
              lax.psum(k_b, axis_name), norm)
    pot_k = rho_k * potential_transfer_fac(
        k2, deconv, nmesh, boxsize, gconst, asmth).astype(jnp.complex64)
    meshes = []
    for kk in (kx, ky, kz):
        fk = pot_k * (1j * force_transfer_fac(kk, nmesh, boxsize)
                      ).astype(jnp.complex64)
        meshes.append(pencil_c2r(fk, axis_name))
    if with_potential:
        meshes.append(pencil_c2r(pot_k, axis_name))
    stacked = jnp.stack(meshes, axis=-1).astype(jnp.float32)
    acc_all = cic_readout_slab(stacked, ipos_all, axis_name)

    n_loc = ipos.shape[0]
    acc = acc_all[:n_loc]
    for i, sh in enumerate(shifts[1:], start=1):
        part = acc_all[i * n_loc:(i + 1) * n_loc]
        # rows gathered with shift sh came from shard s-sh; their accel
        # contribution returns with the inverse shift.
        acc = acc + ring_shift(part, axis_name, -sh)
    if with_potential:
        return acc[:, :3], pk, acc[:, 3]
    return acc, pk


def _entropy_update(entropy, dtent, dloga, density, min_egy_spec,
                    atime, gas_mask):
    """Half-kick entropy integration with the MinGasTemp floor and the
    at-most-halving limiter (apply_hydro_half_kick, timestep.c)."""
    ent = entropy + dtent * dloga
    a3 = atime ** 3
    minent = GAMMA_MINUS1 * min_egy_spec / jnp.maximum(
        density / a3, 1e-30) ** GAMMA_MINUS1
    ent = jnp.maximum(ent, minent)
    ent = jnp.maximum(ent, 0.5 * entropy)
    return jnp.where(gas_mask, ent, entropy)


def spawn_rows(st, gas, make_star, convert, star_mass, atime):
    """Star spawning on the sharded state dict (spawn_stars semantics,
    sfr.py:246: full conversions flip ptype in place, partial
    conversions claim invalid LOCAL rows — slot allocation needs no
    communication because every shard owns its free rows).

    Returns (st, gas, n_spawned, overflow)."""
    n = st["valid"].shape[0]
    spawn = make_star & (~convert)
    free = ~st["valid"]
    free_idx_of_rank = jnp.argsort(~free, stable=True)
    spawn_rank = jnp.cumsum(spawn.astype(jnp.int32)) - 1
    nspawn = jnp.sum(spawn.astype(jnp.int32))
    nfree = jnp.sum(free.astype(jnp.int32))
    overflow = nspawn > nfree
    dest = free_idx_of_rank[jnp.clip(spawn_rank, 0, n - 1)]
    dest = jnp.where(spawn & (spawn_rank < nfree), dest, n)

    def put(key, vals):
        st[key] = st[key].at[dest].set(vals, mode="drop")

    st["ptype"] = jnp.where(convert, 4, st["ptype"])
    put("ptype", jnp.full(n, 4, st["ptype"].dtype))
    for k in ("ipos", "vel", "hsml", "dt_hsml", "amag", "grav_acc",
              "dtent", "density", "metals", "pm_acc", "bins"):
        if k in st:
            put(k, st[k])
    if "star_hsml" in st:
        # new stars keep the parent gas kernel as the initial metal-
        # return search radius (stellarhsml seed, slotsmanager.c:105)
        st["star_hsml"] = jnp.where(convert, st["hsml"],
                                    st["star_hsml"])
        put("star_hsml", st["hsml"])
        zero = jnp.zeros(n, jnp.float32)
        for k in ("total_mass_returned", "last_enrichment_myr"):
            st[k] = jnp.where(convert, 0.0, st[k])
            put(k, zero)
    st["mass"] = jnp.where(spawn, st["mass"] - star_mass, st["mass"])
    put("mass", star_mass)
    put("pid", st["pid"] + jnp.asarray(2 ** 40, st["pid"].dtype))
    put("valid", spawn)
    put("gas_mask", jnp.zeros(n, bool))
    st["gas_mask"] = st["gas_mask"] & (st["ptype"] == 0)
    # star birth record (starslots init analog); converted rows keep
    # their row, spawned rows land at dest
    atime_f = jnp.float32(atime)

    def fill(key, vals):
        st[key] = jnp.where(convert, vals, st[key]).at[dest].set(
            jnp.where(make_star, vals, 0.0), mode="drop")

    fill("formation_time", jnp.where(make_star, atime_f, 0.0))
    fill("birth_density", jnp.where(make_star, st["density"], 0.0))
    fill("birth_metallicity",
         jnp.where(make_star, st["metallicity"], 0.0))
    gas = st["gas_mask"] & st["valid"]
    return st, gas, nspawn, overflow


MAXB = 46     # static timebin-table size == TIMEBINS (timeline.py:17);
              # bins live in [1, maxbin<=MAXB]


def assign_bins_global(state, with_gas, atime, eta_eps, hubble,
                       courant_fac, fac3, max_dloga, dloga_tick,
                       maxbin):
    """Per-particle power-of-two timebins from the gravity +
    Courant/Hsml criteria (find_timesteps, timestep.c:298-503) on the
    SHARDED state — pure elementwise math, so it runs directly on the
    P('x') global arrays with sharding propagation (no shard_map)."""
    atime = jnp.float32(atime)
    full = (state["grav_acc"] + state["pm_acc"]) / (atime * atime)
    ac = jnp.sqrt(jnp.maximum(jnp.sum(full * full, axis=-1), 1e-60))
    dloga = jnp.sqrt(jnp.float32(eta_eps) / ac) * jnp.float32(hubble)
    if with_gas:
        gas = state["gas_mask"] & state["valid"]
        vsig = jnp.maximum(state["maxsig"], 1e-30)
        dt_c = 2.0 * jnp.float32(courant_fac) * atime \
            * state["hsml"] / (jnp.float32(fac3) * vsig)
        dt_h = jnp.float32(courant_fac) * atime * atime * jnp.abs(
            state["hsml"] / (state["dt_hsml"] + 1e-20))
        dloga_h = jnp.minimum(dt_c, dt_h) * jnp.float32(hubble)
        dloga = jnp.where(gas, jnp.minimum(dloga, dloga_h), dloga)
    dloga = jnp.minimum(dloga, jnp.float32(max_dloga))
    dti = dloga / jnp.float32(dloga_tick)
    bins = jnp.floor(jnp.log2(jnp.maximum(dti, 2.0))).astype(jnp.int32)
    bins = jnp.clip(bins, 1, jnp.int32(maxbin))
    return jnp.where(state["valid"], bins, jnp.int32(maxbin))


def build_sharded_pm(mesh, *, n_local, hops_pm, nmesh, boxsize, gconst,
                     asmth, hist_bits=12, nbins=0, with_nu=False,
                     with_gas=True, with_potential=False,
                     with_nu_tracer=False):
    """PM refresh + boundary half kick for hierarchical stepping
    (compute_forces(tree=False) + apply_PM_half_kick, run.c:605 /
    timestep.c at scale).

    fn(st, scal) -> (upd, stats, pm_far_count): st holds {ipos, vel,
    mass, valid, ptype, grav_acc, gas_mask, hsml} P('x'); scal holds
    replicated {fac (closing gravkick factor), ...nu tables}.  upd =
    {pm_acc, vel, amag}; stats carry the displacement-criterion
    reductions (vsum/count/min_mass per type), the x histogram for
    rebalancing, n_valid and hmax."""
    S = int(mesh.devices.size)
    log2s = int(np.log2(S))

    def pm_local(st, scal):
        valid = st["valid"]
        s_idx = lax.axis_index("x")
        geo = (st["ipos"][:, 0] >> jnp.uint32(32 - log2s)).astype(
            jnp.int32)
        dring = jnp.abs(geo - s_idx)
        dring = jnp.minimum(dring, S - dring)
        pm_far = jnp.any(valid & (dring > hops_pm))
        gmass = jnp.where(valid, st["mass"], 0.0)
        if with_nu_tracer:
            # hybrid-nu passive tracers (gravpm.c:83-85,469-475):
            # before NuPartTime type-2 rows neither deposit mass nor
            # receive the PM force; nu_src flips 0->1 at the crossing
            # without recompiling
            tr_w = 1.0 - ((st["ptype"] == 2)
                          & (scal["nu_src"] < 0.5)).astype(jnp.float32)
            gmass = gmass * tr_w
        res_pm = pm_force_multi(
            st["ipos"], gmass, nmesh,
            boxsize, gconst, asmth, "x", hops_pm,
            nu_logk=scal["nu_logk"] if with_nu else None,
            nu_fac=scal["nu_fac"] if with_nu else None, nbins=nbins,
            with_potential=with_potential)
        acc_pm, pk = res_pm[0], res_pm[1]
        if with_nu_tracer:
            acc_pm = acc_pm * tr_w[:, None]
        vel = st["vel"] + acc_pm * scal["fac"]
        full = st["grav_acc"] + acc_pm
        amag = jnp.sqrt(jnp.sum(full * full, axis=-1))
        v2 = jnp.sum(vel * vel, axis=-1)
        w = valid.astype(jnp.float32)
        tid = jnp.where(valid, st["ptype"], 6)
        vsum = jnp.zeros(7, jnp.float32).at[tid].add(v2 * w)[:6]
        cnt = jnp.zeros(7, jnp.float32).at[tid].add(w)[:6]
        mmin = jnp.full(7, jnp.inf, jnp.float32).at[tid].min(
            jnp.where(valid, st["mass"], jnp.inf))[:6]
        hist = count_histogram(st["ipos"], valid, "x", hist_bits)
        if with_gas:
            gas = st["gas_mask"] & valid
            hmax = lax.pmax(jnp.max(jnp.where(gas, st["hsml"], 0.0)),
                            "x")
        else:
            hmax = jnp.float32(0.0)
        stats = {
            "vsum": lax.psum(vsum, "x"),
            "count": lax.psum(cnt, "x"),
            "min_mass": lax.pmin(mmin, "x"),
            "hist": hist,
            "n_valid": lax.psum(jnp.sum(valid.astype(jnp.int32)), "x"),
            "hmax": hmax,
        }
        if nbins:
            stats["pk_p"], stats["pk_n"], stats["pk_k"], \
                stats["pk_norm"] = pk
        upd = {"pm_acc": acc_pm, "vel": vel, "amag": amag}
        if with_potential:
            # total potential at the boundary = fresh PM + the tree
            # part each row recorded when it last closed its bin
            # (P.Potential semantics, gravshort-tree.c:137) — every
            # bin closes AT the boundary, so this is exact at t1
            upd["pm_pot"] = res_pm[2]
            upd["potential"] = res_pm[2] + st["tree_pot"]
        return upd, stats, lax.psum(pm_far.astype(jnp.int32), "x")

    st_keys = ("ipos", "vel", "mass", "valid", "ptype", "grav_acc") \
        + (("gas_mask", "hsml") if with_gas else ()) \
        + (("tree_pot",) if with_potential else ())
    scal_keys = ["fac"] + (["nu_logk", "nu_fac"] if with_nu else []) \
        + (["nu_src"] if with_nu_tracer else [])
    stat_keys = ["vsum", "count", "min_mass", "hist", "n_valid",
                 "hmax"] + (["pk_p", "pk_n", "pk_k", "pk_norm"]
                            if nbins else [])
    upd_keys = ["pm_acc", "vel", "amag"] \
        + (["pm_pot", "potential"] if with_potential else [])
    fn = shard_map(
        pm_local, mesh=mesh,
        in_specs=({k: P("x") for k in st_keys},
                  {k: P() for k in scal_keys}),
        out_specs=({k: P("x") for k in upd_keys},
                   {k: P() for k in stat_keys}, P()),
        check_vma=False)
    return jax.jit(fn)


def build_sharded_step(mesh, *, n_local, with_gas, hops_ghost, hops_pm,
                       bucket_cap, ghost_cap, tree_kwargs, dpar, hpar,
                       caps_d, caps_h, nmesh, boxsize, gconst, asmth,
                       rcut, min_egy_spec, strip_margin=1.6,
                       hist_bits=12, cooling_fn=None, sfr_fn=None,
                       wind_fn=None, extra_state_keys=(), nbins=0,
                       with_nu=False, hierarchical=False,
                       active_block_cap=None, with_potential=False,
                       with_nu_tracer=False):
    """Build the jitted production step.

    step(state, bounds, scal) -> (state', stats, flags) where
      state: dict of P('x') arrays (see Simulation.run_sharded),
      bounds: uint32[S] replicated balanced left edges,
      scal: dict of replicated f32 scalars — dk1/hk1/dloga1 (opening
        half kick), ddrift, dk2/hk2/dloga2 (closing half kick), atime
        (t1), hubble (t1).
    stats: replicated dict — per-type v^2 sums/counts/min mass (PM
      displacement criterion), max |acc|, gas min hsml/vsig and
      |hsml/dt_hsml|, x histogram for rebalancing.
    flags: replicated int32[8] vector of psum'd shard counts, one per
      overflow class — [exchange, ghost, tree, density, hydro, strip,
      pm-hops, spawn]; all-zero means the step is valid.

    hierarchical=True builds the per-particle-timebin SUBSTEP instead
    (the active-list KDK of timestep.c:298-503 at scale): state
    additionally carries ``bins`` (int32 power-of-two timebins) and
    ``pm_acc`` (the long-range field, kicked only by
    build_sharded_pm at PM-interval boundaries; ``grav_acc`` is then
    tree-only); scal additionally carries replicated MAXB+1 tables —
    per-bin opening/closing kick factors gk/hk/dlg_{open,close},
    dlg_full (each particle's own full-bin dloga for source terms),
    alignment masks al_open/al_close at the substep's two clock
    edges — plus eta_eps/courant_fac/fac3/max_dloga/dloga_tick/maxbin
    for the on-device bin re-derivation.  Only rows CLOSING their bin
    at the substep's end are force targets (tree target_active +
    density target mask); flag slot 6 reports active-block compaction
    overflow instead of pm-hops.  Extra stats: min_act_bin (the next
    substep's dti exponent), bin_hist (population per bin, for the
    host's active-block-cap choice), n_closing.
    """
    S = int(mesh.devices.size)
    log2s = int(np.log2(S))
    rcut_box = rcut * asmth / nmesh
    inv_box = 1.0 / boxsize

    if with_gas:
        from ..sph.density import _density_all
        from ..sph.hydra import _hydro_all

    def step_local(state, bounds, scal):
        st = dict(state)
        valid = st["valid"]
        gas = st["gas_mask"] if with_gas else jnp.zeros(
            valid.shape, bool)

        # ---- opening half kick with carried forces ----
        if hierarchical:
            # per-bin half kick for rows whose bin interval OPENS at
            # this substep's clock (apply_half_kick on the active
            # list, timestep.c:520-600)
            bins0 = jnp.clip(st["bins"], 1, MAXB)
            act = valid & scal["al_open"][bins0]
            gk1 = jnp.where(act, scal["gk_open"][bins0], 0.0)
            vel = st["vel"] + st["grav_acc"] * gk1[:, None]
            if with_gas:
                gact = gas & act
                hk1 = jnp.where(gact, scal["hk_open"][bins0], 0.0)
                vel = vel + st["hydro_acc"] * hk1[:, None]
                st["entropy"] = _entropy_update(
                    st["entropy"], st["dtent"],
                    scal["dlg_open"][bins0], st["density"],
                    min_egy_spec, scal["atime"], gact)
        else:
            vel = st["vel"] + st["grav_acc"] * scal["dk1"]
            if with_gas:
                vel = vel + jnp.where(gas[:, None], st["hydro_acc"],
                                      0.0) * scal["hk1"]
                st["entropy"] = _entropy_update(
                    st["entropy"], st["dtent"], scal["dloga1"],
                    st["density"], min_egy_spec, scal["atime"], gas)
        st["vel"] = vel

        # ---- drift ----
        st["ipos"] = drift(st["ipos"], st["vel"], scal["ddrift"],
                           inv_box)
        if with_gas:
            hs = st["hsml"] + st["dt_hsml"] * scal["ddrift"]
            st["hsml"] = jnp.where(
                gas, jnp.clip(hs, 0.0, 0.45 * boxsize), st["hsml"])

        # ---- domain exchange to balanced owners ----
        keys = sorted(st.keys())
        arrays = [st[k] for k in keys if k != "valid"]
        arrays_out, valid, x_ovf = exchange_to_slabs(
            tuple(arrays), st["ipos"], valid, "x", log2s, bucket_cap,
            boundaries=bounds)
        st = dict(zip([k for k in keys if k != "valid"], arrays_out))
        st["valid"] = valid
        st["mass"] = jnp.where(valid, st["mass"], 0.0)
        gas = (st["gas_mask"] & valid) if with_gas else gas

        # hybrid-nu passive tracers (gravpm.c:83-85 + forcetree
        # HybridNuGrav): before NuPartTime type-2 rows neither source
        # gravity (tree moments and PM deposit see zero mass) nor
        # receive the PM force; nu_src flips 0->1 at the crossing
        # without recompiling
        if with_nu_tracer:
            tr_w = 1.0 - ((st["ptype"] == 2)
                          & (scal["nu_src"] < 0.5)).astype(jnp.float32)
            gsrc_mass = st["mass"] * tr_w
        else:
            gsrc_mass = st["mass"]

        # ---- ghost strips #1: gravity + density sources ----
        if with_gas:
            entvar = jnp.where(
                gas, jnp.maximum(st["entropy"], 1e-30) ** (1.0 / GAMMA),
                0.0)
            hs_box = st["hsml"] * jnp.float32(inv_box)
            hmax = lax.pmax(jnp.max(jnp.where(gas, hs_box, 0.0)), "x")
            w1 = jnp.maximum(jnp.float32(rcut_box),
                             hmax * jnp.float32(strip_margin))
            payload = (st["ipos"], gsrc_mass, st["vel"], st["hsml"],
                       entvar, gas)
        else:
            w1 = jnp.float32(rcut_box)
            payload = (st["ipos"], gsrc_mass)
        ghosts, g_ok, g_ovf = ghost_strips_multi(
            payload, st["ipos"], valid, "x", bounds, w1, ghost_cap,
            hops_ghost)
        ng = ghosts[0].shape[0]
        cat = lambda a, b: jnp.concatenate([a, b], axis=0)
        ipos_a = cat(st["ipos"], ghosts[0])
        mass_a = cat(gsrc_mass, jnp.where(g_ok, ghosts[1], 0.0))
        valid_a = cat(valid, g_ok)

        # ---- closing set (hierarchical): rows whose bin interval
        # ends at this substep's far clock edge become force targets
        if hierarchical:
            bins = jnp.clip(st["bins"], 1, MAXB)
            closing = valid & scal["al_close"][bins]

        # ---- tree short-range force (local+ghost rows) ----
        amag_a = cat(st["amag"], jnp.zeros(ng, jnp.float32))
        if hierarchical:
            tmask_g = cat(closing, jnp.zeros(ng, bool))
            res = tree_force(ipos_a, mass_a, valid_a, amag_a,
                             target_active=tmask_g,
                             active_block_cap=active_block_cap,
                             **tree_kwargs)
            st["grav_acc"] = jnp.where(closing[:, None],
                                       res.accel[:n_local],
                                       st["grav_acc"])
            full_acc = st["grav_acc"] + st["pm_acc"]
            st["amag"] = jnp.where(
                closing,
                jnp.sqrt(jnp.sum(full_acc * full_acc, axis=-1)),
                st["amag"])
            if with_potential:
                # record the tree part for rows closing their bin and
                # combine with the carried PM potential — the BH
                # min-pot argmin and the Potential output block need
                # the TOTAL (gravshort-tree.c:137), not PM alone
                st["tree_pot"] = jnp.where(
                    closing,
                    res.potential[:n_local]
                    * jnp.float32(gconst / boxsize),
                    st["tree_pot"])
                st["potential"] = st["tree_pot"] + st["pm_pot"]
            pk = None
            pm_far = res.compact_overflow
        else:
            res = tree_force(ipos_a, mass_a, valid_a, amag_a,
                             **tree_kwargs)
            acc_tree = res.accel[:n_local]

            # ---- PM long-range force (balanced rows, K_pm hops) ----
            # rows whose geometric mesh slab is farther than hops_pm
            # on the ring get no PM force: detect and flag (host
            # raises hops_pm)
            s_idx = lax.axis_index("x")
            geo = (st["ipos"][:, 0] >> jnp.uint32(32 - log2s)).astype(
                jnp.int32)
            dring = jnp.abs(geo - s_idx)
            dring = jnp.minimum(dring, S - dring)
            pm_far = jnp.any(valid & (dring > hops_pm))
            res_pm = pm_force_multi(
                st["ipos"], jnp.where(valid, gsrc_mass, 0.0), nmesh,
                boxsize, gconst, asmth, "x", hops_pm,
                nu_logk=scal["nu_logk"] if with_nu else None,
                nu_fac=scal["nu_fac"] if with_nu else None,
                nbins=nbins, with_potential=with_potential)
            acc_pm, pk = res_pm[0], res_pm[1]
            if with_nu_tracer:
                # tracers receive no PM force
                acc_pm = acc_pm * tr_w[:, None]
            if with_potential:
                # total potential = long-range PM + short-range tree
                # (P.Potential semantics, gravshort-tree.c:137) — the
                # kernel-scale min-pot argmin needs the tree part.
                # tree_force returns box-unit potential; scale by
                # G/box like TreeGravity.compute.  pm_pot carries the
                # PM part alone: the host mirror stores it in
                # pdata.potential (whose single-device semantics are
                # PM-only, tree re-added at output).
                st["pm_pot"] = res_pm[2]
                st["potential"] = res.potential[:n_local] \
                    * jnp.float32(gconst / boxsize) + res_pm[2]
            grav_acc = acc_tree + acc_pm
            st["amag"] = jnp.sqrt(jnp.sum(grav_acc * grav_acc,
                                          axis=-1))
            st["grav_acc"] = grav_acc

        # per-flag shard counts (psum-safe, unlike a bitmask)
        dens_bad = jnp.bool_(False)
        hydro_bad = jnp.bool_(False)
        strip_bad = jnp.bool_(False)
        g2_bad = jnp.bool_(False)

        # ---- SPH density + hydro ----
        if with_gas:
            vel_a = cat(st["vel"], ghosts[2])
            hsml_a = cat(st["hsml"], ghosts[3])
            ev_a = cat(entvar, ghosts[4])
            gas_a = cat(gas, ghosts[5] & g_ok)
            if hierarchical:
                # only closing gas is a density target; everything
                # stays a source (compute_hydro(active=...) analog)
                gate = gas & closing
                tmask = cat(closing, jnp.zeros(ng, bool))
            else:
                gate = gas
                tmask = cat(jnp.ones(n_local, bool),
                            jnp.zeros(ng, bool))
            dres, dflags = _density_all(
                ipos_a, mass_a, gas_a, hsml_a, vel_a, vel_a, ev_a,
                tmask, dpar, boxsize, caps_d["group"],
                caps_d["nleaf"], caps_d["sr"], caps_d["ll"],
                caps_d["src"], True, True, True)
            hsml_n = jnp.where(gate, dres["hsml"][:n_local],
                               st["hsml"])
            strip_bad = jnp.any(
                gas & (hsml_n * jnp.float32(inv_box * 1.26) > w1))
            # (collected into the flag vector below)
            st["hsml"] = hsml_n
            st["density"] = jnp.where(gate, dres["density"][:n_local],
                                      st["density"])
            st["egywt"] = jnp.where(
                gate, dres["egy_wt_density"][:n_local], st["egywt"])
            if hierarchical:
                st["divv"] = jnp.where(
                    gate, dres["div_vel"][:n_local], st["divv"])
                st["curlv"] = jnp.where(
                    gate, dres["curl_vel"][:n_local], st["curlv"])
                st["dhsml_egy"] = jnp.where(
                    gate, dres["dhsml_egy_factor"][:n_local],
                    st["dhsml_egy"])
            else:
                st["divv"] = dres["div_vel"][:n_local]
                st["curlv"] = dres["curl_vel"][:n_local]
                st["dhsml_egy"] = dres["dhsml_egy_factor"][:n_local]
            st["dt_hsml"] = jnp.where(gate, dres["dt_hsml"][:n_local],
                                      st["dt_hsml"])
            dens_bad = jnp.any(jnp.stack([dflags["group"],
                                          dflags["pack"],
                                          dflags["pair"]]))

            # ghost strips #2: refresh gas source fields post-density
            hs_box = st["hsml"] * jnp.float32(inv_box)
            hmax2 = lax.pmax(jnp.max(jnp.where(gas, hs_box, 0.0)), "x")
            w2 = hmax2 * jnp.float32(1.05)
            payload2 = (st["ipos"], st["mass"], st["vel"], st["hsml"],
                        entvar, st["density"], st["egywt"], st["divv"],
                        st["curlv"], st["dhsml_egy"], gas)
            gh2, g2_ok, g2_ovf = ghost_strips_multi(
                payload2, st["ipos"], gas, "x", bounds, w2, ghost_cap,
                hops_ghost)
            ng2 = gh2[0].shape[0]
            cat2 = lambda a, b: jnp.concatenate([a, b], axis=0)
            hres, hflags = _hydro_all(
                cat2(st["ipos"], gh2[0]),
                cat2(st["mass"], jnp.where(g2_ok, gh2[1], 0.0)),
                cat2(gas, gh2[10] & g2_ok),
                cat2(st["hsml"], gh2[3]), cat2(st["vel"], gh2[2]),
                cat2(entvar, gh2[4]), cat2(st["density"], gh2[5]),
                cat2(st["egywt"], gh2[6]), cat2(st["divv"], gh2[7]),
                cat2(st["curlv"], gh2[8]),
                cat2(st["dhsml_egy"], gh2[9]),
                scal["atime"], scal["hubble"], scal["dloga_full"],
                hpar, boxsize, caps_h["group"], caps_h["nleaf"],
                caps_h["sr"], caps_h["ll"], caps_h["src"])
            st["hydro_acc"] = jnp.where(
                gate[:, None], hres["hydro_accel"][:n_local],
                jnp.where(gas[:, None], st["hydro_acc"], 0.0))
            st["dtent"] = jnp.where(
                gate, hres["dt_entropy"][:n_local],
                jnp.where(gas, st["dtent"], 0.0))
            st["maxsig"] = jnp.where(
                gate, hres["max_signal_vel"][:n_local],
                jnp.where(gas, st["maxsig"], 0.0))
            hydro_bad = jnp.any(jnp.stack([hflags["group"],
                                           hflags["pack"],
                                           hflags["pair"]]))
            g2_bad = g2_ovf

        # ---- closing half kick with fresh forces ----
        if hierarchical:
            gk2 = jnp.where(closing, scal["gk_close"][bins], 0.0)
            vel = st["vel"] + st["grav_acc"] * gk2[:, None]
            if with_gas:
                gcl = gas & closing
                hk2 = jnp.where(gcl, scal["hk_close"][bins], 0.0)
                vel = vel + st["hydro_acc"] * hk2[:, None]
                st["entropy"] = _entropy_update(
                    st["entropy"], st["dtent"],
                    scal["dlg_close"][bins], st["density"],
                    min_egy_spec, scal["atime"], gcl)
        else:
            vel = st["vel"] + st["grav_acc"] * scal["dk2"]
            if with_gas:
                vel = vel + jnp.where(gas[:, None], st["hydro_acc"],
                                      0.0) * scal["hk2"]
                st["entropy"] = _entropy_update(
                    st["entropy"], st["dtent"], scal["dloga2"],
                    st["density"], min_egy_spec, scal["atime"], gas)
        st["vel"] = vel

        # ---- Strang-split source terms ----
        nspawn = jnp.int32(0)
        spawn_ovf = jnp.bool_(False)
        sfr_sum = jnp.float32(0.0)
        sm_sum = jnp.float32(0.0)
        sf_dtime_sum = jnp.float32(0.0)
        sf_count = jnp.int32(0)
        mass_formed_sum = jnp.float32(0.0)
        if hierarchical:
            # each closing particle integrates its source terms over
            # its OWN full bin interval (cooling_and_starformation on
            # the active list, run.c:374-520 + timestep.c:298)
            gas_src = gas & closing
            scal_src = dict(scal)
            scal_src["dloga_full"] = jnp.where(
                gas_src, scal["dlg_full"][bins], 0.0)
        else:
            gas_src = gas
            scal_src = scal
        if sfr_fn is not None:
            # cooling + eEOS + stochastic star formation on the shard's
            # rows (cooling_and_starformation, sfr_eff.c:187-330 —
            # pure row math; per-ID RNG keeps draws deterministic
            # under any domain split)
            out = sfr_fn(st, gas_src, scal_src)
            st["entropy"] = jnp.where(gas_src, out["entropy"],
                                      st["entropy"])
            st["ne"] = jnp.where(gas_src, out["ne"], st["ne"])
            st["metallicity"] = jnp.where(gas_src, out["metallicity"],
                                          st["metallicity"])
            st["sfr"] = jnp.where(gas_src, out["sfr"], st["sfr"])
            sfr_sum = lax.psum(jnp.sum(st["sfr"]), "x")
            # expected stellar mass formed this step (write_sfr col 2,
            # sfr_eff.c:381)
            sm_sum = lax.psum(
                jnp.sum(jnp.where(gas_src, out["sm"], 0.0)), "x")
            # write_sfr's rate_in_msunperyear needs sum(dtime) and the
            # count over the star-forming set (sfr_eff.c:343-364), and
            # col 5 is the mass ACTUALLY formed this step (child
            # masses, sfr_eff.c:319-328) — gather all three before
            # spawn_rows mutates the row masses
            on_sf = out["on_eeqos"] & gas_src
            dt_sf = jnp.broadcast_to(
                jnp.asarray(scal_src["dloga_full"], jnp.float32)
                / scal["hubble"], on_sf.shape)
            sf_dtime_sum = lax.psum(
                jnp.sum(jnp.where(on_sf, dt_sf, 0.0)), "x")
            sf_count = lax.psum(jnp.sum(on_sf.astype(jnp.int32)), "x")
            mass_formed_sum = lax.psum(jnp.sum(jnp.where(
                out["make_star"] & gas_src,
                jnp.where(out["convert"], st["mass"],
                          out["star_mass"]), 0.0)), "x")
            if wind_fn is not None:
                # subgrid winds kick the star-forming gas itself before
                # spawning (winds_make_after_sf, winds.c:454)
                vel_w, ent_w, delay_w = wind_fn(st, out, scal_src)
                st["vel"] = jnp.where(gas_src[:, None], vel_w,
                                      st["vel"])
                st["entropy"] = jnp.where(gas_src, ent_w,
                                          st["entropy"])
                st["delay_time"] = jnp.where(gas_src, delay_w,
                                             st["delay_time"])
            st, gas, nspawn, spawn_ovf = spawn_rows(
                st, gas, out["make_star"] & gas_src,
                out["convert"] & gas_src,
                out["star_mass"], scal["atime"])
            nspawn = lax.psum(nspawn, "x")
        elif cooling_fn is not None:
            # cooling_direct path of cooling_and_starformation;
            # cooling_fn sees the whole row dict so per-row UV fields
            # (patchy zreion, excursion-set J21) can modulate rates
            ent_new, ne_new = cooling_fn(st, gas_src, scal_src)
            st["entropy"] = jnp.where(gas_src, ent_new, st["entropy"])
            st["ne"] = jnp.where(gas_src, ne_new, st["ne"])

        # ---- bin re-derivation for rows closing their interval ----
        # (find_timesteps per bin boundary, timestep.c:298-503): a bin
        # may shrink freely at its own boundary but may only GROW when
        # the new, longer interval is aligned with the far clock edge
        # (is_timebin_active rule).
        if hierarchical:
            atime = scal["atime"]
            full_acc = (st["grav_acc"] + st["pm_acc"]) \
                / (atime * atime)
            ac = jnp.sqrt(jnp.maximum(
                jnp.sum(full_acc * full_acc, axis=-1), 1e-60))
            dloga_p = jnp.sqrt(scal["eta_eps"] / ac) * scal["hubble"]
            if with_gas:
                vsig = jnp.maximum(st["maxsig"], 1e-30)
                dt_c = 2.0 * scal["courant_fac"] * atime \
                    * st["hsml"] / (scal["fac3"] * vsig)
                dt_h = scal["courant_fac"] * atime * atime * jnp.abs(
                    st["hsml"] / (st["dt_hsml"] + 1e-20))
                dloga_h = jnp.minimum(dt_c, dt_h) * scal["hubble"]
                dloga_p = jnp.where(gas, jnp.minimum(dloga_p,
                                                     dloga_h),
                                    dloga_p)
            dloga_p = jnp.minimum(dloga_p, scal["max_dloga"])
            dti_f = dloga_p / scal["dloga_tick"]
            nb = jnp.floor(jnp.log2(jnp.maximum(dti_f, 2.0))).astype(
                jnp.int32)
            nb = jnp.clip(nb, 1, scal["maxbin"])
            bins_cur = st["bins"]
            bins_new = jnp.where(closing & (nb < bins_cur), nb,
                                 bins_cur)
            bins_new = jnp.where(
                closing & (nb > bins_cur) & scal["al_close"][nb],
                nb, bins_new)
            st["bins"] = jnp.where(st["valid"],
                                   jnp.clip(bins_new, 1,
                                            scal["maxbin"]),
                                   bins_new)

        # ---- psum'd timestep statistics ----
        valid = st["valid"]          # spawning may have added rows
        v2 = jnp.sum(st["vel"] * st["vel"], axis=-1)
        w = valid.astype(jnp.float32)
        tid = jnp.where(valid, st["ptype"], 6)
        vsum = jnp.zeros(7, jnp.float32).at[tid].add(v2 * w)[:6]
        cnt = jnp.zeros(7, jnp.float32).at[tid].add(w)[:6]
        mmin = jnp.full(7, jnp.inf, jnp.float32).at[tid].min(
            jnp.where(valid, st["mass"], jnp.inf))[:6]
        amax = jnp.max(jnp.where(valid, st["amag"], 0.0))
        if with_gas:
            h_over_sig = jnp.where(
                gas, st["hsml"] / jnp.maximum(st["maxsig"], 1e-30),
                jnp.inf)
            h_over_dth = jnp.where(
                gas, jnp.abs(st["hsml"]
                             / (st["dt_hsml"] + 1e-20)), jnp.inf)
        else:
            h_over_sig = jnp.full(1, jnp.inf, jnp.float32)
            h_over_dth = jnp.full(1, jnp.inf, jnp.float32)
        hist = count_histogram(st["ipos"], valid, "x", hist_bits)
        hmax_st = (lax.pmax(jnp.max(jnp.where(gas, st["hsml"], 0.0)),
                            "x") if with_gas else jnp.float32(0.0))
        stats = {
            "hmax": hmax_st,
            "vsum": lax.psum(vsum, "x"),
            "count": lax.psum(cnt, "x"),
            "min_mass": lax.pmin(mmin, "x"),
            "max_acc": lax.pmax(amax, "x"),
            "min_h_over_sig": lax.pmin(jnp.min(h_over_sig), "x"),
            "min_h_over_dth": lax.pmin(jnp.min(h_over_dth), "x"),
            "hist": hist,
            "n_valid": lax.psum(jnp.sum(valid.astype(jnp.int32)), "x"),
            "sfr_sum": sfr_sum,
            "sm_sum": sm_sum,
            "sf_dtime_sum": sf_dtime_sum,
            "sf_count": sf_count,
            "mass_formed_sum": mass_formed_sum,
            "star_mass_sum": lax.psum(jnp.sum(jnp.where(
                valid & (st["ptype"] == 4), st["mass"], 0.0)), "x"),
            "n_spawned": nspawn,
        }
        if hierarchical:
            # next-substep scheduling: the active set at the far clock
            # edge and the population per bin (the host sizes the
            # active-block compaction cap from it)
            bins_c = jnp.clip(st["bins"], 1, MAXB)
            al_n = scal["al_close"][bins_c]
            stats["min_act_bin"] = lax.pmin(jnp.min(
                jnp.where(valid & al_n, bins_c, MAXB)), "x")
            bh_loc = jnp.zeros(MAXB + 1, jnp.int32).at[
                jnp.where(valid, bins_c, MAXB)].add(
                valid.astype(jnp.int32))
            stats["bin_hist"] = lax.psum(bh_loc, "x")
            stats["n_closing"] = lax.psum(
                jnp.sum(closing.astype(jnp.int32)), "x")
        if nbins and not hierarchical:
            # psum'd in-line power spectrum (powerspectrum_add_mode);
            # the host finalizes with pm.gravity._finalize_power
            stats["pk_p"], stats["pk_n"], stats["pk_k"], \
                stats["pk_norm"] = pk
        flags_vec = jnp.stack([
            x_ovf, g_ovf | g2_bad, res.overflow, dens_bad, hydro_bad,
            strip_bad, pm_far, spawn_ovf]).astype(jnp.int32)
        return st, stats, lax.psum(flags_vec, "x")

    state_keys = ["ipos", "vel", "mass", "valid", "pid", "ptype",
                  "amag", "grav_acc"]
    if hierarchical:
        state_keys += ["bins", "pm_acc"]
    if with_potential:
        state_keys += ["potential", "pm_pot"]
        if hierarchical:
            state_keys += ["tree_pot"]
    if with_gas:
        state_keys += ["gas_mask", "hsml", "entropy", "dtent",
                       "density", "egywt", "divv", "curlv",
                       "dhsml_egy", "dt_hsml", "hydro_acc", "maxsig"]
    if cooling_fn is not None or sfr_fn is not None:
        state_keys += ["ne", "metallicity"]
    if sfr_fn is not None:
        state_keys += ["sfr", "delay_time", "formation_time",
                       "birth_density", "birth_metallicity"]
    state_keys += [k for k in extra_state_keys if k not in state_keys]
    in_state_spec = {k: P("x") for k in state_keys}
    stats_keys = ["vsum", "count", "min_mass", "max_acc",
                  "min_h_over_sig", "min_h_over_dth", "hist",
                  "n_valid", "hmax", "sfr_sum", "sm_sum",
                  "sf_dtime_sum", "sf_count", "mass_formed_sum",
                  "star_mass_sum", "n_spawned"]
    if hierarchical:
        stats_keys += ["min_act_bin", "bin_hist", "n_closing"]
    if nbins and not hierarchical:
        stats_keys += ["pk_p", "pk_n", "pk_k", "pk_norm"]
    stats_spec = {k: P() for k in stats_keys}
    if hierarchical:
        scal_keys = ["ddrift", "dloga_full", "atime", "hubble",
                     "gk_open", "hk_open", "dlg_open", "gk_close",
                     "hk_close", "dlg_close", "dlg_full", "al_open",
                     "al_close", "eta_eps", "courant_fac", "fac3",
                     "max_dloga", "dloga_tick", "maxbin"]
    else:
        scal_keys = ["dk1", "hk1", "dloga1", "ddrift", "dk2", "hk2",
                     "dloga2", "dloga_full", "atime", "hubble"]
    if cooling_fn is not None or sfr_fn is not None:
        scal_keys += ["redshift", "uvbg"]
    if sfr_fn is not None:
        scal_keys += ["rng"]
    if with_nu and not hierarchical:
        scal_keys += ["nu_logk", "nu_fac"]
    if with_nu_tracer:
        scal_keys += ["nu_src"]
    scal_spec = {k: P() for k in scal_keys}
    fn = shard_map(step_local, mesh=mesh,
                   in_specs=(in_state_spec, P(), scal_spec),
                   out_specs=(in_state_spec, stats_spec, P()),
                   check_vma=False)
    return jax.jit(fn), state_keys
