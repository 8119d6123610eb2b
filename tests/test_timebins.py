"""Per-particle timebins + hierarchical sub-cycling
(timestep.c:298-503 analog): bins spread in clustered conditions,
force work shrinks vs global-min stepping, and the integration stays
consistent with the global-step result."""

import numpy as np
import jax.numpy as jnp
import pytest

from mpgadget_tpu.cosmology import Cosmology
from mpgadget_tpu.particles import ParticleData
from mpgadget_tpu.run import Simulation, SimConfig
from mpgadget_tpu.timeline import Timeline
from mpgadget_tpu.timestep import assign_particle_bins
from mpgadget_tpu.utils import get_unitsystem, constants as C

UNITS = get_unitsystem(C.CM_PER_KPC, 1.989e43, 1e5)


def _clustered_sim(tmp_path, split, seed=9, n=512):
    """DM-only box with a dense clump: wide acceleration spread."""
    rng = np.random.RandomState(seed)
    box = 10000.0
    n_clump = n // 4
    pos = rng.uniform(0, box, (n, 3))
    pos[:n_clump] = box / 2 + rng.randn(n_clump, 3) * box * 0.01
    pos = np.mod(pos, box)
    pdata = ParticleData.from_numpy(
        pos, np.zeros((n, 3)), np.full(n, 10.0),
        np.ones(n, np.int32), np.arange(n) + 1, box)
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, HubbleParam=0.7,
                   TimeBegin=0.1).init_units(UNITS)
    timeline = Timeline([0.2], TimeIC=0.1, TimeMax=0.2)
    cfg = SimConfig(boxsize=box, nmesh=16, output_dir=str(tmp_path),
                    timeline=timeline, units=UNITS, hydro_on=False,
                    tree_grav_on=True, split_gravity_timesteps=split,
                    random_particle_offset=0.0)
    sim = Simulation(cp, pdata, cfg, time_ic=0.1)
    sim.compute_forces(measure_power=False)
    return sim


def test_bins_spread_in_clustered_box(tmp_path):
    sim = _clustered_sim(tmp_path / "a", split=True)
    dti_pm = sim.find_pm_timestep()
    bins = assign_particle_bins(
        sim.pdata, None, sim.gas_mask, sim.CP, sim.atime, 50.0,
        sim.timeline, 0, sim.cfg.timestep, dti_pm)
    valid = np.asarray(sim.pdata.valid)
    b = np.asarray(bins)[valid]
    assert len(np.unique(b)) >= 3, f"bins did not spread: {np.unique(b)}"
    # clump particles (largest accel) sit in the deepest bins
    amag = np.linalg.norm(np.asarray(sim.pdata.grav_accel)
                          + np.asarray(sim.pdata.grav_pm), axis=1)[valid]
    assert b[np.argmax(amag)] <= np.median(b)


def test_hierarchical_reduces_force_work(tmp_path):
    """Deep-bin counts shrink per level: total active-target force
    evaluations drop vs stepping everyone at the global minimum."""
    sim = _clustered_sim(tmp_path / "b", split=True)
    dti = sim.find_pm_timestep()
    # instrument the tree-force calls
    counts = []
    orig = sim._compute_tree_forces

    def spy(active=None, n_active=None):
        if active is None:
            counts.append(int(np.asarray(sim.pdata.num_valid)))
        else:
            counts.append(int(np.asarray(jnp.sum(
                active.astype(jnp.int32)))))
        return orig(active=active, n_active=n_active)

    sim._compute_tree_forces = spy
    n_sub = sim.step_hierarchical(dti)
    n = int(np.asarray(sim.pdata.num_valid))
    total_evals = sum(counts)
    global_evals = n_sub * n
    assert n_sub >= 4, f"no sub-cycling happened (n_sub={n_sub})"
    assert total_evals < 0.5 * global_evals, (
        f"active sets did not shrink: {total_evals} vs {global_evals}")


def test_active_block_compaction_matches():
    """tree_force with active_block_cap (compacted walk lanes) returns
    the same forces as the uncompacted active walk (forcetree.h:125-140
    active-only payoff, implemented as block compaction)."""
    from mpgadget_tpu.gravity.treepm import TreeGravity, tree_force
    rng = np.random.RandomState(11)
    n = 8192
    box = 10000.0
    pos = rng.uniform(0, box, (n, 3))
    pos[:256] = box / 2 + rng.randn(256, 3) * box * 0.005
    pos = np.mod(pos, box)
    ipos = jnp.asarray((pos / box * 2.0 ** 32).astype(np.uint32))
    mass = jnp.full(n, 10.0, jnp.float32)
    valid = jnp.ones(n, bool)
    amag = jnp.zeros(n, jnp.float32)
    # active = the clump
    act = np.zeros(n, bool)
    act[:256] = True
    act = jnp.asarray(act)
    tg = TreeGravity(boxsize=box, nmesh=16, softening=box / 300,
                     tree_use_bh=0, with_potential=False)
    kw = tg.force_kwargs(n)
    r_full = tree_force(ipos, mass, valid, amag, target_active=act,
                        **kw)
    nb = n // kw["group_size"]
    r_comp = tree_force(ipos, mass, valid, amag, target_active=act,
                        active_block_cap=max(1, nb // 2), **kw)
    assert not bool(r_comp.compact_overflow), (
        int(r_comp.n_active_blocks), nb)
    np.testing.assert_allclose(np.asarray(r_comp.accel),
                               np.asarray(r_full.accel),
                               rtol=1e-6, atol=1e-10)


def test_hierarchical_5x_fewer_force_evals(tmp_path):
    """VERDICT r2 item 8 'done' criterion: a clustered box steps with
    >=5x fewer force evaluations than global-min stepping at matched
    bulk energy error (timestep.c:298-503)."""
    rng = np.random.RandomState(21)
    box = 10000.0
    n = 4096
    n_clump = 256
    pos = rng.uniform(0, box, (n, 3))
    pos[:n_clump] = box / 2 + rng.randn(n_clump, 3) * box * 0.004
    pos = np.mod(pos, box)

    def mk(sub, split):
        pdata = ParticleData.from_numpy(
            pos, np.zeros((n, 3)), np.full(n, 10.0),
            np.ones(n, np.int32), np.arange(n) + 1, box)
        cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, HubbleParam=0.7,
                       TimeBegin=0.1).init_units(UNITS)
        timeline = Timeline([0.2], TimeIC=0.1, TimeMax=0.2)
        cfg = SimConfig(boxsize=box, nmesh=16,
                        output_dir=str(tmp_path / sub),
                        timeline=timeline, units=UNITS, hydro_on=False,
                        tree_grav_on=True, split_gravity_timesteps=split,
                        random_particle_offset=0.0)
        sim = Simulation(cp, pdata, cfg, time_ic=0.1)
        sim.compute_forces(measure_power=False)
        return sim

    sim_h = mk("h", True)
    sim_g = mk("g", False)
    dti = min(sim_h.find_pm_timestep(), sim_g.find_pm_timestep())

    def ke(sim):
        v = np.asarray(sim.pdata.vel)
        return float((v ** 2).sum())

    n_sub = sim_h.step_hierarchical(dti)
    evals_h = sim_h._force_evals

    # global-min stepping over the same interval: every particle steps
    # at the deepest bin
    t_end = sim_g.ti_current + dti
    evals_g = 0
    while sim_g.ti_current < t_end:
        bins = assign_particle_bins(
            sim_g.pdata, None, sim_g.gas_mask, sim_g.CP, sim_g.atime,
            50.0, sim_g.timeline, sim_g.ti_current, sim_g.cfg.timestep,
            dti)
        db = 1 << int(np.asarray(jnp.min(jnp.where(
            sim_g.pdata.valid, bins, 30))))
        db = min(db, t_end - sim_g.ti_current)
        sim_g.step(db)
        evals_g += n

    assert n_sub >= 4, n_sub
    assert evals_h * 5 <= evals_g, (evals_h, evals_g)
    # matched bulk energy: the box is a deliberately violent collapse
    # (KE is dominated by the chaotic clump, where phase noise between
    # any two integrators amplifies), so the window is 10%
    assert np.isclose(ke(sim_h), ke(sim_g), rtol=0.10), (
        ke(sim_h), ke(sim_g))


def _gas_sim(tmp_path, split=True, n=256, sfr_on=True, tree_on=False):
    """Small gas box with density set up (no stepping unless asked);
    crit thresholds zeroed so all gas is star-forming."""
    rng = np.random.RandomState(5)
    box = 10000.0
    pos = rng.uniform(0, box, (n, 3))
    pdata = ParticleData.from_numpy(
        pos, np.zeros((n, 3)), np.full(n, 10.0),
        np.zeros(n, np.int32), np.arange(n) + 1, box,
        capacity=2 * n)
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, HubbleParam=0.7,
                   TimeBegin=0.1).init_units(UNITS)
    timeline = Timeline([0.2], TimeIC=0.1, TimeMax=0.2)
    import os
    os.makedirs(str(tmp_path), exist_ok=True)
    cfg = SimConfig(boxsize=box, nmesh=8, output_dir=str(tmp_path),
                    timeline=timeline, units=UNITS, hydro_on=True,
                    tree_grav_on=tree_on, split_gravity_timesteps=split,
                    random_particle_offset=0.0, cooling_on=True,
                    starformation_on=sfr_on, crit_overdensity=0.0,
                    crit_phys_density=1e-30)
    sim = Simulation(cp, pdata, cfg, time_ic=0.1)
    sim.setup_gas()
    return sim


def test_per_bin_source_terms_masked(tmp_path):
    """The per-closing-bin source path of step_hierarchical
    (cooling_and_starformation on the active list, run.c:374-520):
    apply_cooling_sfr with an active mask + per-particle dloga leaves
    inactive rows untouched and reproduces the global call on active
    rows (both calls share the ti_current-derived RNG key)."""
    sim = _gas_sim(tmp_path, sfr_on=True)
    cap = int(sim.pdata.capacity)
    sph0, pdata0, stars0 = sim.sph, sim.pdata, sim.stars
    # small enough that stochastic spawning stays well under the
    # capacity headroom, large enough that the eEOS relaxes
    dloga = 1e-5

    # global reference call
    sim.apply_cooling_sfr(dloga)
    sph_g, pdata_g = sim.sph, sim.pdata

    # restore and apply to alternating rows only, per-particle dloga
    sim.sph, sim.pdata, sim.stars = sph0, pdata0, stars0
    act = np.arange(cap) % 2 == 0
    act_j = jnp.asarray(act)
    dloga_pp = jnp.where(act_j, jnp.float32(dloga), 0.0)
    sim.apply_cooling_sfr(dloga_pp, active=act_j)
    sph_m, pdata_m = sim.sph, sim.pdata

    gas0 = np.asarray(pdata0.ptype == 0) & np.asarray(pdata0.valid)
    inact = gas0 & ~act
    # inactive gas: bitwise untouched
    for field in ("entropy", "ne", "sfr", "metallicity", "delay_time"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sph_m, field))[inact],
            np.asarray(getattr(sph0, field))[inact], err_msg=field)
    # no inactive row changed type (spawning restricted to actives)
    changed = np.asarray(pdata_m.ptype) != np.asarray(pdata0.ptype)
    assert not changed[~act & (np.arange(cap) < len(changed))].any()
    # active rows that stayed gas in BOTH calls match the global call
    both_gas = (np.asarray(pdata_g.ptype) == 0) \
        & (np.asarray(pdata_m.ptype) == 0) & act & gas0
    for field in ("entropy", "ne", "sfr", "metallicity"):
        np.testing.assert_allclose(
            np.asarray(getattr(sph_m, field))[both_gas],
            np.asarray(getattr(sph_g, field))[both_gas],
            rtol=1e-6, err_msg=field)


def test_per_bin_plain_cooling_masked(tmp_path):
    """Same contract for the cooling-only path (apply_cooling)."""
    sim = _gas_sim(tmp_path, sfr_on=False)
    cap = int(sim.pdata.capacity)
    sph0 = sim.sph
    dloga = 1e-3
    sim.apply_cooling(dloga)
    sph_g = sim.sph
    sim.sph = sph0
    act = np.arange(cap) % 2 == 0
    act_j = jnp.asarray(act)
    sim.apply_cooling(jnp.where(act_j, jnp.float32(dloga), 0.0),
                      active=act_j)
    sph_m = sim.sph
    gas0 = np.asarray(sim.gas_mask)
    inact = gas0 & ~act
    np.testing.assert_array_equal(np.asarray(sph_m.entropy)[inact],
                                  np.asarray(sph0.entropy)[inact])
    sel = gas0 & act
    np.testing.assert_allclose(np.asarray(sph_m.entropy)[sel],
                               np.asarray(sph_g.entropy)[sel],
                               rtol=1e-6)
    # and something actually cooled/heated (tiny dloga -> tiny change)
    assert (np.asarray(sph_m.entropy)[sel]
            != np.asarray(sph0.entropy)[sel]).any()


def test_hierarchical_gas_loop_smoke(tmp_path):
    """step_hierarchical with gas + cooling wired per closing bin:
    one PM interval completes, entropy stays finite/positive, and mass
    is conserved (the run.c:374-520 loop-integration smoke)."""
    sim = _gas_sim(tmp_path, sfr_on=False, tree_on=True)
    sim.compute_forces(measure_power=False)
    mass0 = float(jnp.sum(jnp.where(sim.pdata.valid,
                                    sim.pdata.mass, 0.0)))
    dti = sim.find_pm_timestep()
    n_sub = sim.step_hierarchical(dti)
    assert n_sub >= 1
    gas = np.asarray(sim.gas_mask)
    ent = np.asarray(sim.sph.entropy)[gas]
    assert np.all(np.isfinite(ent)) and np.all(ent > 0)
    mass1 = float(jnp.sum(jnp.where(sim.pdata.valid,
                                    sim.pdata.mass, 0.0)))
    np.testing.assert_allclose(mass1, mass0, rtol=1e-6)


def test_hierarchical_matches_global_stepping(tmp_path):
    """Same box integrated both ways over one PM interval: energies
    and bulk statistics agree."""
    sim_g = _clustered_sim(tmp_path / "g", split=False)
    sim_h = _clustered_sim(tmp_path / "h", split=True)
    dti = min(sim_g.find_pm_timestep(), sim_h.find_pm_timestep())

    # global path: sub-cycle manually at the global min bin so both
    # integrate over the same interval
    sim_h.step_hierarchical(dti)
    t_end = sim_g.ti_current + dti
    while sim_g.ti_current < t_end:
        bins = assign_particle_bins(
            sim_g.pdata, None, sim_g.gas_mask, sim_g.CP, sim_g.atime,
            2.8 * sim_g.cfg.gravity_softening
            * (sim_g.cfg.boxsize / np.cbrt(512)),
            sim_g.timeline, sim_g.ti_current, sim_g.cfg.timestep, dti)
        db = 1 << int(np.asarray(jnp.min(jnp.where(
            sim_g.pdata.valid, bins, 30))))
        db = min(db, t_end - sim_g.ti_current)
        sim_g.step(db)

    v_g = np.asarray(sim_g.pdata.vel)
    v_h = np.asarray(sim_h.pdata.vel)
    valid = np.asarray(sim_g.pdata.valid)
    # bulk kinetic energy within a few percent
    ke_g = float((v_g[valid] ** 2).sum())
    ke_h = float((v_h[valid] ** 2).sum())
    assert np.isclose(ke_g, ke_h, rtol=0.05), (ke_g, ke_h)
    # positions: the two schedules differ at the sub-step level, so
    # require the divergence to stay well under the actual motion
    def wrapdiff(a, b):
        d = a - b
        d = np.where(d > 2 ** 31, d - 2 ** 32, d)
        return np.where(d < -2 ** 31, d + 2 ** 32, d)

    p_g = np.asarray(sim_g.pdata.ipos, np.float64)
    p_h = np.asarray(sim_h.pdata.ipos, np.float64)
    rms_diff = np.sqrt((wrapdiff(p_h, p_g)[valid] ** 2).mean())
    assert rms_diff < 1e-3 * 2 ** 32, rms_diff  # < 0.1% of box
