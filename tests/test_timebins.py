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

    def spy(active=None):
        if active is None:
            counts.append(int(np.asarray(sim.pdata.num_valid)))
        else:
            counts.append(int(np.asarray(jnp.sum(
                active.astype(jnp.int32)))))
        return orig(active=active)

    sim._compute_tree_forces = spy
    n_sub = sim.step_hierarchical(dti)
    n = int(np.asarray(sim.pdata.num_valid))
    total_evals = sum(counts)
    global_evals = n_sub * n
    assert n_sub >= 4, f"no sub-cycling happened (n_sub={n_sub})"
    assert total_evals < 0.5 * global_evals, (
        f"active sets did not shrink: {total_evals} vs {global_evals}")


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
