"""Lossless checkpoint/restart of star, BH, wind and neutrino state.

The round-1 restart silently dropped BH subgrid mass (killing Bondi
accretion forever), star birth data and wind delay timers (ADVICE r1
item 1; reference block registry petaio.c:992-1078).  These tests
round-trip the full aligned state through a snapshot.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mpgadget_tpu.io.bigfile import BigFile
from mpgadget_tpu.io import snapshot as snap_io
from mpgadget_tpu.io.registry import STATE_BLOCKS, blocks_for_type
from mpgadget_tpu.params import create_gadget_parameter_set
from mpgadget_tpu.main import build_simulation
from mpgadget_tpu.particles import ParticleData
from mpgadget_tpu.run import Simulation, SimConfig
from mpgadget_tpu.timeline import Timeline
from mpgadget_tpu.cosmology import Cosmology
from mpgadget_tpu.utils import get_unitsystem, constants as C

UNITS = get_unitsystem(C.CM_PER_KPC, 1.989e43, 1e5)


def _mixed_sim(tmp_path, n=64):
    """A small sim with gas + DM + stars + BHs and populated slots."""
    rng = np.random.RandomState(11)
    box = 1000.0
    pos = rng.uniform(0, box, (n, 3))
    ptype = np.zeros(n, np.int32)
    ptype[n // 4: n // 2] = 1
    ptype[n // 2: n // 2 + 8] = 4
    ptype[n // 2 + 8: n // 2 + 12] = 5
    vel = rng.randn(n, 3).astype(np.float64)
    pdata = ParticleData.from_numpy(
        pos, vel, np.full(n, 1e-3), ptype, np.arange(n) + 1, box,
        capacity=128)
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, OmegaBaryon=0.05,
                   HubbleParam=0.7, TimeBegin=0.25).init_units(UNITS)
    timeline = Timeline([1.0], TimeIC=0.25, TimeMax=1.0)
    cfg = SimConfig(boxsize=box, nmesh=8, output_dir=str(tmp_path),
                    timeline=timeline, units=UNITS, hydro_on=False,
                    tree_grav_on=False)
    sim = Simulation(cp, pdata, cfg, time_ic=0.25)

    cap = pdata.capacity
    from mpgadget_tpu.sph.state import SphData
    from mpgadget_tpu.physics.stars import StarData
    from mpgadget_tpu.physics.blackhole import BhData

    def rnd(shape):
        return jnp.asarray(rng.rand(*shape).astype(np.float32))

    sim.sph = SphData.zeros(cap).replace(
        entropy=rnd((cap,)) + 0.5, density=rnd((cap,)) + 1.0,
        egy_wt_density=rnd((cap,)) + 1.0, ne=rnd((cap,)),
        metallicity=rnd((cap,)) * 0.02, sfr=rnd((cap,)),
        delay_time=rnd((cap,)), metals=rnd((cap, 9)))
    sim.pdata = sim.pdata.replace(hsml=rnd((cap,)) * 10 + 1.0)
    sim._gas_initialized = True
    sim.stars = StarData.zeros(cap).replace(
        formation_time=rnd((cap,)), birth_density=rnd((cap,)),
        metallicity=rnd((cap,)) * 0.02, metals=rnd((cap, 9)),
        total_mass_returned=rnd((cap,)),
        last_enrichment_myr=rnd((cap,)) * 100)
    sim.bh = BhData.zeros(cap).replace(
        bh_mass=rnd((cap,)) * 1e-4 + 1e-5, mdot=rnd((cap,)),
        bh_density=rnd((cap,)), mtrack=rnd((cap,)) * 1e-4,
        formation_time=rnd((cap,)),
        count_progs=jnp.asarray(
            rng.randint(0, 5, cap).astype(np.int32)),
        kinetic_energy=rnd((cap,)))
    return sim


def test_registry_round_trip(tmp_path):
    sim = _mixed_sim(tmp_path / "out1")
    (tmp_path / "out1").mkdir(exist_ok=True)
    path = sim.write_snapshot(label=7)

    # every registered block for a present type must be on disk
    bf = BigFile(path)
    for t in (0, 4, 5):
        for spec in blocks_for_type(t):
            assert f"{t}/{spec.name}" in bf, f"{t}/{spec.name} missing"

    cfg_kwargs = dict(
        nmesh=8, output_dir=str(tmp_path / "out2"),
        timeline=Timeline([1.0], TimeIC=0.25, TimeMax=1.0),
        hydro_on=False, tree_grav_on=False)
    sim2 = Simulation.from_snapshot(path, cfg_kwargs)
    sim2._restore_gas()

    valid1 = np.asarray(sim.pdata.valid)
    ptype1 = np.asarray(sim.pdata.ptype)
    valid2 = np.asarray(sim2.pdata.valid)
    ptype2 = np.asarray(sim2.pdata.ptype)

    holders1 = {"pdata": sim.pdata, "sph": sim.sph, "stars": sim.stars,
                "bh": sim.bh}
    holders2 = {"pdata": sim2.pdata, "sph": sim2.sph,
                "stars": sim2.stars, "bh": sim2.bh}
    for spec in STATE_BLOCKS:
        t = spec.ptype
        sel1 = valid1 & (ptype1 == t)
        sel2 = valid2 & (ptype2 == t)
        assert sel1.sum() == sel2.sum() > 0
        h1 = holders1[spec.holder]
        h2 = holders2[spec.holder]
        assert h2 is not None, f"{spec.holder} not restored"
        a1 = np.asarray(getattr(h1, spec.field))[sel1]
        a2 = np.asarray(getattr(h2, spec.field))[sel2]
        # match by particle id ordering within the type
        o1 = np.argsort(np.asarray(sim.pdata.pid)[sel1])
        o2 = np.argsort(np.asarray(sim2.pdata.pid)[sel2])
        # f4 disk precision
        assert np.allclose(a1[o1], a2[o2], rtol=1e-6, atol=1e-7), \
            f"{spec.ptype}/{spec.name} not restored losslessly"


def test_neutrino_state_round_trip(tmp_path):
    from mpgadget_tpu.physics.neutrinos_lra import DeltaTotTable
    rng = np.random.RandomState(3)
    state = {
        "scalefact": np.log(np.linspace(0.01, 0.5, 12)),
        "delta_tot": rng.rand(12, 32),
        "delta_nu_init": rng.rand(32),
        "wavenum": np.logspace(-3, 1, 32),
    }
    path = str(tmp_path / "snap")
    bf = BigFile(path, create=True)
    snap_io.write_neutrino_state(bf, state)
    got = snap_io.read_neutrino_state(BigFile(path))
    for k in state:
        assert np.allclose(got[k], state[k]), k


def test_restart_preserves_bh_accretion(tmp_path):
    """The ADVICE r1 regression: after restart, Bondi mdot must not be
    zeroed (bh_mass restored, not reset)."""
    sim = _mixed_sim(tmp_path / "o1")
    (tmp_path / "o1").mkdir(exist_ok=True)
    path = sim.write_snapshot(label=0)
    sim2 = Simulation.from_snapshot(path, dict(
        nmesh=8, output_dir=str(tmp_path / "o2"),
        timeline=Timeline([1.0], TimeIC=0.25, TimeMax=1.0),
        hydro_on=False, tree_grav_on=False))
    is_bh = np.asarray(sim2.pdata.valid) \
        & (np.asarray(sim2.pdata.ptype) == 5)
    assert is_bh.sum() > 0
    assert np.all(np.asarray(sim2.bh.bh_mass)[is_bh] > 0)


def test_random_offset_invisible_in_output(tmp_path):
    """The internal random box shift (partmanager.c:43-60) must cancel
    exactly in written positions."""
    sim = _mixed_sim(tmp_path)
    sim.cfg.random_particle_offset = 8.0
    p0 = sim._output_pos()
    for _ in range(3):
        sim._nstep_total += 1
        sim._update_random_offset()
    assert np.any(sim._ipos_offset != 0)
    p1 = sim._output_pos()
    assert np.allclose(p0, p1, atol=1e-9), np.max(np.abs(p1 - p0))
