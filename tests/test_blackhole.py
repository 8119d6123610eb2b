"""Black hole module tests: Bondi rate, Eddington cap, neighbor sums,
swallowing/feedback, FOF seeding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpgadget_tpu.physics.blackhole import (
    BHParams, BhData, bondi_accretion, bh_neighbor_sums,
    swallow_and_feedback, seed_black_holes)
from mpgadget_tpu.particles import ParticleData, pos_to_fixed
from mpgadget_tpu.sph.state import SphData
from mpgadget_tpu.utils import constants as C


def test_bondi_rate_scalings():
    par = BHParams(accretion_factor=1.0, eddington_factor=0.0)
    bh_mass = jnp.asarray([1.0, 2.0])
    rho = jnp.asarray([1.0, 1.0])
    ent_sm = rho * 100.0  # entropy 100 (sums are rho-weighted)
    gasvel = jnp.zeros((2, 3))
    vel = jnp.zeros((2, 3))
    mdot, dm = bondi_accretion(par, bh_mass, rho, ent_sm, gasvel, vel,
                               1.0, G=1.0, unit_time_in_s=1.0,
                               hubble_param=0.7, dtime=0.1)
    mdot = np.asarray(mdot)
    # mdot ~ M^2
    assert np.isclose(mdot[1] / mdot[0], 4.0, rtol=1e-5)
    assert np.allclose(np.asarray(dm), mdot * 0.1)
    # Eddington cap applies
    par2 = BHParams(accretion_factor=1e30, eddington_factor=2.0)
    mdot2, _ = bondi_accretion(par2, bh_mass, rho, ent_sm, gasvel, vel,
                               1.0, 1.0, 1.0, 0.7, 0.1)
    medd = (4 * np.pi * C.GRAVITY * C.LIGHTCGS * C.PROTONMASS
            / (0.1 * C.LIGHTCGS ** 2 * C.THOMPSON)) / 0.7
    assert np.allclose(np.asarray(mdot2),
                       2.0 * medd * np.asarray(bh_mass), rtol=1e-5)


def make_bh_setup(seed=5):
    """A BH at the center of a uniform gas ball."""
    rng = np.random.RandomState(seed)
    box = 1000.0
    n = 600
    pos = np.concatenate([
        np.array([[500.0, 500, 500]]),               # the BH
        500.0 + 60.0 * (rng.rand(n - 1, 3) - 0.5)])  # gas cube
    ptype = np.zeros(n, np.int32)
    ptype[0] = 5
    mass = np.full(n, 2.0, np.float32)
    pdata = ParticleData.from_numpy(pos, np.zeros((n, 3)), mass, ptype,
                                    np.arange(n) + 1, box)
    hsml = np.full(n, 25.0, np.float32)
    return pdata, jnp.asarray(hsml), box, n


def test_bh_neighbor_sums():
    pdata, hsml, box, n = make_bh_setup()
    is_bh = pdata.ptype == 5
    is_gas = pdata.ptype == 0
    entropy = jnp.full(n, 50.0, jnp.float32)
    sums = bh_neighbor_sums(pdata.ipos, pdata.mass, hsml, pdata.vel,
                            entropy, is_bh, is_gas, box)
    rho = np.asarray(sums["rho"])
    assert rho[0] > 0, "BH sees gas density"
    assert np.all(rho[1:] == 0), "gas rows untouched"
    # uniform ball: density ~ n_gas_mass_density
    expect = (2.0 * 599) / 60.0 ** 3
    assert np.isclose(rho[0], expect, rtol=0.35)
    # smoothed entropy / rho = 50
    assert np.isclose(sums["ent"][0] / rho[0], 50.0, rtol=1e-3)


def test_swallow_and_feedback():
    pdata, hsml, box, n = make_bh_setup()
    is_bh = pdata.ptype == 5
    is_gas = pdata.ptype == 0
    entropy = jnp.full(n, 50.0, jnp.float32)
    sums = bh_neighbor_sums(pdata.ipos, pdata.mass, hsml, pdata.vel,
                            entropy, is_bh, is_gas, box)
    # big subgrid mass >> dyn mass: swallowing probable
    bh_mass = jnp.where(is_bh, 100.0, 0.0)
    mdot = jnp.where(is_bh, 1.0, 0.0)
    density = jnp.full(n, 0.01, jnp.float32)
    par = BHParams()
    swallowed, ent_new, bhrow = swallow_and_feedback(
        par, jax.random.PRNGKey(0), ipos=pdata.ipos, mass=pdata.mass,
        hsml=hsml, entropy=entropy, density=density, is_bh=is_bh,
        is_gas=is_gas, pid=pdata.pid, bh_mass=bh_mass, mdot=mdot,
        bh_density=jnp.asarray(sums["rho"]),
        fbweight=jnp.asarray(sums["fbweight"]), boxsize=box, atime=1.0,
        dtime=0.1, unit_velocity=1e5, uu_in_cgs=1e10)
    sw = np.asarray(swallowed)
    assert sw.sum() > 0, "no gas swallowed despite huge BH mass"
    assert not sw[0], "the BH itself is not swallowed"
    # swallower row points at the BH (row 0)
    assert np.all(np.asarray(bhrow)[sw] == 0)
    # feedback heated nearby gas (entropy increased somewhere)
    ent_arr = np.asarray(ent_new)
    assert (ent_arr[1:] > 50.0).sum() > 0


def test_fof_seeding():
    pdata, hsml, box, n = make_bh_setup()
    # pretend all particles are gas (no BH yet) in one group
    pdata = pdata.replace(ptype=jnp.zeros(n, jnp.int32))
    sph = SphData.zeros(n).replace(
        density=jnp.asarray(np.linspace(1, 2, n), jnp.float32))
    cat = {
        "ngroups": 1,
        "masses": np.array([1200.0]),
        "mass_by_type": np.array([[600.0, 0, 0, 0, 1.0, 0]]),
        "group_index": np.zeros(n, np.int64),
    }
    bh = BhData.zeros(n)
    par = BHParams(min_fof_mass_for_seed=100.0, min_mstar_for_seed=0.5,
                   seed_mass=3e-3)
    pdata2, bh2, nseeded = seed_black_holes(par, cat, pdata, bh, sph,
                                            0.5)
    assert nseeded == 1
    ptype = np.asarray(pdata2.ptype)
    assert (ptype == 5).sum() == 1
    # seeded at the densest member (last index has max density)
    assert ptype[n - 1] == 5
    assert float(bh2.bh_mass[n - 1]) == pytest.approx(3e-3)
    # below-threshold halo: no seed
    cat2 = dict(cat, masses=np.array([10.0]))
    _, _, ns2 = seed_black_holes(par, cat2, pdata, bh, sph, 0.5)
    assert ns2 == 0
