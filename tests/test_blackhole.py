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
    swallowed, ent_new, bhrow, kick = swallow_and_feedback(
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


def test_dynfric_accel_formula():
    """Chandrasekhar DF (bhdynfric.c:84-145): decelerates the BH along
    its relative velocity; magnitude matches the formula with the real
    error function within the approximation's 0.7% accuracy."""
    from mpgadget_tpu.physics.blackhole import dynfric_accel
    from scipy.special import erf

    rho = jnp.asarray([2.0])
    vel_sur = jnp.asarray([[0.0, 0.0, 0.0]])
    rmsvel = jnp.asarray([3.0])        # sigma = 1
    vel = jnp.asarray([[1.5, 0.0, 0.0]])
    mass = jnp.asarray([10.0])
    atime, G = 0.5, 43007.1
    acc = np.asarray(dynfric_accel(rho, vel_sur, rmsvel, mass, vel,
                                   atime, G, bmax=20.0, boost=1.0))
    assert acc[0, 1] == 0 and acc[0, 2] == 0
    assert acc[0, 0] < 0  # decelerating
    x = 1.5 / np.sqrt(2) / 1.0
    f = erf(x) - 2 * x / np.sqrt(np.pi) * np.exp(-x * x)
    lam = 1 + 20.0 * (1.5 / atime) ** 2 / (G * 10.0)
    expect = -4 * np.pi * G ** 2 * 10.0 * 2.0 * np.log(lam) * f \
        / 1.5 ** 3 * atime * 1.5
    assert np.isclose(acc[0, 0], expect, rtol=0.01)
    # zero background or zero velocity -> zero force, no NaN
    acc0 = np.asarray(dynfric_accel(
        jnp.zeros(1), vel_sur, rmsvel, mass, vel, atime, G))
    accv = np.asarray(dynfric_accel(
        rho, vel_sur, rmsvel, mass, jnp.zeros((1, 3)), atime, G))
    assert np.all(acc0 == 0) and np.all(accv == 0)


def test_bh_dynfric_sums_uniform():
    """DF sums vs direct kernel-weighted summation around the BH."""
    from mpgadget_tpu.physics.blackhole import bh_dynfric_sums
    from mpgadget_tpu.sph.kernels import kernel_wk
    box, ng = 100.0, 10
    n = ng ** 3
    rngs = np.random.RandomState(7)
    grid = np.indices((ng, ng, ng)).reshape(3, -1).T / ng * box
    pos = np.concatenate([grid, [[50.05, 50.05, 50.05]]])
    is_bh = np.zeros(n + 1, bool); is_bh[-1] = True
    is_star = ~is_bh
    vel = rngs.randn(n + 1, 3).astype(np.float32)
    h = 25.0
    hsml = np.full(n + 1, h, np.float32)
    out = bh_dynfric_sums(
        jnp.asarray(pos_to_fixed(pos, box)),
        jnp.ones(n + 1, jnp.float32), jnp.asarray(hsml),
        jnp.asarray(vel), jnp.asarray(is_bh), jnp.asarray(is_star),
        box)
    # direct reference
    d = grid - pos[-1]
    d -= np.round(d / box) * box
    r = np.linalg.norm(d, axis=1)
    wk = np.where(r < h, np.asarray(kernel_wk(
        jnp.asarray(r / h, jnp.float32), jnp.float32(1 / h), 2)), 0.0)
    rho_ref = wk.sum()
    vel_ref = (wk[:, None] * vel[:n]).sum(0) / rho_ref
    rms_ref = np.sqrt((wk * (vel[:n] ** 2).sum(1)).sum() / rho_ref)
    assert np.isclose(float(out["rho"][-1]), rho_ref, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["vel"][-1]), vel_ref,
                               atol=1e-3)
    assert np.isclose(float(out["rmsvel"][-1]), rms_ref, rtol=1e-3)
    # rho is also close to the uniform lattice density
    assert np.isclose(rho_ref, n / box ** 3, rtol=0.05)


def test_bh_mergers():
    """Close bound pair merges (bigger ID swallows); unbound or distant
    pairs do not (blackhole.c:495-560)."""
    from mpgadget_tpu.physics.blackhole import bh_mergers
    par = BHParams(merge_grav_bound=True)
    box, soft = 1000.0, 1.0
    # pair A: close, at rest, accel pointing together (bound)
    # pair B: close but huge relative velocity (unbound)
    # C: isolated
    pos = np.array([[100.0, 100, 100], [100.5, 100, 100],
                    [500.0, 500, 500], [500.5, 500, 500],
                    [900.0, 900, 900]])
    vel = np.zeros((5, 3)); vel[3, 0] = 1e4
    acc = np.zeros((5, 3))
    acc[0, 0] = 1.0; acc[1, 0] = -1.0   # attracting
    acc[2, 0] = 1.0; acc[3, 0] = -1.0
    pid = np.array([11, 22, 33, 44, 55], np.uint64)
    out = bh_mergers(par, pos=pos, vel=vel, accel=acc,
                     df_accel=np.zeros((5, 3)), pid=pid,
                     is_bh=np.ones(5, bool), boxsize=box, atime=1.0,
                     softening=soft)
    assert list(out["swallowed"]) == [0]
    assert list(out["swallower"]) == [1]  # ID 22 swallows 11
    # without the bound check, the fast pair merges too
    par2 = BHParams(merge_grav_bound=False)
    out2 = bh_mergers(par2, pos=pos, vel=vel, accel=acc,
                      df_accel=np.zeros((5, 3)), pid=pid,
                      is_bh=np.ones(5, bool), boxsize=box, atime=1.0,
                      softening=soft)
    assert set(out2["swallowed"]) == {0, 2}


def test_kinetic_update():
    """Kinetic channel: accumulates below the Eddington-ratio
    threshold, releases when above the VDisp energy threshold
    (blackhole.c:437-467)."""
    from mpgadget_tpu.physics.blackhole import kinetic_update
    par = BHParams(kinetic_on=True, ke_eddington_thr_factor=0.05,
                   ke_eddington_m_factor=1e30)  # mass term not binding
    bh_mass = jnp.asarray([0.01, 0.01])
    # meddington ~ 4 pi G c mp/(0.1 c^2 sigma_T) * M * t_unit/h
    from mpgadget_tpu.utils import constants as Cc
    tunit = 3.08568e16  # ~kpc/(km/s) in s
    medd = (4 * np.pi * Cc.GRAVITY * Cc.LIGHTCGS * Cc.PROTONMASS
            / (0.1 * Cc.LIGHTCGS ** 2 * Cc.THOMPSON)) * 0.01 \
        * tunit / 0.7
    # BH0 accreting slowly (accumulate), BH1 at Eddington (not)
    mdot = jnp.asarray([0.001 * medd, 1.0 * medd], jnp.float32)
    rho_crit_b = 1e-8
    dens = jnp.asarray([1e-6, 1e-6], jnp.float32)
    ke0 = jnp.zeros(2, jnp.float32)
    ke1, flag = kinetic_update(
        par, bh_mass, mdot, dens, jnp.asarray([100.0, 100.0]),
        jnp.asarray([0.0, 0.0]),  # MgasEnc = 0 -> thresh 0 -> release
        ke0, 0.01, tunit, 0.7, rho_crit_b, 1e5)
    ke1 = np.asarray(ke1)
    flag = np.asarray(flag)
    assert ke1[0] > 0 and flag[0] == 2   # accumulated, above 0 thresh
    assert ke1[1] == 0 and flag[1] == 0  # Eddington: not accumulating


def test_mtrack_accretion_routing():
    """blackhole.c:960-978: swallowed mass fills Mtrack up to
    SeedBHDynMass before growing the dynamical mass."""
    from mpgadget_tpu.physics.blackhole import apply_mtrack_accretion
    n = 4
    is_bh = jnp.asarray([True, True, True, False])
    mass = jnp.asarray([2.0, 2.0, 2.0, 1.0], jnp.float32)   # dyn = 2
    mtrack = jnp.asarray([0.5, 1.9, 2.0, 0.0], jnp.float32)
    acc = jnp.asarray([0.4, 0.4, 0.4, 0.0], jnp.float32)
    vel = jnp.zeros((n, 3), jnp.float32)
    mom = jnp.zeros((n, 3), jnp.float32)
    m2, mt2, v2 = apply_mtrack_accretion(mass, mtrack, acc, mom, vel,
                                         is_bh, 2.0)
    m2, mt2 = np.asarray(m2), np.asarray(mt2)
    # BH 0: still seed regime -> Mtrack grows, mass fixed
    assert np.isclose(mt2[0], 0.9) and np.isclose(m2[0], 2.0)
    # BH 1: transitions -> mass = mtrack + acc, mtrack capped
    assert np.isclose(m2[1], 2.3) and np.isclose(mt2[1], 2.0)
    # BH 2: regular -> mass grows
    assert np.isclose(m2[2], 2.4) and np.isclose(mt2[2], 2.0)
    # non-BH untouched
    assert np.isclose(m2[3], 1.0)


def test_bh_minpot_finds_potential_minimum():
    """bhdynfric.c:199-231: the BH relocates to its deepest-potential
    neighbor inside the kernel."""
    from mpgadget_tpu.physics.blackhole import bh_minpot
    box = 1000.0
    rng = np.random.RandomState(4)
    n = 64
    pos = (box / 2 + rng.uniform(-50, 50, (n, 3))) % box
    ipos = jnp.asarray((pos / box * 2 ** 32).astype(np.uint64)
                       .astype(np.uint32))
    is_bh = jnp.zeros(n, bool).at[0].set(True)
    src = jnp.ones(n, bool)
    pot = jnp.asarray(rng.rand(n).astype(np.float32))
    deepest = 17
    pot = pot.at[deepest].set(-5.0)
    hsml = jnp.where(is_bh, 200.0, 0.0)
    vel = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    mp_pos, mp_vel, found = bh_minpot(ipos, hsml, pot, vel, src,
                                      is_bh, box)
    assert bool(found[0])
    got = np.asarray(mp_pos)[0]
    d = got - pos[deepest]
    d -= box * np.round(d / box)
    assert np.linalg.norm(d) < 1e-2 * box, (got, pos[deepest])
    assert np.allclose(np.asarray(mp_vel)[0],
                       np.asarray(vel)[deepest], atol=1e-5)
