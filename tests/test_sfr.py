"""Star formation model tests (SH03 eEOS; sfr_eff.c behaviors)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpgadget_tpu.physics.sfr import (SFRParams, init_sfr, get_sfr_eeqos,
                                      sfreff_on_eeqos,
                                      cooling_and_starformation,
                                      spawn_stars, get_cooling_time)
from mpgadget_tpu.physics.cooling import (CoolingParams, CoolingRates,
                                          CoolingUnits, TreeCool, UVBG,
                                          do_cooling)
from mpgadget_tpu.cosmology import Cosmology
from mpgadget_tpu.utils import get_unitsystem, constants as C
from mpgadget_tpu.particles import ParticleData
from mpgadget_tpu.sph.state import SphData

UNITS = get_unitsystem(C.CM_PER_KPC, 1.989e43, 1e5)


@pytest.fixture(scope="module")
def setup():
    cp = Cosmology(Omega0=0.3, OmegaBaryon=0.045, OmegaLambda=0.7,
                   HubbleParam=0.7).init_units(UNITS)
    cpar = CoolingParams()
    cr = CoolingRates(cpar, TreeCool(None, cpar))
    cunits = CoolingUnits(
        density_in_phys_cgs=UNITS.UnitDensity_in_cgs * 0.49,
        uu_in_cgs=UNITS.UnitInternalEnergy_in_cgs,
        tt_in_s=UNITS.UnitTime_in_s / 0.7)
    par = init_sfr(SFRParams(), cp, UNITS, cr, cunits,
                   avg_baryon_mass=1e-3)
    return par, cp, cr, cunits


def test_threshold_computed(setup):
    par, cp, cr, cunits = setup
    # the self-consistent threshold should be ~0.1-1 hydrogen/cm^3
    nH = par.PhysDensThresh * UNITS.UnitDensity_in_cgs \
        / C.PROTONMASS * C.HYDROGEN_MASSFRAC
    assert 0.01 < nH < 10, nH
    assert par.EgySpecSN > par.EgySpecCold > 0


def test_eeqos_flags(setup):
    par, cp, cr, cunits = setup
    a3inv = 1.0
    dens = jnp.asarray([par.PhysDensThresh * 10,
                        par.PhysDensThresh * 0.1,
                        par.PhysDensThresh * 10])
    delay = jnp.asarray([0.0, 0.0, 1.0])  # third is in a wind
    flags = np.asarray(sfreff_on_eeqos(par, dens, delay, a3inv))
    assert flags[0] and not flags[1] and not flags[2]


def test_eeqos_model(setup):
    par, cp, cr, cunits = setup
    uv = UVBG()
    dens = jnp.asarray([par.PhysDensThresh * 2, par.PhysDensThresh * 100])
    out = get_sfr_eeqos(par, cr, cunits, dens, jnp.asarray([1.0, 1.0]),
                        jnp.asarray([0.0, 0.0]), 0.01, uv, 0.0, 1.0,
                        jnp.asarray([True, True]))
    cf = np.asarray(out["cloudfrac"])
    assert np.all((cf > 0) & (cf < 1))
    assert cf[1] > cf[0], "denser gas has more cold clouds"
    assert np.all(np.asarray(out["tsfr"]) > 0)
    # tsfr decreases with density (more SF in denser gas)
    assert out["tsfr"][1] < out["tsfr"][0]


def test_star_spawning_and_conversion(setup):
    par, cp, cr, cunits = setup
    n = 16
    box = 1000.0
    rng = np.random.RandomState(3)
    pos = rng.uniform(0, box, (n, 3))
    pdata = ParticleData.from_numpy(
        pos, np.zeros((n, 3)), np.full(n, 1e-3), np.zeros(n, np.int32),
        np.arange(n) + 1, box, capacity=24)
    sph = SphData.zeros(24)
    make_star = jnp.zeros(24, bool).at[0].set(True).at[1].set(True)
    convert = jnp.zeros(24, bool).at[0].set(True)  # particle 0 converts
    star_mass = jnp.where(make_star, jnp.float32(1e-3 / 4), 0.0)
    star_mass = star_mass.at[0].set(1e-3)
    from mpgadget_tpu.physics.stars import StarData
    sph = sph.replace(density=jnp.full(24, 2.5, jnp.float32))
    stars = StarData.zeros(24)
    pdata2, sph2, stars2, nspawn, ovf = spawn_stars(
        pdata, sph, make_star, convert, star_mass, 0.5, stars=stars)
    assert not bool(ovf)
    assert int(nspawn) == 1
    # star slot data populated for converted + spawned rows
    ft = np.asarray(stars2.formation_time)
    bd = np.asarray(stars2.birth_density)
    st4 = np.asarray(pdata2.ptype) == 4
    assert np.all(ft[st4 & np.asarray(pdata2.valid)] == 0.5)
    assert np.all(bd[st4 & np.asarray(pdata2.valid)] == 2.5)
    ptype = np.asarray(pdata2.ptype)
    valid = np.asarray(pdata2.valid)
    mass = np.asarray(pdata2.mass)
    assert ptype[0] == 4 and valid[0]           # converted in place
    assert np.isclose(mass[0], 1e-3)
    # spawned star occupies the first free row (16)
    assert valid[16] and ptype[16] == 4
    assert np.isclose(mass[16], 1e-3 / 4)
    assert np.isclose(mass[1], 1e-3 * 3 / 4)    # parent reduced
    assert valid.sum() == 17


def test_cooling_and_sfr_pipeline(setup):
    par, cp, cr, cunits = setup
    n = 64
    rng = np.random.RandomState(4)
    # half the gas above threshold, half below
    dens = np.where(np.arange(n) < n // 2,
                    par.PhysDensThresh * 50 + par.OverDensThresh * 100,
                    par.OverDensThresh * 0.5).astype(np.float32)
    entropy = np.full(n, 1e3, np.float32)
    uv = UVBG()

    def cool_fn(u, rho, dt, ne, Z):
        return do_cooling(cr, 0.0, u, rho, dt, uv, ne, Z, 1e-10, cunits)

    out = cooling_and_starformation(
        par, cr, cunits, jax.random.PRNGKey(1),
        density=jnp.asarray(dens), entropy=jnp.asarray(entropy),
        ne=jnp.ones(n, jnp.float32), metallicity=jnp.zeros(n, jnp.float32),
        delay_time=jnp.zeros(n, jnp.float32),
        mass=jnp.full(n, 1e-3, jnp.float32),
        pid=jnp.arange(n, dtype=jnp.int64), valid_gas=jnp.ones(n, bool),
        redshift=0.0, atime=1.0, hubble=cp.hubble_function(1.0),
        dloga=0.05, uvbg=uv, do_cooling_fn=cool_fn, min_egy_spec=1e-10)
    sfr = np.asarray(out["sfr"])
    assert np.all(sfr[:n // 2] > 0), "dense gas forms stars"
    assert np.all(sfr[n // 2:] == 0), "thin gas does not"
    assert np.all(np.asarray(out["entropy"]) > 0)
    # dense gas relaxed toward the eEOS: entropy changed
    assert not np.allclose(np.asarray(out["entropy"])[:n // 2], 1e3)
