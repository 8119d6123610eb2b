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
    pdata2, sph2, stars2, nspawn, ovf, new_star = spawn_stars(
        pdata, sph, make_star, convert, star_mass, 0.5, stars=stars)
    assert not bool(ovf)
    assert int(nspawn) == 1
    ns = np.asarray(new_star)
    assert ns[0] and ns.sum() == 2  # converted row + spawned row
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


def test_winds_via_neighbors_kicks_gas_near_new_stars():
    """Non-subgrid winds (winds.c:299-567): neighbors of a new star
    are kicked with the halo-model velocity; gas outside the star's
    Hsml and decoupled gas are untouched."""
    import jax
    from mpgadget_tpu.physics import winds as W

    box = 1000.0
    rng = np.random.RandomState(3)
    ngas = 64
    n = ngas + 1
    # gas clustered around the center; star at the center
    pos = np.vstack([
        (box / 2 + rng.uniform(-40, 40, (ngas, 3))) % box,
        [[box / 2, box / 2, box / 2]]])
    ptype = np.concatenate([np.zeros(ngas, np.int32), [4]])
    ipos = jnp.asarray((pos / box * 2 ** 32).astype(np.uint64)
                       .astype(np.uint32))
    mass = jnp.full(n, 1.0, jnp.float32)
    hsml = jnp.full(n, 60.0, jnp.float32)
    pid = jnp.arange(1, n + 1, dtype=jnp.int64)
    vel = jnp.zeros((n, 3), jnp.float32)
    entropy = jnp.full(n, 1.0, jnp.float32)
    density = jnp.full(n, 1.0, jnp.float32)
    delay = jnp.zeros(n, jnp.float32)
    delay = delay.at[0].set(5.0)      # one decoupled gas particle
    is_gas = jnp.asarray(ptype == 0)
    new_star = jnp.asarray(ptype == 4)
    vdisp = jnp.where(new_star, 100.0, 0.0)

    par = W.WindParams(model=W.WIND_USE_HALO | W.WIND_DECOUPLE_SPH,
                       sigma0=1e4,  # giant windeff -> p >~ 1
                       speed_factor=3.7, max_free_travel_time=60.0,
                       free_travel_length=20.0)
    key = jax.random.PRNGKey(0)
    vel2, ent2, delay2, kicked = W.winds_via_neighbors(
        par, key, ipos=ipos, mass=mass, hsml=hsml, pid=pid, vel=vel,
        entropy=entropy, density=density, delay_time=delay,
        is_gas=is_gas, new_star=new_star, star_vdisp=vdisp,
        boxsize=box, atime=0.5)

    k = np.asarray(kicked)
    d = pos[:ngas] - box / 2
    d -= box * np.round(d / box)
    r = np.sqrt((d ** 2).sum(1))
    inside = r < 60.0
    # every eligible gas inside the bubble gets kicked (p >> 1), none
    # outside, never the decoupled one, never the star
    assert not k[-1]
    assert not k[0]
    expect = inside & (np.arange(ngas) != 0)
    assert np.array_equal(k[:ngas], expect), (k[:ngas], expect)
    assert k.sum() > 0
    # kick speed = speed_factor * vdisp
    dv = np.linalg.norm(np.asarray(vel2) - np.asarray(vel), axis=1)
    assert np.allclose(dv[k], 3.7 * 100.0, rtol=1e-5)
    assert np.all(dv[~k] == 0)
    # decoupling timers set for kicked particles
    assert np.all(np.asarray(delay2)[k] > 0)
