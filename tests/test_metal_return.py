"""Metal return: IMF/lifetime sanity, yield conservation, and the
kernel-weighted spread (metal_return.c analogs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mpgadget_tpu.physics import metal_return as mr
from mpgadget_tpu.physics.stars import StarData
from mpgadget_tpu.particles import ParticleData


def test_imf_normalized():
    m = np.geomspace(mr.MINMASS, mr.MAXMASS, 20000)
    total = np.trapezoid(m * np.asarray(mr.imf_xi(jnp.asarray(m))), m)
    assert np.isclose(total, 1.0, rtol=1e-3)


def test_lifetime_inverts():
    z = 0.02
    for m in (1.0, 3.0, 8.0, 20.0, 40.0):
        t = float(mr.lifetime_myr(jnp.asarray(m), z))
        m_back = float(mr.mass_dying(jnp.asarray(t), z))
        assert np.isclose(m_back, m, rtol=1e-4), (m, t, m_back)
    # more massive -> shorter lived
    t1 = float(mr.lifetime_myr(jnp.asarray(1.0), z))
    t8 = float(mr.lifetime_myr(jnp.asarray(8.0), z))
    t40 = float(mr.lifetime_myr(jnp.asarray(40.0), z))
    assert t1 > t8 > t40
    assert 5e3 < t1 < 5e4      # ~10 Gyr for 1 Msun
    assert t40 < 10.0          # < 10 Myr for 40 Msun


def test_stellar_return_matches_imf_integral():
    """Total mass returned over all time == the analytic IMF integral
    of the ejecta (VERDICT r1 item 5 'done' criterion)."""
    z = 0.02
    m_init = jnp.asarray([1.0])
    mret, gen = mr.stellar_return(
        jnp.asarray([0.0]), jnp.asarray([13.7e3]), jnp.asarray([z]),
        m_init, sn1a_n0=0.0)
    # analytic: integral of ejecta(m)*xi(m) from the mass dying at
    # t=13.7 Gyr up to MAXMASS
    m_lo = max(float(mr.mass_dying(jnp.asarray(13.7e3), z)), 0.85)
    m = np.linspace(m_lo, mr.MAXMASS, 30000)
    ej = m - np.asarray(mr.remnant_mass(jnp.asarray(m)))
    expect = np.trapezoid(ej * np.asarray(mr.imf_xi(jnp.asarray(m))), m)
    assert np.isclose(float(mret[0]), expect, rtol=1e-2)
    # produced metals never exceed the returned mass
    assert float(jnp.sum(gen)) <= float(mret[0]) * 1.0001
    # split across two intervals == one interval (additivity)
    tm = 3.0e3
    r1, _ = mr.stellar_return(jnp.asarray([0.0]), jnp.asarray([tm]),
                              jnp.asarray([z]), m_init, 0.0)
    r2, _ = mr.stellar_return(jnp.asarray([tm]), jnp.asarray([13.7e3]),
                              jnp.asarray([z]), m_init, 0.0)
    assert np.isclose(float(r1[0] + r2[0]), float(mret[0]), rtol=1e-3)


def test_sn1a_dtd():
    z = 0.02
    n0 = 1.3e-3
    # whole DTD window integrates to n0
    tot = float(mr.sn1a_number(jnp.asarray(0.0), jnp.asarray(13.7e3),
                               z, n0))
    assert np.isclose(tot, n0, rtol=1e-6)
    # nothing before the 8-Msun lifetime
    early = float(mr.sn1a_number(jnp.asarray(0.0), jnp.asarray(10.0),
                                 z, n0))
    assert early == 0.0


def test_metal_return_step_conserves_mass():
    """Gas receives exactly what stars return; metals stay bounded."""
    rng = np.random.RandomState(5)
    box = 1000.0
    ngas, nstar = 128, 8
    n = ngas + nstar
    pos = rng.uniform(0, box, (n, 3))
    # put stars near gas so every star has neighbors
    pos[ngas:] = pos[:nstar] + rng.uniform(-20, 20, (nstar, 3))
    pos = np.mod(pos, box)
    ptype = np.concatenate([np.zeros(ngas, np.int32),
                            np.full(nstar, 4, np.int32)])
    pdata = ParticleData.from_numpy(
        pos, np.zeros((n, 3)), np.full(n, 1e-3), ptype,
        np.arange(n) + 1, box)
    is_gas = jnp.asarray(ptype == 0)
    is_star = jnp.asarray(ptype == 4)
    stars = StarData.zeros(n).replace(
        formation_time=jnp.where(is_star, 0.2, 0.0),
        metallicity=jnp.where(is_star, 0.02, 0.0),
        metals=StarData.zeros(n).metals.at[:, 2:].set(0.02 / 7))

    class FlatAge:
        def __call__(self, a):
            # linear in a: 10 Gyr by a=1
            return jnp.asarray(a, jnp.float32) * 1.0e4

    params = mr.MetalReturnParams()
    hsml = jnp.full(n, 60.0, jnp.float32)
    gas_metals = jnp.zeros((n, 9), jnp.float32) \
        .at[:, 0].set(0.76).at[:, 1].set(0.24)
    out = mr.metal_return_step(
        pdata.ipos, pdata.mass, hsml,
        jnp.where(is_gas, 1.0, 0.0), is_gas, is_star, hsml, stars,
        gas_metals, 0.5, 0.6, FlatAge(), box, params)

    ret = float(out["mass_returned_total"])
    rec = float(out["mass_received_total"])
    assert ret > 0, "no mass returned"
    assert np.isclose(ret, rec, rtol=1e-4), (ret, rec)
    # total mass conserved
    m_new = np.where(np.asarray(is_gas), np.asarray(out["gas_mass"]),
                     np.asarray(out["star_mass"]))
    assert np.isclose(m_new.sum(), float(jnp.sum(pdata.mass)),
                      rtol=1e-5)
    # enriched gas has positive metal fractions summing to ~1
    zs = np.asarray(out["gas_metals"])[np.asarray(is_gas)]
    assert np.all(zs.sum(axis=1) < 1.01)
    assert np.any(zs[:, 4] > 0), "no oxygen enrichment"


def test_imf_integrated_yields_match_published():
    """IMF-integrated newly-produced O and Fe per Msun formed pin the
    tabulated yields (yield_tables.py) against the published
    Chabrier-IMF integrations of Kobayashi+06: O ~ 7e-3, Fe(CCSN)
    ~ 6e-4 Msun per Msun formed at solar Z (within the table-coarseness
    tolerance), and secondary N grows with birth metallicity."""
    from mpgadget_tpu.physics.metal_return import stellar_return
    # full population: ages 0.01 Myr .. 13.7 Gyr, no SN1a (CCSN only)
    _, gen = stellar_return(1e-2, 13.7e3, 0.02, 1.0, 0.0)
    gen = np.asarray(gen)
    o_per_msun = gen[4]
    fe_per_msun = gen[8]
    assert 0.004 < o_per_msun < 0.013, o_per_msun
    assert 3.0e-4 < fe_per_msun < 1.1e-3, fe_per_msun
    # He production is a few percent of the formed mass
    assert 0.01 < gen[1] < 0.08, gen[1]
    # N has a secondary (SNII) component: higher birth Z -> more N.
    # (AGB hot-bottom-burning N is primary and partly offsets this,
    # so demand only a clear increase, not proportionality.)
    _, gen_lowz = stellar_return(1e-2, 13.7e3, 1e-3, 1.0, 0.0)
    assert gen[3] > 1.15 * float(np.asarray(gen_lowz)[3]), \
        (gen[3], np.asarray(gen_lowz)[3])


def test_yield_tables_interpolation_edges():
    """Bilinear interpolation clamps at grid edges and hits node
    values exactly on the nodes."""
    from mpgadget_tpu.physics import yield_tables as yt
    import jax.numpy as jnp
    m = jnp.asarray([13.0, 40.0, 60.0])
    out = yt.snii_produced(m, jnp.asarray([0.02, 0.02, 0.02]))
    o = np.asarray(out["O"])
    assert np.isclose(o[0], 0.20, rtol=1e-5)
    assert np.isclose(o[1], 5.3, rtol=1e-5)
    assert np.isclose(o[2], o[1])            # clamped beyond the grid
    a = yt.agb_produced(jnp.asarray([3.0]), jnp.asarray([0.02]))
    assert np.isclose(np.asarray(a["C"])[0], 0.038, rtol=1e-5)
    assert np.all(np.asarray(a["Fe"]) == 0.0)
