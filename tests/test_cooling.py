"""Cooling rate network tests (test_cooling_rates.c analog).

Physics checks: temperature/mu consistency, collisional ionization
equilibrium limits, photoionization equilibrium vs the analytic
approximation, net rate signs, implicit DoCooling relaxation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mpgadget_tpu.physics.cooling import (
    CoolingParams, CoolingRates, CoolingUnits, TreeCool, UVBG,
    do_cooling)
from mpgadget_tpu.utils import constants as C

HY = C.HYDROGEN_MASSFRAC
HELIUM = 1 - HY

TREECOOL = "/root/reference/examples/TREECOOL_fg_june11"


def u_of_T(T, nebynh):
    """erg/g for temperature T at electron abundance ne/nh."""
    mu = 4 / (HY * (3 + 4 * nebynh) + 1)
    return T * C.BOLTZMANN / (C.GAMMA_MINUS1 * mu * C.PROTONMASS)


@pytest.fixture(scope="module")
def cr():
    return CoolingRates(CoolingParams(), TreeCool(None, CoolingParams()))


def test_temperature_roundtrip(cr):
    # fully neutral: ne=0; T_in -> u -> get_temp_internal -> T_in
    for T in (1e3, 1e4, 1e6):
        for ne in (0.0, 1.0, 1.2):
            u = u_of_T(T, ne)
            T2 = float(cr.get_temp_internal(jnp.asarray([ne]),
                                            jnp.asarray([u]), HELIUM)[0])
            assert np.isclose(T2, T, rtol=1e-6)


def test_cie_neutral_fraction_limits(cr):
    """No UVB: cold gas neutral, hot gas ionized."""
    uv = UVBG()
    dens = jnp.asarray([1e-4, 1e-4])
    # temperatures ~8e3 K (neutral) and ~5e5 K (collisionally ionized)
    u = jnp.asarray([u_of_T(8e3, 0.0), u_of_T(5e5, 1.16)])
    ne0 = jnp.asarray([1e-4, 1.0])
    xHI = np.asarray(cr.get_neutral_fraction(dens, u, uv, ne0))
    assert xHI[0] > 0.99, xHI
    assert xHI[1] < 1e-2, xHI
    # electron abundance: ~0 cold, ~1.16 hot (H + He fully ionized)
    ne = np.asarray(cr.get_equilib_ne(dens, u, uv, ne0)) \
        / np.asarray(dens * HY)
    assert ne[0] < 1e-3
    assert np.isclose(ne[1], 1 + 2 * HELIUM / 4 / HY, rtol=0.05)


def test_photoionization_equilibrium(cr):
    """With a UVB, low-density gas: x_HI ~ ne alpha(T) / Gamma."""
    gamma = 1e-12
    uv = UVBG(gJH0=gamma, gJHe0=gamma, gJHep=gamma * 0.05,
              self_shield_dens=1e10)  # self-shielding off
    T = 2e4
    dens = jnp.asarray([1e-5])   # very low density: fully ionized
    u = jnp.asarray([u_of_T(T, 1.16)])
    xHI = float(cr.get_neutral_fraction(dens, u, uv,
                                        jnp.asarray([1.0]))[0])
    # analytic: x_HI = ne alpha / Gamma; ne ~ 1.16 nH
    alpha = float(cr.rates["alphaHp"](jnp.asarray([T]))[0])
    ne_cgs = 1.16 * 1e-5 * HY
    expect = ne_cgs * alpha / gamma
    assert np.isclose(xHI, expect, rtol=0.2), (xHI, expect)


def test_net_rate_signs(cr):
    uv = UVBG(gJH0=1e-12, gJHe0=1e-12, gJHep=5e-14,
              epsH0=3e-24, epsHe0=3e-25, epsHep=1e-26,
              self_shield_dens=1e10)
    dens = jnp.asarray([1e-5, 1e-5])
    # very hot gas cools; cool ionized gas is photoheated
    u = jnp.asarray([u_of_T(3e6, 1.16), u_of_T(6e3, 1.16)])
    lam, ne = cr.get_heatingcooling_rate(dens, u, 2.0, 0.0, uv,
                                         jnp.asarray([1.0, 1.0]))
    lam = np.asarray(lam)
    assert lam[0] < 0, "hot gas must cool"
    assert lam[1] > 0, "cold ionized gas must be photoheated"


def test_treecool_table_reading():
    par = CoolingParams()
    tc = TreeCool(TREECOOL, par)
    assert tc.table is not None and len(tc.table) > 50
    uv3 = tc.get_global_uvbg(3.0)
    assert 1e-13 < uv3.gJH0 < 1e-11  # ~1e-12 at z=3 for FG11
    assert uv3.epsH0 > 0
    assert uv3.self_shield_dens < 1.0  # ~6e-3 atoms/cm^3
    # before reionization the UVB is off
    uv15 = tc.get_global_uvbg(14.9)
    assert uv15.gJH0 == 0 or uv15.gJH0 < uv3.gJH0 * 1e-2


def test_do_cooling_relaxation(cr):
    """Hot low-density gas cools toward the equilibrium; gas at the
    thermal equilibrium stays put."""
    units = CoolingUnits(density_in_phys_cgs=1.0, uu_in_cgs=1.0,
                         tt_in_s=1.0)
    uv = UVBG(gJH0=1e-12, gJHe0=1e-12, gJHep=5e-14,
              epsH0=3e-24, epsHe0=3e-25, epsHep=1e-26,
              self_shield_dens=1e10)
    # density high enough that t_cool << total integration time
    rho = jnp.asarray([0.1 * C.PROTONMASS])  # 0.1 protons/cm^3 in cgs
    u_hot = jnp.asarray([u_of_T(3e6, 1.16)])
    dt = jnp.asarray([3e15])  # ~100 Myr
    ne = jnp.asarray([1.0])
    u1, ne1 = do_cooling(cr, 2.0, u_hot, rho, dt, uv, ne, 0.0,
                         u_of_T(10.0, 0.0), units)
    assert float(u1[0]) < float(u_hot[0]), "hot gas must cool"
    # iterate to equilibrium; then one more step should not move much
    u = u1
    for _ in range(20):
        u, ne = do_cooling(cr, 2.0, u, rho, dt, uv, ne, 0.0,
                           u_of_T(10.0, 0.0), units)
    u2, _ = do_cooling(cr, 2.0, u, rho, dt, uv, ne, 0.0,
                       u_of_T(10.0, 0.0), units)
    assert np.isclose(float(u2[0]), float(u[0]), rtol=5e-2)
    # equilibrium temperature is ~1e4 K for this UVB
    T_eq = float(cr.get_temp(rho / C.PROTONMASS, u, uv, ne)[0])
    assert 5e3 < T_eq < 5e4, T_eq


def test_metal_cooling_table(tmp_path):
    """MetalCoolingTable: trilinear interpolation matches scipy on a
    synthetic table; metal cooling lowers LambdaNet proportionally to Z
    (TableMetalCoolingRate, cooling_uvfluc.c:309-323)."""
    from mpgadget_tpu.physics.cooling import (MetalCoolingTable,
                                              CoolingRates,
                                              CoolingParams, TreeCool,
                                              UVBG)
    from mpgadget_tpu.io.bigfile import BigFile
    from scipy.interpolate import RegularGridInterpolator

    z = np.linspace(0.0, 10.0, 6)
    lognh = np.linspace(-6.0, 3.0, 10)
    logt = np.linspace(2.0, 9.0, 15)
    zz, nn, tt = np.meshgrid(z, lognh, logt, indexing="ij")
    tab = 1e-23 * (1 + zz) * np.exp(-(nn + 2) ** 2) \
        * np.exp(-(tt - 5) ** 2)
    path = str(tmp_path / "metalcool")
    bf = BigFile(path, create=True)
    bf.create_from_array("MetallicityInSolar_bins", np.array([0.0]))
    bf.create_from_array("Redshift_bins", z)
    bf.create_from_array("HydrogenNumberDensity_bins", lognh)
    bf.create_from_array("Temperature_bins", logt)
    bf.create_from_array("NetCoolingRate", tab.ravel())

    mt = MetalCoolingTable.from_file(path)
    rgi = RegularGridInterpolator((z, lognh, logt), tab)
    rng = np.random.RandomState(3)
    zq = rng.uniform(0, 10, 64)
    nhq = 10 ** rng.uniform(-6, 3, 64)
    tq = 10 ** rng.uniform(2, 9, 64)
    got = np.asarray(mt(jnp.asarray(zq), jnp.asarray(nhq),
                        jnp.asarray(tq)))
    want = rgi(np.stack([zq, np.log10(nhq), np.log10(tq)], -1))
    assert np.allclose(got, want, rtol=2e-5, atol=1e-32)
    # clamped outside the grid
    edge = float(mt(0.0, 1e-30, 1e2))
    assert np.isfinite(edge)

    # LambdaNet decreases linearly with Z
    cr = CoolingRates(CoolingParams(), TreeCool(None, CoolingParams()),
                      metal_table=mt)
    uvbg = UVBG(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    rho = jnp.full(3, 0.01, jnp.float32)   # protons/cm^3
    u = jnp.full(3, 3e12, jnp.float32)     # ~1e5 K
    zmet = jnp.asarray([0.0, 0.01, 0.02], jnp.float32)
    lam, _ = cr.get_heatingcooling_rate(rho, u, 1.0, zmet, uvbg,
                                        jnp.ones(3, jnp.float32))
    lam = np.asarray(lam)
    d1 = lam[0] - lam[1]
    d2 = lam[1] - lam[2]
    assert d1 > 0, "metal cooling must reduce LambdaNet"
    assert np.isclose(d1, d2, rtol=1e-3), "linear in Z"


def test_uv_fluctuations(tmp_path):
    """Patchy reionization: regions with zreion < z see no UV
    background (get_local_UVBG_from_global, cooling_uvfluc.c:174-196)."""
    from mpgadget_tpu.physics.cooling import (UVFluctuationTable,
                                              local_uvbg, UVBG)
    from mpgadget_tpu.io.bigfile import BigFile
    from mpgadget_tpu.particles import pos_to_fixed
    from mpgadget_tpu.utils import constants as Cc

    ns, box = 8, 5000.0  # kpc/h -> 5 Mpc/h
    tab = np.full((ns, ns, ns), 20.0)
    tab[ns // 2:, :, :] = 2.0   # x > box/2 reionizes late
    path = str(tmp_path / "uvf")
    bf = BigFile(path, create=True)
    blk = bf.create_from_array("Zreion_Table", tab.ravel())
    blk.attrs["Nmesh"] = np.asarray([ns], "<u8")
    blk.attrs["BoxSize"] = np.asarray([5.0], "<f8")
    blk.attrs["Redshift"] = np.asarray([8.0], "<f8")

    uvf = UVFluctuationTable.from_file(path, box, Cc.CM_PER_KPC)
    # wrong box size must be rejected
    with pytest.raises(ValueError):
        UVFluctuationTable.from_file(path, 2 * box, Cc.CM_PER_KPC)

    pos = np.array([[1250.0, 2500, 2500],    # early patch (z_re = 20)
                    [3750.0, 2500, 2500]])   # late patch (z_re = 2)
    zr = np.asarray(uvf.zreion(jnp.asarray(pos_to_fixed(pos, box))))
    assert np.isclose(zr[0], 20.0, atol=1e-4)
    assert np.isclose(zr[1], 2.0, atol=1e-4)

    glob = UVBG(gJH0=1e-12, gJHe0=1e-13, gJHep=1e-14, epsH0=1e-24,
                epsHe0=1e-25, epsHep=1e-26, self_shield_dens=1e-3)
    loc = local_uvbg(glob, jnp.asarray(zr), redshift=6.0)
    assert np.isclose(float(loc.gJH0[0]), 1e-12)  # full UVB
    assert float(loc.gJH0[1]) == 0.0        # not yet: dark
    assert float(loc.epsHep[1]) == 0.0
    assert float(loc.self_shield_dens) == 1e-3

    # gating changes the equilibrium: neutral without UVB, ionized with
    from mpgadget_tpu.physics.cooling import (CoolingRates,
                                              CoolingParams, TreeCool)
    cr = CoolingRates(CoolingParams(SelfShieldingOn=False),
                      TreeCool(None, CoolingParams()))
    rho = jnp.full(2, 1e-4, jnp.float32)
    u = jnp.full(2, 2e12, jnp.float32)
    nf = cr.get_neutral_fraction(rho, u, loc, jnp.ones(2, jnp.float32))
    nf = np.asarray(nf)
    assert nf[1] > 50 * nf[0], nf  # dark patch far more neutral
