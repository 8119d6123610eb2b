"""Cosmology background tests.

Mirrors the checks of the reference's test_cosmology.c / test_timefac.c:
Hubble function limits, growth function behavior, exact drift/kick factors
against analytic Einstein-de-Sitter results.
"""

import numpy as np
import pytest

from mpgadget_tpu.cosmology import Cosmology
from mpgadget_tpu.utils import get_unitsystem, constants as C
from mpgadget_tpu.timeline import Timeline, TIMEBASE
from mpgadget_tpu.timefac import ExactTimeFactors

KPC = C.CM_PER_KPC
UNITS = get_unitsystem(KPC, 1.989e43, 1e5)


def make_eds():
    """Einstein-de Sitter: Omega_m = 1, no radiation/Lambda."""
    # CMBTemperature=0 kills the constant massless-neutrino term the
    # reference adds even with RadiationOn=False (cosmology.c:80-83)
    cp = Cosmology(Omega0=1.0, OmegaBaryon=0.0, OmegaLambda=0.0,
                   HubbleParam=0.7, RadiationOn=False, CMBTemperature=0.0,
                   TimeBegin=0.01)
    return cp.init_units(UNITS)


def test_hubble_eds():
    cp = make_eds()
    # H(a) = H0 a^-3/2 in EdS
    for a in (0.1, 0.5, 1.0):
        assert np.isclose(cp.hubble_function(a), cp.Hubble * a ** -1.5,
                          rtol=1e-10)


def test_hubble_lcdm_z0():
    cp = Cosmology(Omega0=0.3, OmegaBaryon=0.045, OmegaLambda=0.7,
                   HubbleParam=0.7, RadiationOn=True)
    cp.init_units(UNITS)
    # At a=1 the radiation contributions are tiny; H ~= H0
    assert np.isclose(cp.hubble_function(1.0), cp.Hubble, rtol=2e-3)
    # Internal Hubble for kpc/h units is 0.1
    assert np.isclose(cp.Hubble, 0.1, rtol=1e-5)


def test_growth_eds():
    cp = make_eds()
    # D ~ a in EdS; GrowthFactor(astart, aend) = D(astart)/D(aend)
    assert np.isclose(cp.GrowthFactor(0.1, 1.0), 0.1, rtol=1e-4)
    assert np.isclose(cp.F_Omega(0.5), 1.0, rtol=1e-4)


def test_growth_lcdm_suppressed():
    cp = Cosmology(Omega0=0.3, OmegaBaryon=0.045, OmegaLambda=0.7,
                   HubbleParam=0.7, RadiationOn=False)
    cp.init_units(UNITS)
    # Lambda suppresses growth: D(1)/D(0.1) < 10
    assert cp.GrowthFactor(1.0, 0.1) < 10
    assert cp.GrowthFactor(1.0, 0.1) > 5
    # growth rate f ~ Omega_m(a)^0.55 at z=0
    om_z0 = 0.3
    assert np.isclose(cp.F_Omega(1.0), om_z0 ** 0.55, rtol=0.03)


def test_omega_nu_massless_vs_massive():
    cp0 = Cosmology(Omega0=0.3, OmegaBaryon=0.045, OmegaLambda=0.7,
                    HubbleParam=0.7, MNu=(0.0, 0.0, 0.0))
    # massless: Omega_nu(1) ~ N_eff * 7/8 (4/11)^{4/3} Omega_g
    ratio = cp0.ONu(1.0) / cp0.OmegaG
    expected = 3 * 7.0 / 8.0 * TNUCMB_4_3()
    assert np.isclose(ratio, expected, rtol=5e-3)

    cpm = Cosmology(Omega0=0.3, OmegaBaryon=0.045, OmegaLambda=0.7,
                    HubbleParam=0.7, MNu=(0.1, 0.1, 0.1))
    # Omega_nu h^2 ~= sum(mnu)/93.14 eV at z=0
    onu = cpm.ONu(1.0)
    assert np.isclose(onu * 0.7 ** 2, 0.3 / 93.14, rtol=0.03)
    # OmegaCDM excludes neutrinos
    assert cpm.OmegaCDM < cp0.OmegaCDM


def TNUCMB_4_3():
    from mpgadget_tpu.cosmology import TNUCMB
    return TNUCMB ** 4


def test_exact_drift_factor_eds():
    cp = make_eds()
    tl = Timeline([1.0], TimeIC=0.1, TimeMax=1.0)
    tf = ExactTimeFactors(cp, tl)
    t0 = tl.ti_from_loga(np.log(0.2))
    t1 = tl.ti_from_loga(np.log(0.4))
    # EdS drift: int da/(H a^3) = int a^{-3/2}/H0 = [-2 a^-1/2]/H0
    a0 = np.exp(tl.loga_from_ti(t0))
    a1 = np.exp(tl.loga_from_ti(t1))
    expect = 2.0 * (a0 ** -0.5 - a1 ** -0.5) / cp.Hubble
    assert np.isclose(tf.drift(t0, t1), expect, rtol=1e-6)
    # gravkick: int da/(H a^2) = int a^{-1/2}/H0 = [2 a^1/2]/H0
    expect_k = 2.0 * (a1 ** 0.5 - a0 ** 0.5) / cp.Hubble
    assert np.isclose(tf.gravkick(t0, t1), expect_k, rtol=1e-6)
    assert tf.drift(t0, t0) == 0.0


def test_timeline_roundtrip():
    tl = Timeline([0.2, 0.5, 1.0], TimeIC=0.1, TimeMax=1.0)
    # sync points: 0.1 (start), 0.2, 0.5, 1.0
    assert len(tl.syncpoints) == 4
    for loga in np.log([0.1, 0.15, 0.3, 0.77]):
        ti = tl.ti_from_loga(loga)
        assert abs(tl.loga_from_ti(ti) - loga) < 1e-9
    # ti=0 is the start
    assert tl.loga_from_ti(0) == pytest.approx(np.log(0.1))
    # syncpoint ti values are multiples of TIMEBASE
    for sp in tl.syncpoints:
        assert sp.ti % TIMEBASE == 0


def test_timeline_powers_of_two():
    from mpgadget_tpu.timeline import (round_down_power_of_two,
                                       get_timestep_bin, dti_from_timebin)
    assert round_down_power_of_two(7) == 4
    assert round_down_power_of_two(8) == 8
    assert round_down_power_of_two(TIMEBASE * 3) == TIMEBASE
    assert get_timestep_bin(1) == 0
    assert get_timestep_bin(8) == 3
    assert get_timestep_bin(9) == 3
    assert dti_from_timebin(0) == 0
    assert dti_from_timebin(5) == 32
