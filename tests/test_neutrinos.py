"""Linear-response neutrino tests (test_neutrinos_lra.c analog)."""

import numpy as np
import pytest

from mpgadget_tpu.physics.neutrinos_lra import (special_j, DeltaTotTable)
from mpgadget_tpu.cosmology import Cosmology
from mpgadget_tpu.utils import get_unitsystem, constants as C

UNITS = get_unitsystem(C.CM_PER_KPC, 1.989e43, 1e5)


def test_special_j():
    # J(0) = 1, monotonically decreasing, J(inf) -> 0
    assert special_j(0.0) == 1.0
    xs = np.linspace(0, 20, 100)
    js = special_j(xs)
    assert np.all(np.diff(js) <= 1e-12)
    assert js[-1] < 0.01
    # check against direct numerical integral at a few points
    from scipy.integrate import quad
    for x in (0.5, 2.0, 5.0):
        val, _ = quad(lambda q: np.sinc(q * x / np.pi) * q * q
                      / (np.exp(q) + 1), 0, 50, limit=200)
        norm, _ = quad(lambda q: q * q / (np.exp(q) + 1), 0, 50)
        assert np.isclose(special_j(x), val / norm, rtol=0.03, atol=7e-4)


@pytest.fixture(scope="module")
def table():
    cp = Cosmology(Omega0=0.3, OmegaBaryon=0.045, OmegaLambda=0.7,
                   HubbleParam=0.7, MNu=(0.1, 0.1, 0.1),
                   MassiveNuLinRespOn=True, TimeBegin=0.02)
    cp.init_units(UNITS)
    k = np.logspace(-2.5, 0, 40) / 1000.0  # internal 1/kpc
    delta_cdm = 10.0 * (k * 1000.0) ** -0.8
    return DeltaTotTable(cp, k, delta_cdm, 0.02, UNITS), cp, k, delta_cdm


def test_fslength_positive_and_monotonic(table):
    dt, cp, k, d0 = table
    f1 = dt.fslength(np.log(0.02), np.log(0.1))
    f2 = dt.fslength(np.log(0.02), np.log(0.5))
    assert 0 < f1 < f2
    assert dt.fslength(np.log(0.5), np.log(0.5)) == 0.0


def test_delta_nu_suppressed_small_scales(table):
    dt, cp, k, d0 = table
    # evolve the table through a few steps with growing delta_cdm
    for a in (0.05, 0.1, 0.2):
        growth = a / 0.02
        logk, nufac = dt.step(a, d0 * growth)
    dnu = dt.delta_nu_last
    # on large scales neutrinos cluster like CDM: ratio -> ~growth
    ratio = dnu / (d0 * growth)
    assert ratio[0] > 0.5, f"large-scale ratio {ratio[0]}"
    # free-streaming suppresses small scales
    assert ratio[-1] < 0.5 * ratio[0], \
        f"small-scale {ratio[-1]} vs large {ratio[0]}"
    assert np.all(np.diff(ratio) < 1e-3)  # monotone suppression
    # potential multiplier: >1 on large scales, ->1 at small scales
    assert nufac[0] > 1.0
    assert nufac[-1] < nufac[0]
    assert np.all(nufac >= 1.0)
    # f_nu is small: multiplier bounded by 1 + Omega_nu/Omega_cdm
    fnu = cp.ONu(1.0) / (cp.Omega0 - cp.ONu(1.0))
    assert np.all(nufac <= 1 + 1.5 * fnu)


def test_state_roundtrip(table):
    dt, cp, k, d0 = table
    st = dt.state_dict()
    dt2 = DeltaTotTable(cp, k, d0, 0.02, UNITS)
    dt2.load_state(st)
    np.testing.assert_allclose(np.array(dt2.delta_tot),
                               np.array(dt.delta_tot))
    # same output after reload
    a = 0.25
    d1 = dt.get_delta_nu_combined(a)
    d2 = dt2.get_delta_nu_combined(a)
    np.testing.assert_allclose(d1, d2, rtol=1e-10)


def test_neutrino_run_smoke(tmp_path):
    """examples/neutrinos analog: DM-only run with the linear-response
    correction enabled runs and produces finite forces."""
    import jax.numpy as jnp
    from mpgadget_tpu.params import (create_genic_parameter_set,
                                     create_gadget_parameter_set)
    from mpgadget_tpu.genic.main import run_genic
    from mpgadget_tpu.main import build_simulation
    k = np.logspace(-4, 3, 200)
    P = 2e3 * k / (1 + (k / 0.01) ** 2) ** 1.5
    with open(tmp_path / "pk.txt", "w") as fh:
        for ki, pi in zip(k, P):
            fh.write(f"{ki} {pi}\n")
    gps = create_genic_parameter_set()
    gps.parse_string(f"""
FileWithInputSpectrum = {tmp_path}/pk.txt
OutputDir = {tmp_path}/ics
FileBase = IC
Omega0 = 0.3
OmegaBaryon = 0.0
OmegaLambda = 0.7
HubbleParam = 0.7
ProduceGas = 0
BoxSize = 64000
Redshift = 24
Ngrid = 16
Seed = 3
MNue = 0.2
DifferentTransferFunctions = 0
InputPowerRedshift = 24
""")
    ic = run_genic(gps)
    ps = create_gadget_parameter_set()
    ps.parse_string(f"""
InitCondFile = {ic}
OutputDir = {tmp_path}/out
OutputList = 0.05
TimeMax = 0.05
TimeLimitCPU = 1000
Omega0 = 0.3
OmegaLambda = 0.7
OmegaBaryon = 0.0
HubbleParam = 0.7
CoolingOn = 0
StarformationOn = 0
WindOn = 0
SnapshotWithFOF = 0
BlackHoleOn = 0
MetalReturnOn = 0
MassiveNuLinRespOn = 1
MNue = 0.2
DensityIndependentSphOn = 0
RadiationOn = 1
TreeGravOn = 0
Nmesh = 32
MaxSizeTimestep = 0.05
""")
    sim, _ = build_simulation(ps)
    n = sim.run(verbose=False)
    assert n >= 2
    assert sim._nu_table_state is not None
    assert len(sim._nu_table_state.scalefact) >= 2
    assert np.all(np.isfinite(np.asarray(sim.pdata.grav_pm)))
    # neutrino response: multiplier table > 1 on large scales
    logk, nufac = sim._nu_table_state.step(
        sim.atime, np.sqrt(np.maximum(sim.last_power.power[
            sim.last_power.nmodes > 0], 0)))
    assert nufac[0] > 1.0
