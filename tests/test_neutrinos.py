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


def test_hybrid_neutrino_particles_end_to_end(tmp_path):
    """Hybrid neutrino particles (genic/main.c:62-99,205-236 +
    gravpm.c:83-85): genic writes a type-2 species with truncated F-D
    thermal velocities and nufrac-weighted masses; in the run, before
    NuPartTime the particles are passive tracers (no gravity sourced
    or received), after it they gravitate."""
    import jax.numpy as jnp
    from mpgadget_tpu.params import (create_genic_parameter_set,
                                     create_gadget_parameter_set)
    from mpgadget_tpu.genic.main import run_genic
    from mpgadget_tpu.genic.thermal import NU_V0, ThermalVel
    from mpgadget_tpu.main import build_simulation
    from mpgadget_tpu.io.bigfile import BigFile
    from mpgadget_tpu.io import snapshot as snap_io

    k = np.logspace(-4, 3, 200)
    P = 2e3 * k / (1 + (k / 0.01) ** 2) ** 1.5
    with open(tmp_path / "pk.txt", "w") as fh:
        for ki, pi in zip(k, P):
            fh.write(f"{ki} {pi}\n")
    max_nuvel = 3000.0
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
NgridNu = 8
Max_nuvel = {max_nuvel}
Seed = 3
MNue = 0.2
MNum = 0.2
MNut = 0.2
DifferentTransferFunctions = 0
InputPowerRedshift = 24
""")
    ic = run_genic(gps)

    # --- IC contents: species 2 present, nufrac mass, F-D speeds ---
    bf = BigFile(ic)
    hdr = snap_io.read_header(bf)
    assert int(hdr.TotNumPart[2]) == 8 ** 3
    from mpgadget_tpu.cosmology import Cosmology
    cp = Cosmology(Omega0=0.3, OmegaBaryon=0.0, OmegaLambda=0.7,
                   HubbleParam=0.7, MNu=(0.2, 0.2, 0.2),
                   TimeBegin=0.04).init_units(UNITS)
    atime = 1.0 / 25.0
    v_th = NU_V0(atime, 3 * cp.ONu.kBtnu / 0.6, 1e5)
    tv = ThermalVel(v_th, max_fd=max_nuvel / v_th)
    nufrac = tv.total_frac
    assert 1e-4 < nufrac < 0.999    # truncation really truncates
    assert np.isclose(hdr.FractionNuInParticles, nufrac, rtol=1e-6)
    want_m2 = nufrac * cp.ONu(1.0) * cp.RhoCrit * 64000.0 ** 3 / 8 ** 3
    assert np.isclose(hdr.MassTable[2], want_m2, rtol=1e-5)
    # thermal speeds: bounded by Max_nuvel (peculiar, file units
    # v_pec = internal/a), far above the Zel'dovich flows
    v2 = bf.open("2/Velocity").read()
    sp2 = np.linalg.norm(v2, axis=1)
    v1 = bf.open("1/Velocity").read()
    assert sp2.mean() > 10 * np.linalg.norm(v1, axis=1).mean()
    assert sp2.max() < max_nuvel + np.linalg.norm(v1, axis=1).max()

    # --- run: passive tracers before NuPartTime ---
    def mk(sub, nu_part_time, drop_nu=False):
        ps = create_gadget_parameter_set()
        ps.parse_string(f"""
InitCondFile = {ic}
OutputDir = {tmp_path}/{sub}
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
HybridNeutrinosOn = 1
Vcrit = {max_nuvel}
NuPartTime = {nu_part_time}
MNue = 0.2
MNum = 0.2
MNut = 0.2
DensityIndependentSphOn = 0
RadiationOn = 1
TreeGravOn = 1
Nmesh = 32
MaxSizeTimestep = 0.05
""")
        sim, _ = build_simulation(ps)
        if drop_nu:
            keep = np.asarray(sim.pdata.ptype) != 2
            sim.pdata = sim.pdata.replace(
                valid=jnp.asarray(np.asarray(sim.pdata.valid) & keep))
        return sim

    sim_tr = mk("tr", nu_part_time=0.5)         # tracers throughout
    assert sim_tr.CP.hybrid_nu_tracer(sim_tr.atime)
    sim_tr.compute_forces()
    pt = np.asarray(sim_tr.pdata.ptype)
    val = np.asarray(sim_tr.pdata.valid)
    is_nu = val & (pt == 2)
    # tracers receive NO PM force (hybrid_nu_gravpm_is_active)
    assert np.allclose(np.asarray(sim_tr.pdata.grav_pm)[is_nu], 0.0)
    # ...and exert none: CDM forces equal a run with the nu rows gone
    sim_no = mk("no", nu_part_time=0.5, drop_nu=True)
    sim_no.compute_forces()
    is_cdm = val & (pt == 1)
    np.testing.assert_allclose(
        np.asarray(sim_tr.pdata.grav_pm)[is_cdm],
        np.asarray(sim_no.pdata.grav_pm)[is_cdm], atol=1e-7, rtol=1e-5)
    # the tree force agrees to opening-criterion accuracy only: the
    # dropped rows change the Morton block partition, so the two
    # walks make different (both admissible) opening decisions
    at = np.asarray(sim_tr.pdata.grav_accel)[is_cdm]
    an = np.asarray(sim_no.pdata.grav_accel)[is_cdm]
    scale = np.linalg.norm(an, axis=1)
    assert (np.linalg.norm(at - an, axis=1)
            <= 0.05 * scale + 3e-3).all()

    # --- after NuPartTime the particles gravitate ---
    sim_gr = mk("gr", nu_part_time=0.01)
    assert not sim_gr.CP.hybrid_nu_tracer(sim_gr.atime)
    sim_gr.compute_forces()
    pm_nu = np.asarray(sim_gr.pdata.grav_pm)[is_nu]
    assert np.abs(pm_nu).max() > 0
    d = np.abs(np.asarray(sim_gr.pdata.grav_pm)[is_cdm]
               - np.asarray(sim_no.pdata.grav_pm)[is_cdm])
    assert d.max() > 0      # nu mass now sources the PM force
