"""End-to-end PM simulation: genic -> run -> linear growth check.

The analog of the reference's examples/travis CI test: generate ICs from
a linear power spectrum, evolve, and check the measured matter power
grows by the linear growth factor squared (valid on large scales).
Also round-trips snapshot write/read.
"""

import os
import numpy as np
import pytest

from mpgadget_tpu.cosmology import Cosmology
from mpgadget_tpu.utils import get_unitsystem, constants as C
from mpgadget_tpu.genic.main import run_genic
from mpgadget_tpu.params import (create_genic_parameter_set,
                                 create_gadget_parameter_set)
from mpgadget_tpu.main import build_simulation

UNITS = get_unitsystem(C.CM_PER_KPC, 1.989e43, 1e5)


def write_lcdm_like_table(path, amp=2e3):
    """A smooth red spectrum, P ~ k^-2 at high k, turnover at k_eq."""
    k = np.logspace(-4, 3, 300)  # h/Mpc
    keq = 0.01
    P = amp * k / (1 + (k / keq) ** 2) ** 1.5
    with open(path, "w") as fh:
        for ki, pi in zip(k, P):
            fh.write(f"{ki} {pi}\n")


@pytest.fixture(scope="module")
def ic_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    pk = d / "pk.txt"
    write_lcdm_like_table(str(pk))
    ps = create_genic_parameter_set()
    ps.parse_string(f"""
FileWithInputSpectrum = {pk}
OutputDir = {d}/ics
FileBase = IC
Omega0 = 0.3
OmegaBaryon = 0.0
OmegaLambda = 0.7
HubbleParam = 0.7
ProduceGas = 0
BoxSize = 64000
Redshift = 9
Ngrid = 32
Seed = 181170
UnitaryAmplitude = 1
DifferentTransferFunctions = 0
InputPowerRedshift = 9
""")
    ps.validate()
    path = run_genic(ps)
    return d, path


def test_genic_output_readable(ic_dir):
    from mpgadget_tpu.io.bigfile import BigFile
    from mpgadget_tpu.io import snapshot as snap_io
    d, path = ic_dir
    bf = BigFile(path)
    h = snap_io.read_header(bf)
    assert h.TotNumPart[1] == 32 ** 3
    assert h.BoxSize == 64000
    assert np.isclose(h.Time, 0.1)
    sp = snap_io.read_species(bf, 1, h)
    assert sp["pos"].shape == (32 ** 3, 3)
    assert np.all(sp["pos"] >= 0) and np.all(sp["pos"] < 64000)
    # masses from the mass table: total mass = Omega0 * rhocrit * V
    cp = Cosmology(Omega0=0.3, OmegaBaryon=0.0, OmegaLambda=0.7,
                   HubbleParam=0.7).init_units(UNITS)
    mtot = h.MassTable[1] * 32 ** 3
    assert np.isclose(mtot, 0.3 * cp.RhoCrit * 64000.0 ** 3, rtol=1e-2)


def test_pm_linear_growth(ic_dir):
    d, ic_path = ic_dir
    ps = create_gadget_parameter_set()
    ps.parse_string(f"""
InitCondFile = {ic_path}
OutputDir = {d}/output
OutputList = 0.2
TimeMax = 0.2
TimeLimitCPU = 10000
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
MassiveNuLinRespOn = 0
DensityIndependentSphOn = 0
RadiationOn = 0
TreeGravOn = 0
Nmesh = 64
MaxSizeTimestep = 0.03
""")
    ps.validate()
    sim, _ = build_simulation(ps)
    assert np.isclose(sim.atime, 0.1)
    # measure IC power
    sim.compute_forces()
    p_ic = sim.last_power
    nsteps = sim.run(verbose=False)
    assert nsteps >= 3
    assert np.isclose(sim.atime, 0.2, atol=1e-6)
    p_end = sim.last_power
    # compare growth on large scales (k < 0.25 * particle nyquist).
    # The PM-only force is deficient by f = exp(-k^2 rs^2) (split
    # smoothing, no tree): the EdS growing-mode exponent under a force
    # deficit f is p = (sqrt(1+24 f)-1)/4, so expect D^(2p) per mode
    # (z in [4,9] is matter-dominated, EdS is accurate).
    knyq = np.pi * 32 / 64.0
    D = sim.CP.GrowthFactor(0.2, 0.1)  # D(0.2)/D(0.1) > 1
    sel = (p_ic.k > 3 * 2 * np.pi / 64.0) & (p_ic.k < 0.25 * knyq)
    assert sel.sum() >= 3
    growth = p_end.power[sel] / p_ic.power[sel]
    rs = 1.5 * 64.0 / 64  # asmth * cell, Mpc/h
    f = np.exp(-(p_ic.k[sel] * rs) ** 2)
    # Integrate the exact linear ODE with the force deficit, starting
    # from the f=1 growing mode the Zel'dovich ICs impose (EdS, x=lna):
    # delta'' + 0.5 delta' = 1.5 f delta; IC delta=1, delta'=1.
    from scipy.integrate import solve_ivp

    def mode_growth(fk):
        sol = solve_ivp(
            lambda x, y: [y[1], 1.5 * fk * y[0] - 0.5 * y[1]],
            (np.log(0.1), np.log(0.2)), [1.0, 1.0], rtol=1e-8)
        return sol.y[0, -1]

    expect = np.array([mode_growth(fk) ** 2 for fk in f])
    assert np.all(np.abs(growth / expect - 1) < 0.08), \
        f"growth {growth} vs expected {expect}"
    # snapshot written at the sync point
    snap = os.path.join(str(d), "output", "PART_000")
    assert os.path.isdir(snap)
    # snapshot round-trips through the reader
    from mpgadget_tpu.io.bigfile import BigFile
    from mpgadget_tpu.io import snapshot as snap_io
    h = snap_io.read_header(BigFile(snap))
    assert np.isclose(h.Time, 0.2, atol=1e-6)
    sp = snap_io.read_species(BigFile(snap), 1, h)
    assert len(sp["pid"]) == 32 ** 3
    # IDs preserved
    assert set(np.unique(sp["pid"])) == set(range(1, 32 ** 3 + 1))
