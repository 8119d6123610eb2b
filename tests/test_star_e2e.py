"""Galaxy-formation end-to-end smoke (the examples/star-small analog):
gas+DM with cooling, star formation, and winds through the full loop."""

import os
import numpy as np
import pytest

from mpgadget_tpu.params import (create_genic_parameter_set,
                                 create_gadget_parameter_set)
from mpgadget_tpu.genic.main import run_genic
from mpgadget_tpu.main import build_simulation


def test_star_formation_run(tmp_path):
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
OmegaBaryon = 0.05
OmegaLambda = 0.7
HubbleParam = 0.7
ProduceGas = 1
BoxSize = 5000
Redshift = 9
Ngrid = 8
Seed = 7
DifferentTransferFunctions = 0
InputPowerRedshift = 9
""")
    ic = run_genic(gps)
    ps = create_gadget_parameter_set()
    # quick-lya star formation converts cold dense gas wholesale:
    # deterministic way to exercise the conversion machinery
    ps.parse_string(f"""
InitCondFile = {ic}
OutputDir = {tmp_path}/out
OutputList = 0.12
TimeMax = 0.12
TimeLimitCPU = 10000
Omega0 = 0.3
OmegaLambda = 0.7
OmegaBaryon = 0.05
HubbleParam = 0.7
CoolingOn = 1
TreeCoolFile = /root/reference/examples/TREECOOL_fg_june11
StarformationOn = 1
StarformationCriterion = density
QuickLymanAlphaProbability = 1.0
CritOverDensity = 0.01
CritPhysDensity = 1e-6
WindOn = 1
WindModel = sh03
SnapshotWithFOF = 0
BlackHoleOn = 0
MetalReturnOn = 1
MassiveNuLinRespOn = 0
DensityIndependentSphOn = 1
RadiationOn = 0
TreeGravOn = 1
TreeUseBH = 0
Nmesh = 16
MaxSizeTimestep = 0.08
InitGasTemp = 200
MinGasTemp = 5
""")
    sim, _ = build_simulation(ps)
    nsteps = sim.run(verbose=False)
    assert nsteps >= 1
    ptype = np.asarray(sim.pdata.ptype)
    valid = np.asarray(sim.pdata.valid)
    nstars = int(((ptype == 4) & valid).sum())
    # quick-lya with p=1 and a tiny threshold: cold gas became stars
    assert nstars > 0, "no stars formed"
    # sfr.txt written
    assert os.path.exists(tmp_path / "out" / "sfr.txt")
    # mass conservation: total mass unchanged by conversions
    m0 = 0.3 * sim.CP.RhoCrit * 5000.0 ** 3
    mtot = float(np.asarray(sim.pdata.mass)[valid].sum())
    assert np.isclose(mtot, m0, rtol=1e-3)
    # entropy finite and positive for remaining gas
    gas = valid & (ptype == 0)
    if gas.any():
        ent = np.asarray(sim.sph.entropy)[gas]
        assert np.all(np.isfinite(ent)) and np.all(ent > 0)
