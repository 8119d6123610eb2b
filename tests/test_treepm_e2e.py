"""TreePM end-to-end: with the tree supplying the short-range force the
total force is full gravity, so P(k) growth matches linear theory D^2
directly (no window correction) — the dm-small analog."""

import numpy as np
import pytest
from scipy.integrate import solve_ivp

from mpgadget_tpu.params import (create_genic_parameter_set,
                                 create_gadget_parameter_set)
from mpgadget_tpu.genic.main import run_genic
from mpgadget_tpu.main import build_simulation


def write_table(path):
    k = np.logspace(-4, 3, 300)
    P = 2e3 * k / (1 + (k / 0.01) ** 2) ** 1.5
    with open(path, "w") as fh:
        for ki, pi in zip(k, P):
            fh.write(f"{ki} {pi}\n")


def test_treepm_linear_growth(tmp_path):
    pk = tmp_path / "pk.txt"
    write_table(str(pk))
    gps = create_genic_parameter_set()
    gps.parse_string(f"""
FileWithInputSpectrum = {pk}
OutputDir = {tmp_path}/ics
FileBase = IC
Omega0 = 0.3
OmegaBaryon = 0.0
OmegaLambda = 0.7
HubbleParam = 0.7
ProduceGas = 0
BoxSize = 64000
Redshift = 9
Ngrid = 24
Nmesh = 24
Seed = 181170
UnitaryAmplitude = 1
DifferentTransferFunctions = 0
InputPowerRedshift = 9
""")
    gps.validate()
    ic_path = run_genic(gps)

    ps = create_gadget_parameter_set()
    ps.parse_string(f"""
InitCondFile = {ic_path}
OutputDir = {tmp_path}/output
OutputList = 0.12
TimeMax = 0.12
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
TreeGravOn = 1
TreeUseBH = 0
Nmesh = 48
MaxSizeTimestep = 0.1
MaxRMSDisplacementFac = 0.5
""")
    ps.validate()
    sim, _ = build_simulation(ps)
    sim.compute_forces()
    p_ic = sim.last_power
    # tree short-range accel is nonzero and different from PM
    tree_acc = np.asarray(sim.pdata.grav_accel)
    pm_acc = np.asarray(sim.pdata.grav_pm)
    assert np.linalg.norm(tree_acc) > 0
    assert np.linalg.norm(tree_acc) < np.linalg.norm(pm_acc)
    nsteps = sim.run(verbose=False)
    assert nsteps >= 2
    p_end = sim.last_power
    D = sim.CP.GrowthFactor(0.12, 0.1)
    knyq = np.pi * 24 / 64.0
    sel = (p_ic.k > 3 * 2 * np.pi / 64.0) & (p_ic.k < 0.4 * knyq)
    assert sel.sum() >= 3
    growth = p_end.power[sel] / p_ic.power[sel]
    # full gravity: expect D^2 within a few % (small transients remain)
    assert np.all(np.abs(growth / D ** 2 - 1) < 0.06), \
        f"growth {growth} vs D^2 {D ** 2}"
