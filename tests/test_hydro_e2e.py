"""End-to-end cosmological hydro run (gas + DM), the examples/lya-scale
smoke test: genic with ProduceGas -> a few KDK steps with SPH -> snapshot
with gas thermal blocks -> restart."""

import numpy as np
import pytest

from mpgadget_tpu.params import (create_genic_parameter_set,
                                 create_gadget_parameter_set)
from mpgadget_tpu.genic.main import run_genic
from mpgadget_tpu.main import build_simulation


def write_table(path):
    k = np.logspace(-4, 3, 300)
    P = 1e3 * k / (1 + (k / 0.01) ** 2) ** 1.5
    with open(path, "w") as fh:
        for ki, pi in zip(k, P):
            fh.write(f"{ki} {pi}\n")


def test_hydro_cosmological_run(tmp_path):
    pk = tmp_path / "pk.txt"
    write_table(str(pk))
    gps = create_genic_parameter_set()
    gps.parse_string(f"""
FileWithInputSpectrum = {pk}
OutputDir = {tmp_path}/ics
FileBase = IC
Omega0 = 0.3
OmegaBaryon = 0.05
OmegaLambda = 0.7
HubbleParam = 0.7
ProduceGas = 1
BoxSize = 10000
Redshift = 9
Ngrid = 10
Seed = 99
DifferentTransferFunctions = 0
InputPowerRedshift = 9
""")
    gps.validate()
    ic_path = run_genic(gps)

    ps = create_gadget_parameter_set()
    ps.parse_string(f"""
InitCondFile = {ic_path}
OutputDir = {tmp_path}/out
OutputList = 0.115
TimeMax = 0.115
TimeLimitCPU = 10000
Omega0 = 0.3
OmegaLambda = 0.7
OmegaBaryon = 0.05
HubbleParam = 0.7
CoolingOn = 1
TreeCoolFile = /root/reference/examples/TREECOOL_fg_june11
StarformationOn = 0
WindOn = 0
SnapshotWithFOF = 0
BlackHoleOn = 0
MetalReturnOn = 0
MassiveNuLinRespOn = 0
DensityIndependentSphOn = 1
RadiationOn = 0
TreeGravOn = 1
TreeUseBH = 0
Nmesh = 20
MaxSizeTimestep = 0.05
InitGasTemp = 1000
""")
    ps.validate()
    sim, _ = build_simulation(ps)
    assert sim.has_gas
    nsteps = sim.run(verbose=False)
    assert nsteps >= 2
    # gas state is sane
    gas = np.asarray(sim.gas_mask)
    ent = np.asarray(sim.sph.entropy)[gas]
    rho = np.asarray(sim.sph.density)[gas]
    assert np.all(ent > 0)
    assert np.all(rho > 0)
    assert np.all(np.isfinite(np.asarray(sim.sph.hydro_accel)))
    # cooling ran: electron abundance was updated from its initial 1.0
    ne = np.asarray(sim.sph.ne)[gas]
    assert not np.allclose(ne, 1.0)
    assert np.all(ne >= 0)
    # hsml converged to sane values (~interparticle separation scale)
    hs = np.asarray(sim.pdata.hsml)[gas]
    sep = 10000 / 10
    assert np.all(hs > 0.3 * sep) and np.all(hs < 10 * sep)

    # snapshot contains gas blocks and restarts cleanly
    from mpgadget_tpu.io.bigfile import BigFile
    snap = f"{tmp_path}/out/PART_000"
    bf = BigFile(snap)
    for blk in ("0/InternalEnergy", "0/Density", "0/SmoothingLength",
                "0/Position", "1/Position"):
        assert blk in bf, blk
    u = bf.open("0/InternalEnergy").read()
    assert np.all(u > 0)

    # restart needs a later TimeMax (restarting AT TimeMax is a no-op)
    sim2, _ = build_simulation(ps, override={"TimeMax": 0.13,
                                             "OutputList": "0.13"},
                               snapshot=snap)
    assert sim2._gas_restore is not None
    sim2.run(max_steps=1, verbose=False)
    ent2 = np.asarray(sim2.sph.entropy)[np.asarray(sim2.gas_mask)]
    # restored entropy within f32 round-trip of the original
    np.testing.assert_allclose(np.sort(ent2), np.sort(ent), rtol=0.2)
