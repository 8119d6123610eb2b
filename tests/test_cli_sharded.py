"""CLI-level production dispatch of the sharded driver.

``python -m mpgadget_tpu.main paramfile`` with more than one visible
device must run the SHARDED (and, with SplitGravityTimestepsOn, the
hierarchical per-particle-timebin) main loop end-to-end — the
reference is one binary whatever the rank count (gadget/main.c:56-131)
— and honor the HCI control files (stop/checkpoint/terminate,
libgadget/hci.c; run.c:391-398) with checkpoints through the
collective striped writer.
"""

import glob
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_pk(path, amp=2e3):
    k = np.logspace(-4, 3, 300)
    keq = 0.01
    P = amp * k / (1 + (k / keq) ** 2) ** 1.5
    with open(path, "w") as fh:
        for ki, pi in zip(k, P):
            fh.write(f"{ki} {pi}\n")


@pytest.fixture(scope="module")
def cli_ics(tmp_path_factory):
    """16^3 DM ICs at z=9 via the real genic driver."""
    from mpgadget_tpu.genic.main import run_genic
    from mpgadget_tpu.params import create_genic_parameter_set
    d = tmp_path_factory.mktemp("cli_sharded")
    pk = d / "pk.txt"
    _write_pk(str(pk))
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
Ngrid = 16
Seed = 181170
UnitaryAmplitude = 1
DifferentTransferFunctions = 0
InputPowerRedshift = 9
""")
    ps.validate()
    path = run_genic(ps)
    return d, path


def _paramfile(d, ic_path, outdir, extra=""):
    pf = os.path.join(str(d), f"paramfile_{os.path.basename(outdir)}")
    with open(pf, "w") as fh:
        fh.write(f"""
InitCondFile = {ic_path}
OutputDir = {outdir}
OutputList = 0.12
TimeMax = 0.12
TimeLimitCPU = 86400
SplitGravityTimestepsOn = 1
Omega0 = 0.3
OmegaLambda = 0.7
OmegaBaryon = 0.0
HubbleParam = 0.7
MassiveNuLinRespOn = 0
HydroOn = 0
CoolingOn = 0
StarformationOn = 0
DensityIndependentSphOn = 0
SnapshotWithFOF = 0
PartAllocFactor = 2.0
BlackHoleOn = 0
MetalReturnOn = 0
WindOn = 0
Nmesh = 32
{extra}
""")
    return pf


def _cli_env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=8"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
    env["MPG_JAX_CACHE"] = os.environ.get("MPG_JAX_CACHE",
                                          "/tmp/mpg_jax_cache")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_cli_dispatches_sharded_hierarchical(cli_ics, tmp_path):
    d, ic_path = cli_ics
    outdir = str(tmp_path / "out")
    pf = _paramfile(d, ic_path, outdir)
    res = subprocess.run(
        [sys.executable, "-m", "mpgadget_tpu.main", pf],
        cwd=REPO, env=_cli_env(), timeout=2400,
        capture_output=True, text=True)
    assert res.returncode == 0, res.stderr[-4000:]
    # the hierarchical sharded loop ran (not the single-device run())
    assert "[sharded-hier step" in res.stdout, res.stdout[-4000:]
    snaps = sorted(glob.glob(os.path.join(outdir, "PART_*")))
    assert snaps, "no snapshot written at the sync point"
    from mpgadget_tpu.io.bigfile import BigFile
    from mpgadget_tpu.io import snapshot as snap_io
    hdr = snap_io.read_header(BigFile(snaps[-1]))
    assert abs(float(hdr.Time) - 0.12) < 1e-3
    # striped collective output: one stripe file per shard
    stripes = os.listdir(os.path.join(snaps[-1], "1", "Position"))
    assert len([s for s in stripes if s.isdigit()]) == 8
    pos = BigFile(snaps[-1]).open("1/Position").read()
    assert pos.shape == (16 ** 3, 3)
    assert np.all(pos >= 0) and np.all(pos < 64000)


def test_cli_honors_stop_file(cli_ics, tmp_path):
    """A dropped ``stop`` file checkpoints through the striped writer
    and ends the run before any step (hci.c stop semantics)."""
    d, ic_path = cli_ics
    outdir = str(tmp_path / "out_stop")
    os.makedirs(outdir)
    open(os.path.join(outdir, "stop"), "w").close()
    pf = _paramfile(d, ic_path, outdir)
    res = subprocess.run(
        [sys.executable, "-m", "mpgadget_tpu.main", pf],
        cwd=REPO, env=_cli_env(), timeout=2400,
        capture_output=True, text=True)
    assert res.returncode == 0, res.stderr[-4000:]
    assert "[hci] stop requested" in res.stdout, res.stdout[-4000:]
    snaps = sorted(glob.glob(os.path.join(outdir, "PART_*")))
    assert snaps, "stop did not write a checkpoint"
    from mpgadget_tpu.io.bigfile import BigFile
    from mpgadget_tpu.io import snapshot as snap_io
    hdr = snap_io.read_header(BigFile(snaps[-1]))
    # checkpointed at the start time: the loop never advanced
    assert abs(float(hdr.Time) - 0.1) < 1e-3
    # the control file was consumed (hci_query semantics)
    assert not os.path.exists(os.path.join(outdir, "stop"))
