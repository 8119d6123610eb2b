"""tools/ smoke + correctness tests (converter, comparer, HMF)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_snap(path, n=64, box=500.0, seed=1):
    from mpgadget_tpu.io.bigfile import BigFile
    from mpgadget_tpu.io import snapshot as snap_io
    rng = np.random.RandomState(seed)
    pos = rng.uniform(0, box, (n, 3))
    bf = BigFile(path, create=True)
    snap_io.write_species(bf, 1, pos=pos, vel=rng.randn(n, 3),
                          pid=np.arange(n, dtype=np.uint64) + 1,
                          mass=np.full(n, 2.0), atime=0.5)
    ntot = np.zeros(6, np.uint64)
    ntot[1] = n
    snap_io.write_header(bf, snap_io.SnapshotHeader(
        TotNumPart=ntot, MassTable=np.zeros(6), Time=0.5, TimeIC=0.5,
        BoxSize=box, Omega0=0.3, OmegaLambda=0.7, HubbleParam=0.7))
    return pos


def test_convert_hdf5(tmp_path):
    h5py = pytest.importorskip("h5py")
    snap = str(tmp_path / "PART_000")
    pos = make_snap(snap)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from convert_hdf5 import convert
    out = convert(snap, str(tmp_path / "snap.hdf5"))
    with h5py.File(out) as h5:
        assert h5["Header"].attrs["BoxSize"] == 500.0
        assert abs(h5["Header"].attrs["Redshift"] - 1.0) < 1e-12
        np.testing.assert_allclose(h5["PartType1/Coordinates"][:], pos)
        assert h5["PartType1/ParticleIDs"][0] == 1
        assert np.all(h5["PartType1/Masses"][:] == 2.0)


def test_compare_snap(tmp_path):
    a = str(tmp_path / "A")
    b = str(tmp_path / "B")
    make_snap(a, seed=1)
    make_snap(b, seed=1)  # identical
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from compare_snap import compare
    dr, ratio = compare(a, b)
    assert dr.max() == 0.0
    np.testing.assert_allclose(ratio, 1.0)


def test_hmf_from_fof(tmp_path):
    from mpgadget_tpu.io.bigfile import BigFile
    pig = str(tmp_path / "PIG_000")
    bf = BigFile(pig, create=True)
    masses = np.array([1.0, 1.0, 2.0, 8.0])
    bf.create_from_array("FOFGroups/Mass", masses.astype("<f4"))
    hdr = bf.create("Header")
    hdr.attrs["BoxSize"] = 1000.0
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from hmf_from_fof import hmf
    rows = hmf(pig, nbins=8)
    assert rows is not None
    assert int(rows[:, 2].sum()) == 4
    # total number density = 4 / (1 Mpc/h)^3
    dlnm = (np.log(8e10 * 1.001) - np.log(1e10 * 0.999)) / 8
    assert np.isclose((rows[:, 1] * dlnm).sum(), 4.0, rtol=1e-6)


def test_parse_walltime(tmp_path):
    log = tmp_path / "cpu.txt"
    log.write_text("Step 0\nName Seconds Percent\nPMgrav 1.0 50.0%\n"
                   "Tree 1.0 50.0%\n"
                   "Step 1\nName Seconds Percent\nPMgrav 3.0 60.0%\n"
                   "Tree 2.0 40.0%\n")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from parse_walltime import parse
    last = parse(str(log), ["PMgrav"])
    assert last == {"PMgrav": 3.0, "Tree": 2.0}


def test_convert_from_gadget_1(tmp_path):
    """Round-trip: synthetic Gadget-1 binary -> bigfile -> values match
    (velocity u*sqrt(a) -> peculiar, reference converter convention)."""
    import struct
    rng = np.random.RandomState(4)
    n1 = 8   # type 1 (massarr-carried mass)
    n0 = 4   # gas with mass block + u
    npart = [n0, n1, 0, 0, 0, 0]
    massarr = [0.0, 2.5, 0, 0, 0, 0]
    a = 0.25
    pos = rng.uniform(0, 1000.0, (n0 + n1, 3)).astype("<f4")
    vel = rng.randn(n0 + n1, 3).astype("<f4")
    ids = np.arange(1, n0 + n1 + 1, dtype="<u4")
    gasmass = np.full(n0, 0.5, "<f4")
    u = np.linspace(10, 40, n0).astype("<f4")

    hdr = struct.pack("<6i", *npart) + struct.pack("<6d", *massarr)
    hdr += struct.pack("<dd", a, 1 / a - 1)
    hdr += struct.pack("<2i", 0, 0)
    hdr += struct.pack("<6I", *npart)
    hdr += struct.pack("<2i", 0, 1)
    hdr += struct.pack("<4d", 1000.0, 0.3, 0.7, 0.7)
    hdr += struct.pack("<2i", 0, 0) + struct.pack("<6I", 0, 0, 0, 0, 0, 0)
    hdr += b"\x00" * (256 - len(hdr))

    def rec(payload):
        return struct.pack("<i", len(payload)) + payload \
            + struct.pack("<i", len(payload))

    snap = tmp_path / "snap_000"
    with open(snap, "wb") as fh:
        fh.write(rec(hdr))
        fh.write(rec(pos.tobytes()))
        fh.write(rec(vel.tobytes()))
        fh.write(rec(ids.tobytes()))
        fh.write(rec(gasmass.tobytes()))
        fh.write(rec(u.tobytes()))

    out = str(tmp_path / "bf")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "convert_from_gadget_1.py"),
         str(snap), out], check=True, env=env, timeout=300)

    from mpgadget_tpu.io.bigfile import BigFile
    bf = BigFile(out)
    hdrb = bf.open("Header")
    assert float(np.asarray(hdrb.attrs["Time"])[0]) == a
    assert int(np.asarray(hdrb.attrs["UsePeculiarVelocity"])[0]) == 1
    p1 = bf.open("1/Position").read()
    np.testing.assert_allclose(p1, pos[n0:], rtol=1e-6)
    v1 = bf.open("1/Velocity").read()
    np.testing.assert_allclose(v1, vel[n0:] * np.sqrt(a), rtol=1e-6)
    m0 = bf.open("0/Mass").read()
    np.testing.assert_allclose(m0, gasmass, rtol=1e-6)
    u0 = bf.open("0/InternalEnergy").read()
    np.testing.assert_allclose(u0, u, rtol=1e-6)
    i1 = bf.open("1/ID").read()
    np.testing.assert_array_equal(i1, ids[n0:])


def test_log_message_and_endrun(capsys):
    """Rank-gated logging + fatal endrun (endrun.c analog): single
    process message prints, endrun raises."""
    from mpgadget_tpu.utils.log import message, endrun
    import pytest
    message("hello %d", 42)
    out = capsys.readouterr().out
    assert "hello 42" in out
    with pytest.raises(RuntimeError, match="boom"):
        endrun(3, "boom %s", "x")
