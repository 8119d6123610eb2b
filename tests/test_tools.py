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
