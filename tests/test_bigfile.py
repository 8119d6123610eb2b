"""bigfile format round-trip + byte-compatibility layout tests."""

import os
import numpy as np

from mpgadget_tpu.io import BigFile


def test_roundtrip_scalar(tmp_path):
    bf = BigFile(str(tmp_path / "snap"), create=True)
    data = np.arange(1000, dtype="<i8")
    bf.create_from_array("0/ID", data)
    back = bf.open("0/ID")
    assert back.dtype == np.dtype("<i8")
    assert back.size == 1000
    np.testing.assert_array_equal(back.read(), data)
    np.testing.assert_array_equal(back[100:200], data[100:200])


def test_roundtrip_vector_multifile(tmp_path):
    bf = BigFile(str(tmp_path / "snap"), create=True)
    rng = np.random.RandomState(4)
    pos = rng.uniform(size=(999, 3)).astype("<f8")
    bf.create_from_array("1/Position", pos, Nfile=4)
    back = bf.open("1/Position")
    assert back.Nfile == 4
    assert back.nmemb == 3
    np.testing.assert_array_equal(back.read(), pos)
    # partial read across stripe boundaries
    np.testing.assert_array_equal(back.read(200, 400), pos[200:600])


def test_attrs(tmp_path):
    bf = BigFile(str(tmp_path / "snap"), create=True)
    blk = bf.create("Header")
    blk.attrs["BoxSize"] = 25000.0
    blk.attrs["TotNumPart"] = np.array([0, 0, 128 ** 3, 0, 0, 0])
    blk.attrs["MassTable"] = np.zeros(6)
    blk.attrs["CodeVersion"] = "mpgadget_tpu 0.1"
    # reopen
    back = bf.open("Header")
    assert float(back.attrs["BoxSize"][0]) == 25000.0
    assert back.attrs["TotNumPart"][2] == 128 ** 3
    assert back.attrs["CodeVersion"] == "mpgadget_tpu 0.1"


def test_header_layout(tmp_path):
    """The on-disk header must match the C library's text format."""
    bf = BigFile(str(tmp_path / "snap"), create=True)
    data = np.arange(10, dtype="<f4")
    bf.create_from_array("0/Mass", data)
    txt = open(tmp_path / "snap/0/Mass/header").read().splitlines()
    assert txt[0] == "DTYPE: <f4"
    assert txt[1] == "NMEMB: 1"
    assert txt[2] == "NFILE: 1"
    # per-file sizes are in rows, not bytes (bigfile.c foffset arithmetic)
    assert txt[3].startswith("000000: 10 : ")
    # data file is named 000000 and contains raw bytes
    raw = open(tmp_path / "snap/0/Mass/000000", "rb").read()
    assert raw == data.tobytes()
    # checksum: sysv byte sum
    expected = sum(raw) & 0xFFFFFFFF
    assert f"000000: 10 : {expected} :" in txt[3]


def test_attr_layout(tmp_path):
    bf = BigFile(str(tmp_path / "snap"), create=True)
    blk = bf.create("Header")
    blk.attrs["Time"] = 0.5
    line = open(tmp_path / "snap/Header/attr-v2").read().strip()
    parts = line.split()
    assert parts[0] == "Time"
    assert parts[1] == "<f8"
    assert parts[2] == "1"
    assert bytes.fromhex(parts[3]) == np.float64(0.5).tobytes()
    assert "#HUMANE" in line


def test_blocks_listing(tmp_path):
    bf = BigFile(str(tmp_path / "snap"), create=True)
    bf.create("Header")
    bf.create_from_array("0/ID", np.arange(5, dtype="<i8"))
    bf.create_from_array("1/ID", np.arange(5, dtype="<i8"))
    names = bf.blocks()
    assert "Header" in names
    assert "0/ID" in names
    assert "1/ID" in names
    assert "0/ID" in bf
    assert "0/Nope" not in bf


def test_native_io_and_reference_c_crosscheck(tmp_path):
    """The native (OpenMP C) striped writer produces files the
    REFERENCE's own C bigfile library reads back bit-exactly,
    checksums included."""
    import subprocess
    import sys
    from mpgadget_tpu.io import _native

    rng = np.random.RandomState(8)
    data = rng.randn(1000, 3).astype("<f4")
    bf = BigFile(str(tmp_path / "snap"), create=True)
    bf.create_from_array("0/TestBlock", data, Nfile=3)
    # our own reader round-trips
    back = bf.open("0/TestBlock").read()
    assert np.array_equal(back, data)

    ref_src = "/root/reference/depends/bigfile/src"
    if not os.path.exists(os.path.join(ref_src, "bigfile.c")):
        pytest.skip("reference bigfile C source unavailable")
    prog = tmp_path / "readback.c"
    prog.write_text(r'''
#include <stdio.h>
#include <stdlib.h>
#include "bigfile.h"
int main(int argc, char** argv) {
    BigFile bf = {0};
    BigBlock bb = {0};
    if (big_file_open(&bf, argv[1])) return 1;
    if (big_file_open_block(&bf, &bb, "0/TestBlock")) return 2;
    if (bb.Nfile != 3) return 3;
    BigArray arr = {0};
    BigBlockPtr ptr = {0};
    if (big_block_seek(&bb, &ptr, 0)) return 4;
    float* buf = malloc(sizeof(float) * 3 * bb.size);
    size_t dims[2] = {bb.size, 3};
    big_array_init(&arr, buf, "<f4", 2, dims, NULL);
    if (big_block_read(&bb, &ptr, &arr)) return 5;
    double s = 0;
    for (size_t i = 0; i < 3 * bb.size; i++) s += buf[i];
    printf("%zu %.8e\n", (size_t) bb.size, s);
    if (big_block_close(&bb)) return 6;
    big_file_close(&bf);
    return 0;
}
''')
    exe = tmp_path / "readback"
    subprocess.run(
        ["gcc", "-I", ref_src, str(prog),
         os.path.join(ref_src, "bigfile.c"), "-o", str(exe)],
        check=True, capture_output=True, timeout=120)
    out = subprocess.run([str(exe), str(tmp_path / "snap")],
                         check=True, capture_output=True, timeout=60,
                         text=True).stdout.split()
    assert int(out[0]) == 1000
    assert np.isclose(float(out[1]), float(data.sum()), rtol=1e-6)
