"""Golden-value checks for the travis example (full-physics tiny box,
the examples/travis/check-results.py:34-60 analog).

Checks that the measured matter P(k) at each output tracks the linear
input spectrum scaled by the growth factor: at z ~ 99..66 the box is
fully linear, so P_measured(k, a) ~= D1(a)^2 * P_lin(k, z_init) on all
resolved scales — the same check the reference CI runs on every push.

    python check_results.py [output_dir] [input_spectrum]
"""

import glob
import os
import sys

import numpy as np


def modecount_rebin(kk, pk, modes, minmodes=2, ndesired=16):
    logkk = np.log10(kk)
    mdlogk = (np.max(logkk) - np.min(logkk)) / ndesired
    istart = iend = 1
    count = 0
    k_list, pk_list = [kk[0]], [pk[0]]
    targetlogk = mdlogk + logkk[istart]
    while iend < np.size(logkk) - 1:
        count += modes[iend]
        iend += 1
        if count >= minmodes and logkk[iend - 1] >= targetlogk:
            pk_list.append(np.sum(modes[istart:iend]
                                  * pk[istart:iend]) / count)
            k_list.append(np.sum(modes[istart:iend]
                                 * kk[istart:iend]) / count)
            istart = iend
            targetlogk = mdlogk + logkk[istart]
            count = 0
    return np.array(k_list), np.array(pk_list)


def _read_power(fn):
    data = np.loadtxt(fn)
    kk, pk, modes = data[:, 0], data[:, 1], data[:, 2]
    good = kk > 0
    kk, pk = modecount_rebin(kk[good], pk[good], modes[good])
    d1 = 1.0
    with open(fn) as fh:
        for line in fh:
            if line.startswith("# D1"):
                d1 = float(line.split("=")[1].strip())
            if not line.startswith("#"):
                break
    return kk, pk, d1


def check_linear_growth(outdir, spectrum, rtol=0.25, nbins=5):
    """P(k, a) / P(k, a0) == (D1(a)/D1(a0))^2 on large scales, and the
    first output's shape matches the linear input spectrum."""
    files = sorted(glob.glob(os.path.join(outdir,
                                          "powerspectrum-*.txt")))
    assert len(files) >= 2, f"need >=2 power outputs, got {len(files)}"
    kk0, pk0, d1_0 = _read_power(files[0])
    nb = min(nbins, len(kk0))
    lin = np.loadtxt(spectrum)
    pk_lin = np.interp(kk0[:nb], lin[:, 0], lin[:, 1])
    ratio = pk0[:nb] / pk_lin
    # shape agreement: constant ratio over the large-scale bins
    np.testing.assert_allclose(ratio, np.mean(ratio), rtol=rtol,
                               atol=0)
    for fn in files[1:]:
        kk1, pk1, d1_1 = _read_power(fn)
        pk1i = np.interp(kk0[:nb], kk1, pk1)
        growth = pk1i / pk0[:nb]
        if (d1_1 / d1_0) ** 2 < 1.0 + 2 * rtol:
            continue    # growth smaller than the tolerance: no signal
        np.testing.assert_allclose(
            growth, (d1_1 / d1_0) ** 2, rtol=rtol, atol=0,
            err_msg=f"growth mismatch at {fn}")
    print(f"linear growth OK over {len(files)} outputs")


def check_gas_state(outdir):
    """Snapshot gas blocks are physical (entropy/density positive)."""
    from mpgadget_tpu.io.bigfile import BigFile
    snaps = sorted(glob.glob(os.path.join(outdir, "PART_*")))
    assert snaps, "no snapshots written"
    bf = BigFile(snaps[-1])
    rho = bf.open("0/Density").read()
    u = bf.open("0/InternalEnergy").read()
    assert np.all(rho > 0) and np.all(np.isfinite(rho))
    assert np.all(u > 0) and np.all(np.isfinite(u))
    print(f"gas state OK ({len(rho)} particles)")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "output"
    spectrum = sys.argv[2] if len(sys.argv) > 2 else "class_pk.dat"
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", ".."))
    check_linear_growth(outdir, spectrum)
    check_gas_state(outdir)
    print("all travis checks passed")
