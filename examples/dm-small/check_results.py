"""Golden-value checks for the dm-small example (the
examples/dm-small/check_results.py analog of the reference CI).

Run after `python -m mpgadget_tpu.genic.main paramfile.genic` and
`python -m mpgadget_tpu.main paramfile.gadget`:

    python check_results.py [output_dir] [input_spectrum]

Checks:
* the measured P(k) at the first output tracks the linear input
  spectrum on large scales (rtol 0.07 at the IC redshift, 0.18 after
  nonlinear growth — the reference tolerances);
* the FOF catalog contains halos and the most massive exceeds
  9e12 Msun (check_hmf analog; exact masses differ from the reference
  list because the IC realization differs).
"""

import glob
import os
import sys

import numpy as np


def modecount_rebin(kk, pk, modes, minmodes=2, ndesired=20):
    """Rebin P(k) so each bin holds enough modes (reference helper)."""
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


def check_power(outdir, spectrum, rtol_shape=0.1, rtol_growth=0.18):
    """Large-scale shape of the first output == the linear input
    spectrum; growth between first and last outputs == D1 ratio
    squared (check_power analog with reference tolerances)."""
    files = sorted(glob.glob(os.path.join(outdir,
                                          "powerspectrum-*.txt")))
    assert files, "no power spectra written"
    kk, pk, d1_0 = _read_power(files[0])
    lin = np.loadtxt(spectrum)
    pk_lin = np.interp(kk, lin[:, 0], lin[:, 1])
    nb = min(6, len(kk))
    ratio = pk[:nb] / pk_lin[:nb]
    np.testing.assert_allclose(ratio, np.mean(ratio),
                               rtol=rtol_shape, atol=0)
    if len(files) > 1:
        kk1, pk1, d1_1 = _read_power(files[-1])
        pk1i = np.interp(kk[:nb], kk1, pk1)
        growth = pk1i / pk[:nb]
        np.testing.assert_allclose(growth, (d1_1 / d1_0) ** 2,
                                   rtol=rtol_growth, atol=0)
    print(f"P(k) OK over {len(files)} outputs")


def check_golden_pk(outdir, golden_file, rtol=5e-2):
    """Per-bin golden P(k) regression for the reduced CI config
    (deterministic seed 181170, Ngrid 24, Nmesh 48, a=0.15): the
    un-gated analog of the reference CI's per-halo golden masses
    (check_results.py:15-26) for a box too small to form halos."""
    files = sorted(glob.glob(os.path.join(outdir,
                                          "powerspectrum-*.txt")))
    assert files, "no power spectra written"
    got = np.loadtxt(files[-1])
    want = np.loadtxt(golden_file)
    assert got.shape[0] == want.shape[0], \
        f"bin count changed: {got.shape} vs {want.shape}"
    np.testing.assert_allclose(got[:, 0], want[:, 0], rtol=1e-3)
    np.testing.assert_allclose(got[:, 1], want[:, 1], rtol=rtol,
                               err_msg="golden P(k) regression")
    print(f"golden P(k) OK ({got.shape[0]} bins, rtol {rtol})")


def check_hmf(outdir):
    from mpgadget_tpu.io.bigfile import BigFile
    pigs = sorted(glob.glob(os.path.join(outdir, "PIG_*")))
    assert pigs, "no FOF catalogs written"
    bf = BigFile(pigs[-1])
    hh = float(np.asarray(bf.open("Header").attrs["HubbleParam"])
               .reshape(-1)[0])
    masses = bf.open("FOFGroups/Mass").read() * 1e10 / hh
    assert masses.size > 0, "no halos found"
    assert np.max(masses) > 9e12, f"max halo mass {np.max(masses):g}"
    print(f"FOF OK: {masses.size} halos, max {np.max(masses):.3g} Msun")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "output"
    spectrum = sys.argv[2] if len(sys.argv) > 2 else "class_pk_9.dat"
    check_power(outdir, spectrum)
    check_hmf(outdir)
    print("all dm-small checks passed")
