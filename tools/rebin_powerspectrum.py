#!/usr/bin/env python
"""Rebin a powerspectrum-<a> output onto coarser log-k bins.

The in-line power spectra (pm/gravity.py, powerspectrum.c analog) are
saved at the PM mesh's native binning; for plotting and for comparing
runs with different Nmesh it is standard to rebin onto a fixed log-k
grid, weighting each native bin by its mode count.

Reference analog: tools/rebin_rsd_power.py / the rebinning in
tools/plot_powerspectrum.py.

Usage: python tools/rebin_powerspectrum.py powerspectrum-0.2500.txt \
           --nbins 30 [--kmin K] [--kmax K] [-o OUT]
"""

import argparse

import numpy as np


def rebin(k, p, modes, nbins, kmin=None, kmax=None):
    good = (k > 0) & (modes > 0) & np.isfinite(p)
    k, p, modes = k[good], p[good], modes[good]
    kmin = kmin or k.min() * 0.999
    kmax = kmax or k.max() * 1.001
    edges = np.geomspace(kmin, kmax, nbins + 1)
    idx = np.clip(np.digitize(k, edges) - 1, 0, nbins - 1)
    wsum = np.bincount(idx, weights=modes, minlength=nbins)
    ksum = np.bincount(idx, weights=modes * k, minlength=nbins)
    psum = np.bincount(idx, weights=modes * p, minlength=nbins)
    ok = wsum > 0
    return (ksum[ok] / wsum[ok], psum[ok] / wsum[ok],
            wsum[ok].astype(np.int64))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("infile")
    ap.add_argument("--nbins", type=int, default=30)
    ap.add_argument("--kmin", type=float, default=None)
    ap.add_argument("--kmax", type=float, default=None)
    ap.add_argument("-o", "--output", default=None)
    args = ap.parse_args()

    data = np.loadtxt(args.infile)
    k, p = data[:, 0], data[:, 1]
    modes = data[:, 2] if data.shape[1] > 2 else np.ones_like(k)
    kk, pp, nn = rebin(k, p, modes, args.nbins, args.kmin, args.kmax)
    out = np.column_stack([kk, pp, nn])
    if args.output:
        np.savetxt(args.output, out, header="k P(k) modes")
        print(f"wrote {args.output} ({len(kk)} bins)")
    else:
        for row in out:
            print(f"{row[0]:.6e} {row[1]:.6e} {int(row[2])}")


if __name__ == "__main__":
    main()
