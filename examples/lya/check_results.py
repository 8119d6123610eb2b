"""Physics checks for the Quick-Lyman-alpha example (the hydro
validation target of SURVEY §7 step 6; the reference treats this
config as the forest sanity run, examples/lya/run.sh).

Run after `python -m mpgadget_tpu.genic.main paramfile.genic` and
`python -m mpgadget_tpu.main paramfile.gadget`:

    python check_results.py [output_dir]

Checks on the LAST snapshot (z ~ 2.0-2.3):

* the diffuse photoionized IGM follows the power-law
  temperature-density relation T = T0 (rho/rhobar)^(gamma-1) with
  T0 in [5e3, 5e4] K and gamma in [1.0, 1.9] (Hui & Gnedin 1997
  bounds; the TREECOOL_ep_2018p table puts it near T0 ~ 1e4,
  gamma ~ 1.6);
* the gas is highly ionized (median electron abundance > 0.8 per
  hydrogen) — reionization happened;
* QuickLymanAlphaProbability = 1 converted every gas particle above
  CritOverDensity x the SF threshold into stars: stars exist and NO
  remaining gas sits above ~2x the critical overdensity
  (sfr_eff.c quicklyamanalpha branch);
* mass is conserved across species (gas+stars == initial baryons).
"""

import glob
import os
import sys

import numpy as np


def check_lya(outdir):
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", ".."))
    from mpgadget_tpu.io.bigfile import BigFile
    from mpgadget_tpu.io import snapshot as snap_io

    snaps = sorted(glob.glob(os.path.join(outdir, "PART_*")))
    assert snaps, "no snapshots written"
    bf = BigFile(snaps[-1])
    hdr = snap_io.read_header(bf)
    atime = hdr.Time
    z = 1.0 / atime - 1.0
    assert z < 3.1, f"last snapshot too early (z={z:.2f})"

    ngas = int(hdr.TotNumPart[0])
    nstar = int(hdr.TotNumPart[4])
    assert ngas > 0, "no gas in the forest snapshot"
    assert nstar > 0, \
        "QuickLymanAlpha should have converted dense gas to stars"

    u = bf.open("0/InternalEnergy").read().astype(np.float64)
    rho = bf.open("0/Density").read().astype(np.float64)
    ne = bf.open("0/ElectronAbundance").read().astype(np.float64)

    # temperature from u (internal (km/s)^2) with the ionized mean
    # molecular weight
    XH = 0.76
    BOLTZMANN = 1.38066e-16
    PROTONMASS = 1.6726e-24
    uu = 1e10        # (1e5 cm/s)^2 -> erg/g
    mu = 4.0 / (1.0 + 3 * XH + 4 * XH * ne)
    temp = (2.0 / 3.0) * u * uu * mu * PROTONMASS / BOLTZMANN

    delta = rho / np.median(rho)
    # diffuse forest gas: fit log T = log T0 + (gamma-1) log delta
    sel = (delta > 0.1) & (delta < 5.0) & (temp > 100.0)
    assert sel.sum() > 100, "too little diffuse gas for the fit"
    A = np.vstack([np.ones(sel.sum()), np.log10(delta[sel])]).T
    coef, *_ = np.linalg.lstsq(A, np.log10(temp[sel]), rcond=None)
    T0 = 10 ** coef[0]
    gamma = 1.0 + coef[1]
    print(f"IGM relation: T0 = {T0:.3g} K, gamma = {gamma:.3f} "
          f"(z = {z:.2f})")
    assert 5e3 < T0 < 5e4, f"T0 = {T0:g} outside the forest range"
    assert 1.0 < gamma < 1.9, f"gamma = {gamma:g} unphysical"

    med_ne = float(np.median(ne))
    assert med_ne > 0.8, f"IGM not ionized (median ne = {med_ne:g})"

    # quick-LyA conversion is total above threshold: no cold dense gas
    # should survive well past the critical overdensity
    frac_dense = float((delta > 2000.0).mean())
    assert frac_dense < 0.01, \
        f"{frac_dense:.2%} of gas above the QuickLyA threshold"

    # baryon conservation: gas + stars vs TotNumPartInit gas mass
    mgas = bf.open("0/Mass").read().astype(np.float64).sum()
    mstar = bf.open("4/Mass").read().astype(np.float64).sum() \
        if nstar else 0.0
    n0 = int(hdr.TotNumPartInit[0])
    m0 = mgas + mstar
    # all gas particles started equal-mass; infer from the mode
    m_one = np.median(bf.open("0/Mass").read())
    expect = n0 * m_one
    assert abs(m0 - expect) < 0.05 * expect, \
        f"baryon mass drifted: {m0:g} vs {expect:g}"
    print(f"lya OK: {ngas} gas / {nstar} stars, median ne {med_ne:.2f}")


if __name__ == "__main__":
    check_lya(sys.argv[1] if len(sys.argv) > 1 else "output")
