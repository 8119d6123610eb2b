"""Generate a HeII reionization history table for QSOLightupOn
(the tools/HeII_input_file_maker.py analog, simplified to the linear
history the reference example table uses).

Format consumed by physics/qso_lightup.py (and the reference's
load_heii_reion_hist, cooling_qso_lightup.c:138):
    line 1: quasar spectral index alpha_q
    line 2: instantaneous absorption threshold Emax [eV]
    then rows: redshift  XHeIII  long-MFP heating [erg/s/cm^3]

The linear history ramps XHeIII from 0 at z_start to 1 at z_end; the
uniform long-mean-free-path heating uses a constant comoving
emissivity between the same epochs (a coarse stand-in for the
HeII_heating.py quasar emissivity integral — tune `--lmfp-amp`).

    python tools/make_heii_reion_table.py out.txt --zstart 4 --zend 2.8
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("output")
    ap.add_argument("--zstart", type=float, default=4.0)
    ap.add_argument("--zend", type=float, default=2.8)
    ap.add_argument("--alpha-q", type=float, default=1.7)
    ap.add_argument("--emax", type=float, default=150.0)
    ap.add_argument("--nrows", type=int, default=100)
    ap.add_argument("--lmfp-amp", type=float, default=3.3e-33,
                    help="peak uniform heating, erg/s/cm^3")
    args = ap.parse_args()
    z = np.linspace(args.zstart, args.zend, args.nrows)
    x = np.clip((args.zstart - z) / (args.zstart - args.zend), 0, 1)
    # heating ramps up with the ionizing photon production rate
    lmfp = args.lmfp_amp * np.clip(x * (2 - x), 0, 1)
    lmfp[0] = 0.0
    with open(args.output, "w") as fh:
        fh.write("# HeII reionization history "
                 f"(linear, z={args.zstart}->{args.zend})\n")
        fh.write("# Units of heating rate (3rd column) are "
                 "erg/s/cm^3\n")
        fh.write(f"{args.alpha_q:f}\n{args.emax:f}\n")
        for zi, xi, li in zip(z, x, lmfp):
            fh.write(f"{zi:e} {xi:e} {li:e}\n")
    print(f"wrote {args.output} ({args.nrows} rows)")


if __name__ == "__main__":
    main()
