"""Reader for the per-step black hole detail stream
(BlackholeDetails/BH-Details-R0; the bhinfo.c binary analog).

Layout: consecutive float64 records of 12 columns:
    0 ID        1 atime        2 BlackholeMass   3 AccretionRate
    4 Density   5-7 Position   8 DynamicalMass   9 Mtrack
    10 Progenitors             11 KineticFdbkEnergy

    python tools/read_bh_details.py <OutputDir> [bh_id]
"""

import os
import sys

import numpy as np

COLUMNS = ("ID", "atime", "BlackholeMass", "AccretionRate", "Density",
           "x", "y", "z", "DynamicalMass", "Mtrack", "Progenitors",
           "KineticFdbkEnergy")
NCOL = len(COLUMNS)


def read_details(outdir):
    """Returns a (nrec, 12) float64 array of all BH detail records."""
    path = os.path.join(outdir, "BlackholeDetails", "BH-Details-R0")
    raw = np.fromfile(path, dtype=np.float64)
    assert raw.size % NCOL == 0, "corrupt BH details stream"
    return raw.reshape(-1, NCOL)


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "output"
    rec = read_details(outdir)
    print(f"{rec.shape[0]} records, {len(np.unique(rec[:, 0]))} BHs")
    if len(sys.argv) > 2:
        rec = rec[rec[:, 0] == float(sys.argv[2])]
    print(" ".join(COLUMNS))
    for row in rec:
        print(" ".join(f"{x:.6g}" for x in row))


if __name__ == "__main__":
    main()
