#!/usr/bin/env python
"""Compare two snapshots: per-particle displacement (matched by ID)
and the relative difference of the measured power spectra.

Equivalent of tools/compare_snap.py in the reference (which checks
bit-identity of regression snapshots); this version reports quantified
differences so cross-code comparisons (e.g. vs MP-Gadget output on the
same ICs) are one command.

Usage: python tools/compare_snap.py <snapA> <snapB> [ptype]
"""

import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from mpgadget_tpu.io.bigfile import BigFile  # noqa: E402


def compare(snap_a, snap_b, ptype=1):
    a, b = BigFile(snap_a), BigFile(snap_b)
    box = float(np.asarray(a.open("Header").attrs["BoxSize"])[0])
    ida = a.open(f"{ptype}/ID").read()
    idb = b.open(f"{ptype}/ID").read()
    pa = a.open(f"{ptype}/Position").read()
    pb = b.open(f"{ptype}/Position").read()
    oa, ob = np.argsort(ida), np.argsort(idb)
    if not np.array_equal(ida[oa], idb[ob]):
        print("ID sets differ: "
              f"{len(np.setdiff1d(ida, idb))} only in A, "
              f"{len(np.setdiff1d(idb, ida))} only in B")
        common = np.intersect1d(ida, idb)
        oa = oa[np.isin(ida[oa], common)]
        ob = ob[np.isin(idb[ob], common)]
    d = pa[oa] - pb[ob]
    d -= np.round(d / box) * box            # minimum image
    dr = np.linalg.norm(d, axis=1)
    print(f"N matched = {len(dr)}")
    print(f"displacement: max = {dr.max():.6g}  rms = "
          f"{np.sqrt((dr ** 2).mean()):.6g}  (box = {box:g})")

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from mpgadget_tpu.pm.gravity import measure_power, PMConfig
    from mpgadget_tpu.particles import pos_to_fixed
    ng = max(round(len(dr) ** (1 / 3)), 2)
    cfg = PMConfig(nmesh=2 * ng, boxsize=box)
    w = jnp.ones(len(dr), jnp.float32)
    ka = measure_power(jnp.asarray(pos_to_fixed(pa[oa], box)), w, cfg)
    kb = measure_power(jnp.asarray(pos_to_fixed(pb[ob], box)), w, cfg)
    sel = (ka.nmodes > 0) & (ka.power > 0) & (kb.power > 0)
    ratio = kb.power[sel] / ka.power[sel]
    print("P(k) ratio B/A: "
          f"min = {ratio.min():.4f}  max = {ratio.max():.4f}  "
          f"mean = {ratio.mean():.4f}")
    return dr, ratio


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    compare(sys.argv[1], sys.argv[2],
            int(sys.argv[3]) if len(sys.argv) > 3 else 1)
