"""Plot / compare powerspectrum-*.txt outputs (the reference's
compare_two_plots.py + rebin_powerspectrum.py analog).

    python tools/plot_powerspectrum.py out/powerspectrum-0.2500.txt \
        [more files or a linear-theory table] [-o pk.png] [--ratio]

Any input whose name does not start with 'powerspectrum' is treated as
a two-column linear-theory table (k [h/Mpc], P [(Mpc/h)^3]) and drawn
as a dashed reference curve (scaled by the D1 recorded in the first
measured file when --scale-linear is given).
"""

import argparse
import os

import numpy as np


def modecount_rebin(kk, pk, modes, minmodes=2, ndesired=20):
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


def load_measured(fn):
    d1 = 1.0
    with open(fn) as fh:
        for line in fh:
            if line.startswith("# D1"):
                d1 = float(line.split("=")[1].strip())
            if not line.startswith("#"):
                break
    data = np.loadtxt(fn)
    good = data[:, 0] > 0
    k, p = modecount_rebin(data[good, 0], data[good, 1], data[good, 2])
    return k, p, d1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("-o", "--output", default="powerspectrum.png")
    ap.add_argument("--ratio", action="store_true",
                    help="plot ratios to the first file")
    ap.add_argument("--scale-linear", action="store_true",
                    help="scale linear tables by the first file's D1^2")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    ref = None
    d1_first = None
    for fn in args.files:
        base = os.path.basename(fn)
        if base.startswith("powerspectrum"):
            k, p, d1 = load_measured(fn)
            if d1_first is None:
                d1_first = d1
            label = base.replace("powerspectrum-", "a=") \
                .replace(".txt", "")
            style = dict()
        else:
            tab = np.loadtxt(fn)
            k, p = tab[:, 0], tab[:, 1]
            if args.scale_linear and d1_first is not None:
                p = p * d1_first ** 2
            label = base + " (linear)"
            style = dict(ls="--", color="k", lw=1)
        if args.ratio:
            if ref is None:
                ref = (k, p)
                continue
            p = p / np.interp(k, ref[0], ref[1])
        ax.plot(k, p, label=label, **style)
    ax.set_xscale("log")
    if not args.ratio:
        ax.set_yscale("log")
        ax.set_ylabel(r"$P(k)$ [(Mpc/$h$)$^3$]")
    else:
        ax.set_ylabel(f"ratio to {os.path.basename(args.files[0])}")
        ax.axhline(1.0, color="gray", lw=0.5)
    ax.set_xlabel(r"$k$ [$h$/Mpc]")
    ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig(args.output, dpi=150)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
