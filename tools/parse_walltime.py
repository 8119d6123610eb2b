#!/usr/bin/env python
"""Summarize a cpu.txt walltime log.

Equivalent of tools/parsebench.py in the reference: aggregates the
per-step "Name Seconds Percent" records written by utils/walltime.py
into totals per timer and seconds per step, to spot where the time
goes.

Usage: python tools/parse_walltime.py <cpu.txt> [timer ...]
"""

import sys
from collections import defaultdict


def parse(path, watch=()):
    steps = []
    cur = None
    for line in open(path):
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "Step":
            cur = {}
            steps.append((int(parts[1]), cur))
        elif cur is not None and len(parts) == 3 \
                and parts[0] != "Name":
            try:
                cur[parts[0]] = float(parts[1])
            except ValueError:
                pass
    if not steps:
        print("no steps found")
        return None
    # totals are cumulative in the log; report the last record and the
    # per-step increments of watched timers
    last = steps[-1][1]
    total = sum(last.values())
    print(f"{len(steps)} step records; cumulative totals:")
    for name in sorted(last, key=last.get, reverse=True):
        print(f"  {name:30s} {last[name]:10.2f}s "
              f"{100 * last[name] / max(total, 1e-12):5.1f}%")
    for name in watch:
        prev = 0.0
        incs = []
        for _, rec in steps:
            v = rec.get(name, prev)
            incs.append(v - prev)
            prev = v
        if incs:
            import statistics
            print(f"{name}: per-step mean "
                  f"{statistics.mean(incs):.3f}s max {max(incs):.3f}s")
    return last


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    parse(sys.argv[1], sys.argv[2:])
