"""Rank-gated logging + fatal abort (message/endrun analog,
libgadget/utils/endrun.c + system.c message): on a multi-process mesh
only rank 0 speaks, and a fatal error tears down every process instead
of deadlocking the collectives that the surviving ranks are waiting
in."""

import os
import sys
import time

_T0 = time.monotonic()


def _rank():
    try:
        import jax
        return jax.process_index()
    except Exception:
        return 0


def message(fmt, *args, all_ranks=False):
    """Rank-0 print with an elapsed-walltime prefix (message(),
    system.c).  all_ranks=True prints on every process, tagged."""
    rank = _rank()
    if rank != 0 and not all_ranks:
        return
    txt = fmt % args if args else fmt
    tag = f"[{time.monotonic() - _T0:9.2f}] "
    if all_ranks and rank != 0:
        tag += f"(rank {rank}) "
    print(tag + txt, flush=True)


def endrun(code, fmt, *args):
    """Fatal abort on every process (endrun, endrun.c:47): prints on
    the failing rank, then kills the whole multi-process job — a
    RuntimeError on one rank would leave the others blocked in a
    collective forever."""
    txt = fmt % args if args else fmt
    print(f"ENDRUN {code} (rank {_rank()}): {txt}",
          file=sys.stderr, flush=True)
    try:
        import jax
        multi = jax.process_count() > 1
    except Exception:
        multi = False
    if multi:
        sys.stderr.flush()
        os._exit(int(code) or 1)
    raise RuntimeError(txt)
