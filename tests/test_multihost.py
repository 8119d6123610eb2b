"""Multi-host readiness: run_sharded on a 2-process CPU mesh via
jax.distributed with local processes (VERDICT r2 item 10; the
reference's MPI multi-rank layout, system.h:43-111).  Each process
owns 4 virtual devices; the 8-device global mesh spans both."""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(tmp_path, nproc, *, shared_out=None, extra_env=None,
            devices_per_proc=None):
    """Start ``nproc`` worker processes over one global mesh; return
    the decoded stdout of each after checking returncodes."""
    port = _free_port()
    if devices_per_proc is None:
        devices_per_proc = 8 // nproc
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                            f"{devices_per_proc}")
        env["MPG_REPO"] = REPO
        env["MPG_COORD"] = f"127.0.0.1:{port}"
        env["MPG_NPROC"] = str(nproc)
        env["MPG_PID"] = str(pid)
        if shared_out is None:
            out = tmp_path / f"p{pid}"
            out.mkdir(exist_ok=True)
        else:
            out = shared_out
        env["MPG_OUT"] = str(out)
        env.update(extra_env or {})
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        raw, _ = p.communicate(timeout=1800)
        outs.append(raw.decode())
    for pid, (p, txt) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{txt}"
    return outs


def _results(outs):
    results = []
    for txt in outs:
        lines = [ln for ln in txt.splitlines()
                 if ln.startswith("RESULT ")]
        assert lines, txt
        results.append(lines[-1])
    return results


def test_run_sharded_two_processes(tmp_path):
    outs = _launch(tmp_path, 2)
    results = _results(outs)
    # identical conserved count + velocity checksum on both ranks
    assert results[0] == results[1], results
    n_valid, _, nsteps = results[0].split()[1:]
    assert int(n_valid) == 2048
    assert int(nsteps) == 2


def test_two_process_collective_io_matches_single(tmp_path):
    """The striped snapshot writer's cross-process branches (_barrier,
    process_allgather of stripe sums, non-zero-process bf.open,
    parallel/snapshot.py) plus the distributed FOF + PIG under
    process_count=2 (petaio.c:622-700 collective write path).  The
    8-device global mesh is identical whether it spans 1 process or 2,
    so the striped output directories must match block-for-block."""
    import numpy as np
    sys.path.insert(0, REPO)
    from mpgadget_tpu.io.bigfile import BigFile

    out2 = tmp_path / "np2"
    out1 = tmp_path / "np1"
    out2.mkdir()
    out1.mkdir()
    _launch(tmp_path, 2, shared_out=out2, extra_env={"MPG_IO": "1"})
    _launch(tmp_path, 1, shared_out=out1, extra_env={"MPG_IO": "1"})

    snaps2 = sorted(p for p in os.listdir(out2) if p.startswith("PART"))
    snaps1 = sorted(p for p in os.listdir(out1) if p.startswith("PART"))
    assert snaps2 and snaps2 == snaps1, (snaps2, snaps1)
    pigs2 = sorted(p for p in os.listdir(out2) if p.startswith("PIG"))
    pigs1 = sorted(p for p in os.listdir(out1) if p.startswith("PIG"))
    assert pigs2 and pigs2 == pigs1, (pigs2, pigs1)

    for d in snaps2 + pigs2:
        bf2 = BigFile(str(out2 / d))
        bf1 = BigFile(str(out1 / d))
        names = sorted(bf1.blocks())
        assert sorted(bf2.blocks()) == names, d
        # same global mesh => same shard contents => identical rows
        for name in names:
            b2 = bf2.open(name)
            b1 = bf1.open(name)
            if b1.dtype is None:        # attribute-only (Header etc.)
                assert b2.attrs._attrs.keys() == b1.attrs._attrs.keys()
                for k in b1.attrs._attrs:
                    np.testing.assert_array_equal(
                        b2.attrs._attrs[k][1], b1.attrs._attrs[k][1],
                        err_msg=f"{d}/{name}:{k}")
                continue
            np.testing.assert_array_equal(b2.read(), b1.read(),
                                          err_msg=f"{d}/{name}")
