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


def test_run_sharded_two_processes(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["MPG_REPO"] = REPO
        env["MPG_COORD"] = f"127.0.0.1:{port}"
        env["MPG_NPROC"] = "2"
        env["MPG_PID"] = str(pid)
        out = tmp_path / f"p{pid}"
        out.mkdir()
        env["MPG_OUT"] = str(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        raw, _ = p.communicate(timeout=1200)
        outs.append(raw.decode())
    for pid, (p, txt) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{txt}"
    results = []
    for txt in outs:
        lines = [ln for ln in txt.splitlines()
                 if ln.startswith("RESULT ")]
        assert lines, txt
        results.append(lines[-1])
    # identical conserved count + velocity checksum on both ranks
    assert results[0] == results[1], results
    n_valid, _, nsteps = results[0].split()[1:]
    assert int(n_valid) == 2048
    assert int(nsteps) == 2
