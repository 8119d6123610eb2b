"""Worker for test_multihost: one of N jax.distributed processes
driving Simulation.run_sharded over the global (cross-process) device
mesh — the multi-host analog of the reference's MPI ranks
(system.h:43-111, petaio.c:33-68 NumWriters=1 write policy)."""

import os
import sys

sys.path.insert(0, os.environ["MPG_REPO"])

import jax  # noqa: E402

jax.distributed.initialize(
    coordinator_address=os.environ["MPG_COORD"],
    num_processes=int(os.environ["MPG_NPROC"]),
    process_id=int(os.environ["MPG_PID"]))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from mpgadget_tpu.run import Simulation, SimConfig  # noqa: E402
from mpgadget_tpu.particles import ParticleData  # noqa: E402
from mpgadget_tpu.cosmology import Cosmology  # noqa: E402
from mpgadget_tpu.timeline import Timeline  # noqa: E402
from mpgadget_tpu.utils import get_unitsystem, constants as C  # noqa: E402


def main():
    assert jax.process_count() == int(os.environ["MPG_NPROC"])
    print(f"proc {jax.process_index()}: {jax.local_device_count()} "
          f"local / {jax.device_count()} global devices", flush=True)
    units = get_unitsystem(C.CM_PER_KPC, 1.989e43, 1e5)
    rng = np.random.RandomState(2)
    box = 10000.0
    n = 2048
    pos = rng.uniform(0, box, (n, 3))
    pos[: n // 8] = box / 2 + rng.randn(n // 8, 3) * box * 0.02
    pos = np.mod(pos, box)
    pdata = ParticleData.from_numpy(
        pos, np.zeros((n, 3)), np.full(n, 10.0),
        np.ones(n, np.int32), np.arange(n) + 1, box)
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, HubbleParam=0.7,
                   TimeBegin=0.1).init_units(units)
    with_io = os.environ.get("MPG_IO", "") == "1"
    # MPG_IO: a SHORT run to the output time — the point is the
    # collective striped snapshot + distributed FOF + PIG across
    # processes at the sync point, not the stepping
    tl = Timeline([0.103], TimeIC=0.1, TimeMax=0.103) if with_io \
        else Timeline([0.2], TimeIC=0.1, TimeMax=0.2)
    cfg = SimConfig(boxsize=box, nmesh=16,
                    output_dir=os.environ["MPG_OUT"],
                    timeline=tl,
                    units=units, hydro_on=False, tree_grav_on=True,
                    random_particle_offset=0.0,
                    snapshot_with_fof=with_io,
                    fof_min_group_length=32)
    sim = Simulation(cp, pdata, cfg, time_ic=0.1)
    mesh = Mesh(np.array(jax.devices()), ("x",))
    max_steps = None if with_io else 2
    nsteps = sim.run_sharded(mesh, max_steps=max_steps, verbose=False)
    v = np.asarray(sim.pdata.vel)
    val = np.asarray(sim.pdata.valid)
    chk = float((v[val] ** 2).sum())
    print(f"RESULT {int(val.sum())} {chk:.6e} {nsteps}", flush=True)


if __name__ == "__main__":
    main()
