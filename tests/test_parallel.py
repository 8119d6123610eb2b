"""Multi-device sharding tests on the virtual 8-device CPU mesh.

Covers the SURVEY §2.2 layer: slab domain exchange (exchange.c analog),
ghost strips (treewalk export/import analog), pencil FFT (petapm.c
analog) and the full sharded TreePM step — each checked for numerical
agreement with the single-device path.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mpgadget_tpu.parallel.mesh import (make_sim_mesh, shard_particles,
                                        sharded_pm_step)
from mpgadget_tpu.parallel.decomp import (exchange_to_slabs,
                                          ghost_strips, slab_of)
from mpgadget_tpu.parallel.pfft import pencil_r2c, pencil_c2r
from mpgadget_tpu.parallel.treepm import (make_sim_mesh as tree_mesh,
                                          sharded_treepm_step)

NDEV = 8


@pytest.fixture(scope="module")
def mesh8():
    devs = jax.devices("cpu")[:NDEV]
    assert len(devs) == NDEV
    return Mesh(np.array(devs), ("x",))


def test_pencil_fft_roundtrip_matches_rfftn(mesh8):
    """Pencil r2c under shard_map == jnp.fft.rfftn (petapm.c:278-320)."""
    nmesh = 16
    rng = np.random.RandomState(0)
    vol = rng.randn(nmesh, nmesh, nmesh).astype(np.float32)

    def fwd(local):
        return pencil_r2c(local, "x")

    def bwd(pencil):
        return pencil_c2r(pencil, "x")

    fwd_s = jax.jit(shard_map(
        fwd, mesh=mesh8, in_specs=P("x"), out_specs=P(None, "x")))
    bwd_s = jax.jit(shard_map(
        bwd, mesh=mesh8, in_specs=P(None, "x"), out_specs=P("x")))

    pencil = np.asarray(fwd_s(vol))
    ref = np.asarray(jnp.fft.rfftn(jnp.asarray(vol)))
    assert np.allclose(pencil, ref, rtol=1e-4, atol=1e-4)

    back = np.asarray(bwd_s(jnp.asarray(pencil)))
    assert np.allclose(back, vol, rtol=1e-4, atol=1e-5)


def test_exchange_to_slabs_routes_and_conserves(mesh8):
    """domain_exchange analog: every row lands on its x-slab owner and
    mass/ids are conserved (exchange.c:105-191)."""
    n_loc = 64
    n = n_loc * NDEV
    rng = np.random.RandomState(1)
    ipos = rng.randint(0, 2 ** 32, (n, 3)).astype(np.uint32)
    ids = np.arange(n, dtype=np.int32)
    valid = rng.rand(n) < 0.75
    mass = rng.rand(n).astype(np.float32)

    def run(ipos, ids, mass, valid):
        (ipos2, ids2, mass2), valid2, ovf = exchange_to_slabs(
            (ipos, ids, mass), ipos, valid, "x", 3, bucket_cap=n_loc)
        own = slab_of(ipos2, 3)
        me = jax.lax.axis_index("x")
        misrouted = jnp.sum((valid2 & (own != me)).astype(jnp.int32))
        return (ipos2, ids2, mass2, valid2,
                jax.lax.psum(ovf.astype(jnp.int32), "x"),
                jax.lax.psum(misrouted, "x"))

    run_s = jax.jit(shard_map(
        run, mesh=mesh8,
        in_specs=(P("x"), P("x"), P("x"), P("x")),
        out_specs=(P("x"), P("x"), P("x"), P("x"), P(), P())))
    ipos2, ids2, mass2, valid2, ovf, misrouted = run_s(
        jnp.asarray(ipos), jnp.asarray(ids), jnp.asarray(mass),
        jnp.asarray(valid))

    assert not bool(np.any(np.asarray(ovf))), "exchange overflow"
    assert int(misrouted) == 0
    v2 = np.asarray(valid2)
    got_ids = np.sort(np.asarray(ids2)[v2])
    assert np.array_equal(got_ids, np.sort(ids[valid]))
    assert np.isclose(float(np.sum(np.asarray(mass2)[v2])),
                      float(np.sum(mass[valid])), rtol=1e-6)


def test_exchange_small_bucket_keeps_capacity(mesh8):
    """When S*bucket_cap < n_loc the exchange must keep the caller's
    fixed row capacity (pad, not shrink) — a shrink broke tracing on
    small meshes and would drop rows (exchange.c capacity contract)."""
    n_loc = 128
    n = n_loc * NDEV
    rng = np.random.RandomState(3)
    ipos = rng.randint(0, 2 ** 32, (n, 3)).astype(np.uint32)
    ids = np.arange(n, dtype=np.int32)
    # few enough valid rows that bucket_cap=8 (S*E=64 < n_loc=128)
    # does not overflow: <=4 rows per (src, dst) bucket
    valid = np.zeros(n, bool)
    valid[::8] = True

    def run(ipos, ids, valid):
        (ipos2, ids2), valid2, ovf = exchange_to_slabs(
            (ipos, ids), ipos, valid, "x", 3, bucket_cap=8)
        assert ipos2.shape[0] == n_loc   # capacity preserved
        own = slab_of(ipos2, 3)
        me = jax.lax.axis_index("x")
        misrouted = jnp.sum((valid2 & (own != me)).astype(jnp.int32))
        return (ipos2, ids2, valid2,
                jax.lax.psum(ovf.astype(jnp.int32), "x"),
                jax.lax.psum(misrouted, "x"))

    run_s = jax.jit(shard_map(
        run, mesh=mesh8, in_specs=(P("x"), P("x"), P("x")),
        out_specs=(P("x"), P("x"), P("x"), P(), P())))
    ipos2, ids2, valid2, ovf, misrouted = run_s(
        jnp.asarray(ipos), jnp.asarray(ids), jnp.asarray(valid))
    assert not bool(np.any(np.asarray(ovf))), "exchange overflow"
    assert int(misrouted) == 0
    got_ids = np.sort(np.asarray(ids2)[np.asarray(valid2)])
    assert np.array_equal(got_ids, np.sort(ids[valid]))


def test_ghost_strips_cover_rcut_neighbors(mesh8):
    """Ghost rows == exactly the neighbor particles within rcut of the
    slab faces (the pseudo-particle/export analog)."""
    n_loc = 32
    n = n_loc * NDEV
    rng = np.random.RandomState(2)
    # place each shard's particles inside its own slab
    x = np.concatenate([
        ((s + rng.rand(n_loc)) / NDEV * 2 ** 32).astype(np.uint32)
        for s in range(NDEV)])
    ipos = np.stack([x, rng.randint(0, 2 ** 32, n).astype(np.uint32),
                     rng.randint(0, 2 ** 32, n).astype(np.uint32)],
                    axis=1)
    ids = np.arange(n, dtype=np.int32)
    valid = np.ones(n, bool)
    rcut_box = 0.03

    def run(ipos, ids, valid):
        (g_ids,), g_valid, ovf = ghost_strips(
            (ids,), ipos, valid, "x", 3, rcut_box, ghost_cap=n_loc)
        return g_ids, g_valid, jax.lax.psum(ovf.astype(jnp.int32), "x")

    run_s = jax.jit(shard_map(
        run, mesh=mesh8, in_specs=(P("x"), P("x"), P("x")),
        out_specs=(P("x"), P("x"), P())))
    g_ids, g_valid, ovf = run_s(jnp.asarray(ipos), jnp.asarray(ids),
                                jnp.asarray(valid))
    assert not bool(np.any(np.asarray(ovf)))

    g_ids = np.asarray(g_ids).reshape(NDEV, -1)
    g_valid = np.asarray(g_valid).reshape(NDEV, -1)
    xf = x.astype(np.float64) / 2 ** 32
    for s in range(NDEV):
        lo, hi = s / NDEV, (s + 1) / NDEV
        dl = np.minimum(np.abs(xf - lo), 1 - np.abs(xf - lo))
        dh = np.minimum(np.abs(xf - hi), 1 - np.abs(xf - hi))
        own = slab_of(jnp.asarray(ipos), 3) == s
        want = set(ids[~np.asarray(own)
                       & ((dl < rcut_box) | (dh < rcut_box))])
        got = set(g_ids[s][g_valid[s]])
        assert got == want, f"shard {s}: {got ^ want}"


def test_sharded_pm_matches_single_chip(mesh8):
    """GSPMD PM step accel == single-chip _pm_force_kernel accel."""
    from mpgadget_tpu.pm.gravity import _pm_force_kernel
    nmesh = 16
    n = 512
    boxsize = 1000.0
    rng = np.random.RandomState(3)
    ipos = jnp.asarray(rng.randint(0, 2 ** 32, (n, 3)), jnp.uint32)
    mass = jnp.ones(n, jnp.float32)
    vel = jnp.zeros((n, 3), jnp.float32)

    acc_ref, _, _ = _pm_force_kernel(ipos, mass, nmesh, boxsize,
                                     43007.1, 1.5,
                                     compute_potential=False)

    mesh = make_sim_mesh(jax.devices("cpu")[:NDEV], axis="shard")
    step = sharded_pm_step(mesh, nmesh, boxsize, 43007.1, 1.5,
                           axis="shard")
    ipos_s, vel_s, mass_s = shard_particles((ipos, vel, mass), mesh)
    ipos2, vel2 = step(ipos_s, vel_s, mass_s, jnp.float32(1.0),
                       jnp.float32(0.0))
    acc = np.asarray(vel2)      # dkick=1, vel0=0
    assert np.allclose(acc, np.asarray(acc_ref), rtol=1e-3, atol=1e-5)


def test_sharded_treepm_step_matches_single_device(mesh8):
    """Full sharded TreePM step (exchange + ghosts + local trees +
    pencil PM) reproduces the single-device tree+PM accelerations."""
    from mpgadget_tpu.gravity.treepm import TreeGravity, tree_force
    from mpgadget_tpu.pm.gravity import _pm_force_kernel

    nmesh = 16
    boxsize = 1000.0
    n_local = 128
    n = n_local * NDEV
    rng = np.random.RandomState(4)
    ipos_np = rng.randint(0, 2 ** 32, (n, 3)).astype(np.uint32)
    ipos = jnp.asarray(ipos_np)
    mass = jnp.ones(n, jnp.float32)
    valid = jnp.asarray(np.arange(n) % n_local < n_local // 2)
    vel = jnp.zeros((n, 3), jnp.float32)
    amag = jnp.zeros(n, jnp.float32)

    tg = TreeGravity(boxsize=boxsize, nmesh=nmesh, asmth=1.0, rcut=1.0,
                     G=43007.1, softening=boxsize / 50.0,
                     tree_use_bh=1, bh_opening_angle=0.3,
                     with_potential=False)

    # single-device reference on the valid rows
    kw1 = tg.force_kwargs(n)
    kw1["with_potential"] = False
    res = tree_force(ipos, mass, valid, amag, **kw1)
    acc_pm, _, _ = _pm_force_kernel(ipos, mass * valid, nmesh, boxsize,
                                    43007.1, 1.0,
                                    compute_potential=False)
    acc_ref = np.asarray(res.accel + acc_pm)

    mesh = tree_mesh(jax.devices("cpu")[:NDEV])
    tree_kwargs = tg.force_kwargs(n_local + 2 * max(256, n_local // 4))
    tree_kwargs["with_potential"] = False
    step = sharded_treepm_step(
        mesh, nmesh=nmesh, boxsize=boxsize, gconst=43007.1, asmth=1.0,
        rcut=1.0, softening=boxsize / 50.0, err_tol_force_acc=0.002,
        n_local=n_local, tree_kwargs=tree_kwargs)
    pid = jnp.arange(n, dtype=jnp.int64)
    parts = shard_particles((ipos, vel, mass, valid, amag, pid), mesh,
                            axis="x")
    ipos2, vel2, mass2, valid2, amag2, pid2, ovf = step(
        *parts, jnp.float32(1.0), jnp.float32(0.0))
    assert not int(ovf)

    # rows moved between shards: match particles by position key
    def keyed(ip, acc, ok):
        ip, acc = np.asarray(ip), np.asarray(acc)
        order = np.lexsort((ip[:, 2], ip[:, 1], ip[:, 0]))
        sel = np.asarray(ok)[order]
        return ip[order][sel], acc[order][sel]

    ip_r, acc_r = keyed(ipos, acc_ref, np.asarray(valid))
    ip_s, acc_s = keyed(ipos2, np.asarray(vel2), np.asarray(valid2))
    assert np.array_equal(ip_r, ip_s), "particles lost in exchange"
    denom = np.linalg.norm(acc_r, axis=1) + 1e-8
    rel = np.linalg.norm(acc_s - acc_r, axis=1) / denom
    # local trees differ from the global tree near slab faces (node
    # geometry drives opening): demand close agreement, not identity
    assert np.percentile(rel, 95) < 2e-2, np.percentile(rel, 95)
    assert np.max(rel) < 0.2, np.max(rel)


def test_simulation_run_sharded(mesh8, tmp_path):
    """Simulation.run_sharded drives the sharded TreePM step from the
    integer timeline and conserves particles/momentum."""
    from mpgadget_tpu.cosmology import Cosmology
    from mpgadget_tpu.particles import ParticleData
    from mpgadget_tpu.run import Simulation, SimConfig
    from mpgadget_tpu.timeline import Timeline
    from mpgadget_tpu.utils import get_unitsystem, constants as CC

    UN = get_unitsystem(CC.CM_PER_KPC, 1.989e43, 1e5)
    rng = np.random.RandomState(7)
    box = 50000.0
    n = 1024
    pos = rng.uniform(0, box, (n, 3))
    pdata = ParticleData.from_numpy(
        pos, np.zeros((n, 3)), np.full(n, 1.0),
        np.ones(n, np.int32), np.arange(n) + 1, box)
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, HubbleParam=0.7,
                   TimeBegin=0.1).init_units(UN)
    timeline = Timeline([0.2], TimeIC=0.1, TimeMax=0.2)
    cfg = SimConfig(boxsize=box, nmesh=16, output_dir=str(tmp_path),
                    timeline=timeline, units=UN, hydro_on=False,
                    tree_grav_on=True, asmth=1.0, rcut=1.0,
                    random_particle_offset=0.0)
    sim = Simulation(cp, pdata, cfg, time_ic=0.1)
    nsteps = sim.run_sharded(mesh8, max_steps=3, verbose=False)
    assert nsteps == 3
    valid = np.asarray(sim.pdata.valid)
    assert valid.sum() == n, "particles lost across exchanges"
    vel = np.asarray(sim.pdata.vel)
    assert np.all(np.isfinite(vel))
    # momentum conservation (equal masses): net momentum stays small
    # relative to the momentum scale
    p = vel[valid].sum(axis=0)
    scale = np.abs(vel[valid]).sum(axis=0) + 1e-30
    assert np.all(np.abs(p) / scale < 0.05), (p, scale)
    # structure grew: particles moved
    assert np.std(vel[valid]) > 0


def test_multi_hop_ghosts_cover_wide_strips(mesh8):
    """ghost_strips_multi with K hops collects neighbors farther than
    one slab away (lifts the round-2 single-hop constraint,
    treewalk.c:325 exports reach any rank)."""
    from mpgadget_tpu.parallel.decomp import (ghost_strips_multi,
                                              geometric_boundaries)
    n_loc = 64
    n = n_loc * NDEV
    rng = np.random.RandomState(5)
    x = np.concatenate([
        ((s + rng.rand(n_loc)) / NDEV * 2 ** 32).astype(np.uint32)
        for s in range(NDEV)])
    ipos = np.stack([x, rng.randint(0, 2 ** 32, n).astype(np.uint32),
                     rng.randint(0, 2 ** 32, n).astype(np.uint32)],
                    axis=1)
    ids = np.arange(n, dtype=np.int32)
    valid = np.ones(n, bool)
    width = 0.3            # strip spans >2 slabs (slab width = 0.125)
    hops = 3

    def run(ipos, ids, valid):
        bounds = geometric_boundaries(3)
        (g_ids,), g_valid, ovf = ghost_strips_multi(
            (ids,), ipos, valid, "x", bounds, width,
            ghost_cap=3 * n_loc, hops=hops)
        return g_ids, g_valid, jax.lax.psum(ovf.astype(jnp.int32), "x")

    run_s = jax.jit(shard_map(
        run, mesh=mesh8, in_specs=(P("x"), P("x"), P("x")),
        out_specs=(P("x"), P("x"), P())))
    g_ids, g_valid, ovf = run_s(jnp.asarray(ipos), jnp.asarray(ids),
                                jnp.asarray(valid))
    assert not bool(np.any(np.asarray(ovf)))
    g_ids = np.asarray(g_ids).reshape(NDEV, -1)
    g_valid = np.asarray(g_valid).reshape(NDEV, -1)
    xf = x.astype(np.float64) / 2 ** 32
    for s in range(NDEV):
        lo, hi = s / NDEV, (s + 1) / NDEV
        dl = np.minimum(np.abs(xf - lo), 1 - np.abs(xf - lo))
        dh = np.minimum(np.abs(xf - hi), 1 - np.abs(xf - hi))
        inside = (xf >= lo) & (xf < hi)
        want = set(ids[~inside & ((dl < width) | (dh < width))])
        got = set(g_ids[s][g_valid[s]])
        assert got == want, f"shard {s}: missing {want - got}, " \
            f"extra {got - want}"


@pytest.fixture(scope="module")
def sph_box():
    """Particles pre-placed on their owning slab, SPH-ready."""
    from mpgadget_tpu.sph.density import sph_density, DensityParams
    n_local = 256
    n = n_local * NDEV
    rng = np.random.RandomState(6)
    x = np.concatenate([
        ((s + rng.rand(n_local)) / NDEV * 2 ** 32).astype(np.uint32)
        for s in range(NDEV)])
    ipos = np.stack([x, rng.randint(0, 2 ** 32, n).astype(np.uint32),
                     rng.randint(0, 2 ** 32, n).astype(np.uint32)],
                    axis=1)
    boxsize = 1000.0
    mean_sep = boxsize / round(n ** (1 / 3))
    par = DensityParams(kernel_type=1, max_iter=30)   # cubic
    d = dict(
        ipos=jnp.asarray(ipos), mass=jnp.ones(n, jnp.float32),
        valid=jnp.ones(n, bool),
        hsml0=jnp.full(n, 2.0 * mean_sep, jnp.float32),
        vel=jnp.asarray(rng.randn(n, 3).astype(np.float32) * 10.0),
        entvar=jnp.ones(n, jnp.float32), boxsize=boxsize, par=par,
        n_local=n_local)
    d["single"] = sph_density(d["ipos"], d["mass"], d["valid"],
                              d["hsml0"], d["vel"], d["vel"],
                              d["entvar"], par, boxsize)
    return d


def test_sharded_sph_density_matches_single(mesh8, sph_box):
    """Sharded density (hmax ghost strips + per-shard fused solve) ==
    single-device sph_density (density.c:235 at scale)."""
    from mpgadget_tpu.parallel.sph import (sharded_sph_density,
                                           density_caps)
    b = sph_box
    n_local = b["n_local"]
    hops = 4
    ghost_cap = 2 * n_local
    n_strips = 2 * hops - 1          # 2*hops == NDEV: k=4 single sign
    n_rows = n_local + n_strips * ghost_cap
    caps = density_caps(n_rows, b["par"])
    args = shard_particles((b["ipos"], b["vel"], b["mass"], b["valid"],
                            b["hsml0"], b["entvar"]), mesh8, axis="x")
    hsml = args[4]
    for _ in range(6):
        fn = sharded_sph_density(
            mesh8, n_local=n_local, ghost_cap=ghost_cap, par=b["par"],
            boxsize=b["boxsize"], log2s=3, caps=dict(caps), hops=hops)
        out, flags = fn(args[0], args[1], args[2], args[3], hsml,
                        args[5])
        bad = {k: int(v) for k, v in flags.items() if int(v)}
        if not bad:
            break
        if "pair" in bad:            # capacity retry (driver protocol)
            caps["ll"] *= 2
            caps["src"] *= 2
        if "pack" in bad:
            caps["nleaf"] *= 2
            caps["sr"] *= 2
        assert "group" not in bad and "ghost" not in bad, bad
        if set(bad) == {"strip"}:
            hsml = out["hsml"]       # strips too narrow: re-run wider
    else:
        raise AssertionError("capacity/strip retries exhausted")
    ref = b["single"]
    for k in ("hsml", "density", "egy_wt_density", "div_vel",
              "curl_vel", "dhsml_density_factor"):
        a = np.asarray(out[k])
        r = np.asarray(ref[k])
        scale = np.abs(r).max() + 1e-20
        np.testing.assert_allclose(a, r, rtol=5e-3,
                                   atol=2e-5 * scale, err_msg=k)


def test_sharded_hydro_matches_single(mesh8, sph_box):
    """Sharded hydro force == single-device hydro_force
    (hydra.c:154 at scale)."""
    from mpgadget_tpu.sph.hydra import hydro_force, HydroParams
    from mpgadget_tpu.parallel.sph import sharded_hydro, density_caps
    b = sph_box
    ref_d = b["single"]
    hp = HydroParams(kernel_type=1)
    atime, hubble, dloga = 1.0, 0.1, 0.01
    ref = hydro_force(
        b["ipos"], b["mass"], b["valid"], ref_d["hsml"], b["vel"],
        b["entvar"], ref_d["density"], ref_d["egy_wt_density"],
        ref_d["div_vel"], ref_d["curl_vel"], ref_d["dhsml_egy_factor"],
        hp, b["boxsize"], atime, hubble, dloga)

    n_local = b["n_local"]
    hops = 4
    ghost_cap = 2 * n_local
    n_rows = n_local + (2 * hops - 1) * ghost_cap
    caps = density_caps(n_rows, hp)
    args = shard_particles(
        (b["ipos"], b["vel"], b["mass"], b["valid"], ref_d["hsml"],
         b["entvar"], ref_d["density"], ref_d["egy_wt_density"],
         ref_d["div_vel"], ref_d["curl_vel"],
         ref_d["dhsml_egy_factor"]), mesh8, axis="x")
    for _ in range(6):
        fn = sharded_hydro(mesh8, n_local=n_local, ghost_cap=ghost_cap,
                           par=hp, boxsize=b["boxsize"], log2s=3,
                           caps=dict(caps), hops=hops)
        out, flags = fn(*args, jnp.float32(atime), jnp.float32(hubble),
                        jnp.float32(dloga))
        bad = {k: int(v) for k, v in flags.items() if int(v)}
        if not bad:
            break
        if "pair" in bad:
            caps["ll"] *= 2
            caps["src"] *= 2
        if "pack" in bad:
            caps["nleaf"] *= 2
            caps["sr"] *= 2
        assert "group" not in bad and "ghost" not in bad, bad
    else:
        raise AssertionError("capacity retries exhausted")
    acc = np.asarray(out["hydro_accel"])
    acc_r = np.asarray(ref["hydro_accel"])
    scale = np.abs(acc_r).max() + 1e-20
    np.testing.assert_allclose(acc, acc_r, rtol=5e-3,
                               atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(out["dt_entropy"]),
                               np.asarray(ref["dt_entropy"]),
                               rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["max_signal_vel"]),
                               np.asarray(ref["max_signal_vel"]),
                               rtol=5e-3, atol=1e-5)


def test_run_sharded_gas_dm(mesh8, tmp_path):
    """Production sharded driver runs a gas+DM box end-to-end: the full
    TreePM + SPH density/hydro stack per step, balanced boundaries,
    psum'd timestep policy (run.c:358-800 at scale)."""
    from mpgadget_tpu.cosmology import Cosmology
    from mpgadget_tpu.particles import ParticleData
    from mpgadget_tpu.run import Simulation, SimConfig
    from mpgadget_tpu.timeline import Timeline
    from mpgadget_tpu.utils import get_unitsystem, constants as CC

    UN = get_unitsystem(CC.CM_PER_KPC, 1.989e43, 1e5)
    rng = np.random.RandomState(11)
    box = 2000.0
    ng = 8
    n_dm = ng ** 3
    n_gas = ng ** 3
    # gas+DM interleaved lattices with small scatter
    grid = (np.stack(np.meshgrid(*[np.arange(ng)] * 3),
                     axis=-1).reshape(-1, 3) + 0.5) / ng * box
    pos = np.concatenate([
        grid + rng.uniform(-20, 20, (n_dm, 3)),
        grid + 0.5 / ng * box * 0.5
        + rng.uniform(-20, 20, (n_gas, 3))]) % box
    ptype = np.concatenate([np.ones(n_dm, np.int32),
                            np.zeros(n_gas, np.int32)])
    mass = np.concatenate([np.full(n_dm, 5.0), np.full(n_gas, 1.0)])
    pdata = ParticleData.from_numpy(
        pos, np.zeros((len(pos), 3)), mass, ptype,
        np.arange(len(pos)) + 1, box)
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, HubbleParam=0.7,
                   OmegaBaryon=0.05, TimeBegin=0.1).init_units(UN)
    timeline = Timeline([0.15], TimeIC=0.1, TimeMax=0.15)
    cfg = SimConfig(boxsize=box, nmesh=16, output_dir=str(tmp_path),
                    timeline=timeline, units=UN, hydro_on=True,
                    tree_grav_on=True, asmth=1.0, rcut=1.0,
                    density_kernel_type=1,
                    random_particle_offset=0.0, cooling_on=False,
                    starformation_on=False)
    sim = Simulation(cp, pdata, cfg, time_ic=0.1)
    nsteps = sim.run_sharded(mesh8, max_steps=2, verbose=False)
    assert nsteps == 2
    valid = np.asarray(sim.pdata.valid)
    assert valid.sum() == len(pos), "particles lost across exchanges"
    assert np.all(np.isfinite(np.asarray(sim.pdata.vel)))
    gas = np.asarray(sim.gas_mask)
    ent = np.asarray(sim.sph.entropy)
    rho = np.asarray(sim.sph.density)
    assert np.all(ent[gas & valid] > 0)
    assert np.all(rho[gas & valid] > 0)
    hs = np.asarray(sim.pdata.hsml)
    assert np.all(hs[gas & valid] > 0)


def test_sharded_sort_global_order(mesh8):
    """mpsort analog (parallel/sort.py): a global key sort over the
    mesh axis yields the globally sorted sequence with payload rows
    still attached to their keys (fof.c / petaio.c ordering)."""
    from mpgadget_tpu.parallel.sort import sharded_sort
    rng = np.random.RandomState(3)
    n_loc = 256
    n = NDEV * n_loc
    keys = rng.randint(0, 2 ** 62, size=n).astype(np.int64)
    payload = np.arange(n, dtype=np.int64)          # original row id
    valid = rng.rand(n) < 0.9                       # holes like GC'd rows

    def body(k, p, v):
        return sharded_sort(k, {"rid": p}, v, "x", bucket_cap=n_loc)

    fn = jax.jit(shard_map(
        body, mesh=mesh8, in_specs=(P("x"), P("x"), P("x")),
        out_specs=(P("x"), {"rid": P("x")}, P("x"), P())))
    k_out, arr_out, v_out, ovf = fn(
        jnp.asarray(keys), jnp.asarray(payload), jnp.asarray(valid))
    assert not bool(np.asarray(ovf))
    k_out = np.asarray(k_out)
    rid = np.asarray(arr_out["rid"])
    v_out = np.asarray(v_out)
    # valid rows compacted to the front of each shard, locally sorted,
    # and shard-monotone: concatenation == the global sort
    got = np.concatenate([
        k_out[s * n_loc:(s + 1) * n_loc][
            v_out[s * n_loc:(s + 1) * n_loc]]
        for s in range(NDEV)])
    np.testing.assert_array_equal(got, np.sort(keys[valid]))
    # payload rode along: every valid row still carries its own key
    sel = v_out
    np.testing.assert_array_equal(k_out[sel], keys[rid[sel]])
    # rough balance from the sampled splitters
    per = v_out.reshape(NDEV, n_loc).sum(axis=1)
    assert per.max() <= int(1.5 * valid.sum() / NDEV) + 16, per


def test_run_sharded_clustered_box(mesh8, tmp_path):
    """Adversarial clustering (VERDICT r2 item 4): 70% of the particles
    in a 0.02-box clump.  Geometric slabs would receive-overflow the
    clump shard; count-balanced initial boundaries + rebalance-on-
    overflow keep the run alive at S=8 (domain.c:106-257 analog)."""
    from mpgadget_tpu.run import Simulation, SimConfig
    from mpgadget_tpu.particles import ParticleData
    from mpgadget_tpu.cosmology import Cosmology
    from mpgadget_tpu.timeline import Timeline
    from mpgadget_tpu.utils import get_unitsystem, constants as C

    units = get_unitsystem(C.CM_PER_KPC, 1.989e43, 1e5)
    rng = np.random.RandomState(12)
    box = 10000.0
    n = 2048
    n_clump = (7 * n) // 10
    pos = rng.uniform(0, box, (n, 3))
    pos[:n_clump] = 0.31 * box + rng.randn(n_clump, 3) * box * 0.02
    pos = np.mod(pos, box)
    pdata = ParticleData.from_numpy(
        pos, np.zeros((n, 3)), np.full(n, 10.0),
        np.ones(n, np.int32), np.arange(n) + 1, box)
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, HubbleParam=0.7,
                   TimeBegin=0.1).init_units(units)
    cfg = SimConfig(boxsize=box, nmesh=16, output_dir=str(tmp_path),
                    timeline=Timeline([0.2], TimeIC=0.1, TimeMax=0.2),
                    units=units, hydro_on=False, tree_grav_on=True,
                    random_particle_offset=0.0)
    sim = Simulation(cp, pdata, cfg, time_ic=0.1)
    nsteps = sim.run_sharded(mesh8, max_steps=2, verbose=False)
    assert nsteps == 2
    valid = np.asarray(sim.pdata.valid)
    assert valid.sum() == n          # nothing lost to overflow
    assert np.isfinite(np.asarray(sim.pdata.vel)[valid]).all()


def test_run_sharded_hierarchical_bins(mesh8, tmp_path):
    """Per-particle timebins inside the sharded driver (VERDICT r3
    item 2; timestep.c:298-503 at scale): on a clustered box the
    hierarchical loop computes >=5x fewer force evaluations than a
    global-min-dt driver over the SAME substep clock (n_subs * n), and
    its end-state kinetic energy matches the validated single-device
    hierarchical integrator."""
    from mpgadget_tpu.run import Simulation, SimConfig
    from mpgadget_tpu.particles import ParticleData
    from mpgadget_tpu.cosmology import Cosmology
    from mpgadget_tpu.timeline import Timeline
    from mpgadget_tpu.utils import get_unitsystem, constants as C

    units = get_unitsystem(C.CM_PER_KPC, 1.989e43, 1e5)
    rng = np.random.RandomState(21)
    box = 10000.0
    n = 2048
    n_clump = 128
    pos = rng.uniform(0, box, (n, 3))
    pos[:n_clump] = box / 2 + rng.randn(n_clump, 3) * box * 0.004
    pos = np.mod(pos, box)

    def mk(sub):
        pdata = ParticleData.from_numpy(
            pos, np.zeros((n, 3)), np.full(n, 10.0),
            np.ones(n, np.int32), np.arange(n) + 1, box)
        cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, HubbleParam=0.7,
                       TimeBegin=0.1).init_units(units)
        cfg = SimConfig(
            boxsize=box, nmesh=16, output_dir=str(tmp_path / sub),
            timeline=Timeline([0.105], TimeIC=0.1, TimeMax=0.105),
            units=units, hydro_on=False, tree_grav_on=True,
            split_gravity_timesteps=True, random_particle_offset=0.0)
        return Simulation(cp, pdata, cfg, time_ic=0.1)

    sim_h = mk("h")
    nh = sim_h.run_sharded(mesh8, hierarchical=True, verbose=False,
                           compact_walks=False)
    assert sim_h.ti_current == sim_h.timeline.ti_end
    evals_h = sim_h._force_evals
    n_subs = sim_h._hier_substeps
    assert n_subs >= 4, n_subs
    # a global-min-dt driver with the identical clock evaluates every
    # particle at every substep
    assert evals_h * 5 <= n_subs * n, (evals_h, n_subs * n)
    valid = np.asarray(sim_h.pdata.valid)
    assert valid.sum() == n
    vel_h = np.asarray(sim_h.pdata.vel)
    assert np.all(np.isfinite(vel_h))

    # single-device hierarchical integrator over the same span
    sim_s = mk("s")
    sim_s.compute_forces(measure_power=False)
    while sim_s.ti_current < sim_s.timeline.ti_end:
        sim_s.step_hierarchical(
            sim_s.timeline.ti_end - sim_s.ti_current)
    vel_s = np.asarray(sim_s.pdata.vel)
    ke_h = float((vel_h[valid] ** 2).sum())
    ke_s = float((vel_s[np.asarray(sim_s.pdata.valid)] ** 2).sum())
    # the clump is a chaotic collapse: bulk-energy window as in the
    # single-device test (test_timebins.py)
    assert np.isclose(ke_h, ke_s, rtol=0.10), (ke_h, ke_s)


def test_run_sharded_sfr_spawning(mesh8, tmp_path):
    """Sharded SFR (sfr_eff.c:187-330 at scale): all-eEOS gas forms
    stars inside the sharded step — mass is conserved through
    spawning, star rows carry birth records, sfr.txt is written, and
    per-ID RNG makes the draws domain-split invariant."""
    from mpgadget_tpu.cosmology import Cosmology
    from mpgadget_tpu.particles import ParticleData
    from mpgadget_tpu.run import Simulation, SimConfig
    from mpgadget_tpu.timeline import Timeline
    from mpgadget_tpu.utils import get_unitsystem, constants as CC
    import os

    UN = get_unitsystem(CC.CM_PER_KPC, 1.989e43, 1e5)
    rng = np.random.RandomState(13)
    box = 2000.0
    ng = 8
    n_dm = ng ** 3
    n_gas = ng ** 3
    grid = (np.stack(np.meshgrid(*[np.arange(ng)] * 3),
                     axis=-1).reshape(-1, 3) + 0.5) / ng * box
    pos = np.concatenate([
        grid + rng.uniform(-20, 20, (n_dm, 3)),
        grid + 0.5 / ng * box * 0.5
        + rng.uniform(-20, 20, (n_gas, 3))]) % box
    ptype = np.concatenate([np.ones(n_dm, np.int32),
                            np.zeros(n_gas, np.int32)])
    mass = np.concatenate([np.full(n_dm, 5.0), np.full(n_gas, 1.0)])
    pdata = ParticleData.from_numpy(
        pos, np.zeros((len(pos), 3)), mass, ptype,
        np.arange(len(pos)) + 1, box)
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, HubbleParam=0.7,
                   OmegaBaryon=0.05, TimeBegin=0.1).init_units(UN)
    timeline = Timeline([0.15], TimeIC=0.1, TimeMax=0.15)
    cfg = SimConfig(boxsize=box, nmesh=16, output_dir=str(tmp_path),
                    timeline=timeline, units=UN, hydro_on=True,
                    tree_grav_on=True, asmth=1.0, rcut=1.0,
                    density_kernel_type=1,
                    random_particle_offset=0.0, cooling_on=True,
                    starformation_on=True, crit_overdensity=0.0,
                    crit_phys_density=1e-30, generations=2,
                    metal_return_on=True)
    sim = Simulation(cp, pdata, cfg, time_ic=0.1)
    mass0 = float(jnp.sum(jnp.where(sim.pdata.valid,
                                    sim.pdata.mass, 0.0)))
    nsteps = sim.run_sharded(mesh8, max_steps=3, verbose=False)
    assert nsteps == 3
    valid = np.asarray(sim.pdata.valid)
    pt = np.asarray(sim.pdata.ptype)
    # SFR ran: stored rates positive somewhere, sfr.txt written
    assert float(jnp.sum(sim.sph.sfr)) > 0
    lines = open(os.path.join(str(tmp_path),
                              "sfr.txt")).read().splitlines()
    assert len(lines) == 3
    # mass conserved through conversions/spawning
    mass1 = float(jnp.sum(jnp.where(sim.pdata.valid,
                                    sim.pdata.mass, 0.0)))
    np.testing.assert_allclose(mass1, mass0, rtol=1e-5)
    stars = valid & (pt == 4)
    if stars.any():
        ft = np.asarray(sim.stars.formation_time)
        bd = np.asarray(sim.stars.birth_density)
        assert np.all(ft[stars] > 0)
        assert np.all(bd[stars] > 0)
    ent = np.asarray(sim.sph.entropy)
    gas = valid & (pt == 0)
    assert np.all(np.isfinite(ent[gas])) and np.all(ent[gas] > 0)
    # sharded metal return ran each step: species stay finite and the
    # gas composition remains normalized-ish (H+He+Z ~ mass fractions)
    met = np.asarray(sim.sph.metals)[gas]
    assert np.all(np.isfinite(met))
    assert np.all(met >= 0)


def test_sharded_metal_return_matches_single(mesh8, tmp_path):
    """parallel/metals.py == the single-chip metal_return_step on the
    same box: the gather-formulated spread with 2x-hsml strips is
    exact, so per-row gas mass/metals and star bookkeeping agree
    (metal_return.c:423-500 at scale)."""
    from mpgadget_tpu.physics import metal_return as mrmod
    from mpgadget_tpu.physics.stars import StarData
    from mpgadget_tpu.parallel.metals import build_sharded_metal_return
    from mpgadget_tpu.cosmology import Cosmology
    from mpgadget_tpu.utils import get_unitsystem, constants as CC

    UN = get_unitsystem(CC.CM_PER_KPC, 1.989e43, 1e5)
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, HubbleParam=0.7,
                   TimeBegin=0.1).init_units(UN)
    age = mrmod.AgeTable(cp.hubble_function, UN, 0.7)
    params = mrmod.MetalReturnParams()
    box = 1000.0
    rng = np.random.RandomState(7)
    n = 512
    n_star = 64
    pos = rng.uniform(0, box, (n, 3))
    ipos = (pos / box * 2.0 ** 32).astype(np.uint32)
    is_star = np.zeros(n, bool)
    is_star[:n_star] = True
    is_gas = ~is_star
    mass = np.where(is_star, 2.0, 1.0).astype(np.float32)
    mean_sep = box / np.cbrt(n)
    hsml = np.where(is_gas, 2.0 * mean_sep, 0.0).astype(np.float32)
    star_h = np.where(is_star, 2.0 * mean_sep, 0.0).astype(np.float32)
    density = np.where(is_gas, 1e-8, 0.0).astype(np.float32)
    metals = np.zeros((n, 9), np.float32)
    metals[:, 0] = 0.75
    metals[:, 1] = 0.24
    metals[:, 4] = 0.01
    stars = StarData.zeros(n).replace(
        formation_time=jnp.where(jnp.asarray(is_star), 0.11, 0.0),
        metallicity=jnp.where(jnp.asarray(is_star), 0.02, 0.0),
        metals=jnp.asarray(metals))

    ref = mrmod.metal_return_step(
        jnp.asarray(ipos), jnp.asarray(mass), jnp.asarray(hsml),
        jnp.asarray(density), jnp.asarray(is_gas),
        jnp.asarray(is_star), jnp.asarray(star_h), stars,
        jnp.asarray(metals), 0.5, 0.6, age, box, params)
    assert float(ref["mass_returned_total"]) > 0

    # distribute rows to their x-slab owners (geometric bounds)
    S = NDEV
    n_local = 128
    owner = ipos[:, 0] >> np.uint32(32 - 3)
    cap = S * n_local
    fields = dict(
        ipos=np.zeros((cap, 3), np.uint32),
        mass=np.zeros(cap, np.float32),
        hsml=np.zeros(cap, np.float32),
        density=np.zeros(cap, np.float32),
        gas_mask=np.zeros(cap, bool),
        star_mask=np.zeros(cap, bool),
        star_hsml=np.zeros(cap, np.float32),
        metals=np.zeros((cap, 9), np.float32),
        birth_metallicity=np.zeros(cap, np.float32),
        formation_time=np.zeros(cap, np.float32),
        total_mass_returned=np.zeros(cap, np.float32),
        last_enrichment_myr=np.zeros(cap, np.float32))
    src_of = np.full(cap, -1)
    for s in range(S):
        rows = np.where(owner == s)[0]
        assert len(rows) <= n_local
        sl = slice(s * n_local, s * n_local + len(rows))
        src_of[sl] = rows
        fields["ipos"][sl] = ipos[rows]
        fields["mass"][sl] = mass[rows]
        fields["hsml"][sl] = hsml[rows]
        fields["density"][sl] = density[rows]
        fields["gas_mask"][sl] = is_gas[rows]
        fields["star_mask"][sl] = is_star[rows]
        fields["star_hsml"][sl] = star_h[rows]
        fields["metals"][sl] = metals[rows]
        fields["birth_metallicity"][sl] = np.where(is_star[rows],
                                                   0.02, 0.0)
        fields["formation_time"][sl] = np.where(is_star[rows],
                                                0.11, 0.0)
    st = {k: jnp.asarray(v) for k, v in fields.items()}
    bounds = (np.arange(S, dtype=np.uint64)
              * (2 ** 32 // S)).astype(np.uint32)
    fn = build_sharded_metal_return(
        mesh8, n_local=n_local, ghost_cap=n_local, hops=4,
        age_table=age, params=params, boxsize=box)
    upd, fl = fn(st, jnp.asarray(bounds), jnp.float32(0.5),
                 jnp.float32(0.6))
    assert int(fl["ghost"]) == 0 and int(fl["strip"]) == 0
    np.testing.assert_allclose(float(fl["returned"]),
                               float(ref["mass_returned_total"]),
                               rtol=1e-5)
    placed = src_of >= 0
    src = src_of[placed]
    for key, refkey in (("mass", None), ("metals", "gas_metals"),
                        ("star_hsml", "star_hsml"),
                        ("total_mass_returned", "total_mass_returned")):
        got = np.asarray(upd[key])[placed]
        if key == "mass":
            want = np.where(is_gas, np.asarray(ref["gas_mass"]),
                            np.asarray(ref["star_mass"]))[src]
        else:
            want = np.asarray(ref[refkey])[src]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-7,
                                   err_msg=key)


def test_sharded_bh_matches_single(mesh8):
    """parallel/blackhole.py == the single-chip BH pipeline on the
    same box (blackhole.c:216-360 at scale): the replicated-BH-list
    design computes EXACT kernel sums (no tree capacity truncation),
    so per-BH density/mdot/accreted mass and per-gas feedback agree
    with physics.blackhole to f32 tolerance, and the per-ID RNG makes
    the stochastic swallow set identical."""
    from mpgadget_tpu.physics import blackhole as bhmod
    from mpgadget_tpu.parallel.blackhole import build_sharded_bh
    from mpgadget_tpu.parallel.mesh import shard_particles

    box = 1000.0
    rng = np.random.RandomState(21)
    n = 1024
    nbh = 4
    pos = rng.uniform(0, box, (n, 3))
    is_bh = np.zeros(n, bool)
    is_bh[:nbh] = True
    # cluster some gas around each BH so kernels are populated
    for b in range(nbh):
        pos[nbh + b * 60:nbh + (b + 1) * 60] = (
            pos[b] + rng.uniform(-40, 40, (60, 3))) % box
    # ADVERSARIAL placement (round-3 regression): scatter the BHs to
    # arbitrary high row indices — including the last row of shard 0
    # (slab edge) — so local row index != slot index.  The round-3
    # clamped a[order] gather of the packed slot_ok silently dropped
    # any BH whose row index >= nbh_cap; rows 0..3 masked it.
    perm = rng.permutation(n)
    j0 = int(np.where(is_bh[perm])[0][0])
    perm[[j0, 255]] = perm[[255, j0]]
    pos = pos[perm]
    is_bh = is_bh[perm]
    ipos = jnp.asarray((pos / box * 2.0 ** 32).astype(np.uint32))
    is_gas = ~is_bh
    mass = np.where(is_bh, 4e-4, 2e-4).astype(np.float32)
    hsml = np.where(is_bh, 60.0, 30.0).astype(np.float32)
    vel = rng.randn(n, 3).astype(np.float32) * 20.0
    entropy = np.abs(rng.randn(n)).astype(np.float32) * 1e3 + 1e3
    density = np.full(n, 1e-7, np.float32)
    pid = np.arange(1, n + 1, dtype=np.uint32)
    bh_mass = np.where(is_bh, 2e-3, 0.0).astype(np.float32)
    par = bhmod.BHParams(accretion_factor=100.0, feedback_factor=0.05,
                         eddington_factor=0.0, seed_bh_dyn_mass=-1.0,
                         merge_grav_bound=False)
    atime, dtime = 0.5, 2e-3
    G, ut, hp, uv, uu = 43007.1, 3.08568e16, 0.7, 1e5, 1e10
    key = jax.random.PRNGKey(33)

    # ---- single-device reference pipeline ----
    j = jnp.asarray
    sums = bhmod.bh_neighbor_sums(
        ipos, j(mass), j(hsml), j(vel), j(entropy), j(is_bh),
        j(is_gas), box, kernel_type=1)
    gasvel = jnp.stack([sums["vx"], sums["vy"], sums["vz"]], axis=-1)
    mdot_1, dm_1 = bhmod.bondi_accretion(
        par, j(bh_mass), sums["rho"], sums["ent"], gasvel, j(vel),
        atime, G, ut, hp, dtime)
    bhm_1 = jnp.where(j(is_bh), j(bh_mass) + dm_1, j(bh_mass))
    swallowed_1, ent_1, _, _ = bhmod.swallow_and_feedback(
        par, key, ipos=ipos, mass=j(mass), hsml=j(hsml),
        entropy=j(entropy), density=j(density), is_bh=j(is_bh),
        is_gas=j(is_gas), pid=j(pid), bh_mass=bhm_1,
        mdot=jnp.where(j(is_bh), mdot_1, 0.0),
        bh_density=sums["rho"], fbweight=sums["fbweight"],
        boxsize=box, atime=atime, dtime=dtime, unit_velocity=uv,
        uu_in_cgs=uu, kernel_type=1)

    # ---- sharded pipeline on the 8-device mesh ----
    n_local = 256
    n_pad = n_local * NDEV
    fn = build_sharded_bh(
        mesh8, n_local=n_local, nbh_cap=8, par=par, boxsize=box,
        gconst=G, unit_time_in_s=ut, hubble_param=hp,
        unit_velocity=uv, uu_in_cgs=uu, rho_crit_baryon=1e-9,
        kernel_type=1)

    def padded(a, fill=0):
        a = np.asarray(a)
        out = np.full((n_pad,) + a.shape[1:], fill, a.dtype)
        out[:n] = a
        return jnp.asarray(out)

    st = {
        "ipos": padded(np.asarray(ipos)), "vel": padded(vel),
        "mass": padded(mass), "valid": padded(np.ones(n, bool)),
        "pid": padded(pid), "ptype": padded(
            np.where(is_bh, 5, 0).astype(np.int32)),
        "hsml": padded(hsml), "entropy": padded(entropy),
        "density": padded(density), "gas_mask": padded(is_gas),
        "grav_acc": padded(np.zeros((n, 3), np.float32)),
        "bh_mass": padded(bh_mass),
        "bh_mdot": padded(np.zeros(n, np.float32)),
        "bh_density": padded(np.zeros(n, np.float32)),
        "bh_mtrack": padded(np.zeros(n, np.float32)),
        "bh_progs": padded(np.zeros(n, np.int32)),
        "bh_ke": padded(np.zeros(n, np.float32)),
        "bh_vdisp": padded(np.zeros(n, np.float32)),
    }
    st = shard_particles(st, mesh8, axis="x")
    scal = {"atime": jnp.float32(atime), "dtime": jnp.float32(dtime),
            "rng_bh": key, "bh_soft": jnp.float32(1.0)}
    upd, stats = fn(st, scal)
    assert int(stats["ovf"]) == 0
    assert int(stats["n_bh"]) == nbh

    bhr = np.nonzero(is_bh)[0]
    np.testing.assert_allclose(
        np.asarray(upd["bh_density"])[bhr],
        np.asarray(sums["rho"])[bhr], rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(upd["bh_mdot"])[bhr],
        np.asarray(mdot_1)[bhr], rtol=3e-4)
    # swallow set identical (per-ID RNG): compare swallowed pids
    sw_pid_1 = set(pid[np.asarray(swallowed_1)[:n]].tolist())
    valid_2 = np.asarray(upd["valid"])[:n]
    sw_pid_2 = set(pid[is_gas & ~valid_2].tolist())
    assert sw_pid_1 == sw_pid_2
    # thermal feedback entropy agrees on surviving gas
    keep = is_gas & valid_2
    np.testing.assert_allclose(
        np.asarray(upd["entropy"])[:n][keep],
        np.asarray(ent_1)[keep], rtol=2e-4)
    # accreted + swallowed mass lands on the BHs
    msw = float(np.sum(mass[is_gas & ~valid_2]))
    dm_bh = float(np.sum(np.asarray(upd["mass"])[bhr] - mass[bhr]))
    np.testing.assert_allclose(dm_bh, msw, rtol=1e-5, atol=1e-8)


def test_sharded_bh_mergers(mesh8):
    """Two BHs inside 2 x softening merge in the sharded step: the
    bigger ID swallows, mass/momentum/BH-mass transfer, prey row is
    invalidated (blackhole.c:495-560)."""
    from mpgadget_tpu.physics import blackhole as bhmod
    from mpgadget_tpu.parallel.blackhole import build_sharded_bh
    from mpgadget_tpu.parallel.mesh import shard_particles

    box = 1000.0
    n = 64
    rng = np.random.RandomState(3)
    pos = rng.uniform(0, box, (n, 3))
    pos[1] = pos[0] + np.array([1.0, 0.0, 0.0])   # close pair
    is_bh = np.zeros(n, bool)
    is_bh[:2] = True
    mass = np.full(n, 1e-4, np.float32)
    par = bhmod.BHParams(merge_grav_bound=False, eddington_factor=0.0)
    n_local = 8
    fn = build_sharded_bh(
        mesh8, n_local=n_local, nbh_cap=4, par=par, boxsize=box,
        gconst=43007.1, unit_time_in_s=3.08568e16, hubble_param=0.7,
        unit_velocity=1e5, uu_in_cgs=1e10, rho_crit_baryon=1e-9,
        kernel_type=1)
    n_pad = n_local * NDEV

    def padded(a, fill=0):
        a = np.asarray(a)
        out = np.full((n_pad,) + a.shape[1:], fill, a.dtype)
        out[:n] = a
        return jnp.asarray(out)

    st = {
        "ipos": padded((pos / box * 2.0 ** 32).astype(np.uint32)),
        "vel": padded(np.zeros((n, 3), np.float32)),
        "mass": padded(mass), "valid": padded(np.ones(n, bool)),
        "pid": padded(np.arange(1, n + 1, dtype=np.uint32)),
        "ptype": padded(np.where(is_bh, 5, 0).astype(np.int32)),
        "hsml": padded(np.full(n, 20.0, np.float32)),
        "entropy": padded(np.full(n, 1e3, np.float32)),
        "density": padded(np.full(n, 1e-7, np.float32)),
        "gas_mask": padded(~is_bh),
        "grav_acc": padded(np.zeros((n, 3), np.float32)),
        "bh_mass": padded(np.where(is_bh, 1e-3, 0).astype(np.float32)),
        "bh_mdot": padded(np.zeros(n, np.float32)),
        "bh_density": padded(np.zeros(n, np.float32)),
        "bh_mtrack": padded(np.zeros(n, np.float32)),
        "bh_progs": padded(np.zeros(n, np.int32)),
        "bh_ke": padded(np.zeros(n, np.float32)),
        "bh_vdisp": padded(np.zeros(n, np.float32)),
    }
    st = shard_particles(st, mesh8, axis="x")
    scal = {"atime": jnp.float32(0.5), "dtime": jnp.float32(1e-3),
            "rng_bh": jax.random.PRNGKey(5),
            "bh_soft": jnp.float32(2.0)}
    upd, stats = fn(st, scal)
    assert int(stats["n_merged"]) == 1
    valid = np.asarray(upd["valid"])
    # bigger pid (row 1, pid 2) swallows row 0
    assert not valid[0] and valid[1]
    np.testing.assert_allclose(float(np.asarray(upd["mass"])[1]),
                               2e-4, rtol=1e-4)
    np.testing.assert_allclose(
        float(np.asarray(upd["bh_mass"])[1]), 2e-3, rtol=1e-3)
    assert int(np.asarray(upd["bh_progs"])[1]) == 1


def test_sharded_bh_overflow_flagged(mesh8):
    """More local BHs than nbh_cap: the step flags ovf (the caller's
    rebuild-with-doubled-cap contract) and a rebuild at a sufficient
    cap counts every BH — no silent drops (treewalk.c export-retry
    semantics)."""
    from mpgadget_tpu.physics import blackhole as bhmod
    from mpgadget_tpu.parallel.blackhole import build_sharded_bh
    from mpgadget_tpu.parallel.mesh import shard_particles

    box = 1000.0
    rng = np.random.RandomState(7)
    n_local = 64
    n_pad = n_local * NDEV
    nbh = 6
    pos = rng.uniform(0, box, (n_pad, 3))
    is_bh = np.zeros(n_pad, bool)
    # all 6 BHs on shard 0, at HIGH row indices (> any cap)
    bh_rows = np.array([20, 31, 45, 50, 58, 63])
    is_bh[bh_rows] = True
    # surround every BH with gas (spread across all shards) so each
    # occupied slot accumulates a nonzero neighbor density
    for b, r in enumerate(bh_rows):
        sl = slice(64 + b * 40, 64 + (b + 1) * 40)
        pos[sl] = (pos[r] + rng.uniform(-15, 15, (40, 3))) % box
    par = bhmod.BHParams(merge_grav_bound=False, eddington_factor=0.0)

    def mk(cap):
        return build_sharded_bh(
            mesh8, n_local=n_local, nbh_cap=cap, par=par, boxsize=box,
            gconst=43007.1, unit_time_in_s=3.08568e16,
            hubble_param=0.7, unit_velocity=1e5, uu_in_cgs=1e10,
            rho_crit_baryon=1e-9, kernel_type=1)

    st = {
        "ipos": jnp.asarray((pos / box * 2.0 ** 32).astype(np.uint32)),
        "vel": jnp.zeros((n_pad, 3), jnp.float32),
        "mass": jnp.full(n_pad, 1e-4, jnp.float32),
        "valid": jnp.ones(n_pad, bool),
        "pid": jnp.arange(1, n_pad + 1, dtype=jnp.uint32),
        "ptype": jnp.asarray(np.where(is_bh, 5, 0).astype(np.int32)),
        "hsml": jnp.full(n_pad, 20.0, jnp.float32),
        "entropy": jnp.full(n_pad, 1e3, jnp.float32),
        "density": jnp.full(n_pad, 1e-7, jnp.float32),
        "gas_mask": jnp.asarray(~is_bh),
        "grav_acc": jnp.zeros((n_pad, 3), jnp.float32),
        "bh_mass": jnp.asarray(
            np.where(is_bh, 1e-3, 0).astype(np.float32)),
        "bh_mdot": jnp.zeros(n_pad, jnp.float32),
        "bh_density": jnp.zeros(n_pad, jnp.float32),
        "bh_mtrack": jnp.zeros(n_pad, jnp.float32),
        "bh_progs": jnp.zeros(n_pad, jnp.int32),
        "bh_ke": jnp.zeros(n_pad, jnp.float32),
        "bh_vdisp": jnp.zeros(n_pad, jnp.float32),
    }
    st = shard_particles(st, mesh8, axis="x")
    scal = {"atime": jnp.float32(0.5), "dtime": jnp.float32(1e-3),
            "rng_bh": jax.random.PRNGKey(9),
            "bh_soft": jnp.float32(1.0)}
    _, stats = mk(4)(st, scal)
    assert int(stats["ovf"]) > 0, "overflow must be flagged"
    upd, stats = mk(8)(st, scal)
    assert int(stats["ovf"]) == 0
    assert int(stats["n_bh"]) == nbh, \
        "every BH must occupy a slot after the cap retry"
    rho = np.asarray(upd["bh_density"])[bh_rows]
    assert np.all(rho > 0), "all BHs must accumulate neighbor sums"


def test_run_sharded_with_black_holes(mesh8, tmp_path):
    """run_sharded with BlackHoleOn: a pre-seeded BH accretes from
    the surrounding gas inside the sharded loop (mdot > 0, BH mass
    grows), swallowed gas mass is conserved onto the BH, and the BH
    state mirrors back to BhData (blackhole.c:216-360 at scale)."""
    from mpgadget_tpu.cosmology import Cosmology
    from mpgadget_tpu.particles import ParticleData
    from mpgadget_tpu.run import Simulation, SimConfig
    from mpgadget_tpu.timeline import Timeline
    from mpgadget_tpu.utils import get_unitsystem, constants as CC

    UN = get_unitsystem(CC.CM_PER_KPC, 1.989e43, 1e5)
    rng = np.random.RandomState(17)
    box = 2000.0
    ng = 8
    n_dm = ng ** 3
    n_gas = ng ** 3
    grid = (np.stack(np.meshgrid(*[np.arange(ng)] * 3),
                     axis=-1).reshape(-1, 3) + 0.5) / ng * box
    pos = np.concatenate([
        grid + rng.uniform(-20, 20, (n_dm, 3)),
        grid + 0.5 / ng * box * 0.5
        + rng.uniform(-20, 20, (n_gas, 3)),
        [[0.5 * box, 0.5 * box, 0.5 * box]]]) % box
    ptype = np.concatenate([np.ones(n_dm, np.int32),
                            np.zeros(n_gas, np.int32),
                            [np.int32(5)]])
    mass = np.concatenate([np.full(n_dm, 5.0), np.full(n_gas, 1.0),
                           [2.0]])
    pdata = ParticleData.from_numpy(
        pos, np.zeros((len(pos), 3)), mass, ptype,
        np.arange(len(pos)) + 1, box)
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, HubbleParam=0.7,
                   OmegaBaryon=0.05, TimeBegin=0.1).init_units(UN)
    timeline = Timeline([0.15], TimeIC=0.1, TimeMax=0.15)
    cfg = SimConfig(boxsize=box, nmesh=16, output_dir=str(tmp_path),
                    timeline=timeline, units=UN, hydro_on=True,
                    tree_grav_on=True, asmth=1.0, rcut=1.0,
                    density_kernel_type=1,
                    random_particle_offset=0.0, cooling_on=True,
                    black_hole_on=True, bh_seed_mass=0.1,
                    bh_accretion_factor=5e4)
    sim = Simulation(cp, pdata, cfg, time_ic=0.1)
    mass0 = float(jnp.sum(jnp.where(sim.pdata.valid,
                                    sim.pdata.mass, 0.0)))
    nsteps = sim.run_sharded(mesh8, max_steps=3, verbose=False)
    assert nsteps == 3
    valid = np.asarray(sim.pdata.valid)
    pt = np.asarray(sim.pdata.ptype)
    bhr = valid & (pt == 5)
    assert bhr.sum() == 1
    mdot = np.asarray(sim.bh.mdot)[bhr]
    bhm = np.asarray(sim.bh.bh_mass)[bhr]
    rho = np.asarray(sim.bh.bh_density)[bhr]
    assert np.all(rho > 0), "BH sees no gas density"
    assert np.all(mdot > 0), "Bondi rate should be positive"
    assert np.all(bhm > 0.1), "BH subgrid mass should grow"
    # dynamical mass conservation through swallowing
    mass1 = float(jnp.sum(jnp.where(sim.pdata.valid,
                                    sim.pdata.mass, 0.0)))
    np.testing.assert_allclose(mass1, mass0, rtol=1e-5)
    ent = np.asarray(sim.sph.entropy)
    gas = valid & (pt == 0)
    assert np.all(np.isfinite(ent[gas])) and np.all(ent[gas] > 0)


def test_sharded_winds_match_single(mesh8):
    """parallel/winds.py == physics.winds.winds_via_neighbors on the
    same box (winds.c:299-567 at scale): per-star weights/vdisp are
    exact dense sums, the pair-ID hash makes the stochastic hit set
    identical, and the nearest-star resolution picks the same
    kicker."""
    from mpgadget_tpu.physics import winds as windmod
    from mpgadget_tpu.parallel.winds import build_sharded_winds
    from mpgadget_tpu.parallel.mesh import shard_particles

    box = 1000.0
    rng = np.random.RandomState(11)
    n = 1024
    nstar = 6
    pos = rng.uniform(0, box, (n, 3))
    new_star = np.zeros(n, bool)
    new_star[:nstar] = True
    for b in range(nstar):
        pos[nstar + b * 40:nstar + (b + 1) * 40] = (
            pos[b] + rng.uniform(-50, 50, (40, 3))) % box
    is_dm = np.zeros(n, bool)
    is_dm[nstar + nstar * 40:nstar + nstar * 40 + 400] = True
    is_gas = ~new_star & ~is_dm
    # adversarial row placement (round-3 regression class): scatter
    # the new stars to arbitrary high rows incl. a slab-edge row so
    # local row index != slot index in the packed gather
    perm = rng.permutation(n)
    j0 = int(np.where(new_star[perm])[0][0])
    perm[[j0, 255]] = perm[[255, j0]]
    pos, new_star, is_dm, is_gas = (
        pos[perm], new_star[perm], is_dm[perm], is_gas[perm])
    ipos = jnp.asarray((pos / box * 2.0 ** 32).astype(np.uint32))
    mass = np.full(n, 1e-3, np.float32)
    hsml = np.where(new_star, 80.0, 40.0).astype(np.float32)
    vel = (rng.randn(n, 3) * 50).astype(np.float32)
    entropy = np.full(n, 1e3, np.float32)
    density = np.full(n, 1e-6, np.float32)
    delay = np.zeros(n, np.float32)
    pid = np.arange(1, n + 1, dtype=np.uint64)
    par = windmod.WindParams()       # ofjt10: halo + decouple
    par = windmod.init_winds(par, 0.1, 1e3, 1e-7, 3.08568e16)
    atime = 0.6
    mean_sep = box / np.cbrt(n)
    key = jax.random.PRNGKey(19)

    j = jnp.asarray
    vd = windmod.dm_velocity_dispersion(
        ipos, j(vel), j(mass), j(is_dm), j(new_star), box, mean_sep)
    vel_1, ent_1, delay_1, kicked_1 = windmod.winds_via_neighbors(
        par, key, ipos=ipos, mass=j(mass), hsml=j(hsml),
        pid=j(pid.astype(np.int64)), vel=j(vel), entropy=j(entropy),
        density=j(density), delay_time=j(delay), is_gas=j(is_gas),
        new_star=j(new_star), star_vdisp=jnp.where(j(new_star), vd,
                                                   0.0),
        boxsize=box, atime=atime)

    n_local = 256
    n_pad = n_local * NDEV
    fn = build_sharded_winds(mesh8, n_local=n_local, nstar_cap=8,
                             par=par, boxsize=box, mean_sep=mean_sep)

    def padded(a, fill=0):
        a = np.asarray(a)
        out = np.full((n_pad,) + a.shape[1:], fill, a.dtype)
        out[:n] = a
        return jnp.asarray(out)

    ptype = np.where(new_star, 4,
                     np.where(is_dm, 1, 0)).astype(np.int32)
    st = {
        "ipos": padded(np.asarray(ipos)), "vel": padded(vel),
        "mass": padded(mass), "valid": padded(np.ones(n, bool)),
        "pid": padded(pid), "ptype": padded(ptype),
        "hsml": padded(hsml), "entropy": padded(entropy),
        "density": padded(density), "delay_time": padded(delay),
        "gas_mask": padded(is_gas),
        "formation_time": padded(
            np.where(new_star, atime, 0.0).astype(np.float32)),
    }
    st = shard_particles(st, mesh8, axis="x")
    upd, stats = fn(st, {"atime": jnp.float32(atime),
                         "dtime": jnp.float32(0.0),
                         "aform_min": jnp.float32(atime * (1 - 1e-6)),
                         "rng_wind": key})
    assert int(stats["ovf"]) == 0
    assert int(stats["n_new"]) == nstar
    kicked_2 = (np.asarray(upd["delay_time"])[:n] > 0) & is_gas
    kicked_1n = np.asarray(kicked_1)[:n]
    assert int(stats["n_kicked"]) > 0, "no wind kicks fired"
    assert set(pid[kicked_1n]) == set(pid[kicked_2])
    np.testing.assert_allclose(np.asarray(upd["vel"])[:n][kicked_2],
                               np.asarray(vel_1)[kicked_2], rtol=2e-4,
                               atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(upd["entropy"])[:n][kicked_2],
        np.asarray(ent_1)[kicked_2], rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(upd["delay_time"])[:n][kicked_2],
        np.asarray(delay_1)[kicked_2], rtol=2e-4)


def test_sharded_fof_matches_single(mesh8):
    """Distributed FOF == single-device fof_catalog on a clustered box
    whose clumps span shard boundaries (fof.c:158-330 + :874 + :1175
    at scale): same group count, lengths, masses, per-type masses and
    (to circular-mean tolerance) centers; secondaries attach to the
    same groups."""
    from mpgadget_tpu.physics.fof import fof_catalog, FOFParams
    from mpgadget_tpu.parallel.fof import sharded_fof, build_group_index
    from mpgadget_tpu.parallel.mesh import shard_particles

    box = 10000.0
    S = NDEV
    rng = np.random.RandomState(42)
    n_clump, per_clump = 6, 64
    n_field = 1024
    mean_sep = box / np.cbrt(n_clump * per_clump + n_field)
    ll = 0.2 * mean_sep
    centers = rng.uniform(0, box, (n_clump, 3))
    # two clumps dead on x-slab boundaries (worst case for the ghost
    # exchange), one spanning THREE slabs via an x-elongated filament
    centers[0][0] = box * 3 / 8
    centers[1][0] = box * 7 / 8
    parts = [c + rng.randn(per_clump, 3) * ll * 1.2 for c in centers]
    fil = centers[2] + np.stack(
        [np.linspace(-box / 8, box / 8, per_clump),
         np.zeros(per_clump), np.zeros(per_clump)], axis=1) \
        + rng.randn(per_clump, 3) * ll * 0.2
    parts.append(fil)
    parts.append(rng.uniform(0, box, (n_field, 3)))
    pos = np.mod(np.concatenate(parts), box)
    n_prim = len(pos)
    # gas secondaries inside the first two clumps
    n_sec = 32
    sec_pos = np.mod(np.concatenate([
        centers[0] + rng.randn(n_sec // 2, 3) * ll * 0.5,
        centers[1] + rng.randn(n_sec // 2, 3) * ll * 0.5]), box)
    pos = np.concatenate([pos, sec_pos])
    ptype = np.concatenate([np.ones(n_prim, np.int32),
                            np.zeros(n_sec, np.int32)])
    n = len(pos)
    cap = ((n + 8 * 64 - 1) // (8 * 64)) * (8 * 64)
    pad = cap - n
    ipos = np.zeros((cap, 3), np.uint32)
    ipos[:n] = (pos / box * 2.0 ** 32).astype(np.uint64).astype(
        np.uint32)
    vel = np.zeros((cap, 3), np.float32)
    vel[:n] = rng.randn(n, 3).astype(np.float32)
    mass = np.zeros(cap, np.float32)
    mass[:n] = rng.uniform(1.0, 2.0, n).astype(np.float32)
    pt = np.full(cap, 1, np.int32)
    pt[:n] = ptype
    valid = np.zeros(cap, bool)
    valid[:n] = True
    cfg = FOFParams(min_group_length=32)

    cat_s = fof_catalog(jnp.asarray(ipos), jnp.asarray(vel),
                        jnp.asarray(mass), jnp.asarray(pt),
                        jnp.asarray(valid), box, mean_sep, cfg)

    # slab-decomposed layout: sort by x, equal row split, bounds from
    # each shard's first x
    order = np.argsort(ipos[:, 0], kind="stable")
    # keep invalid (padding) rows spread across shards
    n_local = cap // S
    ipos_d = ipos[order]
    bounds = np.zeros(S, np.uint32)
    for s in range(1, S):
        bounds[s] = ipos_d[s * n_local, 0]
    st = {
        "ipos": jnp.asarray(ipos_d), "vel": jnp.asarray(vel[order]),
        "mass": jnp.asarray(mass[order]),
        "ptype": jnp.asarray(pt[order]),
        "valid": jnp.asarray(valid[order]),
    }
    st = shard_particles(st, mesh8, axis="x")
    cat_p, sorted_labels, extras, labels = sharded_fof(
        mesh8, st, bounds, boxsize=box, mean_sep=mean_sep,
        n_local=n_local, params=cfg)

    assert cat_p["ngroups"] == cat_s["ngroups"]
    # group identity by matching masses (random masses are unique)
    np.testing.assert_allclose(np.sort(cat_p["masses"]),
                               np.sort(np.asarray(cat_s["masses"])),
                               rtol=1e-5)
    o_p = np.argsort(cat_p["masses"])
    o_s = np.argsort(np.asarray(cat_s["masses"]))
    np.testing.assert_array_equal(cat_p["lengths"][o_p],
                                  np.asarray(cat_s["lengths"])[o_s])
    np.testing.assert_array_equal(
        cat_p["len_by_type"][o_p], np.asarray(
            cat_s["len_by_type"])[o_s])
    np.testing.assert_allclose(
        cat_p["mass_by_type"][o_p],
        np.asarray(cat_s["mass_by_type"])[o_s], rtol=1e-5, atol=1e-7)
    # centers: circular mean vs anchor mean; clumps are tiny vs box
    dcm = cat_p["cm"][o_p] - np.asarray(cat_s["cm"])[o_s]
    dcm -= np.round(dcm / box) * box
    assert np.max(np.abs(dcm)) < 1e-3 * box, np.max(np.abs(dcm))
    np.testing.assert_allclose(cat_p["vel"][o_p],
                               np.asarray(cat_s["vel"])[o_s],
                               rtol=1e-4, atol=1e-5)

    # per-particle group index agrees up to the catalog permutation
    gi_fn = build_group_index(mesh8, n_local=n_local)
    srt = np.argsort(sorted_labels)
    gi_p = np.asarray(gi_fn(
        labels, jnp.asarray(sorted_labels[srt]),
        jnp.asarray(np.arange(len(sorted_labels))[srt]
                    .astype(np.int32))))
    gi_s = np.asarray(cat_s["group_index"])[order]
    # map catalog ranks through the mass matching
    rank_map = np.full(cat_p["ngroups"] + 1, -1, np.int64)
    rank_map[o_p] = o_s
    got = np.where(gi_p >= 0, rank_map[np.clip(gi_p, 0, None)], -1)
    np.testing.assert_array_equal(got, gi_s)


def test_run_sharded_striped_snapshot(mesh8, tmp_path):
    """Collective striped snapshot IO (petaio.c:33-68 + 622-700 at
    scale): the sync-point snapshot written by the sharded loop — one
    stripe file per shard, no host mirror — equals the single-writer
    host snapshot of the same state byte-for-byte after a row sort by
    ID, and restarts from it."""
    from mpgadget_tpu.run import Simulation, SimConfig
    from mpgadget_tpu.particles import ParticleData
    from mpgadget_tpu.cosmology import Cosmology
    from mpgadget_tpu.timeline import Timeline
    from mpgadget_tpu.io.bigfile import BigFile
    from mpgadget_tpu.utils import get_unitsystem, constants as C

    units = get_unitsystem(C.CM_PER_KPC, 1.989e43, 1e5)
    rng = np.random.RandomState(5)
    box = 4000.0
    ng = 8
    n = 2 * ng ** 3
    grid = (np.stack(np.meshgrid(*[np.arange(ng)] * 3),
                     axis=-1).reshape(-1, 3) + 0.5) / ng * box
    pos = np.concatenate([grid + rng.uniform(-30, 30, (ng ** 3, 3)),
                          grid + rng.uniform(-30, 30, (ng ** 3, 3))
                          + box / ng / 2]) % box
    ptype = np.concatenate([np.zeros(ng ** 3, np.int32),
                            np.ones(ng ** 3, np.int32)])
    mass = np.where(ptype == 0, 1.0, 5.0)
    pdata = ParticleData.from_numpy(
        pos, rng.randn(n, 3) * 5, mass, ptype, np.arange(n) + 1, box)
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, HubbleParam=0.7,
                   OmegaBaryon=0.05, TimeBegin=0.1).init_units(units)
    # TimeMax in the OutputList: the sharded writer fires at the final
    # sync point, so it snapshots exactly the state the host mirror
    # sees after the loop
    cfg = SimConfig(
        boxsize=box, nmesh=16, output_dir=str(tmp_path),
        timeline=Timeline([0.115], TimeIC=0.1, TimeMax=0.115),
        units=units, hydro_on=True, tree_grav_on=True,
        cooling_on=True, random_particle_offset=0.0)
    sim = Simulation(cp, pdata, cfg, time_ic=0.1)
    sim.run_sharded(mesh8, verbose=False)
    assert sim.ti_current == sim.timeline.ti_end

    # the sharded snapshot written at the final sync point
    snap_sharded = tmp_path / "PART_000"
    assert snap_sharded.is_dir()
    # host single-writer snapshot of the SAME (mirrored) state
    host_path = sim.write_snapshot()
    bf_s = BigFile(str(snap_sharded))
    bf_h = BigFile(host_path)

    hdr_s = bf_s.open("Header").attrs
    hdr_h = bf_h.open("Header").attrs
    np.testing.assert_array_equal(hdr_s["TotNumPart"],
                                  hdr_h["TotNumPart"])
    assert float(np.asarray(hdr_s["Time"])[0]) == \
        float(np.asarray(hdr_h["Time"])[0])

    for t in (0, 1):
        ids_s = bf_s.open(f"{t}/ID").read()
        ids_h = bf_h.open(f"{t}/ID").read()
        assert len(ids_s) == len(ids_h) == ng ** 3
        o_s = np.argsort(ids_s)
        o_h = np.argsort(ids_h)
        np.testing.assert_array_equal(ids_s[o_s], ids_h[o_h])
        blocks = ["Position", "Velocity", "Mass"]
        if t == 0:
            blocks += ["SmoothingLength", "Density", "EgyWtDensity",
                       "ElectronAbundance", "InternalEnergy"]
        for name in blocks:
            a_s = bf_s.open(f"{t}/{name}").read()
            a_h = bf_h.open(f"{t}/{name}").read()
            # byte-for-byte after the ID sort
            np.testing.assert_array_equal(
                np.asarray(a_s)[o_s], np.asarray(a_h)[o_h],
                err_msg=f"{t}/{name}")
        # Potential present in BOTH writers (OutputPotential default;
        # petaio.c Potential + gravshort-tree.c:137 tree term); the
        # sharded column sums tree+PM in-driver while the host writer
        # re-derives the tree part on the mirror, so compare to walk
        # rounding rather than bytes
        p_s = bf_s.open(f"{t}/Potential").read()
        p_h = bf_h.open(f"{t}/Potential").read()
        scale = np.abs(p_h).max()
        np.testing.assert_allclose(p_s[o_s], p_h[o_h],
                                   atol=2e-5 * scale, rtol=2e-4,
                                   err_msg=f"{t}/Potential")
        # stripes: one file per shard
        blk = bf_s.open(f"{t}/Position")
        assert blk.Nfile == NDEV

    # restart from the sharded snapshot round-trips
    from mpgadget_tpu.timeline import Timeline as TL
    sim2 = Simulation.from_snapshot(str(snap_sharded), dict(
        output_dir=str(tmp_path / "restart"), nmesh=16,
        hydro_on=True, tree_grav_on=True, cooling_on=True,
        random_particle_offset=0.0,
        timeline=TL([0.13], TimeIC=0.115, TimeMax=0.13)))
    np.testing.assert_array_equal(
        np.sort(np.asarray(sim2.pdata.pid)[
            np.asarray(sim2.pdata.valid)]),
        np.sort(np.asarray(sim.pdata.pid)[
            np.asarray(sim.pdata.valid)]))


def test_run_sharded_fof_sync_and_seeding(mesh8, tmp_path):
    """Sync-point FOF inside run_sharded runs distributed — catalog
    written as PIG with group-sorted particle blocks, and a
    qualifying halo without a BH seeds one by converting its densest
    gas member (fof_seed + fofpetaio.c at scale) — with no host
    mirror."""
    from mpgadget_tpu.run import Simulation, SimConfig
    from mpgadget_tpu.particles import ParticleData
    from mpgadget_tpu.cosmology import Cosmology
    from mpgadget_tpu.timeline import Timeline
    from mpgadget_tpu.io.bigfile import BigFile
    from mpgadget_tpu.utils import get_unitsystem, constants as C

    units = get_unitsystem(C.CM_PER_KPC, 1.989e43, 1e5)
    rng = np.random.RandomState(9)
    box = 8000.0
    n_bg = 1024
    n_clump = 96
    mean_sep = box / np.cbrt(n_bg + 2 * n_clump)
    ll = 0.2 * mean_sep
    # a tight DM clump straddling the x = box/2 shard boundary, with
    # gas members inside it (seed candidates)
    dm_clump = np.array([box / 2, box / 3, box / 3]) \
        + rng.randn(n_clump, 3) * ll * 0.8
    gas_clump = np.array([box / 2, box / 3, box / 3]) \
        + rng.randn(n_clump, 3) * ll * 0.5
    pos = np.mod(np.concatenate([
        rng.uniform(0, box, (n_bg, 3)), dm_clump, gas_clump]), box)
    ptype = np.concatenate([
        np.ones(n_bg, np.int32), np.ones(n_clump, np.int32),
        np.zeros(n_clump, np.int32)])
    mass = np.where(ptype == 0, 1.0, 5.0)
    n = len(pos)
    pdata = ParticleData.from_numpy(
        pos, np.zeros((n, 3)), mass, ptype, np.arange(n) + 1, box)
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, HubbleParam=0.7,
                   OmegaBaryon=0.05, TimeBegin=0.1).init_units(units)
    cfg = SimConfig(
        boxsize=box, nmesh=16, output_dir=str(tmp_path),
        timeline=Timeline([0.105], TimeIC=0.1, TimeMax=0.105),
        units=units, hydro_on=True, tree_grav_on=True,
        cooling_on=True, random_particle_offset=0.0,
        black_hole_on=True, bh_seed_mass=0.05,
        min_fof_mass_for_seed=1.0, min_mstar_for_seed=-1.0,
        snapshot_with_fof=True, fof_min_group_length=32)
    sim = Simulation(cp, pdata, cfg, time_ic=0.1)
    sim.run_sharded(mesh8, verbose=False)

    # PIG written with the clump's group
    pig = tmp_path / "PIG_000"
    assert pig.is_dir()
    bf = BigFile(str(pig))
    masses = bf.open("FOFGroups/Mass").read()
    assert len(masses) >= 1
    # clump: 96 DM x 5.0 + 96 gas x 1.0 (minus the seeded BH's gas row
    # if seeding precedes... seeding follows the PIG write)
    assert masses.max() > n_clump * 5.0
    gid1 = bf.open("1/GroupID").read()
    assert np.all(np.diff(gid1.astype(np.int64)) >= 0), \
        "PIG particle blocks must be GrNr-sorted"
    # the clump is drawn at sigma = 0.8 linking lengths: a few >2sigma
    # outliers legitimately fall outside the percolation network
    assert (gid1 == 1).sum() >= n_clump - 12
    # seeding: exactly one BH, converted from the densest clump gas
    valid = np.asarray(sim.pdata.valid)
    pt = np.asarray(sim.pdata.ptype)
    assert (valid & (pt == 5)).sum() == 1
    bhm = np.asarray(sim.bh.bh_mass)[valid & (pt == 5)]
    np.testing.assert_allclose(bhm, 0.05, rtol=1e-6)


def test_run_sharded_lightcone_matches_single(mesh8, tmp_path):
    """Sharded lightcone (lightcone.c:176-221 at scale): per-shard
    crossing detection + per-process stripe append with NO global
    gather.  On a crossing-rich box (z~1.2, horizon sweeping through
    the replicas) the union of sharded stripe rows equals the
    single-device output row-for-row (matched by position; the two
    paths round u32->f32 differently at the ~1e-7 level)."""
    from mpgadget_tpu.run import Simulation, SimConfig
    from mpgadget_tpu.particles import ParticleData
    from mpgadget_tpu.cosmology import Cosmology
    from mpgadget_tpu.timeline import Timeline
    from mpgadget_tpu.timestep import TimestepParams
    from mpgadget_tpu.utils import get_unitsystem, constants as C

    units = get_unitsystem(C.CM_PER_KPC, 1.989e43, 1e5)
    rng = np.random.RandomState(5)
    box = 1.0e6                      # 1 Gpc/h: horizon ~2.6 boxes
    ng = 10
    n = ng ** 3
    grid = (np.stack(np.meshgrid(*[np.arange(ng)] * 3),
                     axis=-1).reshape(-1, 3) + 0.5) / ng * box
    pos = np.mod(grid + rng.uniform(-0.02, 0.02, (n, 3)) * box, box)
    vel = rng.randn(n, 3).astype(np.float64) * 100.0
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, HubbleParam=0.7,
                   OmegaBaryon=0.05, TimeBegin=0.45).init_units(units)

    def mk(sub):
        pd = ParticleData.from_numpy(
            pos, vel, np.full(n, 10.0), np.ones(n, np.int32),
            np.arange(n) + 1, box)
        c = SimConfig(
            boxsize=box, nmesh=16, output_dir=str(tmp_path / sub),
            timeline=Timeline([0.48], TimeIC=0.45, TimeMax=0.48),
            units=units, hydro_on=False, tree_grav_on=True,
            random_particle_offset=0.0, lightcone_on=True,
            timestep=TimestepParams(MaxSizeTimestep=0.02))
        return Simulation(cp, pd, c, time_ic=0.45)

    sim_p = mk("p")
    sim_p.run_sharded(mesh8, verbose=False)
    sim_s = mk("s")
    sim_s.run(verbose=False)

    def read_rows(sub):
        import glob
        rows = []
        for f in sorted(glob.glob(str(
                tmp_path / sub / "lightcone" / "*" / "*.raw"))):
            rows.append(np.fromfile(f, np.float64).reshape(-1, 4))
        return np.concatenate(rows) if rows else np.zeros((0, 4))

    rp = read_rows("p")
    rs = read_rows("s")
    assert len(rs) > 50, f"box not crossing-rich ({len(rs)} rows)"
    # the two paths round u32->f32 positions differently (~1e-7
    # relative), so a row exactly ON the shell edge may flip its hit
    # test in one path only — allow a per-mille of unmatched rows
    assert abs(len(rp) - len(rs)) <= max(2, len(rs) // 500), \
        (len(rp), len(rs))
    op = np.lexsort(rp[:, :3].T)
    os_ = np.lexsort(rs[:, :3].T)
    m = min(len(rp), len(rs))
    bad = 0
    i = j = 0
    # two-pointer walk over the lexsorted sets: count rows without a
    # within-2kpc partner
    a, b = rp[op], rs[os_]
    while i < len(a) and j < len(b):
        if np.all(np.abs(a[i] - b[j]) <= 2.0):
            i += 1
            j += 1
        elif tuple(a[i, :3]) < tuple(b[j, :3]):
            bad += 1
            i += 1
        else:
            bad += 1
            j += 1
    bad += (len(a) - i) + (len(b) - j)
    assert bad <= max(4, m // 500), f"{bad} unmatched rows of {m}"


def test_pig_giant_group_spans_shards(mesh8, tmp_path):
    """PIG output when ONE group holds more members than a shard's
    row capacity (n_local): the composite-key member sort lets the
    group span stripe/shard boundaries (fofpetaio.c:291
    fof_distribute_particles analog) — no host-mirror fallback, and
    the striped block layout (one stripe per shard) proves the
    collective writer ran."""
    from mpgadget_tpu.run import Simulation, SimConfig
    from mpgadget_tpu.particles import ParticleData
    from mpgadget_tpu.cosmology import Cosmology
    from mpgadget_tpu.timeline import Timeline
    from mpgadget_tpu.io.bigfile import BigFile
    from mpgadget_tpu.utils import get_unitsystem, constants as C

    units = get_unitsystem(C.CM_PER_KPC, 1.989e43, 1e5)
    rng = np.random.RandomState(17)
    box = 8000.0
    n_bg = 512
    n_clump = 900           # > n_local = 512 for this capacity
    mean_sep = box / np.cbrt(n_bg + n_clump)
    ll = 0.2 * mean_sep
    clump = np.array([box / 2, box / 2, box / 2]) \
        + rng.randn(n_clump, 3) * ll * 0.7
    pos = np.mod(np.concatenate(
        [rng.uniform(0, box, (n_bg, 3)), clump]), box)
    n = len(pos)
    pdata = ParticleData.from_numpy(
        pos, np.zeros((n, 3)), np.full(n, 2.0),
        np.ones(n, np.int32), np.arange(n) + 1, box)
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, HubbleParam=0.7,
                   OmegaBaryon=0.05, TimeBegin=0.1).init_units(units)
    cfg = SimConfig(
        boxsize=box, nmesh=16, output_dir=str(tmp_path),
        timeline=Timeline([0.105], TimeIC=0.1, TimeMax=0.105),
        units=units, hydro_on=False, tree_grav_on=True,
        random_particle_offset=0.0, snapshot_with_fof=True,
        fof_min_group_length=32)
    sim = Simulation(cp, pdata, cfg, time_ic=0.1)
    # the giant group really exceeds the per-shard row capacity
    S = NDEV
    n_local = int(np.ceil(2.0 * sim.pdata.capacity / S / 256)) * 256
    assert n_clump > n_local, (n_clump, n_local)
    sim.run_sharded(mesh8, verbose=False)

    pig = tmp_path / "PIG_000"
    assert pig.is_dir()
    # collective striped write: one stripe file per shard — the host
    # fallback writes single-file blocks
    stripes = [s for s in os.listdir(str(pig / "1" / "Position"))
               if s.isdigit()]
    assert len(stripes) == S, stripes
    bf = BigFile(str(pig))
    masses = bf.open("FOFGroups/Mass").read()
    lengths = bf.open("FOFGroups/LengthByType").read().sum(axis=1)
    assert lengths.max() > n_local
    gid1 = bf.open("1/GroupID").read()
    assert np.all(np.diff(gid1.astype(np.int64)) >= 0), \
        "PIG particle blocks must be GrNr-sorted"
    # every member of every group present: counts match the catalog
    ng, cnt = np.unique(gid1, return_counts=True)
    np.testing.assert_array_equal(cnt, lengths[ng - 1])
    # members agree with the single-device FOF of the same state
    assert (gid1 == (np.argmax(masses) + 1)).sum() == lengths.max()


def test_run_sharded_bh_reposition(mesh8, tmp_path):
    """BH min-potential repositioning at scale (bhdynfric.c:199-231 +
    drift.c:32-49): with bh_reposition=True the sharded state carries
    the PM potential column and the BH jumps exactly onto its kernel
    minimum-potential neighbor — the same row the single-device
    semantics select from the mirrored state.

    Adversarial placement: the BH sits just ABOVE the box midplane in
    x and its true min-pot neighbor (the heavy clump) just BELOW it,
    so with count-balanced slabs the jump target lives on the OTHER
    side of a slab boundary — the scan must reach it through the
    replicated-BH global reduction (treewalk.c:325 export semantics),
    not just local rows."""
    from mpgadget_tpu.run import Simulation, SimConfig
    from mpgadget_tpu.particles import ParticleData
    from mpgadget_tpu.cosmology import Cosmology
    from mpgadget_tpu.timeline import Timeline
    from mpgadget_tpu.utils import get_unitsystem, constants as C

    units = get_unitsystem(C.CM_PER_KPC, 1.989e43, 1e5)
    rng = np.random.RandomState(3)
    box = 2000.0
    ng = 8
    n_dm = ng ** 3
    grid = (np.stack(np.meshgrid(*[np.arange(ng)] * 3),
                     axis=-1).reshape(-1, 3) + 0.5) / ng * box
    # a heavy DM clump => deep potential well near the BH; the well
    # center sits 30 kpc BELOW the midplane (where the count-balanced
    # boundary of an even shard count falls on a near-uniform box) and
    # the BH 30 kpc ABOVE it: jump target and BH straddle a slab edge
    well = np.array([0.5 * box - 30.0, 0.5 * box, 0.5 * box])
    pos = np.concatenate([
        grid + rng.uniform(-20, 20, (n_dm, 3)),
        well + rng.randn(32, 3) * 25.0,
        grid + box / ng / 2 + rng.uniform(-20, 20, (n_dm, 3)),
        [well + np.array([60.0, 0.0, 0.0])]]) % box
    ptype = np.concatenate([
        np.ones(n_dm + 32, np.int32), np.zeros(n_dm, np.int32),
        [np.int32(5)]])
    mass = np.concatenate([np.full(n_dm, 5.0), np.full(32, 50.0),
                           np.full(n_dm, 1.0), [2.0]])
    n = len(pos)
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, HubbleParam=0.7,
                   OmegaBaryon=0.05, TimeBegin=0.1).init_units(units)

    def mk(sub):
        pd = ParticleData.from_numpy(
            pos, np.zeros((n, 3)), mass, ptype, np.arange(n) + 1,
            box)
        c = SimConfig(
            boxsize=box, nmesh=16, output_dir=str(tmp_path / sub),
            timeline=Timeline([0.102], TimeIC=0.1, TimeMax=0.102),
            units=units, hydro_on=True, tree_grav_on=True,
            cooling_on=True, random_particle_offset=0.0,
            black_hole_on=True, bh_seed_mass=0.1,
            bh_reposition=True)
        return Simulation(cp, pd, c, time_ic=0.1)

    def bh_pos(sim):
        valid = np.asarray(sim.pdata.valid)
        pt = np.asarray(sim.pdata.ptype)
        bhr = np.flatnonzero(valid & (pt == 5))
        assert len(bhr) == 1
        return (np.asarray(sim.pdata.ipos)[bhr[0]].astype(np.float64)
                / 2 ** 32 * box)

    bh_start = pos[-1]

    sim_p = mk("p")
    sim_p.run_sharded(mesh8, max_steps=1, verbose=False)
    p_sharded = bh_pos(sim_p)
    # the BH must have JUMPED onto a neighbor (one step drifts < 1 kpc
    # from rest; any jump target is >= 5 kpc away)
    d0 = p_sharded - bh_start
    d0 -= np.round(d0 / box) * box
    assert np.linalg.norm(d0) > 5.0, np.linalg.norm(d0)

    # the landing point is the true min-pot in-kernel neighbor of the
    # final state (the jump is idempotent: the BH sits ON its target,
    # so re-deriving the argmin from the carried potential column must
    # select the particle it sits on)
    valid = np.asarray(sim_p.pdata.valid)
    pt = np.asarray(sim_p.pdata.ptype)
    # pdata.potential carries the PM part (single-device semantics);
    # the jump argmin runs on the TOTAL tree+PM potential
    # (gravshort-tree.c:137) — re-add the tree term exactly like the
    # single-device reposition does (run.py bh reposition block)
    _, tree_pot = sim_p._tree_grav.compute(
        sim_p.pdata, return_potential=True)
    pot = np.asarray(sim_p.pdata.potential) + np.asarray(tree_pot)
    pp = (np.asarray(sim_p.pdata.ipos).astype(np.float64)
          / 2 ** 32 * box)
    bhr = np.flatnonzero(valid & (pt == 5))[0]
    h = float(np.asarray(sim_p.pdata.hsml)[bhr])
    d = pp - p_sharded[None, :]
    d -= np.round(d / box) * box
    r = np.linalg.norm(d, axis=1)
    srcs = valid & np.isin(pt, [0, 1, 4, 5]) & (r < h)
    assert srcs.any()
    im = np.argmin(np.where(srcs, pot, np.inf))
    assert r[im] < 1.0, (r[im], pot[im], pot[bhr])

    # single-device semantics pick the same min-pot neighbor
    sim_s = mk("s")
    sim_s.run(max_steps=1, verbose=False)
    p_single = bh_pos(sim_s)
    dd = p_sharded - p_single
    dd -= np.round(dd / box) * box
    # same target particle: both runs drift it < 1e-3 box; different
    # targets would be >= the inter-particle spacing apart
    assert np.linalg.norm(dd) < 2.0, np.linalg.norm(dd)


def test_run_sharded_aux_physics(mesh8, tmp_path):
    """QSO helium reionization, excursion-set UVBG and lensing planes
    inside run_sharded (run.c:605-727 at scale): bubbles around halos
    of the DISTRIBUTED catalog ionize exactly the in-radius gas, the
    J21 readout marks reionized gas, the FITS plane equals a
    recomputation from the mirrored host state byte-for-byte, and the
    single-device loop ionizes the same particle set."""
    from mpgadget_tpu.run import Simulation, SimConfig
    from mpgadget_tpu.particles import ParticleData
    from mpgadget_tpu.cosmology import Cosmology
    from mpgadget_tpu.timeline import Timeline
    from mpgadget_tpu.utils import get_unitsystem, constants as C

    units = get_unitsystem(C.CM_PER_KPC, 1.989e43, 1e5)
    rng = np.random.RandomState(11)
    box = 8000.0
    ng = 8
    n_bg = ng ** 3
    grid = (np.stack(np.meshgrid(*[np.arange(ng)] * 3),
                     axis=-1).reshape(-1, 3) + 0.5) / ng * box
    # one massive DM halo straddling a shard boundary, gas inside the
    # future QSO bubble (r < 0.3 R) and far outside it (background)
    halo_c = np.array([box / 2, box / 3, box / 3])
    R_bub = 600.0
    n_halo, n_in = 64, 48
    pos = np.concatenate([
        grid + rng.uniform(-40, 40, (n_bg, 3)),            # bg DM
        halo_c + rng.randn(n_halo, 3) * 60.0,              # halo DM
        halo_c + rng.randn(n_in, 3) * 0.3 * R_bub / 3,     # gas in
        grid + box / ng / 2 + rng.uniform(-40, 40, (n_bg, 3)),  # gas
        halo_c + rng.randn(16, 3) * 50.0,                  # stars
    ]) % box
    # background gas closer than 2 R_bub to the halo would blur the
    # in/out margin: push it out
    d_bg = pos[n_bg + n_halo + n_in:n_bg + n_halo + n_in + n_bg] \
        - halo_c
    d_bg -= np.round(d_bg / box) * box
    rr = np.sqrt((d_bg ** 2).sum(1))
    close = rr < 2.0 * R_bub
    shift = np.where(close[:, None], 2.5 * R_bub
                     * d_bg / np.maximum(rr, 1.0)[:, None], 0.0)
    pos[n_bg + n_halo + n_in:n_bg + n_halo + n_in + n_bg] = \
        (pos[n_bg + n_halo + n_in:n_bg + n_halo + n_in + n_bg]
         + shift) % box
    ptype = np.concatenate([
        np.ones(n_bg + n_halo, np.int32),
        np.zeros(n_in, np.int32), np.zeros(n_bg, np.int32),
        np.full(16, 4, np.int32)])
    mass = np.where(ptype == 1, 50.0,
                    np.where(ptype == 4, 10.0, 1.0))
    n = len(pos)
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, HubbleParam=0.7,
                   OmegaBaryon=0.05, TimeBegin=0.1).init_units(units)

    # HeII table spanning the run's z ~ 9 epoch
    hist_path = tmp_path / "heii.txt"
    with open(hist_path, "w") as fh:
        fh.write("1.7\n150.0\n")
        for z, x, lm in [(12.0, 0.0, 0.0), (10.0, 0.02, 1e-33),
                         (8.0, 0.6, 2e-33), (6.0, 0.999, 1e-33)]:
            fh.write(f"{z} {x} {lm}\n")

    def mk(sub):
        pd = ParticleData.from_numpy(
            pos, np.zeros((n, 3)), mass, ptype, np.arange(n) + 1,
            box)
        c = SimConfig(
            boxsize=box, nmesh=16, output_dir=str(tmp_path / sub),
            timeline=Timeline([0.102], TimeIC=0.1, TimeMax=0.102),
            units=units, hydro_on=True, tree_grav_on=True,
            cooling_on=True, random_particle_offset=0.0,
            qso_lightup_on=True, reion_hist_file=str(hist_path),
            qso_min_mass=1000.0, qso_max_mass=1e8,
            qso_mean_bubble=R_bub, qso_var_bubble=0.0,
            excursion_set_on=True, excursion_set_zstart=12.0,
            excursion_set_zstop=5.0, uvbg_dim=32,
            reion_use_particle_sfr=False,
            # partial reionization on the 8 Mpc box: the halo's cell
            # crosses the f_coll threshold, the whole box does not
            reion_nion_phot_per_bary=10.0,
            reion_r_bubble_max=3000.0,
            plane_output_list="0.1", plane_resolution=64,
            fof_min_group_length=32)
        return Simulation(cp, pd, c, time_ic=0.1)

    sim = mk("p")
    sim.run_sharded(mesh8, max_steps=1, verbose=False)

    # --- QSO: exactly the in-bubble gas is ionized and heated ---
    valid = np.asarray(sim.pdata.valid)
    gas = valid & (np.asarray(sim.pdata.ptype) == 0)
    ion = np.asarray(sim.sph.he_iii_ionized) > 0
    pp = (np.asarray(sim.pdata.ipos).astype(np.float64)
          / 2 ** 32 * box)
    d = pp - halo_c
    d -= np.round(d / box) * box
    r = np.sqrt((d ** 2).sum(1))
    # bubble is centered on the halo CM (within the halo's ~60 kpc
    # spread): the r < 0.3 R gas is in, the r > 2 R gas is out
    assert ion[gas & (r < 0.3 * R_bub)].all()
    assert not ion[gas & (r > 2.0 * R_bub)].any()
    helium = tmp_path / "p" / "helium.txt"
    assert helium.exists()
    assert len(open(helium).read().strip().splitlines()) >= 1

    # --- excursion set: stars+halo reionize their cell ---
    j21 = np.asarray(sim.sph.local_j21)
    zre = np.asarray(sim.sph.zreion)
    assert (j21[gas] > 0).any(), "no UVBG built around the halo"
    assert (zre[gas & (j21 > 0)] > 0).all()
    assert (zre[gas] < 0).any(), "whole box reionized (degenerate)"

    # --- planes: sharded FITS == host recomputation, byte level ---
    import glob
    fits = sorted(glob.glob(str(tmp_path / "p" / "snap0_*.fits")))
    assert len(fits) == 3                      # normals 0,1,2
    orig = {f: open(f, "rb").read() for f in fits}
    from mpgadget_tpu.physics.plane import write_planes
    write_planes(sim, 0, sim._plane_params)    # host pdata path
    for f in fits:
        assert open(f, "rb").read() == orig[f], f

    # --- single-device agreement: same ionized set, same zreion ---
    sim_s = mk("s")
    sim_s.run(max_steps=1, verbose=False)
    v_s = np.asarray(sim_s.pdata.valid)
    ion_s = set(np.asarray(sim_s.pdata.pid)[
        v_s & (np.asarray(sim_s.sph.he_iii_ionized) > 0)])
    ion_p = set(np.asarray(sim.pdata.pid)[valid & ion])
    assert ion_p == ion_s
    zre_s = np.asarray(sim_s.sph.zreion)
    re_p = set(np.asarray(sim.pdata.pid)[valid & (zre > 0)])
    re_s = set(np.asarray(sim_s.pdata.pid)[v_s & (zre_s > 0)])
    sym = re_p ^ re_s
    assert len(sym) <= max(2, len(re_p) // 50), \
        f"zreion sets differ by {len(sym)}"
