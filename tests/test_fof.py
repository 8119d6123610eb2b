"""FOF halo finder tests (test_fof.c analog): known cluster
configurations, linking-length behavior, periodic wrapping, catalog
properties vs direct computation."""

import numpy as np
import jax.numpy as jnp
import pytest

from mpgadget_tpu.physics.fof import fof_label, fof_catalog, FOFParams
from mpgadget_tpu.particles import pos_to_fixed


def scipy_fof(pos, box, ll):
    """Reference implementation: connected components via scipy."""
    from scipy.spatial import cKDTree
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import connected_components
    tree = cKDTree(pos, boxsize=box)
    prs = tree.query_pairs(ll, output_type="ndarray")
    n = len(pos)
    mat = csr_matrix((np.ones(len(prs)), (prs[:, 0], prs[:, 1])),
                     shape=(n, n))
    ncomp, lab = connected_components(mat, directed=False)
    return lab


def test_fof_vs_scipy_random():
    rng = np.random.RandomState(8)
    box = 1000.0
    n = 3000
    # clumpy distribution: several gaussian blobs + background
    centers = rng.uniform(100, 900, (8, 3))
    blob = centers[rng.randint(8, size=n // 2)] + 8.0 * rng.randn(n // 2, 3)
    pos = np.concatenate([rng.uniform(0, box, (n - n // 2, 3)),
                          np.mod(blob, box)])
    ll = 15.0
    ipos = jnp.asarray(pos_to_fixed(pos, box))
    labels, _, _ = fof_label(ipos, jnp.ones(n, bool), box, ll)
    lab = np.asarray(labels)
    ref = scipy_fof(pos, box, ll)
    # same partition: group sizes of matched labels must agree
    # (labels differ; compare partition refinement both ways)
    import collections
    pairs_ = collections.Counter(zip(lab, ref))
    # every our-label maps to exactly one ref-label and vice versa
    ours_to_ref = {}
    for (a, b), c in pairs_.items():
        ours_to_ref.setdefault(a, set()).add(b)
    assert all(len(v) == 1 for v in ours_to_ref.values()), \
        "our groups split reference groups"
    ref_to_ours = {}
    for (a, b), c in pairs_.items():
        ref_to_ours.setdefault(b, set()).add(a)
    assert all(len(v) == 1 for v in ref_to_ours.values()), \
        "our groups merge reference groups"


def test_fof_periodic_wrap():
    """A cluster straddling the box boundary is one group."""
    box = 100.0
    pos = np.array([[99.5, 50, 50], [0.2, 50, 50], [0.9, 50, 50],
                    [50, 50, 50]])
    ipos = jnp.asarray(pos_to_fixed(pos, box))
    labels, _, _ = fof_label(ipos, jnp.ones(4, bool), box, 1.0)
    lab = np.asarray(labels)
    assert lab[0] == lab[1] == lab[2]
    assert lab[3] != lab[0]


def test_fof_catalog_properties():
    box = 1000.0
    rng = np.random.RandomState(9)
    # one 50-particle halo + one 40-particle halo + field particles
    h1 = np.array([200.0, 300, 400]) + 3 * rng.randn(50, 3)
    h2 = np.array([700.0, 100, 800]) + 3 * rng.randn(40, 3)
    field = rng.uniform(0, box, (200, 3))
    pos = np.mod(np.concatenate([h1, h2, field]), box)
    n = len(pos)
    mass = np.concatenate([np.full(50, 2.0), np.full(40, 1.0),
                           np.full(200, 1.5)])
    vel = rng.randn(n, 3).astype(np.float32)
    vel[:50] += 100.0
    ipos = jnp.asarray(pos_to_fixed(pos, box))
    mean_sep = box / np.cbrt(n)
    cfg = FOFParams(linking_length=10.0 / mean_sep, min_group_length=30,
                    primary_link_types=2)
    cat = fof_catalog(ipos, jnp.asarray(vel), jnp.asarray(mass),
                      jnp.full(n, 1, jnp.int32), jnp.ones(n, bool),
                      box, mean_sep, cfg)
    assert cat["ngroups"] == 2
    # catalog sorted by mass: halo1 (100.0) first, halo2 (40.0) second
    assert cat["lengths"][0] == 50
    assert cat["lengths"][1] == 40
    assert np.isclose(cat["masses"][0], 100.0, rtol=1e-5)
    assert np.isclose(cat["masses"][1], 40.0, rtol=1e-5)
    # CM within the scatter of the halo center
    np.testing.assert_allclose(cat["cm"][0], [200, 300, 400], atol=2.0)
    np.testing.assert_allclose(cat["vel"][0], vel[:50].mean(axis=0)
                               * (mass[:50] / mass[:50].mean())[0],
                               atol=1.0)
    # group indices: halo members share an index, field = -1
    gi = cat["group_index"]
    assert len(set(gi[:50])) == 1 and gi[0] >= 0
    assert len(set(gi[50:90])) == 1 and gi[50] >= 0
    assert (gi[90:] == -1).mean() > 0.9  # field mostly ungrouped


def test_fof_secondary_linking():
    """Stars (type 4) attach to the group of their nearest DM primary
    (fof.c fof_secondary); distant field stars stay ungrouped."""
    box = 1000.0
    rng = np.random.RandomState(11)
    h1 = np.array([200.0, 300, 400]) + 3 * rng.randn(50, 3)
    h2 = np.array([700.0, 100, 800]) + 3 * rng.randn(40, 3)
    field_dm = rng.uniform(0, box, (100, 3))
    # stars: 5 inside halo1, 3 inside halo2, 2 deep field
    s1 = np.array([200.0, 300, 400]) + 2 * rng.randn(5, 3)
    s2 = np.array([700.0, 100, 800]) + 2 * rng.randn(3, 3)
    sf = np.array([[450.0, 600, 100], [50.0, 900, 250]])
    pos = np.mod(np.concatenate([h1, h2, field_dm, s1, s2, sf]), box)
    n = len(pos)
    ptype = np.concatenate([np.full(190, 1), np.full(10, 4)])
    mass = np.ones(n)
    ipos = jnp.asarray(pos_to_fixed(pos, box))
    mean_sep = box / np.cbrt(190)
    cfg = FOFParams(linking_length=10.0 / mean_sep, min_group_length=30,
                    primary_link_types=2, secondary_link_types=16)
    cat = fof_catalog(ipos, jnp.zeros((n, 3), jnp.float32),
                      jnp.asarray(mass), jnp.asarray(ptype, jnp.int32),
                      jnp.ones(n, bool), box, mean_sep, cfg)
    gi = cat["group_index"]
    # stars in halos share the halo's group index
    assert set(gi[190:195]) == {gi[0]}
    assert set(gi[195:198]) == {gi[50]}
    # per-type lengths: group 0 (mass 55) has 50 DM + 5 stars
    g0 = gi[0]
    assert cat["len_by_type"][g0, 1] == 50
    assert cat["len_by_type"][g0, 4] == 5
    assert cat["lengths"][g0] == 55
    # field stars: either ungrouped or attached to a (dropped) field
    # primary -> group_index -1 either way
    assert gi[198] == -1 and gi[199] == -1


def test_pig_particle_blocks(tmp_path):
    """RestartFlag-3 style output: PIG must contain FOFGroups tables
    plus particle blocks sorted by group with 1-based GroupID
    (fofpetaio.c fof_save_particles; fof.c:1127 GrNr from 1)."""
    from mpgadget_tpu.io.bigfile import BigFile
    from mpgadget_tpu.io import snapshot as snap_io
    from mpgadget_tpu.run import Simulation
    from mpgadget_tpu.timeline import Timeline

    box = 1000.0
    rng = np.random.RandomState(13)
    h1 = np.array([200.0, 300, 400]) + 3 * rng.randn(50, 3)
    h2 = np.array([700.0, 100, 800]) + 3 * rng.randn(40, 3)
    field = rng.uniform(0, box, (100, 3))
    s1 = np.array([200.0, 300, 400]) + 2 * rng.randn(4, 3)
    pos = np.mod(np.concatenate([h1, h2, field, s1]), box)
    nd, ns = 190, 4
    ic = str(tmp_path / "IC")
    bf = BigFile(ic, create=True)
    snap_io.write_species(bf, 1, pos=pos[:nd],
                          vel=np.zeros((nd, 3)),
                          pid=np.arange(nd, dtype=np.uint64) + 1,
                          mass=np.full(nd, 2.0), atime=0.5)
    snap_io.write_species(bf, 4, pos=pos[nd:],
                          vel=np.zeros((ns, 3)),
                          pid=np.arange(ns, dtype=np.uint64) + 1000,
                          mass=np.full(ns, 0.5), atime=0.5)
    ntot = np.zeros(6, np.uint64)
    ntot[1], ntot[4] = nd, ns
    snap_io.write_header(bf, snap_io.SnapshotHeader(
        TotNumPart=ntot, MassTable=np.zeros(6), Time=0.5, TimeIC=0.5,
        BoxSize=box, Omega0=0.3, OmegaLambda=0.7, HubbleParam=0.7))

    outdir = str(tmp_path / "out")
    sim = Simulation.from_snapshot(ic, dict(
        output_dir=outdir, nmesh=16,
        timeline=Timeline([0.6], TimeIC=0.5, TimeMax=0.6),
        hydro_on=False, tree_grav_on=False,
        fof_min_group_length=30,
        fof_linking_length=10.0 / (box / np.cbrt(nd))))
    import os
    os.makedirs(outdir, exist_ok=True)
    cat = sim.run_fof(save=True, label=7)

    pig = BigFile(f"{outdir}/PIG_007")
    gid_tab = pig.open("FOFGroups/GroupID").read()
    assert gid_tab[0] == 1  # 1-based
    assert len(gid_tab) == cat["ngroups"] == 2
    # particle blocks: DM + stars, sorted by GroupID
    gdm = pig.open("1/GroupID").read()
    gst = pig.open("4/GroupID").read()
    assert len(gdm) == 90 and len(gst) == 4
    assert np.all(np.diff(gdm) >= 0) and np.all(np.diff(gst) >= 0)
    # star masses/ids preserved
    assert np.allclose(pig.open("4/Mass").read(), 0.5)
    assert set(pig.open("4/ID").read()) == set(range(1000, 1004))
    # group lengths match LengthByType
    lbt = pig.open("FOFGroups/LengthByType").read()
    for g in (1, 2):
        assert (gdm == g).sum() == lbt[g - 1][1]
        assert (gst == g).sum() == lbt[g - 1][4]
    # positions of group-1 DM particles are inside that halo
    p1 = pig.open("1/Position").read()[gdm == gid_tab[0]]
    cmref = cat["cm"][0]
    assert np.all(np.linalg.norm(p1 - cmref, axis=1) < 25.0)
