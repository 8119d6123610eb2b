"""Sharded snapshot output: stripe-per-shard collective writes.

TPU-native analog of the reference's collective petaio writer
(libgadget/petaio.c:33-68 NumWriters/BytesPerFile policy, :622-700
petaio_save_block): instead of allgathering the whole particle state
to one writer (the round-3 ``mirror_to_host`` pattern), every block is
created with one stripe FILE per mesh shard; each process writes only
the rows its own devices hold, so peak host memory during output is
O(N/S) per process and the bytes ride local disks in parallel.

Layout: rows of species t appear in shard order (stripe file s holds
shard s's rows, compacted) — the same "concatenation of per-rank rows"
layout the reference produces, just keyed by shard instead of MPI
rank.  A snapshot written here is byte-identical to the single-writer
snapshot after a row sort by ID (tests/test_parallel.py).

The block set is driven by the sharded-state keys (the sharded
run carries exactly the registry state, io/registry.py); with
OutputPotential (the default) the sharded state carries the total
tree+PM potential column and the Potential block is written like the
single-writer path (petaio.c OutputPotential).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..utils.constants import GAMMA_MINUS1


def build_species_pack(mesh, *, keys):
    """fn(st, t) -> (packed P('x') dict, counts replicated i32[S]):
    rows with ptype == t (valid) compacted to the front of each shard,
    in row order (stable) — the per-shard half of petaio_save_block's
    row layout."""
    def local(st, t):
        mask = st["valid"] & (st["ptype"] == t)
        order = jnp.argsort(~mask, stable=True)
        out = {k: st[k][order] for k in keys}
        counts = lax.all_gather(jnp.sum(mask.astype(jnp.int32)), "x")
        return out, counts

    fn = shard_map(
        local, mesh=mesh,
        in_specs=({k: P("x") for k in set(keys) | {"valid", "ptype"}},
                  P()),
        out_specs=({k: P("x") for k in keys}, P()),
        check_vma=False)
    return jax.jit(fn)


def _barrier():
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("sharded_io")


def _gather_sums(sums_local):
    """Combine per-stripe byte sums across processes (each process
    fills only its own shards' entries; others are -1)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        allsums = multihost_utils.process_allgather(
            np.asarray(sums_local, np.int64))
        return np.max(allsums, axis=0)
    return np.asarray(sums_local, np.int64)


def write_block_sharded(bf, name, packed_col, counts, dtype,
                        transform=None):
    """Write one block with Nfile = S stripes, stripe s = shard s's
    compacted rows.  packed_col: the sharded packed array (global jax
    Array); counts: host i32[S] valid rows per shard; transform:
    host fn(np rows) -> np rows applied per stripe (unit/derived-block
    conversions)."""
    S = counts.shape[0]
    total = int(counts.sum())
    shard0 = packed_col.addressable_shards[0]
    ncol = 1 if packed_col.ndim == 1 else packed_col.shape[1]
    if transform is not None:
        probe = transform(np.asarray(shard0.data)[:1])
        ncol = 1 if probe.ndim == 1 else probe.shape[1]
    dt = np.dtype(dtype)
    if jax.process_index() == 0:
        blk = bf.create(name, dtype=dt, size=total, nmemb=ncol,
                        Nfile=S)
        # stripe sizes follow the per-shard counts, not the default
        # equal split
        blk.Nfile = S
        blk.fsize = [int(c) for c in counts]
        blk.fchecksum = [0] * S
        blk._write_header()
    _barrier()
    if jax.process_index() != 0:
        blk = bf.open(name)
    sums = np.full(S, -1, np.int64)
    for sh in packed_col.addressable_shards:
        s = sh.index[0].start // sh.data.shape[0] \
            if sh.index[0].start else 0
        rows = np.asarray(sh.data)[:int(counts[s])]
        if transform is not None:
            rows = transform(rows)
        sums[s] = blk.write_stripe(s, rows.astype(dt, copy=False))
    allsums = _gather_sums(sums)
    _barrier()
    if jax.process_index() == 0:
        blk.finalize_checksums(np.maximum(allsums, 0))
    return total


def species_block_table(state, t, *, atime, boxsize, ipos_offset,
                        with_gas, with_sfr, with_metals, with_bh):
    """(block name, state key(s), dtype, transform) rows for species t,
    mirroring write_snapshot + _species_extra_blocks +
    io/registry.STATE_BLOCKS — keyed on the sharded-state columns."""
    inv32 = boxsize / 2.0 ** 32
    off = ipos_offset.astype(np.uint64)

    def pos_tr(ip):
        ip = (ip.astype(np.uint64) - off).astype(np.uint32)
        return ip.astype(np.float64) * inv32

    vfac = 1.0 / atime

    def vel_tr(v):
        # reciprocal-multiply, bit-identical to the host writer
        # (io/snapshot.write_species)
        return (v * vfac).astype("<f4")

    a3inv = 1.0 / atime ** 3

    table = [
        ("Position", "ipos", "<f8", pos_tr),
        ("Velocity", "vel", "<f4", vel_tr),
        ("ID", "pid", "<u8", None),
        ("Mass", "mass", "<f4", None),
    ]
    if "potential" in state:
        # total tree+PM potential carried by the sharded state
        # (OutputPotential, petaio.c Potential registration +
        # gravshort-tree.c:137 tree term)
        table.append(("Potential", "potential", "<f4", None))
    if t == 0 and with_gas:
        table += [
            ("SmoothingLength", "hsml", "<f4", None),
            ("Density", "density", "<f4", None),
            ("EgyWtDensity", "egywt", "<f4", None),
        ]
        if "ne" in state:
            table.append(("ElectronAbundance", "ne", "<f4", None))
        if "he_iii_ionized" in state:
            table.append(("HeIIIIonized", "he_iii_ionized", "u1",
                          None))
        if "local_j21" in state:
            table += [("J21", "local_j21", "<f4", None),
                      ("ZReionized", "zreion", "<f4", None)]
        if with_sfr:
            table += [("StarFormationRate", "sfr", "<f4", None),
                      ("DelayTime", "delay_time", "<f4", None)]
        if "metallicity" in state:
            table.append(("Metallicity", "metallicity", "<f4", None))
        if with_metals:
            table.append(("Metals", "metals", "<f4", None))
        # derived InternalEnergy needs two columns: handled by caller
    if t == 4:
        if with_sfr:
            table += [
                ("StarFormationTime", "formation_time", "<f4", None),
                ("BirthDensity", "birth_density", "<f4", None),
                ("Metallicity", "birth_metallicity", "<f4", None),
            ]
        if with_metals:
            table += [
                ("Metals", "metals", "<f4", None),
                ("TotalMassReturned", "total_mass_returned", "<f4",
                 None),
                ("LastEnrichmentMyr", "last_enrichment_myr", "<f4",
                 None),
            ]
    if t == 5 and with_bh:
        table += [
            ("BlackholeMass", "bh_mass", "<f4", None),
            ("BlackholeAccretionRate", "bh_mdot", "<f4", None),
            ("BlackholeDensity", "bh_density", "<f4", None),
            ("BlackholeMtrack", "bh_mtrack", "<f4", None),
            ("BlackholeProgenitors", "bh_progs", "<i4", None),
            ("BlackholeKineticFdbkEnergy", "bh_ke", "<f4", None),
            ("BHVelDisp", "bh_vdisp", "<f4", None),
        ]
        if "formation_time" in state:
            table.append(("StarFormationTime", "formation_time",
                          "<f4", None))
    return [(n, k, d, tr) for (n, k, d, tr) in table if k in state]


def write_pig_sharded(sim, mesh, state, n_local, labels,
                      sorted_labels, cat, *, label=None, cache=None,
                      with_gas=False, with_sfr=False,
                      with_metals=False, with_bh=False):
    """FOF catalog (PIG) output from the sharded state
    (fof_save_groups + fof_save_particles, fofpetaio.c:540-570 at
    scale): rank 0 writes the small FOFGroups table from the host
    catalog; the per-particle blocks are globally sorted by group rank
    with the distributed sort (the mpsort analog) and striped out
    shard-per-file like the snapshot writer.  Returns the path, or
    None if the member sort overflowed a shard (one group larger than
    a shard's row capacity) — the caller falls back to the host
    writer."""
    from ..io.bigfile import BigFile
    from .fof import build_group_index
    from .sort import sharded_sort
    from jax.sharding import NamedSharding

    cache = cache if cache is not None else {}
    if label is None:
        label = max(sim.snapshot_count - 1, 0)
    path = os.path.join(sim.cfg.output_dir,
                        f"{sim.cfg.fof_file_base}_{label:03d}")
    if jax.process_index() == 0:
        bf = BigFile(path, create=True)
        ng = cat["ngroups"]
        atime = sim.atime
        bf.create_from_array("FOFGroups/GroupID",
                             np.arange(1, ng + 1, dtype="<u4"))
        bf.create_from_array("FOFGroups/Mass",
                             cat["masses"].astype("<f4"))
        off = sim._ipos_offset.astype(np.float64) / 2.0 ** 32 \
            * sim.cfg.boxsize
        bf.create_from_array(
            "FOFGroups/MassCenterPosition",
            np.mod(cat["cm"] - off, sim.cfg.boxsize).astype("<f8"))
        bf.create_from_array("FOFGroups/MassCenterVelocity",
                             (cat["vel"] / atime).astype("<f4"))
        bf.create_from_array("FOFGroups/LengthByType",
                             cat["len_by_type"].astype("<u4"))
        bf.create_from_array("FOFGroups/MassByType",
                             cat["mass_by_type"].astype("<f4"))
        bf.create_from_array("FOFGroups/StarFormationRate",
                             cat["sfr"].astype("<f4"))
    _barrier()
    if jax.process_index() != 0:
        bf = BigFile(path)

    ntot = np.zeros(6, np.uint64)
    ngroups = cat["ngroups"]
    if sim.cfg.fof_save_particles and ngroups > 0:
        if "gi" not in cache:
            cache["gi"] = build_group_index(mesh, n_local=n_local)
        srt = np.argsort(sorted_labels)
        gi = cache["gi"](
            labels,
            jnp.asarray(sorted_labels[srt].astype(np.int32)),
            jnp.asarray(np.arange(len(sorted_labels))[srt]
                        .astype(np.int32)))

        atime = sim.atime
        all_tables = {
            t: species_block_table(
                state, t, atime=atime, boxsize=sim.cfg.boxsize,
                ipos_offset=sim._ipos_offset, with_gas=with_gas,
                with_sfr=with_sfr, with_metals=with_metals,
                with_bh=with_bh)
            for t in range(6)}
        keys = sorted({k for tab in all_tables.values()
                       for (_, k, _, _) in tab}
                      | {"ptype"}
                      | ({"entropy", "density"} if with_gas
                         else set()))
        sort_key = ("pig_sort", tuple(keys))
        if sort_key not in cache:
            def sort_fn(gi_, arrays, sel):
                # composite (group rank << 34 | global row) key: the
                # sampled splitters may then fall INSIDE a group, so
                # one group's members can span stripe/shard boundaries
                # in the GrNr-sorted order — the analog of
                # fof_distribute_particles redistributing a giant
                # group across ranks (fofpetaio.c:291) instead of
                # capping a group at one shard's rows.
                gid = lax.axis_index("x").astype(jnp.int64) * n_local \
                    + jnp.arange(n_local, dtype=jnp.int64)
                key = (gi_.astype(jnp.int64) << 34) | gid
                k_s, arrays_s, valid_s, ovf = sharded_sort(
                    key, arrays, sel, "x", bucket_cap=n_local)
                return (k_s >> 34).astype(jnp.int32), arrays_s, \
                    valid_s, ovf
            cache[sort_key] = jax.jit(shard_map(
                sort_fn, mesh=mesh,
                in_specs=(P("x"), {k: P("x") for k in keys}, P("x")),
                out_specs=(P("x"), {k: P("x") for k in keys}, P("x"),
                           P()),
                check_vma=False))
        sel = state["valid"] & (gi >= 0)
        gi_s, arrays_s, valid_s, ovf = cache[sort_key](
            gi, {k: state[k] for k in keys}, sel)
        if int(np.asarray(ovf)):
            # splitter-sampling imbalance only (a group can no longer
            # overflow a shard by itself); the caller's host fallback
            # remains as a safety net
            return None
        pack_key = ("pig_pack", tuple(keys))
        if pack_key not in cache:
            cache[pack_key] = build_species_pack(
                mesh, keys=tuple(set(keys) | {"gi"}))
        st2 = dict(arrays_s)
        st2["gi"] = gi_s
        st2["valid"] = valid_s
        for t in range(6):
            packed, counts = cache[pack_key](st2, jnp.int32(t))
            counts = np.asarray(counts)
            total = int(counts.sum())
            ntot[t] = total
            if total == 0:
                continue
            for (name, key, dtype, tr) in all_tables[t]:
                write_block_sharded(bf, f"{t}/{name}", packed[key],
                                    counts, dtype, transform=tr)
            write_block_sharded(
                bf, f"{t}/GroupID", packed["gi"], counts, "<u4",
                transform=lambda g: (g + 1).astype("<u4"))
            if t == 0 and with_gas:
                a3 = 1.0 / atime ** 3

                def u_tr(ent_rho, a3=a3):
                    u = ent_rho[:, 0] / GAMMA_MINUS1 * np.maximum(
                        ent_rho[:, 1] * a3, 1e-30) ** GAMMA_MINUS1
                    return u.astype("<f4")

                ent_rho = jnp.stack([packed["entropy"],
                                     packed["density"]], axis=1)
                write_block_sharded(bf, "0/InternalEnergy", ent_rho,
                                    counts, "<f4", transform=u_tr)

    if jax.process_index() == 0:
        hdr = bf.create("Header")
        hdr.attrs["NumFOFGroupsTotal"] = np.asarray([ngroups], "<u8")
        hdr.attrs["NumPartInGroupTotal"] = ntot.astype("<u8")
        hdr.attrs["Time"] = float(sim.atime)
        hdr.attrs["BoxSize"] = float(sim.cfg.boxsize)
        hdr.attrs["Omega0"] = float(sim.CP.Omega0)
        hdr.attrs["OmegaLambda"] = float(sim.CP.OmegaLambda)
        hdr.attrs["HubbleParam"] = float(sim.CP.HubbleParam)
    _barrier()
    return path


def write_snapshot_sharded(sim, mesh, state, n_local, *, label=None,
                           cache=None, with_gas=False, with_sfr=False,
                           with_metals=False, with_bh=False):
    """Collective snapshot from the sharded run state — the
    write_checkpoint analog without the host mirror.  Every process
    writes its own shards' stripe files; rank 0 writes headers,
    Snapshots.txt and the neutrino state.  Returns the snapshot
    path."""
    from ..io.bigfile import BigFile
    from ..io import snapshot as snap_io

    cache = cache if cache is not None else {}
    if label is None:
        label = sim.snapshot_count
        sim.snapshot_count += 1
    path = os.path.join(sim.cfg.output_dir,
                        f"{sim.cfg.snapshot_base}_{label:03d}")
    if jax.process_index() == 0:
        bf = BigFile(path, create=True)
    _barrier()
    if jax.process_index() != 0:
        bf = BigFile(path)
    atime = sim.atime

    all_tables = {
        t: species_block_table(
            state, t, atime=atime, boxsize=sim.cfg.boxsize,
            ipos_offset=sim._ipos_offset, with_gas=with_gas,
            with_sfr=with_sfr, with_metals=with_metals,
            with_bh=with_bh)
        for t in range(6)}
    keys = sorted({k for tab in all_tables.values()
                   for (_, k, _, _) in tab}
                  | ({"entropy", "density"} if with_gas else set()))
    if "pack" not in cache:
        cache["pack"] = build_species_pack(mesh, keys=tuple(keys))
    pack = cache["pack"]
    st_in = {k: state[k] for k in set(keys) | {"valid", "ptype"}}

    ntot = np.zeros(6, np.uint64)
    for t in range(6):
        packed, counts = pack(st_in, jnp.int32(t))
        counts = np.asarray(counts)
        total = int(counts.sum())
        ntot[t] = total
        if total == 0:
            continue
        for (name, key, dtype, tr) in all_tables[t]:
            write_block_sharded(bf, f"{t}/{name}", packed[key],
                                counts, dtype, transform=tr)
        if t == 0 and with_gas:
            # derived InternalEnergy = entropy/(gamma-1) rho^(gamma-1)
            # (petaio InternalEnergy; _species_extra_blocks analog)
            rho = packed["density"]
            a3 = 1.0 / atime ** 3

            def u_tr(ent_rho):
                ent, rho_ = ent_rho[:, 0], ent_rho[:, 1]
                u = ent / GAMMA_MINUS1 * np.maximum(
                    rho_ * a3, 1e-30) ** GAMMA_MINUS1
                return u.astype("<f4")

            ent_rho = jnp.stack([packed["entropy"],
                                 packed["density"]], axis=1)
            write_block_sharded(bf, "0/InternalEnergy", ent_rho,
                                counts, "<f4", transform=u_tr)

    if jax.process_index() == 0:
        hubble = sim.CP.hubble_function(atime)
        header = snap_io.SnapshotHeader(
            TotNumPart=ntot, MassTable=np.zeros(6), Time=atime,
            TimeIC=sim.time_ic, BoxSize=sim.cfg.boxsize,
            Omega0=sim.CP.Omega0, OmegaLambda=sim.CP.OmegaLambda,
            HubbleParam=sim.CP.HubbleParam,
            OmegaBaryon=sim.CP.OmegaBaryon,
            CMBTemperature=sim.CP.CMBTemperature,
            UnitLength_in_cm=sim.cfg.units.UnitLength_in_cm,
            UnitMass_in_g=sim.cfg.units.UnitMass_in_g,
            UnitVelocity_in_cm_per_s=(
                sim.cfg.units.UnitVelocity_in_cm_per_s),
            RSDFactor=1.0 / (atime * hubble),
        )
        snap_io.write_header(bf, header)
        if getattr(sim, "_nu_table_state", None) is not None:
            snap_io.write_neutrino_state(
                bf, sim._nu_table_state.state_dict())
        with open(os.path.join(sim.cfg.output_dir, "Snapshots.txt"),
                  "a") as fh:
            fh.write(f"{label:03d} {atime}\n")
    _barrier()
    return path
