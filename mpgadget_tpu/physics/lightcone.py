"""Past light cone particle output (libgadget/lightcone.c:30-268).

The observer sits at the box origin; the box is tiled into the
positive octant (BoxBoost^3 replicas) and at each step the DM
particles that cross the shrinking comoving horizon shell between
their old and drifted positions are interpolated onto the crossing
and appended to ``lightcone/000/lightcone-00000.raw`` as float64
(x, y, z, SampleFraction) rows — byte-identical layout to the
reference, so its readers work unchanged.

Above ReferenceRedshift only a SampleFraction subsample is kept (the
angular-resolution rule, lightcone.c:200-210); the per-(particle,
replica) subsampling uses the same ID-keyed deterministic draw idea as
the reference's RandTable.

TPU-native: the horizon test is one fused elementwise kernel per
active replica (replicas straddling the shell are few), with the rare
crossers gathered to host for the file append.
"""

import os
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from scipy import integrate

from ..utils import constants as C

ZMIN = 0.1
ZMAX = 80.0
REFERENCE_REDSHIFT = 2.0
BOX_BOOST = 20


@jax.jit
def _cross_mask(pos, vel, rep, ddrift, hd_prev2, hd2, hd_prev, hd,
                samplefrac, pid):
    """Per-particle horizon-crossing test + interpolation for one
    replica (lightcone_cross, lightcone.c:219-268)."""
    pold = pos + rep[None, :]
    pnew = pold + vel * ddrift
    dold2 = jnp.sum(pold * pold, axis=-1)
    dnew2 = jnp.sum(pnew * pnew, axis=-1)
    # deterministic subsample keyed on (id, replica)
    x = (pid.astype(jnp.uint32)
         + jnp.uint32(12345) * jnp.uint32(rep[0] + 3 * rep[1]
                                          + 9 * rep[2] + 1))
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7feb352d)
    x = x ^ (x >> jnp.uint32(15))
    u = x.astype(jnp.float32) * jnp.float32(2.0 ** -32)
    hit = (dold2 <= hd_prev2) & (dnew2 >= hd2) & (u < samplefrac)
    dnew = jnp.sqrt(dnew2)
    dold = jnp.sqrt(dold2)
    cnew = dnew - hd
    cold = dold - hd_prev
    denom = cnew - cold
    safe = jnp.abs(denom) > 1e-20
    u1 = jnp.where(safe, -cold / jnp.where(safe, denom, 1.0), 0.5)
    u2 = jnp.where(safe, cnew / jnp.where(safe, denom, 1.0), 0.5)
    p3 = pold * u2[:, None] + pnew * u1[:, None]
    return hit, p3


def build_sharded_cross(mesh, *, cap):
    """Per-shard horizon-crossing detection + compaction
    (lightcone_compute at scale, lightcone.c:176-221): each shard
    tests only its OWN rows against one replica's shell — the
    reference computes crossings rank-locally too — and compacts the
    rare crossers into a fixed ``cap``-row buffer.  The host appends
    each process's addressable shards to that process's stripe file:
    no global gather, host peak memory O(cap) per shard.  Overflow
    (more crossers than cap on any shard) is psum'd; the caller
    doubles cap and retries, like every other capacity."""
    from jax import lax
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def local(st, scal):
        pos = (st["ipos"] - scal["off"][None, :]).astype(jnp.float32) \
            * jnp.float32(2.0 ** -32) * scal["box"]
        hit, p3 = _cross_mask(
            pos, st["vel"], scal["rep"], scal["ddrift"],
            scal["hd_prev2"], scal["hd2"], scal["hd_prev"],
            scal["hd"], scal["samplefrac"], st["pid"])
        hit = hit & st["valid"] & (st["ptype"] == 1)
        cnt = jnp.sum(hit.astype(jnp.int32))
        order = jnp.argsort(~hit, stable=True)[:cap]
        ovf = lax.psum((cnt > cap).astype(jnp.int32), "x")
        return p3[order], hit[order], ovf

    st_keys = ("ipos", "vel", "valid", "ptype", "pid")
    scal_keys = ("off", "box", "rep", "ddrift", "hd_prev2", "hd2",
                 "hd_prev", "hd", "samplefrac")
    fn = shard_map(
        local, mesh=mesh,
        in_specs=({k: P("x") for k in st_keys},
                  {k: P() for k in scal_keys}),
        out_specs=(P("x"), P("x"), P()),
        check_vma=False)
    return jax.jit(fn)


class Lightcone:
    def __init__(self, CP, time_begin, unit_velocity_in_cm_s, outdir,
                 boxsize, task=0):
        self.CP = CP
        self.boxsize = boxsize
        nentry = 512
        self.tab_loga = np.linspace(np.log(max(time_begin, 1e-4)), 0.0,
                                    nentry)
        # comoving distance table in internal length units
        # (lightcone_init_entry, lightcone.c:64-90):
        # (c/unit_vel) * int dloga / (a H_internal)
        light = C.LIGHTCGS / unit_velocity_in_cm_s
        dc = np.zeros(nentry)
        for i, la in enumerate(self.tab_loga):
            val, _ = integrate.quad(
                lambda x: 1.0 / (np.exp(x)
                                 * CP.hubble_function(np.exp(x))),
                la, 0.0, epsabs=0, epsrel=1e-7, limit=200)
            dc[i] = light * val
        self.tab_dc = dc
        # one raw stripe per task, the reference's per-rank layout
        # (lightcone.c:99-108 "%03d/lightcone-%05d.raw")
        d = os.path.join(outdir, "lightcone", f"{task // 1000:03d}")
        os.makedirs(d, exist_ok=True)
        self.path = os.path.join(d, f"lightcone-{task:05d}.raw")
        self.fd = open(self.path, "ab")
        self.hd = self.hd2 = 0.0
        self.hd_prev = self.hd_prev2 = 0.0
        self.sample_fraction = 0.0
        self.hd_ref = self.get_horizon(1.0 / (1 + REFERENCE_REDSHIFT))
        self.n_written = 0

    def get_horizon(self, a):
        """Comoving horizon distance (lightcone_get_horizon)."""
        return float(np.interp(np.log(a), self.tab_loga, self.tab_dc))

    def set_time(self, a):
        """Advance the horizon shell (lightcone_set_time)."""
        z = 1.0 / a - 1.0
        if not (ZMIN < z < ZMAX):
            self.sample_fraction = 0.0
            return
        self.hd_prev, self.hd_prev2 = self.hd, self.hd2
        self.hd = self.get_horizon(a)
        self.hd2 = self.hd * self.hd
        if self.hd_prev == 0.0:
            self.hd_prev, self.hd_prev2 = self.hd, self.hd2
        if z < REFERENCE_REDSHIFT:
            self.sample_fraction = 1.0
        else:
            f = self.hd_ref / self.hd
            self.sample_fraction = f ** 4   # angular resolution rule

    def replicas(self):
        """Box replicas straddling the horizon shell
        (update_replicas, lightcone.c:135-172)."""
        reps = []
        L = self.boxsize
        nmax = int(np.ceil(self.hd_prev / L)) + 1
        nmax = min(nmax, BOX_BOOST)
        for rx in range(nmax):
            for ry in range(nmax):
                for rz in range(nmax):
                    d1 = (rx * rx + ry * ry + rz * rz) * L * L
                    d2 = ((rx + 1) ** 2 + (ry + 1) ** 2
                          + (rz + 1) ** 2) * L * L
                    if d1 <= self.hd_prev2 and d2 >= self.hd2:
                        reps.append((rx * L, ry * L, rz * L))
        return reps

    def append_rows(self, rows_xyz):
        """Append crossing rows (float x,y,z; host side) to this
        task's stripe with the current SampleFraction column — the
        raw-append half of lightcone_cross used by the sharded path,
        which detects crossers on device per shard."""
        if len(rows_xyz) == 0:
            return 0
        out = np.concatenate(
            [np.asarray(rows_xyz, np.float64),
             np.full((len(rows_xyz), 1), self.sample_fraction)],
            axis=1)
        self.fd.write(out.tobytes())
        self.fd.flush()
        self.n_written += len(rows_xyz)
        return len(rows_xyz)

    def compute(self, a, ddrift, pos, vel, is_dm, pid):
        """Write the particles crossing the horizon this step
        (lightcone_compute).  pos: float positions internal units
        (random offset already removed); returns rows written."""
        self.set_time(a)
        if self.sample_fraction <= 0:
            return 0
        wrote = 0
        sel = np.asarray(is_dm)
        for rep in self.replicas():
            hit, p3 = _cross_mask(
                pos, vel, jnp.asarray(rep, jnp.float32),
                jnp.float32(ddrift), jnp.float32(self.hd_prev2),
                jnp.float32(self.hd2), jnp.float32(self.hd_prev),
                jnp.float32(self.hd),
                jnp.float32(self.sample_fraction), pid)
            hitn = np.asarray(hit) & sel
            if not hitn.any():
                continue
            rows = np.asarray(p3)[hitn].astype(np.float64)
            out = np.concatenate(
                [rows, np.full((len(rows), 1), self.sample_fraction)],
                axis=1)
            self.fd.write(out.tobytes())
            wrote += len(rows)
        if wrote:
            self.fd.flush()
            self.n_written += wrote
        return wrote
