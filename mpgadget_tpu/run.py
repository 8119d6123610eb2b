"""Simulation driver: begrun/run analog (libgadget/run.c).

Round-1 scope: PM-only N-body with a global (power-of-two quantized)
timestep, KDK integration with exact FLRW factors, in-line power spectra
and snapshot output at sync points.  Tree gravity, SPH and the
astrophysics modules hook into `compute_forces` / `extra_physics` as
they land.
"""

import os
import time as _time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax.numpy as jnp

from .cosmology import Cosmology
from .timeline import Timeline, TIMEBASE
from .timefac import ExactTimeFactors
from .timestep import (TimestepParams, get_long_range_timestep_dloga,
                       get_pm_timestep_ti)
from .particles import ParticleData, pos_to_fixed, fixed_to_pos
from .pm import pm_force, PMConfig
from .integrate import drift, kick
from .io.bigfile import BigFile
from .io import snapshot as snap_io
from .utils import constants as C, get_unitsystem
from .utils.walltime import WallTime


@dataclass
class SimConfig:
    boxsize: float
    nmesh: int
    output_dir: str
    timeline: Timeline
    units: object
    asmth: float = 1.5
    snapshot_base: str = "PART"
    fast_particle_type: int = 2
    tree_grav_on: bool = True
    rcut: float = 6.0
    gravity_softening: float = 1.0 / 30.0  # of mean DM separation
    err_tol_force_acc: float = 0.002
    bh_opening_angle: float = 0.175
    max_bh_opening_angle: float = 0.9
    tree_use_bh: int = 2
    timestep: TimestepParams = field(default_factory=TimestepParams)


class Simulation:
    def __init__(self, cosmology: Cosmology, pdata: ParticleData,
                 cfg: SimConfig, time_ic: float = None):
        self.CP = cosmology
        self.pdata = pdata
        self.cfg = cfg
        self.timeline = cfg.timeline
        self.tf = ExactTimeFactors(cosmology, cfg.timeline)
        # The Gaussian split smoothing stays on even for PM-only runs:
        # without it the double CIC deconvolution amplifies mesh-scale
        # noise into artificial clustering.  PM-only runs therefore have
        # a known force deficit exp(-k^2 rs^2) at sub-split scales; the
        # tree supplies that part in TreePM runs.
        self.pm_cfg = PMConfig(nmesh=cfg.nmesh, boxsize=cfg.boxsize,
                               asmth=cfg.asmth, G=cosmology.GravInternal,
                               unitlength_in_cm=cfg.units.UnitLength_in_cm)
        self.ti_current = 0
        self.time_ic = time_ic if time_ic is not None else \
            np.exp(cfg.timeline.loga_from_ti(0))
        self.snapshot_count = 0
        self.walltime = WallTime()
        self.last_power = None
        self._omega_per_type = self._compute_omegas()
        # tree gravity (set up lazily when enabled)
        self._tree_grav = None

    # -- setup ---------------------------------------------------------

    @classmethod
    def from_snapshot(cls, path, cfg_kwargs):
        """Read an IC/snapshot bigfile (petaio_read_snapshot analog)."""
        bf = BigFile(path)
        header = snap_io.read_header(bf)
        pos_all, vel_all, mass_all, type_all, id_all = [], [], [], [], []
        for ptype in range(6):
            sp = snap_io.read_species(bf, ptype, header)
            if sp is None:
                continue
            n = len(sp["pid"])
            pos_all.append(sp["pos"])
            vel_all.append(sp["vel"])
            mass_all.append(sp["mass"])
            type_all.append(np.full(n, ptype, np.int32))
            id_all.append(sp["pid"].astype(np.int64))
        pos = np.concatenate(pos_all)
        pdata = ParticleData.from_numpy(
            pos, np.concatenate(vel_all), np.concatenate(mass_all),
            np.concatenate(type_all), np.concatenate(id_all),
            header.BoxSize)
        units = get_unitsystem(header.UnitLength_in_cm,
                               header.UnitMass_in_g,
                               header.UnitVelocity_in_cm_per_s)
        cp = Cosmology(
            Omega0=header.Omega0, OmegaBaryon=header.OmegaBaryon,
            OmegaLambda=header.OmegaLambda,
            HubbleParam=header.HubbleParam,
            CMBTemperature=header.CMBTemperature,
            Omega_fld=header.Omega_fld, w0_fld=header.w0_fld,
            wa_fld=header.wa_fld, Omega_ur=header.Omega_ur,
            TimeBegin=header.Time,
        ).init_units(units)
        cfg_kwargs = dict(cfg_kwargs)
        cfg_kwargs["units"] = units
        cfg = SimConfig(boxsize=header.BoxSize, **cfg_kwargs)
        sim = cls(cp, pdata, cfg, time_ic=header.TimeIC or header.Time)
        sim._header = header
        return sim

    def _compute_omegas(self):
        """Density parameter per particle type, from total masses."""
        mass = np.asarray(self.pdata.mass)
        ptype = np.asarray(self.pdata.ptype)
        valid = np.asarray(self.pdata.valid)
        vol = self.cfg.boxsize ** 3
        omegas = np.zeros(6)
        for t in range(6):
            m = mass[valid & (ptype == t)].astype(np.float64).sum()
            omegas[t] = m / vol / self.CP.RhoCrit
        return omegas

    # -- state ---------------------------------------------------------

    @property
    def atime(self):
        return float(np.exp(self.timeline.loga_from_ti(self.ti_current)))

    # -- forces --------------------------------------------------------

    def compute_forces(self, measure_power=True):
        """Long-range PM force (+ short-range tree when enabled)."""
        weights = jnp.where(self.pdata.valid, self.pdata.mass,
                            jnp.float32(0))
        self.walltime.start("PMgrav")
        accel, pot, ps = pm_force(self.pdata.ipos, weights, self.pm_cfg)
        self.walltime.stop("PMgrav")
        self.pdata = self.pdata.replace(grav_pm=accel)
        if pot is not None:
            self.pdata = self.pdata.replace(potential=pot)
        if measure_power:
            self.last_power = ps
        if self.cfg.tree_grav_on:
            self.walltime.start("Tree")
            self._compute_tree_forces()
            self.walltime.stop("Tree")
        else:
            self.pdata = self.pdata.replace(
                grav_accel=jnp.zeros_like(self.pdata.grav_accel))

    def _compute_tree_forces(self):
        from .gravity.treepm import TreeGravity
        if self._tree_grav is None:
            # softening in units of mean DM separation
            # (gravshort_set_softenings, gravshort-tree.c:43-50)
            mean_sep = self.cfg.boxsize / max(
                1.0, np.cbrt(float(np.asarray(self.pdata.num_valid))))
            self._tree_grav = TreeGravity(
                boxsize=self.cfg.boxsize, nmesh=self.cfg.nmesh,
                asmth=self.cfg.asmth, rcut=self.cfg.rcut,
                G=self.CP.GravInternal,
                softening=2.8 * self.cfg.gravity_softening * mean_sep,
                err_tol_force_acc=self.cfg.err_tol_force_acc,
                bh_opening_angle=self.cfg.bh_opening_angle,
                max_bh_opening_angle=self.cfg.max_bh_opening_angle,
                tree_use_bh=self.cfg.tree_use_bh,
                # potential comes from the PM mesh; the short-range
                # correction is only added on output (petaio stores
                # Potential on PM steps, gravshort-tree.c:137)
                with_potential=False)
        accel = self._tree_grav.compute(self.pdata)
        self.pdata = self.pdata.replace(grav_accel=accel)
        if bool(jnp.any(self._tree_grav.last_overflow)):
            raise RuntimeError(
                "tree interaction list overflow: increase "
                "WalkConfig.node_list_max/leaf_list_max")

    # -- stepping ------------------------------------------------------

    def find_pm_timestep(self):
        asmth_len = self.cfg.asmth * self.cfg.boxsize / self.cfg.nmesh
        dloga = get_long_range_timestep_dloga(
            self.pdata, self.CP, self.atime, asmth_len,
            self.cfg.timestep, self.cfg.fast_particle_type,
            self._omega_per_type)
        return get_pm_timestep_ti(dloga, self.timeline, self.ti_current,
                                  self.ti_current)

    def step(self, dti: int):
        """One global KDK step over dti integer ticks."""
        t0, t1 = self.ti_current, self.ti_current + dti
        th = t0 + dti // 2
        inv_box = 1.0 / self.cfg.boxsize
        # K: half kick with forces at t0
        accel = self.pdata.grav_pm + self.pdata.grav_accel
        self.pdata = self.pdata.replace(
            vel=kick(self.pdata.vel, accel, self.tf.gravkick(t0, th)))
        # D: full drift
        self.pdata = self.pdata.replace(
            ipos=drift(self.pdata.ipos, self.pdata.vel,
                       self.tf.drift(t0, t1), inv_box))
        self.ti_current = t1
        # Force at t1
        self.compute_forces()
        # K: half kick with forces at t1
        accel = self.pdata.grav_pm + self.pdata.grav_accel
        self.pdata = self.pdata.replace(
            vel=kick(self.pdata.vel, accel, self.tf.gravkick(th, t1)))

    def run(self, max_steps: Optional[int] = None, verbose=True):
        """Main loop (run.c:314-800, PM-only path)."""
        os.makedirs(self.cfg.output_dir, exist_ok=True)
        self.compute_forces()
        nsteps = 0
        while self.ti_current < self.timeline.ti_end:
            dti = self.find_pm_timestep()
            if dti <= 0:
                raise RuntimeError(f"Bad timestep {dti}")
            self.step(dti)
            nsteps += 1
            sp = self.timeline.find_current_sync_point(self.ti_current)
            if sp is not None and sp.write_snapshot:
                self.write_snapshot()
            if self.last_power is not None:
                D1 = self.CP.GrowthFactor(self.atime, 1.0)
                self.last_power.save(self.cfg.output_dir, self.atime, D1)
            if verbose:
                dloga = self.timeline.dloga_from_dti(
                    dti, self.ti_current - dti)
                print(f"[step {nsteps}] a={self.atime:.5f} "
                      f"dloga={dloga:.4g}")
            if max_steps and nsteps >= max_steps:
                break
        return nsteps

    # -- output --------------------------------------------------------

    def write_snapshot(self, label: Optional[int] = None):
        """write_checkpoint analog: snapshot == checkpoint."""
        if label is None:
            label = self.snapshot_count
            self.snapshot_count += 1
        path = os.path.join(self.cfg.output_dir,
                            f"{self.cfg.snapshot_base}_{label:03d}")
        bf = BigFile(path, create=True)
        atime = self.atime
        valid = np.asarray(self.pdata.valid)
        ptype = np.asarray(self.pdata.ptype)
        pos = fixed_to_pos(np.asarray(self.pdata.ipos), self.cfg.boxsize)
        vel = np.asarray(self.pdata.vel)
        mass = np.asarray(self.pdata.mass)
        pid = np.asarray(self.pdata.pid)
        pot = np.asarray(self.pdata.potential)
        ntot = np.zeros(6, np.uint64)
        hubble = self.CP.hubble_function(atime)
        for t in range(6):
            sel = valid & (ptype == t)
            ntot[t] = sel.sum()
            if ntot[t] == 0:
                continue
            snap_io.write_species(
                bf, t, pos=pos[sel], vel=vel[sel], pid=pid[sel],
                mass=mass[sel], atime=atime, use_peculiar=True,
                extra={"Potential": pot[sel].astype("<f4")})
        header = snap_io.SnapshotHeader(
            TotNumPart=ntot, MassTable=np.zeros(6), Time=atime,
            TimeIC=self.time_ic, BoxSize=self.cfg.boxsize,
            Omega0=self.CP.Omega0, OmegaLambda=self.CP.OmegaLambda,
            HubbleParam=self.CP.HubbleParam,
            OmegaBaryon=self.CP.OmegaBaryon,
            CMBTemperature=self.CP.CMBTemperature,
            UnitLength_in_cm=self.cfg.units.UnitLength_in_cm,
            UnitMass_in_g=self.cfg.units.UnitMass_in_g,
            UnitVelocity_in_cm_per_s=self.cfg.units.UnitVelocity_in_cm_per_s,
            RSDFactor=1.0 / (atime * hubble),
        )
        snap_io.write_header(bf, header)
        with open(os.path.join(self.cfg.output_dir, "Snapshots.txt"),
                  "a") as fh:
            fh.write(f"{label:03d} {atime}\n")
        return path
