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
import jax
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
    split_gravity_timesteps: bool = False  # per-bin sub-cycling
    rcut: float = 6.0
    gravity_softening: float = 1.0 / 30.0  # of mean DM separation
    err_tol_force_acc: float = 0.002
    bh_opening_angle: float = 0.175
    max_bh_opening_angle: float = 0.9
    tree_use_bh: int = 2
    # hydro
    hydro_on: bool = True
    density_independent_sph: bool = True
    density_kernel_type: int = 2      # quintic
    density_resolution_eta: float = 1.0
    max_numngb_deviation: float = 2.0
    art_bulk_visc: float = 0.75
    density_contrast_limit: float = 100.0
    init_gas_temp: float = -1.0
    min_gas_temp: float = 5.0
    min_gas_hsml_fractional: float = 0.0
    # cooling
    cooling_on: bool = False
    treecool_file: str = ""
    metal_cool_file: str = ""
    uv_fluctuation_file: str = ""
    cooling_rates: int = 2        # Sherwood
    recomb_rates: int = 1         # Verner96
    self_shielding_on: bool = True
    photo_ionize_factor: float = 1.0
    photo_ionization_on: bool = True
    helium_heat_on: bool = False
    helium_heat_thresh: float = 10.0
    helium_heat_amp: float = 1.0
    helium_heat_exp: float = 0.0
    # excursion-set reionization (uvbg.c)
    excursion_set_on: bool = False
    uvbg_dim: int = 64
    reion_filter_type: int = 0
    rtom_filter_type: int = 0
    reion_r_bubble_max: float = 20340.0
    reion_r_bubble_min: float = 406.8
    reion_delta_r_factor: float = 1.1
    reion_nion_phot_per_bary: float = 4000.0
    alpha_uv: float = 3.0
    escape_fraction_norm: float = 0.2
    escape_fraction_scaling: float = 0.5
    uvbg_timestep_myr: float = 10.0
    excursion_set_zstart: float = 25.0
    excursion_set_zstop: float = 5.0
    # ReionUseParticleSFR / ReionSFRTimescale (uvbg.c:46-47): J21 from
    # the per-particle SFR deposit, or from stellar mass over a
    # fraction of the Hubble time
    reion_use_particle_sfr: bool = True
    reion_sfr_timescale: float = 0.5
    # QSO helium reionization (cooling_qso_lightup.c)
    qso_lightup_on: bool = False
    reion_hist_file: str = ""
    qso_min_mass: float = 100.0
    qso_max_mass: float = 1000.0
    qso_mean_bubble: float = 20000.0
    qso_var_bubble: float = 0.0
    qso_finish_frac: float = 0.995
    # star formation
    starformation_on: bool = False
    metal_return_on: bool = False
    metals_sn1a_n0: float = 1.3e-3
    metals_sph_weighting: int = 1
    metals_max_ngb_deviation: float = 5.0
    wind_on: bool = False
    sfr_criterion: int = 1
    crit_overdensity: float = 57.7
    crit_phys_density: float = 0.0
    factor_sn: float = 0.1
    factor_evp: float = 1000.0
    temp_supernova: float = 1e8
    temp_clouds: float = 1000.0
    max_sfr_timescale: float = 1.5
    generations: int = 4
    quick_lya_probability: float = 0.0
    quick_lya_temp_thresh: float = 1e5
    wind_model: int = 4 | 2   # ofjt10
    wind_efficiency: float = 2.0
    wind_energy_fraction: float = 1.0
    wind_sigma0: float = 353.0
    wind_speed_factor: float = 3.7
    wind_free_travel_length: float = 20.0
    wind_free_travel_dens_fac: float = 0.1
    min_wind_velocity: float = 0.0
    wind_thermal_factor: float = 0.0
    max_wind_free_travel_time: float = 60.0
    random_seed: int = 42
    random_particle_offset: float = 8.0  # max shift in PM cells
    # massive neutrinos (linear response)
    massive_nu_lin_resp_on: bool = False
    m_nu: tuple = (0.0, 0.0, 0.0)
    # hybrid neutrinos (cosmology.c:32-34, run.c:170-175): type-2
    # particles carry the slow F-D tail; before nu_part_time they are
    # passive tracers excluded from gravity sources and the PM force
    hybrid_neutrinos_on: bool = False
    hybrid_vcrit: float = 500.0
    hybrid_nu_part_time: float = 0.3333333
    # black holes
    black_hole_on: bool = False
    bh_accretion_factor: float = 100.0
    bh_eddington_factor: float = 2.1
    bh_feedback_factor: float = 0.05
    bh_seed_mass: float = 2e-5
    bh_ngb_factor: float = 2.0
    min_fof_mass_for_seed: float = 2.0
    min_mstar_for_seed: float = 5e-4
    time_between_seeding: float = 1.04
    bh_kinetic_on: bool = False
    bh_merge_grav_bound: bool = True
    bh_dynfric_method: int = 0
    bh_df_boost: float = 1.0
    bh_df_bmax: float = 20.0
    bhke_eddington_thr_factor: float = 0.05
    bhke_eddington_m_factor: float = 0.002
    bhke_eddington_m_pivot: float = 0.05
    bhke_eddington_m_index: float = 2.0
    bhke_eff_rho_factor: float = 0.05
    bhke_eff_cap: float = 0.05
    bhke_inj_energy_thr: float = 5.0
    seed_bh_dyn_mass: float = -1.0
    bh_reposition: bool = False
    write_bh_details: bool = False
    # control
    time_limit_cpu: float = 0.0
    auto_snapshot_time: float = 0.0
    output_energy_debug: bool = False
    # OutputPotential (params.py:95): write the Potential block in
    # snapshots; drives the sharded state's potential column so the
    # striped writer matches the single-writer block set
    output_potential: bool = True
    # FOF
    part_alloc_factor: float = 1.5
    bytes_per_file: int = 1 << 30      # output striping (BytesPerFile)
    # lensing potential planes (plane.c)
    plane_output_list: str = ""
    plane_resolution: int = 256
    plane_thickness: float = -1.0
    plane_cut_points: str = ""
    plane_normals: str = "0, 1, 2"
    plane_nu_correction: bool = True
    plane_double_out: bool = False
    lightcone_on: bool = False
    snapshot_with_fof: bool = False
    fof_file_base: str = "PIG"
    fof_save_particles: bool = True
    fof_linking_length: float = 0.2
    fof_min_group_length: int = 32
    fof_primary_link_types: int = 2
    fof_secondary_link_types: int = 1 + 16 + 32
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
        # SPH state (allocated when gas is present)
        self.has_gas = bool(np.any(np.asarray(pdata.ptype) == 0)
                            & np.any(np.asarray(pdata.valid)))
        self.sph = None
        self.bh = None
        self.stars = None
        # random internal box shift (partmanager.h:79-84): decorrelates
        # Morton-tree force errors between steps; subtracted on output
        self._ipos_offset = np.zeros(3, np.uint32)
        self._nstep_total = 0
        self._force_evals = 0   # walk-target count (diagnostics)
        self._gas_initialized = False
        self._min_egy_spec = 0.0

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
        n_read = len(pos)
        # over-allocate rows for star spawning / BH seeding
        # (PartAllocFactor; slots_reserve analog) — rounded up to the
        # treewalk block size so no per-step padding is needed
        alloc = float(cfg_kwargs.get("part_alloc_factor", 1.5))
        if not (cfg_kwargs.get("starformation_on")
                or cfg_kwargs.get("black_hole_on")):
            alloc = 1.0     # nothing spawns: no padding needed
        capacity = int(np.ceil(max(1.0, alloc) * n_read / 128)) * 128
        pdata = ParticleData.from_numpy(
            pos, np.concatenate(vel_all), np.concatenate(mass_all),
            np.concatenate(type_all), np.concatenate(id_all),
            header.BoxSize, capacity=capacity)
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
            MNu=tuple(cfg_kwargs.get("m_nu", (0.0, 0.0, 0.0))),
            MassiveNuLinRespOn=bool(
                cfg_kwargs.get("massive_nu_lin_resp_on", False)),
            HybridNeutrinosOn=bool(
                cfg_kwargs.get("hybrid_neutrinos_on", False)),
            HybridVcrit=float(cfg_kwargs.get("hybrid_vcrit", 500.0)),
            HybridNuPartTime=float(
                cfg_kwargs.get("hybrid_nu_part_time", 0.3333333)),
            TimeBegin=header.Time,
        ).init_units(units)
        cfg_kwargs = dict(cfg_kwargs)
        cfg_kwargs["units"] = units
        cfg = SimConfig(boxsize=header.BoxSize, **cfg_kwargs)
        sim = cls(cp, pdata, cfg, time_ic=header.TimeIC or header.Time)
        sim._header = header
        # restore gas thermal state when present (restart path)
        if int(header.TotNumPart[0]) > 0 and "0/InternalEnergy" in bf:
            sim._gas_restore = {
                "u": bf.open("0/InternalEnergy").read(),
                "density": bf.open("0/Density").read(),
                "hsml": bf.open("0/SmoothingLength").read(),
            }
            # every registered gas block present is restored (petaio
            # reads the full registry; ne/Z matter for cooling)
            from .io.registry import blocks_for_type
            for spec in blocks_for_type(0):
                if spec.holder != "sph" or spec.wronly:
                    continue
                if "0/" + spec.name in bf:
                    sim._gas_restore[spec.field] = \
                        bf.open("0/" + spec.name).read()
        else:
            sim._gas_restore = None
        # star/BH slot state via the declarative registry (the round-1
        # restart dropped these: ADVICE r1 #1, petaio.c:1040-1069)
        from .io.registry import blocks_for_type
        slot_restore = {}
        for t in (4, 5):
            if int(header.TotNumPart[t]) == 0:
                continue
            for spec in blocks_for_type(t):
                key = f"{t}/{spec.name}"
                if not spec.wronly and key in bf:
                    slot_restore[(t, spec.name)] = bf.open(key).read()
        sim._restore_slot_state(slot_restore)
        # neutrino delta_tot history (petaio_read_neutrinos analog)
        if "Neutrino" in bf:
            sim._nu_restore = snap_io.read_neutrino_state(bf)
        else:
            sim._nu_restore = None
        return sim

    def _restore_slot_state(self, slot_restore):
        """Scatter registry-read star/BH blocks into aligned structs."""
        if not slot_restore:
            return
        from .io.registry import blocks_for_type
        ptype = np.asarray(self.pdata.ptype)
        valid = np.asarray(self.pdata.valid)
        n = self.pdata.capacity
        for t, name in ((4, "stars"), (5, "bh")):
            data = {k[1]: v for k, v in slot_restore.items()
                    if k[0] == t}
            if not data:
                continue
            rows = np.flatnonzero(valid & (ptype == t))
            if rows.size == 0:
                continue
            if t == 4:
                from .physics.stars import StarData
                holder = StarData.zeros(n)
            else:
                from .physics.blackhole import BhData
                holder = BhData.zeros(n)
            updates = {}
            for spec in blocks_for_type(t):
                arr = data.get(spec.name)
                if arr is None:
                    continue
                cur = np.asarray(getattr(holder, spec.field))
                full = np.array(cur)
                full[rows] = np.asarray(arr).reshape(
                    (rows.size,) + cur.shape[1:]).astype(cur.dtype)
                updates[spec.field] = jnp.asarray(full)
            if t == 5 and "bh_mass" not in updates:
                # never leave restored BHs with zero subgrid mass:
                # Bondi mdot ~ bh_mass^2 would stay 0 forever
                m = np.zeros(n, np.float32)
                m[rows] = self.cfg.bh_seed_mass
                updates["bh_mass"] = jnp.asarray(m)
            setattr(self, name, holder.replace(**updates))

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

    def compute_forces(self, measure_power=True, tree=True):
        """Long-range PM force (+ short-range tree when enabled)."""
        weights = jnp.where(self.pdata.valid, self.pdata.mass,
                            jnp.float32(0))
        # hybrid-nu passive tracers: before NuPartTime type-2 rows
        # neither source nor receive the PM force
        # (hybrid_nu_gravpm_is_active, gravpm.c:83-85,469-475)
        nu_tracer = self.CP.hybrid_nu_tracer(self.atime)
        if nu_tracer:
            weights = jnp.where(self.pdata.ptype == 2, 0.0, weights)
        nu_table = None
        if self.cfg.massive_nu_lin_resp_on:
            nu_table = self._neutrino_response(weights)
        self.walltime.start("PMgrav")
        accel, pot, ps = pm_force(self.pdata.ipos, weights, self.pm_cfg,
                                  nu_table=nu_table)
        if nu_tracer:
            accel = jnp.where((self.pdata.ptype == 2)[:, None], 0.0,
                              accel)
        self.walltime.stop("PMgrav")
        if self.cfg.massive_nu_lin_resp_on and ps is not None:
            # The modes were scaled by nufac (total matter) but the
            # zero-mode Norm is still the CDM mass squared; rescale so
            # the output is the total matter power (gravpm.c:442-447)
            onu = self.CP.ONu.nopart(self.atime) * self.atime ** 3
            fac = self.CP.Omega0 / (self.CP.Omega0 - onu)
            ps.power = ps.power / (fac * fac)
        self.pdata = self.pdata.replace(grav_pm=accel)
        if pot is not None:
            self.pdata = self.pdata.replace(potential=pot)
        if measure_power:
            self.last_power = ps
        if self.cfg.tree_grav_on:
            if tree:
                self.walltime.start("Tree")
                self._compute_tree_forces()
                self.walltime.stop("Tree")
        else:
            self.pdata = self.pdata.replace(
                grav_accel=jnp.zeros_like(self.pdata.grav_accel))

    def _neutrino_response(self, weights):
        """Per-PM-step neutrino linear-response table
        (compute_neutrino_power, gravpm.c:307-330)."""
        from .pm.gravity import measure_power
        from .physics.neutrinos_lra import DeltaTotTable
        from .utils import constants as C
        ps = measure_power(self.pdata.ipos, weights, self.pm_cfg)
        good = ps.nmodes > 0
        scale = self.cfg.units.UnitLength_in_cm / C.CM_PER_MPC
        k_int = ps.k[good] * scale          # internal 1/length
        delta = np.sqrt(np.maximum(ps.power[good], 0.0))
        if getattr(self, "_nu_table_state", None) is None:
            self._nu_table_state = DeltaTotTable(
                self.CP, k_int, delta, self.atime, self.cfg.units)
            if getattr(self, "_nu_restore", None) is not None:
                # snapshot-embedded history (neutrinos_lra.c:379-452)
                self._nu_table_state.load_state(self._nu_restore)
        logk, nufac = self._nu_table_state.step(self.atime, delta)
        return (logk, nufac)

    def _compute_tree_forces(self, active=None, n_active=None):
        from .gravity.treepm import TreeGravity
        if self._tree_grav is None:
            # softening in units of mean DM separation
            # (gravshort_set_softenings, gravshort-tree.c:43-50)
            mean_sep = self._dm_mean_sep()
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
        # restartable walk: double capacities on overflow (the export-
        # buffer-full retry analog, treewalk.c:801-902).  The retry
        # recompiles, so steady-state configs should size WalkConfig to
        # avoid it; the overflow check syncs only on the retry path.
        from dataclasses import replace as dc_replace
        # Compacted active-block cap: start from the cap observed on
        # the previous active call (clustered actives occupy far fewer
        # blocks than the worst case); power-of-two bucketed so the jit
        # cache stays small; compact-overflow retries only bump THIS
        # cap, not the walk buffers.
        active_cap = None
        nb = 0
        if active is not None and n_active is not None:
            G = self._tree_grav.tree_cfg.group_max
            nb = (int(self.pdata.capacity) + G - 1) // G
            hint = getattr(self, "_active_cap_hint", None)
            want = hint if hint is not None \
                else max(1, min(nb, int(n_active)))
            cap = 1 << (max(1, want) - 1).bit_length()
            if cap <= nb // 2:
                active_cap = cap
        pd = self.pdata
        if self.CP.hybrid_nu_tracer(self.atime):
            # tracer-nu mass excluded from tree moments
            # (force_tree_active_moments HybridNuGrav path,
            # forcetree.c:162 + timestep.c:282-287)
            pd = pd.replace(mass=jnp.where(pd.ptype == 2, 0.0,
                                           pd.mass))
        for attempt in range(8):
            # a failed (overflowed) attempt must not consume the
            # "BH opening on the first call" state (TreeUseBH=2):
            # retrying with use_bh already flipped but amag still zero
            # degrades the opening to the max-angle cap and the retry
            # silently returns ~10% force errors (no overflow flag)
            bh_prev = self._tree_grav._use_bh_now
            accel = self._tree_grav.compute(pd,
                                            target_active=active,
                                            active_block_cap=active_cap)
            if active_cap is not None and bool(
                    self._tree_grav.last_compact_overflow):
                self._tree_grav._use_bh_now = bh_prev
                observed = int(self._tree_grav.last_n_active_blocks)
                want = max(observed, active_cap * 2)
                active_cap = 1 << (want - 1).bit_length()
                if active_cap > nb // 2:
                    active_cap = None
                continue
            if not bool(jnp.any(self._tree_grav.last_overflow)):
                if active is not None:
                    # remember the observed block count (+25% slack)
                    obs = int(self._tree_grav.last_n_active_blocks)
                    self._active_cap_hint = max(4, (obs * 5) // 4)
                break
            self._tree_grav._use_bh_now = bh_prev
            wc = self._tree_grav.walk_cfg
            self._tree_grav.walk_cfg = dc_replace(
                wc, leaf_list_max=wc.leaf_list_max * 2,
                src_cap=wc.src_cap * 2,
                nleaf_frac=min(1.0, wc.nleaf_frac * 2),
                sr_frac=min(1.0, wc.sr_frac * 2))
            self._tree_grav.tree_cfg = dc_replace(
                self._tree_grav.tree_cfg,
                node_factor=min(
                    2.0, self._tree_grav.tree_cfg.node_factor * 2))
        else:
            raise RuntimeError(
                "tree walk capacity overflow after retries: increase "
                "WalkConfig.leaf_list_max/src_cap or "
                "TreeConfig.node_factor")
        if active is not None:
            accel = jnp.where(active[:, None], accel,
                              self.pdata.grav_accel)
        self.pdata = self.pdata.replace(grav_accel=accel)

    # -- SPH -----------------------------------------------------------

    @property
    def gas_mask(self):
        return self.pdata.valid & (self.pdata.ptype == 0)

    def _dm_mean_sep(self):
        """Mean type-1 (DM) inter-particle separation: the reference
        sets the ONE global gravitational softening from
        MeanSeparation[1] (init.c:117 -> gravshort_set_softenings,
        gravshort-tree.c:43-50), so gas/star/nu counts must not move
        it.  Falls back to the all-species count for DM-free boxes
        (gas-only test setups)."""
        nd = float(np.asarray(jnp.sum(
            (self.pdata.valid
             & (self.pdata.ptype == 1)).astype(jnp.int32))))
        if nd < 1.0:
            nd = max(1.0, float(np.asarray(self.pdata.num_valid)))
        return self.cfg.boxsize / np.cbrt(nd)

    def _density_params(self):
        from .sph.density import DensityParams
        mean_sep = self._dm_mean_sep()
        softening = self.cfg.gravity_softening * mean_sep
        return DensityParams(
            kernel_type=self.cfg.density_kernel_type,
            eta=self.cfg.density_resolution_eta,
            max_ngb_deviation=self.cfg.max_numngb_deviation,
            min_hsml=self.cfg.min_gas_hsml_fractional * softening)

    def setup_gas(self):
        """Initial Hsml + entropy from InitGasTemp
        (setup_smoothinglengths, init.c:461-524)."""
        from .sph.state import SphData
        from .sph.density import sph_density
        from .utils import constants as C
        n = self.pdata.capacity
        self.sph = SphData.zeros(n)
        gas = self.gas_mask
        atime = self.atime
        # initial hsml guess from the mean gas separation; BHs from
        # ICs get the same seed kernel (init.c:461-524 initializes
        # Hsml for types 0 AND 5 — a zero BH kernel would make the
        # accretion sums empty forever)
        ngas = float(jnp.sum(gas))
        mean_sep = self.cfg.boxsize / max(1.0, np.cbrt(ngas))
        is_bh = self.pdata.valid & (self.pdata.ptype == 5)
        hsml0 = jnp.where(gas | is_bh, 2.0 * mean_sep,
                          0.0).astype(jnp.float32)
        self.pdata = self.pdata.replace(hsml=hsml0)
        # u_init from InitGasTemp (init.c:488-501)
        init_temp = self.cfg.init_gas_temp
        if init_temp < 0:
            init_temp = self.CP.CMBTemperature / atime
        uu = self.cfg.units.UnitInternalEnergy_in_cgs
        u_init = (1.0 / C.GAMMA_MINUS1) * (C.BOLTZMANN / C.PROTONMASS) \
            * init_temp / uu
        mol_weight = (4 / (8 - 5 * (1 - C.HYDROGEN_MASSFRAC))
                      if init_temp > 1e4
                      else 4 / (1 + 3 * C.HYDROGEN_MASSFRAC))
        u_init /= mol_weight
        min_egy = (C.BOLTZMANN / C.PROTONMASS / C.GAMMA_MINUS1
                   * self.cfg.min_gas_temp / uu
                   / (4.0 / (1 + 3 * C.HYDROGEN_MASSFRAC)))
        u_init = max(u_init, min_egy)
        self._min_egy_spec = min_egy
        a3 = atime ** 3
        # density + hsml convergence with unit entvar
        dpar = self._density_params()
        ones = jnp.ones(n, jnp.float32)
        out = sph_density(self.pdata.ipos, self.pdata.mass, gas,
                          self.pdata.hsml, self.pdata.vel,
                          self.pdata.vel, ones, dpar, self.cfg.boxsize)
        self.pdata = self.pdata.replace(
            hsml=jnp.asarray(out["hsml"]),
            dt_hsml=jnp.asarray(out["dt_hsml"]))
        rho = jnp.asarray(out["density"])
        egy = rho
        entropy = C.GAMMA_MINUS1 * u_init / jnp.maximum(
            rho / a3, 1e-30) ** C.GAMMA_MINUS1
        if self.cfg.density_independent_sph:
            # iterate entropy <-> EgyWtDensity (init.c:406-452)
            for _ in range(8):
                entropy = C.GAMMA_MINUS1 * u_init / jnp.maximum(
                    egy / a3, 1e-30) ** C.GAMMA_MINUS1
                entvar = jnp.maximum(entropy, 1e-30) ** (1.0 / C.GAMMA)
                out = sph_density(
                    self.pdata.ipos, self.pdata.mass, gas,
                    self.pdata.hsml, self.pdata.vel, self.pdata.vel,
                    entvar, dpar, self.cfg.boxsize,
                    update_hsml=False)
                new_egy = jnp.asarray(out["egy_wt_density"])
                diff = float(jnp.max(jnp.where(
                    gas, jnp.abs(new_egy - egy)
                    / jnp.maximum(egy, 1e-30), 0.0)))
                egy = new_egy
                if diff < 1e-3:
                    break
        self.sph = self.sph.replace(
            entropy=jnp.where(gas, entropy, 0.0),
            density=rho, egy_wt_density=egy,
            dhsml_density_factor=jnp.asarray(
                out["dhsml_density_factor"]),
            dhsml_egy_factor=jnp.asarray(out["dhsml_egy_factor"]),
            div_vel=jnp.asarray(out["div_vel"]),
            curl_vel=jnp.asarray(out["curl_vel"]))
        self._gas_initialized = True

    def _restore_gas(self):
        """Rebuild SPH state from snapshot blocks
        (check_density_entropy path, init.c:366-400)."""
        from .sph.state import SphData
        from .utils import constants as C
        n = self.pdata.capacity
        gas = self.gas_mask
        r = self._gas_restore
        ngas = len(r["u"])
        atime = self.atime
        a3 = atime ** 3

        def expand(x):
            full = np.zeros(n, np.float32)
            full[np.asarray(gas)] = np.asarray(x, np.float32)
            return jnp.asarray(full)

        rho = expand(r["density"])
        u = expand(r["u"])
        entropy = C.GAMMA_MINUS1 * u / jnp.maximum(
            rho / a3, 1e-30) ** C.GAMMA_MINUS1
        sph = SphData.zeros(n).replace(
            entropy=entropy, density=rho,
            egy_wt_density=(expand(r["egy_wt_density"])
                            if "egy_wt_density" in r else rho))
        # generic registry-driven field scatter (any dtype/shape)
        updates = {}
        for field, arr in r.items():
            if field in ("u", "density", "hsml", "egy_wt_density") \
                    or not hasattr(sph, field):
                continue
            cur = np.array(np.asarray(getattr(sph, field)))
            cur[np.asarray(gas)] = np.asarray(arr).reshape(
                (-1,) + cur.shape[1:]).astype(cur.dtype)
            updates[field] = jnp.asarray(cur)
        if updates:
            sph = sph.replace(**updates)
        self.sph = sph
        self.pdata = self.pdata.replace(hsml=expand(r["hsml"]))
        uu = self.cfg.units.UnitInternalEnergy_in_cgs
        self._min_egy_spec = (C.BOLTZMANN / C.PROTONMASS
                              / C.GAMMA_MINUS1 * self.cfg.min_gas_temp
                              / uu / (4.0 / (1 + 3 * C.HYDROGEN_MASSFRAC)))
        self._gas_initialized = True

    def compute_hydro(self, dloga, active=None):
        """Density + hydro force loops (run.c:466-489 analog).

        active: optional bool[N] — restrict TARGETS to the active set
        (hierarchical stepping); all gas stays as sources and inactive
        targets keep their old values."""
        from .sph.density import sph_density
        from .sph.hydra import hydro_force, HydroParams
        from .utils.constants import GAMMA
        gas = self.gas_mask
        tgt = gas if active is None else (gas & active)
        atime = self.atime
        hubble = self.CP.hubble_function(atime)
        entvar = jnp.maximum(self.sph.entropy, 1e-30) ** (1.0 / GAMMA)
        entvar = jnp.where(gas, entvar, 0.0)
        dpar = self._density_params()

        def merge(new, old):
            new = jnp.asarray(new)
            if active is None:
                return new
            m = tgt[:, None] if new.ndim == 2 else tgt
            return jnp.where(m, new, old)

        self.walltime.start("SPH/Density")
        out = sph_density(self.pdata.ipos, self.pdata.mass, gas,
                          self.pdata.hsml, self.pdata.vel,
                          self.pdata.vel, entvar, dpar,
                          self.cfg.boxsize,
                          do_egy_density=self.cfg.density_independent_sph,
                          target_mask=None if active is None else tgt)
        self.walltime.stop("SPH/Density")
        self.pdata = self.pdata.replace(
            hsml=merge(out["hsml"], self.pdata.hsml),
            dt_hsml=merge(out["dt_hsml"], self.pdata.dt_hsml))
        self.sph = self.sph.replace(
            density=merge(out["density"], self.sph.density),
            egy_wt_density=merge(out["egy_wt_density"],
                                 self.sph.egy_wt_density),
            dhsml_density_factor=merge(out["dhsml_density_factor"],
                                       self.sph.dhsml_density_factor),
            dhsml_egy_factor=merge(out["dhsml_egy_factor"],
                                   self.sph.dhsml_egy_factor),
            div_vel=merge(out["div_vel"], self.sph.div_vel),
            curl_vel=merge(out["curl_vel"], self.sph.curl_vel))
        hp = HydroParams(
            kernel_type=self.cfg.density_kernel_type,
            art_bulk_visc=self.cfg.art_bulk_visc,
            density_independent=self.cfg.density_independent_sph,
            density_contrast_limit=self.cfg.density_contrast_limit)
        self.walltime.start("SPH/Hydro")
        res = hydro_force(
            self.pdata.ipos, self.pdata.mass, gas, self.pdata.hsml,
            self.pdata.vel, entvar, self.sph.density,
            self.sph.egy_wt_density, self.sph.div_vel,
            self.sph.curl_vel, self.sph.dhsml_egy_factor, hp,
            self.cfg.boxsize, atime, hubble, dloga)
        self.walltime.stop("SPH/Hydro")
        hydro_accel = res["hydro_accel"]
        dt_entropy = res["dt_entropy"]
        if self.cfg.wind_on and self._gas_initialized:
            # decoupled wind particles feel no hydro force
            # (winds_decoupled_hydro, winds.c:113-136)
            dec = self.sph.delay_time > 0
            hydro_accel = jnp.where(dec[:, None], 0.0, hydro_accel)
            dt_entropy = jnp.where(dec, 0.0, dt_entropy)
        self.sph = self.sph.replace(
            hydro_accel=merge(hydro_accel, self.sph.hydro_accel),
            dt_entropy=merge(dt_entropy, self.sph.dt_entropy),
            max_signal_vel=merge(res["max_signal_vel"],
                                 self.sph.max_signal_vel))

    def _init_cooling(self):
        from .physics.cooling import (CoolingParams, CoolingRates,
                                      CoolingUnits, TreeCool)
        par = CoolingParams(
            recomb=self.cfg.recomb_rates, cooling=self.cfg.cooling_rates,
            SelfShieldingOn=self.cfg.self_shielding_on,
            PhotoIonizationOn=self.cfg.photo_ionization_on,
            PhotoIonizeFactor=self.cfg.photo_ionize_factor,
            MinGasTemp=self.cfg.min_gas_temp,
            CMBTemperature=self.CP.CMBTemperature,
            fBar=self.CP.OmegaBaryon / max(self.CP.OmegaCDM, 1e-10),
            HeliumHeatOn=self.cfg.helium_heat_on,
            HeliumHeatThresh=self.cfg.helium_heat_thresh,
            HeliumHeatAmp=self.cfg.helium_heat_amp,
            HeliumHeatExp=self.cfg.helium_heat_exp,
        )
        tc = TreeCool(self.cfg.treecool_file or None, par)
        mtab = None
        if self.cfg.metal_cool_file:
            from .physics.cooling import MetalCoolingTable
            mtab = MetalCoolingTable.from_file(self.cfg.metal_cool_file)
        self._uvf = None
        if self.cfg.uv_fluctuation_file:
            from .physics.cooling import UVFluctuationTable
            self._uvf = UVFluctuationTable.from_file(
                self.cfg.uv_fluctuation_file, self.cfg.boxsize,
                self.cfg.units.UnitLength_in_cm)
        self._cooling = CoolingRates(par, tc, metal_table=mtab)
        self._treecool = tc
        units = self.cfg.units
        h = self.CP.HubbleParam
        self._cooling_units = CoolingUnits(
            density_in_phys_cgs=units.UnitDensity_in_cgs * h * h,
            uu_in_cgs=units.UnitInternalEnergy_in_cgs,
            tt_in_s=units.UnitTime_in_s / h)

    def apply_cooling(self, dloga, active=None):
        """Strang-split cooling after the kick (cooling_direct path of
        cooling_and_starformation, sfr_eff.c:187).

        dloga may be per-particle (hierarchical bins, each closing
        particle cools over its own interval) and ``active`` restricts
        the update to the closing set."""
        from .physics.cooling import do_cooling
        from .utils.constants import GAMMA_MINUS1
        if not hasattr(self, "_cooling"):
            self._init_cooling()
        gas = self.gas_mask
        if active is not None:
            gas = gas & active
        atime = self.atime
        redshift = 1.0 / atime - 1.0
        hubble = self.CP.hubble_function(atime)
        uvbg = self._treecool.get_global_uvbg(redshift)
        if getattr(self, "_uvf", None) is not None:
            from .physics.cooling import local_uvbg
            uvbg = local_uvbg(uvbg, self._uvf.zreion(self.pdata.ipos),
                              redshift)
        uvbg = self._excursion_uvbg(uvbg, redshift)
        a3 = atime ** 3
        rho_phys = jnp.maximum(self.sph.density, 1e-30) / a3
        u = self.sph.entropy / GAMMA_MINUS1 * rho_phys ** GAMMA_MINUS1
        dt = jnp.broadcast_to(jnp.asarray(dloga, u.dtype) / hubble,
                              u.shape)
        self.walltime.start("Cooling")
        u_new, ne = do_cooling(self._cooling, redshift, u, rho_phys,
                               dt, uvbg, self.sph.ne,
                               self.sph.metallicity,
                               self._min_egy_spec, self._cooling_units)
        self.walltime.stop("Cooling")
        ent_new = GAMMA_MINUS1 * u_new / rho_phys ** GAMMA_MINUS1
        self.sph = self.sph.replace(
            entropy=jnp.where(gas, ent_new, self.sph.entropy),
            ne=jnp.where(gas, ne, self.sph.ne))

    def _init_sfr(self):
        from .physics.sfr import SFRParams, init_sfr
        mass = np.asarray(self.pdata.mass)
        gas = np.asarray(self.gas_mask)
        avg_bar = float(mass[gas].mean()) if gas.any() else 0.0
        par = SFRParams(
            StarformationCriterion=self.cfg.sfr_criterion,
            CritOverDensity=self.cfg.crit_overdensity,
            CritPhysDensity=self.cfg.crit_phys_density,
            FactorSN=self.cfg.factor_sn,
            FactorEVP=self.cfg.factor_evp,
            TempSupernova=self.cfg.temp_supernova,
            TempClouds=self.cfg.temp_clouds,
            MaxSfrTimescale=self.cfg.max_sfr_timescale,
            Generations=self.cfg.generations,
            QuickLymanAlphaProbability=self.cfg.quick_lya_probability,
            QuickLymanAlphaTempThresh=self.cfg.quick_lya_temp_thresh,
            WindOn=self.cfg.wind_on)
        self._sfr = init_sfr(par, self.CP, self.cfg.units,
                             self._cooling, self._cooling_units, avg_bar)
        if self.cfg.wind_on:
            from .physics.winds import WindParams, init_winds
            wp = WindParams(
                model=self.cfg.wind_model,
                efficiency=self.cfg.wind_efficiency,
                energy_fraction=self.cfg.wind_energy_fraction,
                sigma0=self.cfg.wind_sigma0,
                speed_factor=self.cfg.wind_speed_factor,
                free_travel_length=self.cfg.wind_free_travel_length,
                free_travel_dens_fac=self.cfg.wind_free_travel_dens_fac,
                min_wind_velocity=self.cfg.min_wind_velocity,
                thermal_factor=self.cfg.wind_thermal_factor,
                max_free_travel_time=self.cfg.max_wind_free_travel_time)
            self._winds = init_winds(
                wp, self._sfr.FactorSN, self._sfr.EgySpecSN,
                self._sfr.PhysDensThresh,
                self.cfg.units.UnitTime_in_s)
            self._vdisp = jnp.zeros(self.pdata.capacity, jnp.float32)

    def apply_metal_return(self, dloga):
        """Stellar mass & metal return to neighbor gas
        (metal_return(), metal_return.c:423-500)."""
        from .physics import metal_return as mrmod
        is_star = self.pdata.valid & (self.pdata.ptype == 4)
        nstar = int(jnp.sum(is_star.astype(jnp.int32)))
        if nstar == 0 or self.sph is None or self.stars is None:
            return
        atime1 = self.atime
        atime0 = float(np.exp(np.log(atime1) - dloga))
        if getattr(self, "_age_table", None) is None:
            self._age_table = mrmod.AgeTable(
                self.CP.hubble_function, self.cfg.units,
                self.CP.HubbleParam)
            self._mr_params = mrmod.MetalReturnParams(
                sn1a_n0=self.cfg.metals_sn1a_n0,
                sph_weighting=self.cfg.metals_sph_weighting,
                max_ngb_deviation=self.cfg.metals_max_ngb_deviation)
            self._star_hsml = jnp.where(
                is_star, self.pdata.hsml, 0.0)
        # seed star hsml from the particle hsml (gas-inherited) or the
        # mean spacing when zero
        npart = float(np.asarray(self.pdata.num_valid))
        mean_sep = self.cfg.boxsize / max(1.0, np.cbrt(npart))
        sh = jnp.where(self._star_hsml > 0, self._star_hsml,
                       jnp.where(self.pdata.hsml > 0,
                                 self.pdata.hsml, 2.0 * mean_sep))
        self.walltime.start("MetalReturn")
        out = mrmod.metal_return_step(
            self.pdata.ipos, self.pdata.mass, self.pdata.hsml,
            self.sph.density, self.gas_mask, is_star, sh, self.stars,
            self.sph.metals, atime0, atime1, self._age_table,
            self.cfg.boxsize, self._mr_params, self.CP.HubbleParam)
        self.walltime.stop("MetalReturn")
        new_mass = jnp.where(self.gas_mask, out["gas_mass"],
                             out["star_mass"]).astype(jnp.float32)
        self.pdata = self.pdata.replace(mass=new_mass)
        zmet = jnp.sum(out["gas_metals"][:, 2:], axis=1)
        self.sph = self.sph.replace(
            metals=out["gas_metals"],
            metallicity=jnp.where(self.gas_mask, zmet,
                                  self.sph.metallicity))
        self.stars = self.stars.replace(
            total_mass_returned=out["total_mass_returned"],
            last_enrichment_myr=out["last_enrichment_myr"])
        self._star_hsml = out["star_hsml"]

    def apply_cooling_sfr(self, dloga, active=None):
        """cooling_and_starformation (sfr_eff.c:187): eEOS + spawning
        for star-forming gas, plain cooling otherwise.

        dloga may be per-particle (hierarchical stepping applies the
        source terms to each closing bin over its own interval,
        timestep.c:298 + run.c:374-520); ``active`` restricts the
        update to the closing set."""
        from .physics import sfr as sfrmod
        from .physics.cooling import do_cooling
        if not hasattr(self, "_cooling"):
            self._init_cooling()
        if not hasattr(self, "_sfr"):
            self._init_sfr()
        gas = self.gas_mask
        if active is not None:
            gas = gas & active
        atime = self.atime
        redshift = 1.0 / atime - 1.0
        hubble = self.CP.hubble_function(atime)
        uvbg = self._treecool.get_global_uvbg(redshift)
        if getattr(self, "_uvf", None) is not None:
            from .physics.cooling import local_uvbg
            uvbg = local_uvbg(uvbg, self._uvf.zreion(self.pdata.ipos),
                              redshift)
        uvbg = self._excursion_uvbg(uvbg, redshift)
        key = jax.random.PRNGKey(
            (self.cfg.random_seed + self.ti_current) % (2 ** 31))

        def cool_fn(u, rho_phys, dt, ne, Z):
            return do_cooling(self._cooling, redshift, u, rho_phys, dt,
                              uvbg, ne, Z, self._min_egy_spec,
                              self._cooling_units)

        self.walltime.start("Cooling/SFR")
        out = sfrmod.cooling_and_starformation(
            self._sfr, self._cooling, self._cooling_units, key,
            density=self.sph.density, entropy=self.sph.entropy,
            ne=self.sph.ne, metallicity=self.sph.metallicity,
            delay_time=self.sph.delay_time, mass=self.pdata.mass,
            pid=self.pdata.pid, valid_gas=gas, redshift=redshift,
            atime=atime, hubble=hubble, dloga=dloga, uvbg=uvbg,
            do_cooling_fn=cool_fn, min_egy_spec=self._min_egy_spec)
        self.walltime.stop("Cooling/SFR")
        # keep the stored SFR of non-closing rows (out zeroes outside
        # the update mask)
        sfr_new = out["sfr"] if active is None else \
            jnp.where(gas, out["sfr"], self.sph.sfr)
        self.sph = self.sph.replace(
            entropy=out["entropy"], ne=out["ne"], sfr=sfr_new,
            metallicity=out["metallicity"])
        # subgrid winds kick the star-forming gas itself BEFORE
        # spawning (winds_make_after_sf); non-subgrid models (vs08,
        # ofjt10) kick NEIGHBORS of the new stars after spawning
        # (winds_and_feedback, winds.c:299-345)
        from .physics import winds as windmod
        wkey = jax.random.fold_in(key, 77)
        vdisp = getattr(self, "_vdisp",
                        jnp.zeros(self.pdata.capacity, jnp.float32))
        subgrid = bool(self.cfg.wind_model & windmod.WIND_SUBGRID)
        if self.cfg.wind_on and subgrid:
            vel_new, ent_new, delay_new, kicked = windmod.winds_subgrid(
                self._winds, wkey, sm=out["sm"], mass=self.pdata.mass,
                pid=self.pdata.pid, vdisp=vdisp, vel=self.pdata.vel,
                entropy=self.sph.entropy, density=self.sph.density,
                delay_time=self.sph.delay_time,
                eligible=out["on_eeqos"], atime=atime)
            self.pdata = self.pdata.replace(vel=vel_new)
            self.sph = self.sph.replace(entropy=ent_new,
                                        delay_time=delay_new)
        # write_sfr stats gathered BEFORE spawn_stars mutates masses
        # (sfr_eff.c:319-364): sum(dtime) + count over the
        # star-forming set, and the child masses actually formed
        on_sf = out["on_eeqos"]
        dt_sf = jnp.broadcast_to(
            jnp.asarray(dloga, jnp.float32) / hubble, on_sf.shape)
        sum_dtime = float(jnp.sum(jnp.where(on_sf, dt_sf, 0.0)))
        n_sf = int(jnp.sum(on_sf.astype(jnp.int32)))
        mass_formed = float(jnp.sum(jnp.where(
            out["make_star"],
            jnp.where(out["convert"], self.pdata.mass,
                      out["star_mass"]), 0.0)))
        nstar = int(jnp.sum(out["make_star"].astype(jnp.int32)))
        new_star = None
        if nstar > 0:
            if self.stars is None:
                from .physics.stars import StarData
                self.stars = StarData.zeros(self.pdata.capacity)
            self.pdata, self.sph, self.stars, nspawn, ovf, new_star = \
                sfrmod.spawn_stars(
                    self.pdata, self.sph, out["make_star"],
                    out["convert"], out["star_mass"], atime,
                    stars=self.stars,
                    vdisp=getattr(self, "_vdisp", None))
            if bool(ovf):
                raise RuntimeError("particle capacity exhausted while "
                                   "spawning stars; raise PartAllocFactor")
        if self.cfg.wind_on and not subgrid and new_star is not None:
            self.walltime.start("Winds")
            vel_new, ent_new, delay_new, kicked = \
                windmod.winds_via_neighbors(
                    self._winds, wkey, ipos=self.pdata.ipos,
                    mass=self.pdata.mass, hsml=self.pdata.hsml,
                    pid=self.pdata.pid, vel=self.pdata.vel,
                    entropy=self.sph.entropy,
                    density=self.sph.density,
                    delay_time=self.sph.delay_time,
                    is_gas=self.gas_mask, new_star=new_star,
                    star_vdisp=self.stars.vdisp,
                    boxsize=self.cfg.boxsize, atime=atime)
            self.pdata = self.pdata.replace(vel=vel_new)
            self.sph = self.sph.replace(entropy=ent_new,
                                        delay_time=delay_new)
            self.walltime.stop("Winds")
        if self.cfg.wind_on:
            # advance decoupling timers (winds_evolve)
            hubble_now = self.CP.hubble_function(atime)
            self.sph = self.sph.replace(
                delay_time=windmod.winds_decouple_update(
                    self._winds, self.sph.delay_time,
                    self.sph.density, dloga / hubble_now, atime))
        # sfr.txt in the reference's 8-column layout (write_sfr,
        # sfr_eff.c:381): a, total_sm (expected mass formed, internal),
        # totsfrrate (Msun/yr), rate_in_msunperyear
        # (= total_sm * n_sf / sum_dtime * UnitSfr — the rate implied
        # by total_sm over the mean star-forming dt, a DISTINCT
        # quantity from col 3), mass actually formed this step,
        # mean dt, n star-forming, n new stars
        total_sfr = float(jnp.sum(self.sph.sfr))
        total_sm = float(jnp.sum(jnp.where(gas, out["sm"], 0.0)))
        rate_msun = (total_sm * n_sf / sum_dtime
                     * self._sfr.UnitSfr_in_solar_per_year
                     if sum_dtime > 0 else 0.0)
        mean_dt = sum_dtime / n_sf if n_sf > 0 else 0.0
        with open(os.path.join(self.cfg.output_dir, "sfr.txt"),
                  "a") as fh:
            fh.write(f"{atime:.12g} {total_sm:g} {total_sfr:g} "
                     f"{rate_msun:g} {mass_formed:g} "
                     f"{mean_dt:g} {n_sf} {nstar}\n")

    def find_hydro_timestep_dloga(self):
        """Courant + Hsml-change criteria (timestep.c:1075-1090)."""
        from .utils.constants import GAMMA
        gas = self.gas_mask
        atime = self.atime
        hubble = self.CP.hubble_function(atime)
        par = self.cfg.timestep
        fac3 = atime ** (3 * (1 - GAMMA) / 2.0)
        vsig = jnp.maximum(self.sph.max_signal_vel, 1e-30)
        dt_c = 2 * par.CourantFac * atime * self.pdata.hsml \
            / (fac3 * vsig)
        dt_h = par.CourantFac * atime * atime * jnp.abs(
            self.pdata.hsml / (self.pdata.dt_hsml + 1e-20))
        dt = jnp.minimum(dt_c, dt_h)
        dloga = float(jnp.min(jnp.where(gas, dt, jnp.inf))) * hubble
        return min(dloga, par.MaxSizeTimestep)

    # -- stepping ------------------------------------------------------

    def find_pm_timestep(self):
        asmth_len = self.cfg.asmth * self.cfg.boxsize / self.cfg.nmesh
        dloga = get_long_range_timestep_dloga(
            self.pdata, self.CP, self.atime, asmth_len,
            self.cfg.timestep, self.cfg.fast_particle_type,
            self._omega_per_type)
        return get_pm_timestep_ti(dloga, self.timeline, self.ti_current,
                                  self.ti_current)

    def _apply_half_kick(self, t0, t1):
        """Gravity (+hydro, +entropy) kick over [t0, t1]
        (apply_half_kick / apply_hydro_half_kick, timestep.c)."""
        accel = self.pdata.grav_pm + self.pdata.grav_accel
        vel = kick(self.pdata.vel, accel, self.tf.gravkick(t0, t1))
        if self.has_gas and self._gas_initialized:
            from .utils.constants import GAMMA_MINUS1
            gas = self.gas_mask
            hk = self.tf.hydrokick(t0, t1)
            vel = vel + jnp.where(gas[:, None], self.sph.hydro_accel,
                                  0.0) * jnp.float32(hk)
            dloga = (self.timeline.loga_from_ti(t1)
                     - self.timeline.loga_from_ti(t0))
            ent = self.sph.entropy + self.sph.dt_entropy \
                * jnp.float32(dloga)
            # entropy floor from MinGasTemp (check_density_entropy)
            a3 = self.atime ** 3
            minent = GAMMA_MINUS1 * self._min_egy_spec / jnp.maximum(
                self.sph.density / a3, 1e-30) ** GAMMA_MINUS1
            ent = jnp.maximum(ent, minent)
            # entropy may at most halve per step (Gadget convention)
            ent = jnp.maximum(ent, 0.5 * self.sph.entropy)
            self.sph = self.sph.replace(
                entropy=jnp.where(gas, ent, self.sph.entropy))
        self.pdata = self.pdata.replace(vel=vel)

    def _update_random_offset(self):
        """Re-randomize the internal box shift (update_random_offset,
        partmanager.c:43-60; applied per PM step, run.c:411).  With
        uint32 fixed-point positions the shift is one wrapping add."""
        frac = self.cfg.random_particle_offset / self.cfg.nmesh
        rng = np.random.RandomState(
            (self.cfg.random_seed * 9999991 + self._nstep_total)
            % (2 ** 31 - 1))
        new = (rng.random_sample(3) * frac * 2.0 ** 32).astype(
            np.uint64).astype(np.uint32)
        delta = (new.astype(np.uint64)
                 - self._ipos_offset.astype(np.uint64)).astype(np.uint32)
        self.pdata = self.pdata.replace(
            ipos=self.pdata.ipos + jnp.asarray(delta)[None, :])
        self._ipos_offset = new

    def _output_pos(self, sel=None):
        """Float positions with the internal random shift removed
        (petaio position IO, partmanager.h:79-84)."""
        ip = np.asarray(self.pdata.ipos)
        if sel is not None:
            ip = ip[sel]
        ip = (ip.astype(np.uint64)
              - self._ipos_offset.astype(np.uint64)).astype(np.uint32)
        return fixed_to_pos(ip, self.cfg.boxsize)

    def _check_invariants(self):
        """DEBUG-style state sanity checks (the reference's
        check_kick_drift_times / containment asserts, timestep.c and
        exchange.c DEBUG blocks): finite velocities and entropy,
        positive masses, valid counts stable."""
        valid = self.pdata.valid
        bad = []
        if not bool(jnp.all(jnp.isfinite(
                jnp.where(valid[:, None], self.pdata.vel, 0.0)))):
            bad.append("non-finite velocity")
        if not bool(jnp.all(jnp.where(valid, self.pdata.mass, 1.0)
                            > 0)):
            bad.append("non-positive mass")
        if self.sph is not None and self._gas_initialized:
            gas = self.gas_mask
            ent = jnp.where(gas, self.sph.entropy, 1.0)
            if not bool(jnp.all(jnp.isfinite(ent) & (ent > 0))):
                bad.append("bad gas entropy")
        if bad:
            try:
                self.write_snapshot(label=999)
            except Exception:
                pass
            raise RuntimeError(
                f"state invariants violated at a={self.atime:g}: "
                + ", ".join(bad))

    def _apply_pm_half_kick(self, t0, t1):
        """Long-range-only kick (apply_PM_half_kick, timestep.c)."""
        vel = kick(self.pdata.vel, self.pdata.grav_pm,
                   self.tf.gravkick(t0, t1))
        self.pdata = self.pdata.replace(vel=vel)

    def _bin_half_kick(self, mask, bins, ti, maxbin, opening):
        """Per-timebin short-range + hydro half kick for particles in
        ``mask`` at their own bin interval (apply_half_kick for the
        active list, timestep.c:520-600)."""
        from .utils.constants import GAMMA_MINUS1
        gfac = np.zeros(maxbin + 1, np.float32)
        hfac = np.zeros(maxbin + 1, np.float32)
        dlg = np.zeros(maxbin + 1, np.float32)
        for b in range(1, maxbin + 1):
            db = 1 << b
            if opening:
                ta, tb = ti, ti + db // 2
            else:
                ta, tb = ti - db // 2, ti
            gfac[b] = self.tf.gravkick(ta, tb)
            if self.has_gas and self._gas_initialized:
                hfac[b] = self.tf.hydrokick(ta, tb)
                dlg[b] = (self.timeline.loga_from_ti(tb)
                          - self.timeline.loga_from_ti(ta))
        bins_c = jnp.clip(bins, 0, maxbin)
        gk = jnp.asarray(gfac)[bins_c]
        vel = self.pdata.vel + jnp.where(
            mask[:, None], self.pdata.grav_accel * gk[:, None], 0.0)
        if self.has_gas and self._gas_initialized:
            gas = self.gas_mask & mask
            hk = jnp.asarray(hfac)[bins_c]
            vel = vel + jnp.where(gas[:, None],
                                  self.sph.hydro_accel * hk[:, None],
                                  0.0)
            dl = jnp.asarray(dlg)[bins_c]
            ent = self.sph.entropy + self.sph.dt_entropy * dl
            a3 = self.atime ** 3
            minent = GAMMA_MINUS1 * self._min_egy_spec / jnp.maximum(
                self.sph.density / a3, 1e-30) ** GAMMA_MINUS1
            ent = jnp.maximum(ent, minent)
            ent = jnp.maximum(ent, 0.5 * self.sph.entropy)
            self.sph = self.sph.replace(
                entropy=jnp.where(gas, ent, self.sph.entropy))
        self.pdata = self.pdata.replace(vel=vel)

    def step_hierarchical(self, dti_pm: int):
        """One PM interval with per-particle timebin sub-cycling
        (find_timesteps + the active-list KDK of run.c:374-520,
        timestep.c:298-503).

        Particles carry power-of-two bins from the gravity-acceleration
        and Courant criteria; each substep advances the global clock by
        the minimum active bin, drifts everything, and recomputes
        short-range + hydro forces only for targets closing their bin
        interval.  The PM force is a global half kick at each end of
        the interval.  Bins are fixed within one PM interval; source
        terms (cooling/SFR/BH/metal return) run once per PM interval
        (a Strang-split approximation of the reference's per-active-bin
        application)."""
        from .timestep import assign_particle_bins
        from .timeline import get_timestep_bin
        t0 = self.ti_current
        t_end = t0 + dti_pm
        if self.cfg.random_particle_offset > 0 and self._nstep_total:
            self._update_random_offset()
        self._nstep_total += 1
        inv_box = 1.0 / self.cfg.boxsize
        mid = t0 + dti_pm // 2
        self._apply_pm_half_kick(t0, mid)

        soft = 2.8 * self.cfg.gravity_softening * self._dm_mean_sep()
        bins = assign_particle_bins(
            self.pdata, self.sph if self._gas_initialized else None,
            self.gas_mask, self.CP, self.atime, soft, self.timeline,
            t0, self.cfg.timestep, dti_pm)
        # bin dti must divide both t0 and dti_pm or boundaries never
        # align with the global clock (is_timebin_active analog)
        maxbin = get_timestep_bin(dti_pm)
        tz = (t0 & -t0).bit_length() - 1 if t0 > 0 else 62
        tzp = (dti_pm & -dti_pm).bit_length() - 1
        maxbin = max(1, min(maxbin, tz, tzp))
        bins = jnp.clip(bins, 1, maxbin)
        if self.cfg.timestep.ForceEqualTimesteps:
            bins = jnp.full_like(bins, int(jnp.min(bins)))
        self.pdata = self.pdata.replace(timebin=bins)
        dtib = (jnp.int64(1) << bins.astype(jnp.int64))
        valid = self.pdata.valid

        ti = t0
        n_sub = 0
        while ti < t_end:
            aligned = (jnp.int64(ti) & (dtib - 1)) == 0
            active = valid & aligned
            self._bin_half_kick(active, bins, ti, maxbin, opening=True)
            dti_s = int(jnp.min(jnp.where(active, dtib, jnp.int64(
                1 << 62))))
            dti_s = min(dti_s, t_end - ti)
            # drift ALL particles (drift is global, drift.c)
            hsml = self.pdata.hsml + self.pdata.dt_hsml \
                * jnp.float32(self.tf.drift(ti, ti + dti_s))
            hsml = jnp.clip(hsml, 0.0, 0.45 * self.cfg.boxsize)
            self.pdata = self.pdata.replace(
                ipos=drift(self.pdata.ipos, self.pdata.vel,
                           self.tf.drift(ti, ti + dti_s), inv_box),
                hsml=hsml)
            ti += dti_s
            self.ti_current = ti
            closing = valid & ((jnp.int64(ti) & (dtib - 1)) == 0)
            n_closing = int(jnp.sum(closing))
            if self.has_gas and self.cfg.hydro_on \
                    and self._gas_initialized:
                dloga_s = self.timeline.dloga_from_dti(dti_s,
                                                       ti - dti_s)
                self.compute_hydro(dloga_s, active=closing)
            self._compute_tree_forces(active=closing,
                                      n_active=n_closing)
            self._bin_half_kick(closing, bins, ti, maxbin,
                                opening=False)
            self._force_evals += n_closing
            # gas source terms per closing bin, each particle over its
            # OWN interval (cooling_and_starformation on the active
            # list, run.c:374-520 + timestep.c:298); BH and metal
            # return stay at PM cadence (cheaper, see docstring)
            if self.has_gas and self._gas_initialized and (
                    self.cfg.starformation_on or self.cfg.cooling_on):
                dlg1 = self.timeline.dloga_from_dti(1, ti)
                dloga_pp = jnp.where(
                    closing, dtib.astype(jnp.float32)
                    * jnp.float32(dlg1), 0.0)
                if self.cfg.starformation_on:
                    self.apply_cooling_sfr(dloga_pp, active=closing)
                    # spawning may have added stars: refresh the loop's
                    # masks so new particles drift/kick this interval
                    valid = self.pdata.valid
                    bins = jnp.clip(self.pdata.timebin, 1, maxbin)
                    dtib = (jnp.int64(1) << bins.astype(jnp.int64))
                else:
                    self.apply_cooling(dloga_pp, active=closing)
            # re-derive bins for particles closing their interval from
            # the fresh forces (timestep.c:298-503: bins move per
            # boundary, not per PM interval); a bin may shrink freely
            # at its own boundary but may only GROW when the new,
            # longer interval is aligned with the current clock
            # (is_timebin_active rule).
            if ti < t_end and not \
                    self.cfg.timestep.ForceEqualTimesteps:
                new_bins = assign_particle_bins(
                    self.pdata,
                    self.sph if self._gas_initialized else None,
                    self.gas_mask, self.CP, self.atime, soft,
                    self.timeline, ti, self.cfg.timestep, dti_pm)
                new_bins = jnp.clip(new_bins, 1, maxbin)
                dtin = (jnp.int64(1) << new_bins.astype(jnp.int64))
                aligned_new = (jnp.int64(ti) & (dtin - 1)) == 0
                bins = jnp.where(closing & (new_bins < bins),
                                 new_bins, bins)
                bins = jnp.where(closing & (new_bins > bins)
                                 & aligned_new, new_bins, bins)
                self.pdata = self.pdata.replace(timebin=bins)
                dtib = (jnp.int64(1) << bins.astype(jnp.int64))
            n_sub += 1
        # long-range force refresh + closing PM kick at the sync point
        self.compute_forces(tree=False)
        self._apply_pm_half_kick(mid, t_end)
        # cooling/SFR already ran per closing bin inside the loop; the
        # remaining source terms are Strang-split once per PM interval
        # (BH + metal return: their neighbor searches at substep
        # cadence would dominate; the reference restricts them to
        # active BHs/stars instead, blackhole.c:216)
        if self.has_gas and self._gas_initialized:
            dloga = self.timeline.dloga_from_dti(dti_pm, t0)
            if self.cfg.black_hole_on:
                self.apply_blackholes(dloga)
            if self.cfg.metal_return_on:
                self.apply_metal_return(dloga)
        return n_sub

    def run_sharded(self, device_mesh, max_steps=None, verbose=True,
                    rebalance=True, hierarchical=False,
                    compact_walks=True):
        """Production multi-device main loop (run.c:358-800 at scale).

        Drives parallel/driver.build_sharded_step: the full gas+DM
        TreePM KDK (tree + pencil-FFT PM + SPH density/hydro) over
        count-balanced slab boundaries (domain.c:106 analog) with
        K-hop ghost strips (treewalk.c exports), capacity-free
        multi-hop PM, and psum'd timestep statistics — the host never
        mirrors particle arrays except at sync-point outputs.  Buffer
        overflows rebuild the step with doubled capacities and retry
        the SAME step inputs (the single-chip treewalk retry policy at
        scale).  Boundaries are recomputed from the returned x
        histogram every step.

        hierarchical=True: per-particle power-of-two timebins inside
        the sharded driver (the sharded analog of step_hierarchical;
        find_timesteps + the active-list KDK of timestep.c:298-503).
        Each PM interval opens/closes with a long-range half kick from
        a separate PM-refresh program; substeps advance the clock by
        the minimum active bin and compute tree/SPH forces only for
        rows closing their bin (compacted active-block walks), with
        per-closing-bin cooling/SFR.  BH/winds/metal return stay at PM
        cadence, exactly like the single-device hierarchical path.

        Sharded source terms: radiative cooling, SFR/eEOS with
        stochastic star spawning (per-ID RNG → domain-split
        invariant draws), subgrid fixed-efficiency winds in-step, and
        — as separate sharded programs after each step — the
        neighbor-search wind models vs08/ofjt10 (parallel/winds.py),
        black holes (parallel/blackhole.py) and stellar metal return
        (parallel/metals.py).  With bh_reposition the state carries
        the total (tree+PM) potential and BHs jump to their kernel
        min-pot neighbor inside the sharded BH pass.

        Aux physics at PM cadence (run.c:605-727 at scale): QSO
        helium reionization (lmfp heating + bubbles around halos of
        the DISTRIBUTED catalog), the excursion-set UVBG (sharded
        deposits/readouts + per-row J21 cooling rates during the
        epoch), lensing potential planes (sharded NGP deposit), and
        the lightcone.  Sync points write snapshots with the
        collective striped writer and run the distributed FOF + PIG
        output + BH seeding (parallel/snapshot.py, parallel/fof.py)
        — no host mirror."""
        from .parallel.driver import build_sharded_step
        from .parallel.decomp import balanced_boundaries
        from .parallel.mesh import shard_particles
        from .timeline import round_down_power_of_two
        from .utils.constants import GAMMA

        from .physics import winds as windmod
        with_gas = bool(self.has_gas and self.cfg.hydro_on)
        with_sfr = bool(with_gas and self.cfg.starformation_on)
        wind_sharded = bool(
            with_sfr and self.cfg.wind_on
            and (self.cfg.wind_model & windmod.WIND_SUBGRID)
            and (self.cfg.wind_model & windmod.WIND_FIXED_EFFICIENCY))
        with_metals = bool(with_gas and self.cfg.metal_return_on)
        with_bh = bool(with_gas and self.cfg.black_hole_on)
        # bh_reposition: the sharded state carries the PM potential
        # column (pm_force_multi with_potential) and the BH pass jumps
        # each BH to its kernel min-pot neighbor (bhdynfric.c:199 +
        # drift.c:32-49)
        with_potential = bool((with_bh and self.cfg.bh_reposition)
                              or self.cfg.output_potential)
        # hybrid neutrinos: the step carries a 0/1 scalar that turns
        # type-2 rows from passive tracers into gravitating particles
        # at NuPartTime (hybrid_nu_tracer, gravpm.c:83-85) with no
        # recompile
        with_nu_tracer = bool(self.cfg.hybrid_neutrinos_on)

        def nu_src_scalar(a):
            return jnp.float32(
                0.0 if self.CP.hybrid_nu_tracer(a) else 1.0)
        # QSO helium reionization and the excursion-set UVBG carry
        # per-row columns (HeIII flag / J21+zreion) so bubbles and
        # grid readouts run on the sharded rows (cooling_qso_lightup.c
        # / uvbg.c at scale)
        with_qso = bool(with_gas and self.cfg.qso_lightup_on)
        with_excursion = bool(with_gas and self.cfg.excursion_set_on)
        # non-subgrid wind models (vs08/ofjt10) kick gas NEIGHBORS of
        # the new stars; they run as a separate sharded program after
        # the step (parallel/winds.py)
        wind_neighbors = bool(
            with_sfr and self.cfg.wind_on
            and not (self.cfg.wind_model & windmod.WIND_SUBGRID))
        if (with_gas and self.cfg.wind_on and not wind_sharded
                and not wind_neighbors):
            raise ValueError(
                "sharded subgrid winds require WIND_FIXED_EFFICIENCY "
                "(sh03); use the single-device run() for exotic "
                "subgrid+halo combinations")
        if with_metals and not with_sfr:
            raise ValueError("sharded metal return requires "
                             "StarformationOn (star slots)")
        if with_gas and not self._gas_initialized:
            if getattr(self, "_gas_restore", None):
                self._restore_gas()
            else:
                self.setup_gas()
        if with_gas:
            self.compute_hydro(dloga=0.0)
        if self._tree_grav is None or self.pdata.grav_accel is None:
            self.compute_forces(measure_power=False)
        tg = self._tree_grav
        os.makedirs(self.cfg.output_dir, exist_ok=True)

        S = int(device_mesh.devices.size)
        log2s = int(np.log2(S))
        assert 1 << log2s == S, "shard count must be a power of two"
        n = self.pdata.capacity
        n_local = int(np.ceil(2.0 * n / S / 256)) * 256
        n_pad = n_local * S

        def pad(a, fill=0):
            # pad from the array's own length: the host mirror may
            # have grown (spawning) between make_state() calls
            if a.shape[0] > n_pad:
                raise RuntimeError(
                    "host mirror outgrew the sharded capacity "
                    f"({a.shape[0]} > {n_pad}); restart run_sharded")
            return jnp.concatenate(
                [a, jnp.full((n_pad - a.shape[0],) + a.shape[1:],
                             fill, a.dtype)], axis=0)

        with_cooling = bool(with_gas and self.cfg.cooling_on
                            and not with_sfr)

        def make_state():
            """(Re)build the sharded state dict from the host
            mirror — called once at entry and again after FOF BH
            seeding mutates the host arrays."""
            acc0 = self.pdata.grav_accel + self.pdata.grav_pm
            state = {
                "ipos": pad(self.pdata.ipos), "vel": pad(self.pdata.vel),
                "mass": pad(self.pdata.mass),
                "valid": pad(self.pdata.valid, False),
                "pid": pad(self.pdata.pid),
                "ptype": pad(self.pdata.ptype),
                "amag": pad(jnp.sqrt(jnp.sum(acc0 * acc0, axis=-1))),
                "grav_acc": pad(acc0),
            }
            if with_potential:
                # split carry: pdata.potential holds the PM part
                # (single-device semantics); the tree part is added
                # in-driver (global step) or per closing bin
                # (hierarchical tree_pot)
                state["potential"] = pad(self.pdata.potential)
                state["pm_pot"] = pad(self.pdata.potential)
                if hierarchical:
                    state["tree_pot"] = pad(jnp.zeros(
                        self.pdata.capacity, jnp.float32))
            if hierarchical:
                # hierarchical stepping kicks tree and PM at different
                # cadences: grav_acc is tree-only, pm_acc carries the
                # long-range field between PM boundaries
                state["grav_acc"] = pad(self.pdata.grav_accel)
                state["pm_acc"] = pad(self.pdata.grav_pm)
                state["bins"] = pad(jnp.ones(self.pdata.capacity,
                                             jnp.int32), 1)
            if with_gas:
                state.update(
                    gas_mask=pad(self.gas_mask, False),
                    hsml=pad(self.pdata.hsml),
                    entropy=pad(self.sph.entropy),
                    dtent=pad(self.sph.dt_entropy),
                    density=pad(self.sph.density),
                    egywt=pad(self.sph.egy_wt_density),
                    divv=pad(self.sph.div_vel),
                    curlv=pad(self.sph.curl_vel),
                    dhsml_egy=pad(self.sph.dhsml_egy_factor),
                    dt_hsml=pad(self.pdata.dt_hsml),
                    hydro_acc=pad(self.sph.hydro_accel),
                    maxsig=pad(self.sph.max_signal_vel))
            if with_cooling or with_sfr:
                if not hasattr(self, "_cooling"):
                    self._init_cooling()
                state.update(ne=pad(self.sph.ne),
                             metallicity=pad(self.sph.metallicity))
            if with_qso:
                state.update(he_iii_ionized=pad(
                    self.sph.he_iii_ionized.astype(jnp.uint8)))
            if with_excursion:
                state.update(local_j21=pad(self.sph.local_j21),
                             zreion=pad(self.sph.zreion, -1.0))
            if with_sfr:
                if not hasattr(self, "_sfr"):
                    self._init_sfr()
                from .physics.stars import StarData
                if self.stars is None:
                    self.stars = StarData.zeros(self.pdata.capacity)
                state.update(
                    sfr=pad(self.sph.sfr),
                    delay_time=pad(self.sph.delay_time),
                    formation_time=pad(self.stars.formation_time),
                    birth_density=pad(self.stars.birth_density),
                    birth_metallicity=pad(self.stars.metallicity))
            if with_metals:
                # one (N,9) species column serves both sides: gas rows
                # hold the evolving gas metals, star rows the star's
                # birth composition (metal_return.c NMETALS layout)
                is_star0 = self.pdata.valid & (self.pdata.ptype == 4)
                metals0 = jnp.where(is_star0[:, None], self.stars.metals,
                                    self.sph.metals)
                npart0 = float(np.asarray(self.pdata.num_valid))
                msep = self.cfg.boxsize / max(1.0, np.cbrt(npart0))
                msep32 = jnp.float32(2.0 * msep)  # keep the column f32:
                # a numpy-f64 scalar here promotes state['mass'] after the
                # first return step and poisons the walk's packed rows
                sh0 = getattr(self, "_star_hsml", None)
                if sh0 is None:
                    sh0 = jnp.where(self.pdata.hsml > 0, self.pdata.hsml,
                                    msep32)
                sh0 = jnp.where(is_star0, jnp.where(sh0 > 0, sh0, msep32),
                                jnp.float32(0.0)).astype(jnp.float32)
                state.update(
                    metals=pad(metals0),
                    star_hsml=pad(sh0),
                    total_mass_returned=pad(
                        self.stars.total_mass_returned),
                    last_enrichment_myr=pad(
                        self.stars.last_enrichment_myr))
            if with_bh:
                self._ensure_bh()
                state.update(
                    bh_mass=pad(self.bh.bh_mass),
                    bh_mdot=pad(self.bh.mdot),
                    bh_density=pad(self.bh.bh_density),
                    bh_mtrack=pad(self.bh.mtrack),
                    bh_progs=pad(self.bh.count_progs),
                    bh_ke=pad(self.bh.kinetic_energy),
                    bh_vdisp=pad(self.bh.vdisp))
            return shard_particles(state, device_mesh, axis="x")

        state = make_state()

        def excursion_uv(uv, st, scal):
            """During the excursion epoch the cooling UVB comes from
            the per-row J21 grid readout (the _excursion_uvbg analog,
            traced so epoch entry/exit does not recompile)."""
            if not with_excursion:
                return uv
            from .physics.uvbg import j21_to_rates
            from .physics.cooling import UVBG
            g, e = j21_to_rates(st["local_j21"], self.cfg.alpha_uv)
            z = scal["redshift"]
            on = ((z >= self.cfg.excursion_set_zstop)
                  & (z <= self.cfg.excursion_set_zstart))

            def blend(a, b):
                return jnp.where(on, a, jnp.broadcast_to(
                    jnp.asarray(b, a.dtype), a.shape))

            return UVBG(gJH0=blend(g[0], uv.gJH0),
                        gJHe0=blend(g[1], uv.gJHe0),
                        gJHep=blend(g[2], uv.gJHep),
                        epsH0=blend(e[0], uv.epsH0),
                        epsHe0=blend(e[1], uv.epsHe0),
                        epsHep=blend(e[2], uv.epsHep),
                        self_shield_dens=uv.self_shield_dens)

        cooling_fn = None
        if with_cooling:
            from .physics.cooling import do_cooling, UVBG, local_uvbg
            from .utils.constants import GAMMA_MINUS1
            cr = self._cooling
            cu = self._cooling_units
            uvf = getattr(self, "_uvf", None)
            min_egy = float(self._min_egy_spec)

            def cooling_fn(st, gas, scal):
                entropy, density = st["entropy"], st["density"]
                ne, met = st["ne"], st["metallicity"]
                atime = scal["atime"]
                redshift = scal["redshift"]
                a3 = atime ** 3
                rho_phys = jnp.maximum(density, 1e-30) / a3
                u = entropy / GAMMA_MINUS1 * rho_phys ** GAMMA_MINUS1
                uv = UVBG(*[scal["uvbg"][i] for i in range(7)])
                if uvf is not None:
                    uv = local_uvbg(uv, uvf.zreion(st["ipos"]),
                                    redshift)
                uv = excursion_uv(uv, st, scal)
                # dloga_full is a scalar (global-dt) or a per-row
                # array (hierarchical per-bin intervals)
                dt = jnp.broadcast_to(
                    jnp.asarray(scal["dloga_full"] / scal["hubble"],
                                u.dtype), u.shape)
                u_new, ne2 = do_cooling(cr, redshift, u, rho_phys, dt,
                                        uv, ne, met, min_egy, cu)
                ent_new = GAMMA_MINUS1 * u_new \
                    / rho_phys ** GAMMA_MINUS1
                return ent_new, ne2

        sfr_fn = None
        wind_fn = None
        if with_sfr:
            from .physics import sfr as sfrmod
            from .physics.cooling import do_cooling, UVBG, local_uvbg
            sfr_par = self._sfr
            cr = self._cooling
            cu = self._cooling_units
            uvf = getattr(self, "_uvf", None)
            min_egy = float(self._min_egy_spec)

            def sfr_fn(st, gas, scal):
                redshift = scal["redshift"]
                uv = UVBG(*[scal["uvbg"][i] for i in range(7)])
                if uvf is not None:
                    uv = local_uvbg(uv, uvf.zreion(st["ipos"]),
                                    redshift)
                uv = excursion_uv(uv, st, scal)

                def cool_fn(u, rho_phys, dt, ne, Z):
                    return do_cooling(cr, redshift, u, rho_phys, dt,
                                      uv, ne, Z, min_egy, cu)

                return sfrmod.cooling_and_starformation(
                    sfr_par, cr, cu, scal["rng"],
                    density=st["density"], entropy=st["entropy"],
                    ne=st["ne"], metallicity=st["metallicity"],
                    delay_time=st["delay_time"], mass=st["mass"],
                    pid=st["pid"], valid_gas=gas,
                    redshift=redshift, atime=scal["atime"],
                    hubble=scal["hubble"], dloga=scal["dloga_full"],
                    uvbg=uv, do_cooling_fn=cool_fn,
                    min_egy_spec=min_egy)

            if wind_sharded:
                wp = self._winds

                def wind_fn(st, out, scal):
                    wkey = jax.random.fold_in(scal["rng"], 77)
                    zero_vdisp = jnp.zeros_like(st["mass"])
                    vel_new, ent_new, delay_new, _ = \
                        windmod.winds_subgrid(
                            wp, wkey, sm=out["sm"], mass=st["mass"],
                            pid=st["pid"], vdisp=zero_vdisp,
                            vel=st["vel"], entropy=st["entropy"],
                            density=st["density"],
                            delay_time=st["delay_time"],
                            eligible=out["on_eeqos"],
                            atime=scal["atime"])
                    delay_new = windmod.winds_decouple_update(
                        wp, delay_new, st["density"],
                        scal["dloga_full"] / scal["hubble"],
                        scal["atime"])
                    return vel_new, ent_new, delay_new

        rcut_box = self.cfg.rcut * self.cfg.asmth / self.cfg.nmesh
        hist_bits = 12
        if rebalance:
            # count-balanced initial boundaries from the host mirror
            # (domain_decompose before the first step, domain.c:106) —
            # a clustered restart would overflow geometric slabs
            x_host = np.asarray(self.pdata.ipos[:, 0])
            v_host = np.asarray(self.pdata.valid)
            hist0 = np.bincount(
                (x_host[v_host] >> np.uint32(32 - hist_bits)).astype(
                    np.int64), minlength=1 << hist_bits)
            bounds_np = balanced_boundaries(hist0, S)
        else:
            bounds_np = (np.arange(S, dtype=np.uint64)
                         * (2 ** 32 // S)).astype(np.uint32)
        hmax_box = (float(jnp.max(jnp.where(
            self.gas_mask, self.pdata.hsml, 0.0))) / self.cfg.boxsize
            if with_gas else 0.0)
        bp = {"ghost_cap": max(256, n_local // 2),
              "bucket_cap": max(256, n_local // 4),
              "ll": 256, "src": 2048, "strip_margin": 1.6,
              "tree_boost": 1, "pm_extra": 0}

        def hops_for(bounds, width):
            b = np.asarray(bounds, np.float64) / 2 ** 32
            widths = np.diff(np.append(b, 1.0))
            K = 1
            for s in range(S):
                left = right = 0.0
                k = 0
                while (left < width or right < width) and k < S // 2:
                    k += 1
                    left += widths[(s - k) % S]
                    right += widths[(s + k) % S]
                K = max(K, k)
            return int(min(max(K, 1), max(S // 2, 1)))

        def pm_hops_for(bounds):
            b = np.asarray(bounds, np.float64) / 2 ** 32
            ivals = np.append(b, 1.0)
            K = 0
            for s in range(S):
                lo_slab = int(ivals[s] * S)
                hi_slab = min(int(np.nextafter(ivals[s + 1], 0) * S),
                              S - 1)
                for g in (lo_slab, hi_slab):
                    d = abs(g - s)
                    K = max(K, min(d, S - d))
            return int(min(K + bp["pm_extra"], S // 2))

        steps_cache = {}

        def get_step(bounds, acap=None):
            w1 = max(rcut_box, hmax_box * bp["strip_margin"])
            hops_g = hops_for(bounds, w1)
            hops_pm = pm_hops_for(bounds)
            n_strips = 2 * hops_g - (1 if (2 * hops_g) % S == 0 else 0)
            n_rows = n_local + n_strips * bp["ghost_cap"]
            key = (hops_g, hops_pm, bp["ghost_cap"], bp["bucket_cap"],
                   bp["ll"], bp["src"], round(bp["strip_margin"], 3),
                   bp["tree_boost"], acap)
            if key not in steps_cache:
                tree_kwargs = tg.force_kwargs(n_rows * bp["tree_boost"])
                # total potential (tree+PM) for BH min-pot jumps; the
                # hierarchical substep carries PM-only potential (the
                # tree runs per closing bin, no full refresh)
                tree_kwargs["with_potential"] = bool(with_potential)
                dpar = self._density_params()
                from .sph.hydra import HydroParams
                hpar = HydroParams(
                    kernel_type=self.cfg.density_kernel_type,
                    art_bulk_visc=self.cfg.art_bulk_visc,
                    density_independent=self.cfg.density_independent_sph,
                    density_contrast_limit=self.cfg
                    .density_contrast_limit)
                caps = {"group": min((8 * n_rows) // dpar.group_max
                                     + 64, n_rows + 64),
                        "nleaf": n_rows // 2 + 64,
                        "sr": n_rows // 8 + n_rows // 2 + 128,
                        "ll": bp["ll"], "src": bp["src"]}
                steps_cache[key] = build_sharded_step(
                    device_mesh, n_local=n_local, with_gas=with_gas,
                    hops_ghost=hops_g, hops_pm=hops_pm,
                    bucket_cap=bp["bucket_cap"],
                    ghost_cap=bp["ghost_cap"],
                    tree_kwargs=tree_kwargs, dpar=dpar, hpar=hpar,
                    caps_d=caps, caps_h=dict(caps),
                    nmesh=self.cfg.nmesh, boxsize=self.cfg.boxsize,
                    gconst=self.CP.GravInternal,
                    asmth=self.cfg.asmth, rcut=self.cfg.rcut,
                    min_egy_spec=float(getattr(self, "_min_egy_spec",
                                               0.0)),
                    strip_margin=bp["strip_margin"],
                    hist_bits=hist_bits, cooling_fn=cooling_fn,
                    sfr_fn=sfr_fn, wind_fn=wind_fn,
                    hierarchical=hierarchical, active_block_cap=acap,
                    with_potential=with_potential,
                    with_nu_tracer=with_nu_tracer,
                    extra_state_keys=(
                        (("metals", "star_hsml",
                          "total_mass_returned",
                          "last_enrichment_myr") if with_metals
                         else ())
                        + (("bh_mass", "bh_mdot", "bh_density",
                            "bh_mtrack", "bh_progs", "bh_ke",
                            "bh_vdisp") if with_bh else ())
                        + (("he_iii_ionized",) if with_qso else ())
                        + (("local_j21", "zreion")
                           if with_excursion else ())))[0]
            return steps_cache[key]

        pm_cache = {}

        def get_pm_fn(bounds):
            """PM-refresh program for hierarchical intervals
            (build_sharded_pm), keyed on the hop count."""
            from .parallel.driver import build_sharded_pm
            hops_pm = pm_hops_for(bounds)
            if hops_pm not in pm_cache:
                pm_cache[hops_pm] = build_sharded_pm(
                    device_mesh, n_local=n_local, hops_pm=hops_pm,
                    nmesh=self.cfg.nmesh, boxsize=self.cfg.boxsize,
                    gconst=self.CP.GravInternal, asmth=self.cfg.asmth,
                    hist_bits=hist_bits, with_gas=with_gas,
                    with_potential=with_potential,
                    with_nu_tracer=with_nu_tracer)
            return pm_cache[hops_pm]

        windnb_cache = {}
        windnb_bp = {"nstar_cap": 64}

        def get_windnb_fn():
            from .parallel.winds import build_sharded_winds
            key = windnb_bp["nstar_cap"]
            if key not in windnb_cache:
                windnb_cache[key] = build_sharded_winds(
                    device_mesh, n_local=n_local, nstar_cap=key,
                    par=self._winds, boxsize=self.cfg.boxsize,
                    mean_sep=self._dm_mean_sep())
            return windnb_cache[key]

        bh_cache = {}
        bh_par = self._bh_params() if with_bh else None
        bh_bp = {"nbh_cap": 32}

        def get_bh_fn():
            from .parallel.blackhole import build_sharded_bh
            key = bh_bp["nbh_cap"]
            if key not in bh_cache:
                rho_crit_b = self.CP.OmegaBaryon * 3 \
                    * self.CP.Hubble ** 2 \
                    / (8 * np.pi * self.CP.GravInternal)
                bh_cache[key] = build_sharded_bh(
                    device_mesh, n_local=n_local, nbh_cap=key,
                    par=bh_par, boxsize=self.cfg.boxsize,
                    gconst=self.CP.GravInternal,
                    unit_time_in_s=self.cfg.units.UnitTime_in_s,
                    hubble_param=self.CP.HubbleParam,
                    unit_velocity=self.cfg.units
                    .UnitVelocity_in_cm_per_s,
                    uu_in_cgs=self.cfg.units
                    .UnitInternalEnergy_in_cgs,
                    rho_crit_baryon=rho_crit_b,
                    kernel_type=self.cfg.density_kernel_type,
                    reposition=with_potential)
            return bh_cache[key]

        metal_cache = {}

        def get_metal_fn():
            from .parallel.metals import build_sharded_metal_return
            from .physics import metal_return as mrmod
            if getattr(self, "_age_table", None) is None:
                self._age_table = mrmod.AgeTable(
                    self.CP.hubble_function, self.cfg.units,
                    self.CP.HubbleParam)
                self._mr_params = mrmod.MetalReturnParams(
                    sn1a_n0=self.cfg.metals_sn1a_n0,
                    sph_weighting=self.cfg.metals_sph_weighting,
                    max_ngb_deviation=self.cfg
                    .metals_max_ngb_deviation)
            # strips carry 2x the max star kernel (parallel/metals.py)
            w1 = max(rcut_box, 2.0 * hmax_box * bp["strip_margin"])
            hops_g = hops_for(bounds_np, w1)
            key = (hops_g, bp["ghost_cap"],
                   round(bp["strip_margin"], 3))
            if key not in metal_cache:
                metal_cache[key] = build_sharded_metal_return(
                    device_mesh, n_local=n_local,
                    ghost_cap=bp["ghost_cap"], hops=hops_g,
                    age_table=self._age_table,
                    params=self._mr_params,
                    boxsize=self.cfg.boxsize,
                    margin=bp["strip_margin"])
            return metal_cache[key]

        def dloga_from_stats(stats, atime, pm_only=False):
            """The host timestep policy from psum'd statistics
            (get_long_range_timestep_dloga + accel + Courant,
            timestep.c:1063-1300).  pm_only=True keeps only the max
            RMS displacement criterion — the hierarchical loop's PM
            interval; accel/Courant then live in per-particle bins."""
            par = self.cfg.timestep
            hubble = self.CP.hubble_function(atime)
            dloga = par.MaxSizeTimestep
            asmth_len = (self.cfg.asmth * self.cfg.boxsize
                         / self.cfg.nmesh)
            vsum = np.asarray(stats["vsum"], np.float64)
            cnt = np.asarray(stats["count"], np.float64)
            mmin = np.asarray(stats["min_mass"], np.float64)
            for t in range(6):
                if cnt[t] == 0 or self._omega_per_type is None:
                    continue
                omega = self._omega_per_type[t]
                if omega <= 0:
                    continue
                dmean = (mmin[t] / (omega * self.CP.RhoCrit)) ** (1 / 3)
                vrms = np.sqrt(vsum[t] / cnt[t])
                if vrms <= 0:
                    continue
                d1 = (par.MaxRMSDisplacementFac * hubble * atime
                      * atime * min(asmth_len, dmean) / vrms)
                if t != self.cfg.fast_particle_type:
                    dloga = min(dloga, d1)
            if pm_only:
                return max(dloga, par.MinSizeTimestep)
            amax = float(stats["max_acc"])
            if amax > 0 and self.cfg.tree_grav_on:
                eta_eps = (2 * par.ErrTolIntAccuracy * atime
                           * tg.softening)
                dloga = min(dloga, float(
                    np.sqrt(eta_eps / (amax / atime ** 2)) * hubble))
            if with_gas:
                fac3 = atime ** (3 * (1 - GAMMA) / 2.0)
                hos = float(stats["min_h_over_sig"])
                if np.isfinite(hos):
                    dloga = min(dloga, 2 * par.CourantFac * atime
                                * hos / fac3 * hubble)
                hod = float(stats["min_h_over_dth"])
                if np.isfinite(hod):
                    dloga = min(dloga, par.CourantFac * atime * atime
                                * hod * hubble)
            return max(dloga, par.MinSizeTimestep)

        def mirror_to_host():
            """Compact valid rows into the Simulation arrays (outputs
            and final state only — not per step).  Multi-host: every
            process allgathers the full state (fetch_global), so the
            Simulation mirror — and any snapshot written from it — is
            identical on every rank."""
            from .parallel.mesh import fetch_global
            v = fetch_global(state["valid"])
            n_valid_tot = int(v.sum())
            cap_now = int(self.pdata.capacity)
            m = max(cap_now,
                    int(np.ceil(n_valid_tot / 256.0)) * 256)
            if m > cap_now:
                # star spawning grew the population past the host
                # mirror capacity: grow it (PartAllocFactor headroom
                # realized, partmanager.c:88)
                grow = m - cap_now

                def padf(a):
                    return jnp.concatenate(
                        [a, jnp.zeros((grow,) + a.shape[1:],
                                      a.dtype)], axis=0)

                self.pdata = jax.tree_util.tree_map(padf, self.pdata)
                if self.sph is not None:
                    self.sph = jax.tree_util.tree_map(padf, self.sph)
                if self.stars is not None:
                    self.stars = jax.tree_util.tree_map(padf,
                                                        self.stars)
                if getattr(self, "bh", None) is not None:
                    self.bh = jax.tree_util.tree_map(padf, self.bh)
            order = np.argsort(~v, kind="stable")[:m]

            def take(key):
                return jnp.asarray(fetch_global(state[key])[order])

            upd = dict(
                ipos=take("ipos"), vel=take("vel"),
                mass=take("mass"), valid=take("valid"),
                pid=take("pid"), ptype=take("ptype"),
                grav_accel=take("grav_acc"))
            if hierarchical:
                upd["grav_pm"] = take("pm_acc")
                upd["timebin"] = take("bins")
            else:
                upd["grav_pm"] = jnp.zeros_like(upd["grav_accel"])
            if with_potential:
                # PM part only: write_snapshot re-adds the tree term
                # at output like the single-device loop
                upd["potential"] = take("pm_pot")
            if with_gas:
                upd["hsml"] = take("hsml")
                upd["dt_hsml"] = take("dt_hsml")
            self.pdata = self.pdata.replace(**upd)
            if with_gas:
                upd_sph = dict(
                    entropy=take("entropy"),
                    dt_entropy=take("dtent"),
                    density=take("density"),
                    egy_wt_density=take("egywt"),
                    div_vel=take("divv"),
                    curl_vel=take("curlv"),
                    dhsml_egy_factor=take("dhsml_egy"),
                    hydro_accel=take("hydro_acc"),
                    max_signal_vel=take("maxsig"))
                if with_cooling or with_sfr:
                    upd_sph["ne"] = take("ne")
                    upd_sph["metallicity"] = take("metallicity")
                if with_sfr:
                    upd_sph["sfr"] = take("sfr")
                    upd_sph["delay_time"] = take("delay_time")
                if with_qso:
                    upd_sph["he_iii_ionized"] = take("he_iii_ionized")
                if with_excursion:
                    upd_sph["local_j21"] = take("local_j21")
                    upd_sph["zreion"] = take("zreion")
                self.sph = self.sph.replace(**upd_sph)
                if with_sfr:
                    self.stars = self.stars.replace(
                        formation_time=take("formation_time"),
                        birth_density=take("birth_density"),
                        metallicity=take("birth_metallicity"))
                if with_metals:
                    met = take("metals")
                    is_star_m = (take("ptype") == 4) & take("valid")
                    self.sph = self.sph.replace(
                        metals=jnp.where(is_star_m[:, None],
                                         self.sph.metals, met))
                    self.stars = self.stars.replace(
                        metals=jnp.where(is_star_m[:, None], met,
                                         self.stars.metals),
                        total_mass_returned=take(
                            "total_mass_returned"),
                        last_enrichment_myr=take(
                            "last_enrichment_myr"))
                    self._star_hsml = take("star_hsml")
            if with_bh:
                from .physics.blackhole import BhData
                if getattr(self, "bh", None) is None:
                    self.bh = BhData.zeros(self.pdata.capacity)
                self.bh = self.bh.replace(
                    bh_mass=take("bh_mass"), mdot=take("bh_mdot"),
                    bh_density=take("bh_density"),
                    mtrack=take("bh_mtrack"),
                    count_progs=take("bh_progs"),
                    kinetic_energy=take("bh_ke"),
                    vdisp=take("bh_vdisp"))

        loga = self.timeline.loga_from_ti

        def apply_wind_neighbors(t0, t1, a1, key):
            # vs08/ofjt10: kick gas neighbors of the stars formed
            # inside [t0, t1] (winds.c:299-567 via parallel/winds.py)
            nonlocal state
            a0w = float(np.exp(loga(t0)))
            dloga_f = float(loga(t1) - loga(t0))
            hub1 = float(self.CP.hubble_function(a1))
            scal_w = {
                "atime": jnp.float32(a1),
                "dtime": jnp.float32(dloga_f / hub1),
                "aform_min": jnp.float32(a0w * (1.0 + 1e-7)),
                "rng_wind": jax.random.fold_in(key, 77),
            }
            w_keys = ("ipos", "vel", "mass", "valid", "pid",
                      "ptype", "hsml", "entropy", "density",
                      "delay_time", "gas_mask", "formation_time")
            for w_try in range(6):
                sub = {k: state[k] for k in w_keys}
                w_upd, w_stats = get_windnb_fn()(sub, scal_w)
                if not int(w_stats["ovf"]):
                    state.update(w_upd)
                    return
                windnb_bp["nstar_cap"] = min(
                    2 * windnb_bp["nstar_cap"], n_local)
            from .utils.log import endrun
            endrun(5, "sharded winds: star-slot retries exhausted")

        def apply_bh_interval(t0, t1, a1, n_valid_f):
            # Strang-split BH accretion/swallowing/feedback/mergers on
            # the sharded state (blackhole.c:216-360 via
            # parallel/blackhole.py)
            nonlocal state
            dloga_f = float(loga(t1) - loga(t0))
            hub1 = float(self.CP.hubble_function(a1))
            soft = self.cfg.gravity_softening * self._dm_mean_sep()
            scal_bh = {
                "atime": jnp.float32(a1),
                "dtime": jnp.float32(dloga_f / hub1),
                "rng_bh": jax.random.PRNGKey(
                    (self.cfg.random_seed + self.ti_current + 5)
                    % (2 ** 31)),
                "bh_soft": jnp.float32(soft),
            }
            bh_keys = ("ipos", "vel", "mass", "valid", "pid",
                       "ptype", "hsml", "entropy", "density",
                       "gas_mask", "grav_acc", "bh_mass",
                       "bh_mdot", "bh_density", "bh_mtrack",
                       "bh_progs", "bh_ke", "bh_vdisp") \
                + (("potential",) if with_potential else ())
            for b_try in range(6):
                sub = {k: state[k] for k in bh_keys}
                if hierarchical:
                    # the BH merger boundness check wants the FULL
                    # acceleration; grav_acc is tree-only here
                    sub["grav_acc"] = state["grav_acc"] \
                        + state["pm_acc"]
                b_upd, b_stats = get_bh_fn()(sub, scal_bh)
                if not int(b_stats["ovf"]):
                    if int(b_stats["n_bh"]) > 0:
                        state.update(b_upd)
                    return
                bh_bp["nbh_cap"] = min(2 * bh_bp["nbh_cap"],
                                       n_local)
            from .utils.log import endrun
            endrun(4, "sharded BH: slot-capacity retries exhausted")

        def apply_metals_interval(t0, t1, bounds_dev):
            # Strang-split stellar return (metal_return.c:423 via
            # parallel/metals.py)
            nonlocal state
            a0m = float(np.exp(loga(t0)))
            a1m = float(np.exp(loga(t1)))
            sub_keys = ("ipos", "mass", "hsml", "density",
                        "metals", "birth_metallicity",
                        "formation_time", "total_mass_returned",
                        "last_enrichment_myr", "star_hsml")
            for m_try in range(4):
                sub = {k: state[k] for k in sub_keys}
                sub["gas_mask"] = state["gas_mask"] \
                    & state["valid"]
                sub["star_mask"] = state["valid"] \
                    & (state["ptype"] == 4)
                m_upd, m_fl = get_metal_fn()(
                    sub, bounds_dev, jnp.float32(a0m),
                    jnp.float32(a1m))
                if not (int(m_fl["ghost"])
                        or int(m_fl["strip"])):
                    state.update(
                        {k: m_upd[k] for k in
                         ("mass", "metals", "star_hsml",
                          "total_mass_returned",
                          "last_enrichment_myr")})
                    # keep the scalar metallicity in sync with
                    # the species column (sfr_eff.c convention:
                    # Z = sum of species beyond H/He)
                    state["metallicity"] = jnp.where(
                        sub["gas_mask"],
                        jnp.sum(m_upd["metals"][:, 2:], axis=1),
                        state["metallicity"])
                    return
                if int(m_fl["ghost"]):
                    bp["ghost_cap"] = min(2 * bp["ghost_cap"],
                                          n_local)
                if int(m_fl["strip"]):
                    bp["strip_margin"] *= 1.5
            from .utils.log import endrun
            endrun(3, "sharded metal return: retries exhausted")

        def write_sfr_line(stats):
            # sfr.txt from the psum'd totals, the 8-column reference
            # layout (sfr_eff.c:381): a, total_sm, totsfrrate,
            # rate_in_msunperyear = total_sm*n_sf/sum_dtime * UnitSfr,
            # mass actually formed, mean dt, n star-forming, n new
            if not (with_sfr and jax.process_index() == 0):
                return
            sm_tot = float(stats['sm_sum'])
            dt_tot = float(stats['sf_dtime_sum'])
            n_sf = int(stats['sf_count'])
            rate_msun = (sm_tot * n_sf / dt_tot
                         * self._sfr.UnitSfr_in_solar_per_year
                         if dt_tot > 0 else 0.0)
            mean_dt = dt_tot / n_sf if n_sf > 0 else 0.0
            with open(os.path.join(self.cfg.output_dir,
                                   "sfr.txt"), "a") as fh:
                fh.write(f"{self.atime:.12g} {sm_tot:g} "
                         f"{float(stats['sfr_sum']):g} "
                         f"{rate_msun:g} "
                         f"{float(stats['mass_formed_sum']):g} "
                         f"{mean_dt:g} {n_sf} "
                         f"{int(stats['n_spawned'])}\n")

        io_cache = {}
        fof_cache = {}
        seed_cache = {}

        def apply_lightcone(t0, t1, a1):
            """Horizon-crossing output from the sharded state
            (lightcone_compute, lightcone.c:176-221 at scale): each
            shard detects its OWN crossers on device (the reference's
            rank-local crossing test) and compacts them into a small
            fixed-cap buffer; every process appends only its
            addressable shards' rows to its own stripe file — no
            fetch_global, host peak memory O(cap)/shard."""
            if not self.cfg.lightcone_on:
                return
            from .physics.lightcone import Lightcone, \
                build_sharded_cross
            if getattr(self, "_lightcone", None) is None:
                self._lightcone = Lightcone(
                    self.CP, self.time_ic,
                    self.cfg.units.UnitVelocity_in_cm_per_s,
                    self.cfg.output_dir, self.cfg.boxsize,
                    task=jax.process_index())
            lc = self._lightcone
            lc.set_time(a1)
            if lc.sample_fraction <= 0:
                return
            reps = lc.replicas()
            if not reps:
                return
            self.walltime.start("Lightcone")
            sub = {k: state[k] for k in
                   ("ipos", "vel", "valid", "ptype", "pid")}
            scal0 = {
                "off": jnp.asarray(self._ipos_offset),
                "box": jnp.float32(self.cfg.boxsize),
                "ddrift": jnp.float32(self.tf.drift(t0, t1)),
                "hd_prev2": jnp.float32(lc.hd_prev2),
                "hd2": jnp.float32(lc.hd2),
                "hd_prev": jnp.float32(lc.hd_prev),
                "hd": jnp.float32(lc.hd),
                "samplefrac": jnp.float32(lc.sample_fraction),
            }
            cap = bp.setdefault("lc_cap", max(256, n_local // 64))
            for rep in reps:
                scal0["rep"] = jnp.asarray(rep, jnp.float32)
                while True:
                    key = ("lc", cap)
                    if key not in io_cache:
                        io_cache[key] = build_sharded_cross(
                            device_mesh, cap=cap)
                    rows, ok, ovf = io_cache[key](sub, scal0)
                    if not int(ovf):
                        break
                    cap = min(2 * cap, n_local)
                    bp["lc_cap"] = cap
                mine = []
                for sh_r, sh_o in zip(rows.addressable_shards,
                                      ok.addressable_shards):
                    o = np.asarray(sh_o.data)
                    if o.any():
                        mine.append(np.asarray(sh_r.data)[o])
                if mine:
                    lc.append_rows(np.concatenate(mine))
            self.walltime.stop("Lightcone")

        def sharded_cat():
            """Distributed FOF catalog from the sharded state
            (fof_fof at scale); returns (cat, sorted_labels, extras,
            labels) — labels is the per-row group label P('x')."""
            from .parallel.fof import sharded_fof
            from .physics.fof import FOFParams
            npart = int(jnp.sum((state["valid"]
                                 & (state["ptype"] == 1)).astype(
                jnp.int32)))
            mean_sep = self.cfg.boxsize / max(1.0, np.cbrt(npart))
            params = FOFParams(
                linking_length=self.cfg.fof_linking_length,
                min_group_length=self.cfg.fof_min_group_length,
                primary_link_types=self.cfg.fof_primary_link_types,
                secondary_link_types=(
                    self.cfg.fof_secondary_link_types))
            stf = {k: state[k] for k in ("ipos", "vel", "mass",
                                         "ptype", "valid")}
            if with_sfr:
                stf["sfr"] = state["sfr"]
            if with_bh:
                stf["density"] = state["density"]
                stf["gas_mask"] = state["gas_mask"] & state["valid"]
            self.walltime.start("FOF")
            out = sharded_fof(
                device_mesh, stf, bounds_np,
                boxsize=self.cfg.boxsize, mean_sep=mean_sep,
                n_local=n_local, params=params, cache=fof_cache)
            self.walltime.stop("FOF")
            return out

        def sharded_group_index(cat, sorted_labels, labels):
            """Per-row dense group index (-1 ungrouped) matching the
            catalog row order (the group_index of run_fof at scale)."""
            from .parallel.fof import build_group_index
            if "gi" not in fof_cache:
                fof_cache["gi"] = build_group_index(
                    device_mesh, n_local=n_local)
            srt = np.argsort(sorted_labels)
            return fof_cache["gi"](
                labels,
                jnp.asarray(sorted_labels[srt].astype(np.int32)),
                jnp.asarray(np.arange(len(sorted_labels))[srt]
                            .astype(np.int32)))

        def apply_qso(t0, t1, a1):
            """Helium reionization on the sharded state
            (cooling_qso_lightup.c at scale): lmfp heating is
            elementwise on the sharded columns; QSO bubbles are placed
            around halos of the DISTRIBUTED catalog, each bubble one
            tiny elementwise kernel + global count (XLA partitions
            both — no host mirror)."""
            nonlocal state
            from .physics import qso_lightup as qmod
            if getattr(self, "_heii_hist", None) is None:
                if not self.cfg.reion_hist_file:
                    raise ValueError("QSOLightupOn needs "
                                     "ReionHistFile")
                self._heii_hist = qmod.load_heii_reion_hist(
                    self.cfg.reion_hist_file)
                self._qso_params = qmod.QSOParams(
                    min_mass=self.cfg.qso_min_mass,
                    max_mass=self.cfg.qso_max_mass,
                    mean_bubble=self.cfg.qso_mean_bubble,
                    var_bubble=self.cfg.qso_var_bubble,
                    finish_frac=self.cfg.qso_finish_frac,
                    heiii_start=self._heii_hist.zstart)
            hist = self._heii_hist
            par = self._qso_params.with_units(
                self.cfg.units.UnitInternalEnergy_in_cgs)
            z = 1.0 / a1 - 1.0
            if z > par.heiii_start or a1 > hist.aend:
                return
            self.walltime.start("HeIII")
            dloga_f = float(loga(t1) - loga(t0))
            gas = state["gas_mask"] & state["valid"]
            ionized = state["he_iii_ionized"] > 0
            rate = qmod.lmfp_heating(hist, par, a1)
            if rate > 0 and dloga_f > 0:
                hub1 = float(self.CP.hubble_function(a1))
                dt_s = dloga_f / hub1 * self.cfg.units.UnitTime_in_s \
                    / self.CP.HubbleParam
                state["entropy"] = qmod.lmfp_heat_entropy(
                    state["entropy"], state["density"],
                    gas & ~ionized, rate, dt_s, a1, self.cfg.units,
                    self.CP.HubbleParam)
            cat, _, _, _ = sharded_cat()
            ion2, ent2, nbub = qmod.place_bubbles(
                state["ipos"], gas, ionized, state["density"],
                state["entropy"], cat, hist, par, a1,
                self.cfg.boxsize, self.cfg.random_seed,
                self.cfg.output_dir,
                write=(jax.process_index() == 0))
            state["he_iii_ionized"] = ion2.astype(jnp.uint8)
            state["entropy"] = ent2.astype(jnp.float32)
            self.walltime.stop("HeIII")

        def apply_excursion(a1):
            """Excursion-set UVBG update at the UVBGTimestep cadence
            on the sharded state (calculate_uvbg, uvbg.c:506-594 at
            scale): halo masses come from the distributed catalog,
            the star/SFR deposits and the J21 readout run on the
            sharded rows, and only the small uvbg_dim^3 grid
            filtering is replicated."""
            nonlocal state
            from .physics import uvbg as uvmod
            z = 1.0 / a1 - 1.0
            if not (self.cfg.excursion_set_zstop <= z
                    <= self.cfg.excursion_set_zstart):
                return
            if getattr(self, "_uvbg_params", None) is None:
                self._uvbg_params = uvmod.UVBGParams(
                    uvbg_dim=self.cfg.uvbg_dim,
                    r_bubble_max=self.cfg.reion_r_bubble_max,
                    r_bubble_min=self.cfg.reion_r_bubble_min,
                    delta_r_factor=self.cfg.reion_delta_r_factor,
                    filter_type=self.cfg.reion_filter_type,
                    rtom_filter_type=self.cfg.rtom_filter_type,
                    nion_phot_per_bary=(
                        self.cfg.reion_nion_phot_per_bary),
                    alpha_uv=self.cfg.alpha_uv,
                    escape_frac_norm=self.cfg.escape_fraction_norm,
                    escape_frac_scaling=(
                        self.cfg.escape_fraction_scaling),
                    zstart=self.cfg.excursion_set_zstart,
                    zstop=self.cfg.excursion_set_zstop,
                    timestep_myr=self.cfg.uvbg_timestep_myr,
                    use_particle_sfr=(
                        self.cfg.reion_use_particle_sfr),
                    sfr_timescale=self.cfg.reion_sfr_timescale)
                self._uvbg_last_myr = -1e30
                if getattr(self, "_age_table", None) is None:
                    from .physics.metal_return import AgeTable
                    self._age_table = AgeTable(
                        self.CP.hubble_function, self.cfg.units,
                        self.CP.HubbleParam)
            t_myr = float(self._age_table(a1))
            if t_myr - self._uvbg_last_myr \
                    < self.cfg.uvbg_timestep_myr:
                return
            self._uvbg_last_myr = t_myr
            self.walltime.start("UVBG")
            cat, sorted_labels, extras, labels = sharded_cat()
            if cat["ngroups"] > 0:
                gi = sharded_group_index(cat, sorted_labels, labels)
                masses_dev = jnp.asarray(
                    np.asarray(cat["masses"]).astype(np.float32))
                halo_mass = jnp.where(
                    gi >= 0, masses_dev[jnp.clip(gi, 0)], 0.0)
            else:
                halo_mass = jnp.zeros_like(state["mass"])
            fesc = uvmod.escape_fractions(
                halo_mass, self._uvbg_params.escape_frac_norm,
                self._uvbg_params.escape_frac_scaling,
                self.cfg.units.UnitMass_in_g, self.CP.HubbleParam)
            gas = state["gas_mask"] & state["valid"]
            is_star = state["valid"] & (state["ptype"] == 4)
            sfr_col = state.get("sfr",
                                jnp.zeros_like(state["mass"]))
            out = uvmod.calculate_uvbg(
                state["ipos"], state["mass"], state["valid"], gas,
                is_star, sfr_col, fesc, self._uvbg_params, self.CP,
                self.cfg.units, self.cfg.boxsize, a1)
            self._uvbg_grids = out
            j21_p = uvmod.readout_j21_max(out["j21"], state["ipos"])
            newly = gas & (j21_p > state["local_j21"]) \
                & (state["zreion"] < 0)
            from jax.sharding import NamedSharding, PartitionSpec
            row_shd = NamedSharding(device_mesh, PartitionSpec("x"))

            def put(a):
                # eager-mode mixes of replicated grid readouts and
                # P('x') rows can leave the result replicated: pin the
                # columns back to the mesh rows before the next step
                return jax.device_put(a, row_shd)

            state["local_j21"] = put(jnp.where(
                gas, jnp.maximum(state["local_j21"], j21_p),
                state["local_j21"]))
            state["zreion"] = put(jnp.where(newly, jnp.float32(z),
                                            state["zreion"]))
            self.walltime.stop("UVBG")
            if verbose and jax.process_index() == 0:
                from .utils.log import message
                message(f"[UVBG] z={z:.2f} vol xHI="
                        f"{out['volume_weighted_global_xHI']:.4f} "
                        "mass xHI="
                        f"{out['mass_weighted_global_xHI']:.4f}")

        def maybe_planes():
            """Lensing potential planes from the sharded rows
            (write_plane, plane.c:572 at scale): the NGP deposit is
            elementwise+scatter over the sharded ipos; rank 0 writes
            the FITS files."""
            if not self.cfg.plane_output_list:
                return
            from .physics.plane import write_planes
            self._ensure_plane_params()
            atime = self.atime
            off = jnp.asarray(self._ipos_offset)
            for i, t in enumerate(self._plane_times):
                if i in self._planes_done or t > atime + 1e-9:
                    continue
                self.walltime.start("Planes")
                ip = state["ipos"] - off[None, :]   # u32 wrap: exact
                w = jnp.where(state["valid"], 1.0, 0.0)
                n_tot = int(jnp.sum(
                    state["valid"].astype(jnp.int32)))
                write_planes(self, i, self._plane_params, ipos=ip,
                             weights=w, n_tot=n_tot,
                             write=(jax.process_index() == 0))
                self.walltime.stop("Planes")
                self._planes_done.add(i)

        def do_sharded_fof():
            """Distributed FOF + PIG output + BH seeding on the
            sharded state — no host mirror (fof.c:158-330 + fof_seed
            at scale)."""
            nonlocal state
            from .parallel.fof import build_seed_convert
            from .parallel.snapshot import write_pig_sharded
            cat, sorted_labels, extras, labels = sharded_cat()
            pig = write_pig_sharded(
                self, device_mesh, state, n_local, labels,
                sorted_labels, cat, cache=io_cache,
                with_gas=with_gas, with_sfr=with_sfr,
                with_metals=with_metals, with_bh=with_bh)
            if pig is None:
                # one group outgrew a shard's row capacity in the
                # member sort: fall back to the host writer
                mirror_to_host()
                cat_h = self.run_fof(save=(jax.process_index() == 0))
                if self.cfg.black_hole_on:
                    if self.seed_black_holes_from_fof(cat_h):
                        state = make_state()
                return
            if not (self.cfg.black_hole_on and cat["ngroups"]):
                return
            # seeding (fof_seed): qualifying halos without a BH
            # convert their densest gas member
            par_bh = self._bh_params()
            eligible = ((cat["masses"] > par_bh.min_fof_mass_for_seed)
                        & (cat["mass_by_type"][:, 4]
                           > par_bh.min_mstar_for_seed)
                        & ~extras["has_bh"]
                        & (extras["seed_gid"] < 2 ** 31 - 1))
            seeds = np.sort(extras["seed_gid"][eligible]
                            .astype(np.int32))
            if not len(seeds):
                return
            cap = max(64, 1 << int(len(seeds) - 1).bit_length())
            pad_s = np.full(cap, 2 ** 31 - 1, np.int32)
            pad_s[:len(seeds)] = seeds
            if "fn" not in seed_cache:
                seed_cache["fn"] = build_seed_convert(
                    device_mesh, n_local=n_local)
            sub = {k: state[k] for k in
                   ("ptype", "gas_mask", "bh_mass", "bh_mtrack",
                    "mass", "valid")}
            sub["formation_time"] = state.get(
                "formation_time",
                jnp.zeros_like(state["mass"]))
            upd, nseeded = seed_cache["fn"](
                sub, jnp.asarray(pad_s),
                {"seed_mass": jnp.float32(par_bh.seed_mass),
                 "seed_dyn_mass": jnp.float32(
                     par_bh.seed_bh_dyn_mass),
                 "atime": jnp.float32(self.atime)})
            if "formation_time" not in state:
                upd.pop("formation_time")
            state.update(upd)
            if verbose and int(nseeded):
                from .utils.log import message
                message(f"[sharded fof] seeded {int(nseeded)} "
                        "black holes")

        def sync_outputs():
            # snapshot / FOF / BH seeding at sync points
            # (run.c:605-727) — collective striped IO and distributed
            # FOF on the sharded state; no host mirror
            # (petaio.c:33-68, fof.c:158-330 at scale)
            nonlocal state
            sp = self.timeline.find_current_sync_point(
                self.ti_current)
            if sp is None or not sp.write_snapshot:
                return
            from .parallel.snapshot import write_snapshot_sharded
            write_snapshot_sharded(
                self, device_mesh, state, n_local, cache=io_cache,
                with_gas=with_gas, with_sfr=with_sfr,
                with_metals=with_metals, with_bh=with_bh)
            if sp.write_fof or (self.cfg.snapshot_with_fof
                                and sp.write_snapshot):
                do_sharded_fof()

        # ---- HCI: stop/checkpoint/terminate control files,
        # TimeLimitCPU budget and auto-checkpoint (hci.c; run.c:391-398)
        # queried at PM boundaries.  Rank 0 decides (the reference's
        # task-0 hci_query + broadcast) and the action is agreed across
        # processes; checkpoints go through the collective striped
        # writer, so a multi-day pod run can be cleanly stopped. ----
        from .utils.hci import (HCIManager, HCI_STOP, HCI_TERMINATE,
                                HCI_CHECKPOINT, HCI_TIMEOUT,
                                HCI_AUTO_CHECKPOINT)
        hci = HCIManager(self.cfg.output_dir,
                         time_limit_cpu=self.cfg.time_limit_cpu,
                         auto_checkpoint_time=self.cfg.auto_snapshot_time)

        def write_checkpoint():
            from .parallel.snapshot import write_snapshot_sharded
            write_snapshot_sharded(
                self, device_mesh, state, n_local, cache=io_cache,
                with_gas=with_gas, with_sfr=with_sfr,
                with_metals=with_metals, with_bh=with_bh)

        def hci_check():
            """Returns True when the loop must stop.  A checkpoint
            request (explicit file or AutoSnapshotTime cadence) writes
            a striped snapshot and continues."""
            action = hci.query() if jax.process_index() == 0 else 0
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils
                action = int(multihost_utils.broadcast_one_to_all(
                    np.int32(action)))
            if action in (HCI_STOP, HCI_TIMEOUT):
                write_checkpoint()
                if verbose:
                    from .utils.log import message
                    message("[hci] stop requested: checkpoint written"
                            if action == HCI_STOP else
                            "[hci] TimeLimitCPU reached: checkpoint "
                            "written")
                return True
            if action == HCI_TERMINATE:
                return True
            if action in (HCI_CHECKPOINT, HCI_AUTO_CHECKPOINT):
                write_checkpoint()
            return False

        if hierarchical:
            # ---- per-particle timebin loop (timestep.c:298-503 at
            # scale; the sharded analog of step_hierarchical) ----
            from .timeline import get_timestep_bin
            from .parallel.driver import MAXB
            par_ts = self.cfg.timestep
            soft_h = 2.8 * self.cfg.gravity_softening \
                * self._dm_mean_sep()
            group_sz = int(tg.tree_cfg.group_max)
            pm_stats = None
            nsteps = 0
            self._force_evals = getattr(self, "_force_evals", 0)
            self._hier_substeps = 0

            def bin_tables(ti, dti_s, maxbin, a1s):
                """Per-bin kick-factor/alignment tables for one
                substep (apply_half_kick factors, timestep.c)."""
                z = np.zeros(MAXB + 1, np.float32)
                gko, hko, dlo = z.copy(), z.copy(), z.copy()
                gkc, hkc, dlc, dlf = (z.copy(), z.copy(), z.copy(),
                                      z.copy())
                ti2 = ti + dti_s
                for b in range(1, maxbin + 1):
                    db = 1 << b
                    if ti % db == 0:
                        gko[b] = self.tf.gravkick(ti, ti + db // 2)
                        hko[b] = self.tf.hydrokick(ti, ti + db // 2)
                        dlo[b] = loga(ti + db // 2) - loga(ti)
                    if ti2 % db == 0:
                        gkc[b] = self.tf.gravkick(ti2 - db // 2, ti2)
                        hkc[b] = self.tf.hydrokick(ti2 - db // 2, ti2)
                        dlc[b] = loga(ti2) - loga(ti2 - db // 2)
                        dlf[b] = loga(ti2) - loga(max(ti2 - db, 0))
                al_o = np.array([ti % (1 << b) == 0
                                 for b in range(MAXB + 1)])
                al_c = np.array([ti2 % (1 << b) == 0
                                 for b in range(MAXB + 1)])
                hub = float(self.CP.hubble_function(a1s))
                fac3 = a1s ** (3 * (1 - GAMMA) / 2.0)
                scal = {
                    "ddrift": jnp.float32(self.tf.drift(ti, ti2)),
                    "dloga_full": jnp.float32(loga(ti2) - loga(ti)),
                    "atime": jnp.float32(a1s),
                    "hubble": jnp.float32(hub),
                    "gk_open": jnp.asarray(gko),
                    "hk_open": jnp.asarray(hko),
                    "dlg_open": jnp.asarray(dlo),
                    "gk_close": jnp.asarray(gkc),
                    "hk_close": jnp.asarray(hkc),
                    "dlg_close": jnp.asarray(dlc),
                    "dlg_full": jnp.asarray(dlf),
                    "al_open": jnp.asarray(al_o),
                    "al_close": jnp.asarray(al_c),
                    "eta_eps": jnp.float32(
                        2 * par_ts.ErrTolIntAccuracy * a1s * soft_h),
                    "courant_fac": jnp.float32(par_ts.CourantFac),
                    "fac3": jnp.float32(fac3),
                    "max_dloga": jnp.float32(par_ts.MaxSizeTimestep),
                    "dloga_tick": jnp.float32(
                        self.timeline._interval_dloga(ti)),
                    "maxbin": jnp.int32(maxbin),
                }
                if with_nu_tracer:
                    scal["nu_src"] = nu_src_scalar(a1s)
                if with_cooling or with_sfr:
                    z1 = 1.0 / a1s - 1.0
                    uv = self._treecool.get_global_uvbg(z1)
                    scal["redshift"] = jnp.float32(z1)
                    scal["uvbg"] = jnp.asarray(
                        [uv.gJH0, uv.gJHe0, uv.gJHep, uv.epsH0,
                         uv.epsHe0, uv.epsHep, uv.self_shield_dens],
                        jnp.float32)
                if with_sfr:
                    scal["rng"] = jax.random.PRNGKey(
                        (self.cfg.random_seed + ti) % (2 ** 31))
                return scal

            def pick_acap(n_close_hint):
                """Active-block compaction cap: conservative (each
                closing row may occupy its own block), pow2-bucketed;
                None disables compaction when the active set is not
                small.  compact_walks=False keeps a single compiled
                substep (each pow2 bucket is its own XLA program) at
                the cost of walking inactive lanes."""
                if n_close_hint is None or not compact_walks:
                    return None
                nb = (n_pad // S + group_sz - 1) // group_sz
                want = max(4, min(nb, int(n_close_hint)))
                cap = 1 << (want - 1).bit_length()
                return cap if cap <= nb // 2 else None

            while self.ti_current < self.timeline.ti_end:
                if hci_check():
                    break
                import time as _t
                _pm_t0 = _t.monotonic()
                t0 = self.ti_current
                a0 = self.atime
                if pm_stats is None:
                    dti = self.find_pm_timestep()
                else:
                    dloga_pm = dloga_from_stats(pm_stats, a0,
                                                pm_only=True)
                    dti = get_pm_timestep_ti(dloga_pm, self.timeline,
                                             t0, t0)
                if dti <= 0:
                    from .utils.log import endrun
                    endrun(1, f"bad sharded PM timestep {dti}")
                dti = min(dti, self.timeline.ti_end - t0)
                t1 = t0 + dti
                mid = t0 + dti // 2
                # opening PM half kick with the carried field
                # (apply_PM_half_kick; elementwise on sharded arrays)
                state["vel"] = state["vel"] + state["pm_acc"] \
                    * jnp.float32(self.tf.gravkick(t0, mid))
                # per-particle bins from the carried full forces
                maxbin = get_timestep_bin(dti)
                tz = (t0 & -t0).bit_length() - 1 if t0 > 0 else 62
                tzp = (dti & -dti).bit_length() - 1
                maxbin = max(1, min(maxbin, tz, tzp, MAXB))
                from .parallel.driver import assign_bins_global
                state["bins"] = assign_bins_global(
                    state, with_gas, a0,
                    2 * par_ts.ErrTolIntAccuracy * a0 * soft_h,
                    float(self.CP.hubble_function(a0)),
                    par_ts.CourantFac,
                    a0 ** (3 * (1 - GAMMA) / 2.0),
                    par_ts.MaxSizeTimestep,
                    float(self.timeline._interval_dloga(t0)), maxbin)
                if par_ts.ForceEqualTimesteps:
                    mb0 = int(jnp.min(jnp.where(
                        state["valid"], state["bins"], maxbin)))
                    state["bins"] = jnp.where(
                        state["valid"], jnp.int32(mb0), state["bins"])
                minb = int(jnp.min(jnp.where(
                    state["valid"], state["bins"], jnp.int32(MAXB))))
                ti = t0
                n_close_hint = None   # first substep: all rows close
                n_sub = 0
                while ti < t1:
                    dti_s = min(1 << minb, t1 - ti)
                    a1s = float(np.exp(loga(ti + dti_s)))
                    scal = bin_tables(ti, dti_s, maxbin, a1s)
                    acap = pick_acap(n_close_hint)
                    bounds_dev = jnp.asarray(bounds_np)
                    for attempt in range(8):
                        step = get_step(bounds_np, acap)
                        new_state, stats, flags = step(
                            state, bounds_dev, scal)
                        fl = np.asarray(flags)
                        if not fl.any():
                            break
                        if verbose:
                            from .utils.log import message
                            message("[sharded-hier] overflow counts "
                                    f"{fl.tolist()}; retrying")
                        if fl[0]:
                            bp["bucket_cap"] = min(
                                2 * bp["bucket_cap"], n_local)
                            if rebalance:
                                bounds_np = balanced_boundaries(
                                    np.asarray(stats["hist"]), S)
                                bounds_dev = jnp.asarray(bounds_np)
                        if fl[1]:
                            bp["ghost_cap"] = min(
                                2 * bp["ghost_cap"], n_local)
                        if fl[2]:
                            bp["tree_boost"] *= 2
                        if fl[3] or fl[4]:
                            bp["ll"] *= 2
                            bp["src"] *= 2
                        if fl[5]:
                            bp["strip_margin"] *= 1.5
                            hm = float(stats["hmax"]) \
                                / self.cfg.boxsize
                            hmax_box = max(hmax_box, hm)
                        if fl[6]:
                            # active-block compaction overflow
                            acap = (None if acap is None
                                    else pick_acap(acap * 2 + 1))
                        if len(fl) > 7 and fl[7] and rebalance:
                            bounds_np = balanced_boundaries(
                                np.asarray(stats["hist"]), S)
                            bounds_dev = jnp.asarray(bounds_np)
                    else:
                        from .utils.log import endrun
                        endrun(2, "sharded substep: capacity retries "
                               f"exhausted (counts {fl.tolist()})")
                    state = new_state
                    apply_lightcone(ti, ti + dti_s, a1s)
                    ti += dti_s
                    self.ti_current = ti
                    n_sub += 1
                    self._hier_substeps += 1
                    self._force_evals += int(stats["n_closing"])
                    if float(stats["sm_sum"]) > 0:
                        write_sfr_line(stats)
                    hm = float(stats["hmax"]) / self.cfg.boxsize
                    if hm > 0:
                        hmax_box = hm
                    if rebalance:
                        bounds_np = balanced_boundaries(
                            np.asarray(stats["hist"]), S)
                    minb = int(stats["min_act_bin"])
                    if ti < t1:
                        # exact closing count of the NEXT substep from
                        # the bin populations (sizes the walk cap)
                        bh = np.asarray(stats["bin_hist"])
                        tc = ti + min(1 << minb, t1 - ti)
                        n_close_hint = int(sum(
                            int(bh[b]) for b in range(1, MAXB + 1)
                            if tc % (1 << b) == 0))
                # ---- PM refresh + closing half kick at t1 ----
                a1 = float(np.exp(loga(t1)))
                pm_sub_keys = ("ipos", "vel", "mass", "valid",
                               "ptype", "grav_acc") + (
                    ("gas_mask", "hsml") if with_gas else ()) + (
                    ("tree_pot",) if with_potential else ())
                pm_scal = {"fac": jnp.float32(
                    self.tf.gravkick(mid, t1))}
                if with_nu_tracer:
                    pm_scal["nu_src"] = nu_src_scalar(a1)
                for attempt in range(1 + S // 2):
                    pm_fn = get_pm_fn(bounds_np)
                    upd_pm, pm_stats, pm_far = pm_fn(
                        {k: state[k] for k in pm_sub_keys}, pm_scal)
                    if not int(pm_far):
                        break
                    bp["pm_extra"] += 1
                else:
                    from .utils.log import endrun
                    endrun(6, "sharded PM: hop retries exhausted")
                state.update(upd_pm)
                nsteps += 1
                # ---- interval-cadence source terms ----
                if wind_neighbors:
                    apply_wind_neighbors(
                        t0, t1, a1, jax.random.PRNGKey(
                            (self.cfg.random_seed + t0) % (2 ** 31)))
                if with_bh:
                    apply_bh_interval(t0, t1, a1,
                                      float(pm_stats["n_valid"]))
                if with_metals:
                    apply_metals_interval(t0, t1,
                                          jnp.asarray(bounds_np))
                if with_qso:
                    apply_qso(t0, t1, a1)
                if with_excursion:
                    apply_excursion(a1)
                maybe_planes()
                if rebalance:
                    bounds_np = balanced_boundaries(
                        np.asarray(pm_stats["hist"]), S)
                sync_outputs()
                hci.update_longest_step(_t.monotonic() - _pm_t0)
                if verbose:
                    from .utils.log import message
                    message(f"[sharded-hier step {nsteps}] "
                            f"a={self.atime:.5f} "
                            f"n={int(pm_stats['n_valid'])} "
                            f"substeps={n_sub}")
                if max_steps and nsteps >= max_steps:
                    break
            mirror_to_host()
            return nsteps

        nsteps = 0
        stats = None
        while self.ti_current < self.timeline.ti_end:
            if hci_check():
                break
            import time as _t
            _pm_t0 = _t.monotonic()
            if stats is None:
                dti = self.find_pm_timestep()
                if with_gas:
                    dloga_h = self.find_hydro_timestep_dloga()
                    dti_h = round_down_power_of_two(
                        self.timeline.dti_from_dloga(dloga_h,
                                                     self.ti_current))
                    dti = min(dti, max(dti_h, 1))
            else:
                dloga = dloga_from_stats(stats, self.atime)
                dti = get_pm_timestep_ti(dloga, self.timeline,
                                         self.ti_current,
                                         self.ti_current)
            if dti <= 0:
                from .utils.log import endrun
                endrun(1, f"bad sharded timestep {dti}")
            dti = min(dti, self.timeline.ti_end - self.ti_current)
            t0, t1 = self.ti_current, self.ti_current + dti
            mid = t0 + dti // 2
            loga = self.timeline.loga_from_ti
            a1 = float(np.exp(loga(t1)))
            scal = {
                "dk1": jnp.float32(self.tf.gravkick(t0, mid)),
                "hk1": jnp.float32(self.tf.hydrokick(t0, mid)),
                "dloga1": jnp.float32(loga(mid) - loga(t0)),
                "ddrift": jnp.float32(self.tf.drift(t0, t1)),
                "dk2": jnp.float32(self.tf.gravkick(mid, t1)),
                "hk2": jnp.float32(self.tf.hydrokick(mid, t1)),
                "dloga2": jnp.float32(loga(t1) - loga(mid)),
                "dloga_full": jnp.float32(loga(t1) - loga(t0)),
                "atime": jnp.float32(a1),
                "hubble": jnp.float32(self.CP.hubble_function(a1)),
            }
            if with_cooling or with_sfr:
                z1 = 1.0 / a1 - 1.0
                uv = self._treecool.get_global_uvbg(z1)
                scal["redshift"] = jnp.float32(z1)
                scal["uvbg"] = jnp.asarray(
                    [uv.gJH0, uv.gJHe0, uv.gJHep, uv.epsH0,
                     uv.epsHe0, uv.epsHep, uv.self_shield_dens],
                    jnp.float32)
            if with_sfr:
                scal["rng"] = jax.random.PRNGKey(
                    (self.cfg.random_seed + self.ti_current)
                    % (2 ** 31))
            if with_nu_tracer:
                scal["nu_src"] = nu_src_scalar(a1)
            bounds_dev = jnp.asarray(bounds_np)
            for attempt in range(8):
                step = get_step(bounds_np)
                new_state, stats, flags = step(state, bounds_dev, scal)
                # flags: per-flag shard counts [exchange, ghost, tree,
                # density, hydro, strip, pm-hops, spawn]
                fl = np.asarray(flags)
                if not fl.any():
                    break
                if verbose:
                    from .utils.log import message
                    message(f"[sharded] overflow counts {fl.tolist()}; "
                            "growing capacities and retrying")
                if fl[0]:
                    bp["bucket_cap"] = min(2 * bp["bucket_cap"],
                                           n_local)
                    if rebalance:
                        # receive overflow (a clump outgrowing its
                        # slab) is only fixable by moving boundaries:
                        # rebalance from this attempt's histogram and
                        # retry the same inputs (domain.c:31-56
                        # escalating-policy analog)
                        bounds_np = balanced_boundaries(
                            np.asarray(stats["hist"]), S)
                        bounds_dev = jnp.asarray(bounds_np)
                if fl[1]:
                    bp["ghost_cap"] = min(2 * bp["ghost_cap"], n_local)
                if fl[2]:
                    bp["tree_boost"] *= 2
                if fl[3] or fl[4]:
                    bp["ll"] *= 2
                    bp["src"] *= 2
                if fl[5]:
                    bp["strip_margin"] *= 1.5
                    hm = float(stats["hmax"]) / self.cfg.boxsize
                    hmax_box = max(hmax_box, hm)
                if fl[6]:
                    bp["pm_extra"] += 1
                if len(fl) > 7 and fl[7] and rebalance:
                    # spawn overflow: a shard ran out of free rows;
                    # rebalancing spreads its particles (and thus its
                    # free slots) before the retry
                    bounds_np = balanced_boundaries(
                        np.asarray(stats["hist"]), S)
                    bounds_dev = jnp.asarray(bounds_np)
            else:
                from .utils.log import endrun
                endrun(2, "sharded step: capacity retries exhausted "
                       f"(counts {fl.tolist()})")
            state = new_state
            self.ti_current = t1
            nsteps += 1
            apply_lightcone(t0, t1, a1)
            if wind_neighbors:
                apply_wind_neighbors(t0, t1, a1, scal["rng"])
            if with_bh:
                apply_bh_interval(t0, t1, a1, float(stats["n_valid"]))
            if with_metals:
                apply_metals_interval(t0, t1, bounds_dev)
            if with_qso:
                apply_qso(t0, t1, a1)
            if with_excursion:
                apply_excursion(a1)
            maybe_planes()
            write_sfr_line(stats)
            hm = float(stats["hmax"]) / self.cfg.boxsize
            if hm > 0:
                hmax_box = hm
            if rebalance:
                bounds_np = balanced_boundaries(
                    np.asarray(stats["hist"]), S)
            sync_outputs()
            hci.update_longest_step(_t.monotonic() - _pm_t0)
            if verbose:
                from .utils.log import message
                message(f"[sharded step {nsteps}] a={self.atime:.5f} "
                      f"n={int(stats['n_valid'])}")
            if max_steps and nsteps >= max_steps:
                break
        mirror_to_host()
        return nsteps


    def step(self, dti: int):
        """One global KDK step over dti integer ticks."""
        t0, t1 = self.ti_current, self.ti_current + dti
        th = t0 + dti // 2
        if self.cfg.random_particle_offset > 0 and self._nstep_total:
            self._update_random_offset()
        self._nstep_total += 1
        inv_box = 1.0 / self.cfg.boxsize
        # K: half kick with forces at t0
        self._apply_half_kick(t0, th)
        # D: full drift (positions and predicted Hsml)
        hsml = self.pdata.hsml + self.pdata.dt_hsml \
            * jnp.float32(self.tf.drift(t0, t1))
        hsml = jnp.clip(hsml, 0.0, 0.45 * self.cfg.boxsize)
        self.pdata = self.pdata.replace(
            ipos=drift(self.pdata.ipos, self.pdata.vel,
                       self.tf.drift(t0, t1), inv_box),
            hsml=hsml)
        self.ti_current = t1
        # Forces at t1
        if self.has_gas and self.cfg.hydro_on:
            dloga = self.timeline.dloga_from_dti(dti, t0)
            # halo wind model needs the DM velocity dispersion; computed
            # on (PM) steps like the reference (run.c:646-647)
            if (self.cfg.wind_on and self._gas_initialized
                    and (self.cfg.wind_model & 4)):
                from .physics.winds import dm_velocity_dispersion
                npart = float(np.asarray(self.pdata.num_valid))
                mean_sep = self.cfg.boxsize / max(1.0, np.cbrt(npart))
                self._vdisp = dm_velocity_dispersion(
                    self.pdata.ipos, self.pdata.vel, self.pdata.mass,
                    self.pdata.valid & (self.pdata.ptype == 1),
                    self.gas_mask, self.cfg.boxsize, mean_sep)
            self.compute_hydro(dloga)
        self.compute_forces()
        self._force_evals += int(np.asarray(self.pdata.num_valid))
        # K: half kick with forces at t1
        self._apply_half_kick(th, t1)
        # Strang-split source terms (run.c:586-604)
        if self.has_gas and self._gas_initialized:
            dloga = self.timeline.dloga_from_dti(dti, t0)
            if self.cfg.black_hole_on:
                self.apply_blackholes(dloga)
            if self.cfg.starformation_on:
                self.apply_cooling_sfr(dloga)
            elif self.cfg.cooling_on:
                self.apply_cooling(dloga)
            if self.cfg.metal_return_on:
                self.apply_metal_return(dloga)

    def run(self, max_steps: Optional[int] = None, verbose=True):
        """Main loop (run.c:314-800, PM-only path)."""
        os.makedirs(self.cfg.output_dir, exist_ok=True)
        from .utils.hci import (HCIManager, HCI_STOP, HCI_TERMINATE,
                                HCI_CHECKPOINT, HCI_TIMEOUT,
                                HCI_AUTO_CHECKPOINT, HCI_NO_ACTION)
        hci = HCIManager(self.cfg.output_dir,
                         time_limit_cpu=self.cfg.time_limit_cpu,
                         auto_checkpoint_time=self.cfg.auto_snapshot_time)
        if self.has_gas and self.cfg.hydro_on and not self._gas_initialized:
            if getattr(self, "_gas_restore", None):
                self._restore_gas()
            else:
                self.setup_gas()
        if self.has_gas and self.cfg.hydro_on:
            self.compute_hydro(dloga=0.0)
        self.compute_forces()
        nsteps = 0
        while self.ti_current < self.timeline.ti_end:
            action = hci.query()
            if action in (HCI_STOP, HCI_TIMEOUT):
                self.write_snapshot()
                break
            if action == HCI_TERMINATE:
                break
            if action in (HCI_CHECKPOINT, HCI_AUTO_CHECKPOINT):
                self.write_snapshot()
            import time as _t
            _step_t0 = _t.monotonic()
            dti = self.find_pm_timestep()
            if self.has_gas and self.cfg.hydro_on:
                dloga_h = self.find_hydro_timestep_dloga()
                from .timeline import round_down_power_of_two
                dti_h = round_down_power_of_two(
                    self.timeline.dti_from_dloga(dloga_h,
                                                 self.ti_current))
                dti = min(dti, max(dti_h, 1))
            if dti <= 0:
                # dump state for post-mortem before dying
                # (emergency snapshot, run.c:776-780)
                try:
                    self.write_snapshot(label=999)
                except Exception:
                    pass
                raise RuntimeError(
                    f"Bad timestep {dti}; emergency snapshot "
                    f"{self.cfg.snapshot_base}_999 written")
            if self.cfg.split_gravity_timesteps \
                    and self.cfg.tree_grav_on:
                self.step_hierarchical(dti)
            else:
                self.step(dti)
            nsteps += 1
            hci.update_longest_step(_t.monotonic() - _step_t0)
            # QSO helium reionization runs on PM steps during its
            # epoch, with a fresh FOF (do_heiii_reionization)
            if (self.cfg.qso_lightup_on and self.has_gas
                    and self._gas_initialized):
                self._run_qso_lightup(self.timeline.dloga_from_dti(
                    dti, self.ti_current - dti))
            if self.cfg.plane_output_list:
                self._maybe_write_planes()
            if self.cfg.lightcone_on:
                self._run_lightcone(dti)
            if (self.cfg.excursion_set_on and self.has_gas
                    and self._gas_initialized):
                self._run_excursion_set()
            if self.cfg.output_energy_debug:
                self._check_invariants()
            sp = self.timeline.find_current_sync_point(self.ti_current)
            if sp is not None and sp.write_snapshot:
                self.write_snapshot()
                if self.cfg.output_energy_debug:
                    self.energy_statistics()
                if sp.write_fof or (self.cfg.snapshot_with_fof
                                    and sp.write_snapshot):
                    cat = self.run_fof()
                    if self.cfg.black_hole_on:
                        self.seed_black_holes_from_fof(cat)
            if self.last_power is not None:
                D1 = self.CP.GrowthFactor(self.atime, 1.0)
                self.last_power.save(self.cfg.output_dir, self.atime, D1)
            # per-step timer dump (the reference's cpu.txt,
            # walltime_summary in run.c:553)
            with open(os.path.join(self.cfg.output_dir, "cpu.txt"),
                      "a") as fh:
                fh.write(f"Step {nsteps}, Time: {self.atime:g}\n")
                tot = max(self.walltime.elapsed(), 1e-12)
                for name in sorted(self.walltime.totals,
                                   key=self.walltime.totals.get,
                                   reverse=True):
                    s = self.walltime.totals[name]
                    fh.write(f"    {name:<24s} {s:10.2f} "
                             f"{100 * s / tot:6.2f}%\n")
            if verbose:
                dloga = self.timeline.dloga_from_dti(
                    dti, self.ti_current - dti)
                print(f"[step {nsteps}] a={self.atime:.5f} "
                      f"dloga={dloga:.4g}")
            if max_steps and nsteps >= max_steps:
                break
        return nsteps

    # -- black holes ----------------------------------------------------

    def _excursion_uvbg(self, uvbg, redshift):
        """During the excursion epoch the cooling UVB comes from the
        per-particle J21 grid: neutral cells see no background
        (excursionset_rundown.md; after ZStop revert to the global
        table)."""
        if not self.cfg.excursion_set_on or self.sph is None:
            return uvbg
        if not (self.cfg.excursion_set_zstop <= redshift
                <= self.cfg.excursion_set_zstart):
            return uvbg
        from .physics.uvbg import j21_to_rates
        from .physics.cooling import UVBG
        g, e = j21_to_rates(self.sph.local_j21, self.cfg.alpha_uv)
        return UVBG(gJH0=g[0], gJHe0=g[1], gJHep=g[2],
                    epsH0=e[0], epsHe0=e[1], epsHep=e[2],
                    self_shield_dens=uvbg.self_shield_dens)

    def _run_excursion_set(self):
        """Excursion-set UVBG update at the UVBGTimestep cadence
        (calculate_uvbg, uvbg.c:506-594)."""
        from .physics import uvbg as uvmod
        atime = self.atime
        z = 1.0 / atime - 1.0
        if not (self.cfg.excursion_set_zstop <= z
                <= self.cfg.excursion_set_zstart):
            return
        if getattr(self, "_uvbg_params", None) is None:
            self._uvbg_params = uvmod.UVBGParams(
                uvbg_dim=self.cfg.uvbg_dim,
                r_bubble_max=self.cfg.reion_r_bubble_max,
                r_bubble_min=self.cfg.reion_r_bubble_min,
                delta_r_factor=self.cfg.reion_delta_r_factor,
                filter_type=self.cfg.reion_filter_type,
                rtom_filter_type=self.cfg.rtom_filter_type,
                nion_phot_per_bary=self.cfg.reion_nion_phot_per_bary,
                alpha_uv=self.cfg.alpha_uv,
                escape_frac_norm=self.cfg.escape_fraction_norm,
                escape_frac_scaling=self.cfg.escape_fraction_scaling,
                zstart=self.cfg.excursion_set_zstart,
                zstop=self.cfg.excursion_set_zstop,
                timestep_myr=self.cfg.uvbg_timestep_myr,
                use_particle_sfr=self.cfg.reion_use_particle_sfr,
                sfr_timescale=self.cfg.reion_sfr_timescale)
            self._uvbg_last_myr = -1e30
            if getattr(self, "_age_table", None) is None:
                from .physics.metal_return import AgeTable
                self._age_table = AgeTable(
                    self.CP.hubble_function, self.cfg.units,
                    self.CP.HubbleParam)
        t_myr = float(self._age_table(atime))
        if t_myr - self._uvbg_last_myr < self.cfg.uvbg_timestep_myr:
            return
        self._uvbg_last_myr = t_myr
        self.walltime.start("UVBG")
        # per-particle escape fractions from FOF halo mass
        cat = self.run_fof(save=False)
        gi = cat["group_index"]
        halo_mass = np.zeros(self.pdata.capacity, np.float32)
        ok = np.asarray(gi) >= 0
        halo_mass[ok] = np.asarray(cat["masses"])[np.asarray(gi)[ok]]
        fesc = uvmod.escape_fractions(
            jnp.asarray(halo_mass), self._uvbg_params.escape_frac_norm,
            self._uvbg_params.escape_frac_scaling,
            self.cfg.units.UnitMass_in_g, self.CP.HubbleParam)
        is_star = self.pdata.valid & (self.pdata.ptype == 4)
        out = uvmod.calculate_uvbg(
            self.pdata.ipos, self.pdata.mass, self.pdata.valid,
            self.gas_mask, is_star, self.sph.sfr, fesc,
            self._uvbg_params, self.CP, self.cfg.units,
            self.cfg.boxsize, atime)
        self._uvbg_grids = out
        j21_p = uvmod.readout_j21_max(out["j21"], self.pdata.ipos)
        newly = self.gas_mask & (j21_p > self.sph.local_j21) \
            & (self.sph.zreion < 0)
        self.sph = self.sph.replace(
            local_j21=jnp.where(self.gas_mask,
                                jnp.maximum(self.sph.local_j21, j21_p),
                                self.sph.local_j21),
            zreion=jnp.where(newly, jnp.float32(z), self.sph.zreion))
        self.walltime.stop("UVBG")
        print(f"[UVBG] z={z:.2f} vol xHI="
              f"{out['volume_weighted_global_xHI']:.4f} mass xHI="
              f"{out['mass_weighted_global_xHI']:.4f}")

    def _run_lightcone(self, dti):
        """Append horizon-crossing particles (lightcone_compute,
        lightcone.c:176-190) once per step."""
        from .physics.lightcone import Lightcone
        if getattr(self, "_lightcone", None) is None:
            self._lightcone = Lightcone(
                self.CP, self.time_ic,
                self.cfg.units.UnitVelocity_in_cm_per_s,
                self.cfg.output_dir, self.cfg.boxsize)
        t0 = self.ti_current - dti
        ddrift = self.tf.drift(t0, self.ti_current)
        pos = jnp.asarray(self._output_pos(), jnp.float32)
        is_dm = self.pdata.valid & (self.pdata.ptype == 1)
        self.walltime.start("Lightcone")
        self._lightcone.compute(self.atime, ddrift, pos,
                                self.pdata.vel, is_dm,
                                self.pdata.pid)
        self.walltime.stop("Lightcone")

    def _ensure_plane_params(self):
        from .physics.plane import PlaneParams
        if getattr(self, "_plane_times", None) is None:
            self._plane_times = sorted(
                float(x) for x in
                self.cfg.plane_output_list.replace(",", " ").split())
            self._planes_done = set()
            cuts = [float(x) for x in
                    self.cfg.plane_cut_points.replace(",", " ").split()]
            normals = [int(x) for x in
                       self.cfg.plane_normals.replace(",", " ").split()]
            self._plane_params = PlaneParams(
                output_times=self._plane_times,
                resolution=self.cfg.plane_resolution,
                thickness=self.cfg.plane_thickness,
                cut_points=cuts, normals=normals,
                massive_nu_correction=self.cfg.plane_nu_correction,
                double_out=self.cfg.plane_double_out)

    def _maybe_write_planes(self):
        """Write lensing potential planes for any plane output times
        crossed this step (write_plane, plane.c:572)."""
        from .physics.plane import write_planes
        self._ensure_plane_params()
        atime = self.atime
        for i, t in enumerate(self._plane_times):
            if i in self._planes_done or t > atime + 1e-9:
                continue
            self.walltime.start("Planes")
            write_planes(self, i, self._plane_params)
            self.walltime.stop("Planes")
            self._planes_done.add(i)

    def _run_qso_lightup(self, dloga=0.0):
        """Helium reionization driver for one PM step."""
        from .physics import qso_lightup as qmod
        if getattr(self, "_heii_hist", None) is None:
            if not self.cfg.reion_hist_file:
                raise ValueError("QSOLightupOn needs ReionHistFile")
            self._heii_hist = qmod.load_heii_reion_hist(
                self.cfg.reion_hist_file)
            self._qso_params = qmod.QSOParams(
                min_mass=self.cfg.qso_min_mass,
                max_mass=self.cfg.qso_max_mass,
                mean_bubble=self.cfg.qso_mean_bubble,
                var_bubble=self.cfg.qso_var_bubble,
                finish_frac=self.cfg.qso_finish_frac,
                heiii_start=self._heii_hist.zstart)
        hist, par = self._heii_hist, self._qso_params
        atime = self.atime
        z = 1.0 / atime - 1.0
        if z > par.heiii_start or atime > hist.aend:
            return
        self.walltime.start("HeIII")
        if dloga > 0:
            qmod.apply_lmfp_heating(self, hist, par, dloga)
        cat = self.run_fof(save=False)
        qmod.do_heiii_reionization(self, cat, hist, par)
        self.walltime.stop("HeIII")

    def _bh_params(self):
        from .physics.blackhole import BHParams
        return BHParams(
            accretion_factor=self.cfg.bh_accretion_factor,
            eddington_factor=self.cfg.bh_eddington_factor,
            feedback_factor=self.cfg.bh_feedback_factor,
            seed_mass=self.cfg.bh_seed_mass,
            ngb_factor=self.cfg.bh_ngb_factor,
            min_fof_mass_for_seed=self.cfg.min_fof_mass_for_seed,
            min_mstar_for_seed=self.cfg.min_mstar_for_seed,
            kinetic_on=self.cfg.bh_kinetic_on,
            merge_grav_bound=self.cfg.bh_merge_grav_bound,
            dynfric_method=self.cfg.bh_dynfric_method,
            df_boost=self.cfg.bh_df_boost,
            df_bmax=self.cfg.bh_df_bmax,
            ke_eddington_thr_factor=self.cfg.bhke_eddington_thr_factor,
            ke_eddington_m_factor=self.cfg.bhke_eddington_m_factor,
            ke_eddington_m_pivot=self.cfg.bhke_eddington_m_pivot,
            ke_eddington_m_index=self.cfg.bhke_eddington_m_index,
            ke_eff_rho_factor=self.cfg.bhke_eff_rho_factor,
            ke_eff_cap=self.cfg.bhke_eff_cap,
            ke_inj_energy_thr=self.cfg.bhke_inj_energy_thr,
            ke_sfr_crit_overdensity=self.cfg.crit_overdensity,
            seed_bh_dyn_mass=self.cfg.seed_bh_dyn_mass,
            reposition_enabled=self.cfg.bh_reposition)

    def apply_blackholes(self, dloga):
        """BH accretion + swallowing + thermal feedback (blackhole(),
        blackhole.c:216-360), executed when any BHs exist."""
        from .physics import blackhole as bhmod
        is_bh = self.pdata.valid & (self.pdata.ptype == 5)
        nbh = int(jnp.sum(is_bh.astype(jnp.int32)))
        if nbh == 0:
            return
        self._ensure_bh()
        par = self._bh_params()
        gas = self.gas_mask
        atime = self.atime
        hubble = self.CP.hubble_function(atime)
        dtime = dloga / hubble
        self.walltime.start("BH")
        # dynamical friction environment (bhdynfric.c): optional
        if par.dynfric_method > 0:
            ptype = self.pdata.ptype
            src = self.pdata.valid & (ptype == 4)
            if par.dynfric_method > 1:
                src = src | (self.pdata.valid & (ptype == 1))
            if par.dynfric_method > 2:
                src = src | gas
            dfs = bhmod.bh_dynfric_sums(
                self.pdata.ipos, self.pdata.mass, self.pdata.hsml,
                self.pdata.vel, is_bh, src, self.cfg.boxsize,
                kernel_type=self.cfg.density_kernel_type)
            df_acc = bhmod.dynfric_accel(
                dfs["rho"], dfs["vel"], dfs["rmsvel"],
                self.pdata.mass, self.pdata.vel, atime,
                self.CP.GravInternal, bmax=par.df_bmax,
                boost=par.df_boost)
            df_acc = jnp.where(is_bh[:, None], df_acc, 0.0)
            self.bh = self.bh.replace(df_accel=df_acc)
        if par.kinetic_on:
            # 1D DM velocity dispersion around BHs within each BH's
            # own Hsml (veldisp.c:60-76)
            from .physics.winds import dm_velocity_dispersion
            vd = dm_velocity_dispersion(
                self.pdata.ipos, self.pdata.vel, self.pdata.mass,
                self.pdata.valid & (self.pdata.ptype == 1), is_bh,
                self.cfg.boxsize, 0.0,
                radius_per_particle=jnp.where(is_bh, self.pdata.hsml,
                                              0.0))
            self.bh = self.bh.replace(
                vdisp=jnp.where(is_bh, vd, 0.0))
        sums = bhmod.bh_neighbor_sums(
            self.pdata.ipos, self.pdata.mass, self.pdata.hsml,
            self.pdata.vel, self.sph.entropy, is_bh, gas,
            self.cfg.boxsize,
            kernel_type=self.cfg.density_kernel_type)
        self.bh = self.bh.replace(bh_density=jnp.asarray(sums["rho"]))
        gasvel = jnp.stack([sums["vx"], sums["vy"], sums["vz"]],
                           axis=-1)
        mdot, dm = bhmod.bondi_accretion(
            par, self.bh.bh_mass, self.bh.bh_density, sums["ent"],
            gasvel, self.pdata.vel, atime, self.CP.GravInternal,
            self.cfg.units.UnitTime_in_s, self.CP.HubbleParam, dtime)
        self.bh = self.bh.replace(
            mdot=jnp.where(is_bh, mdot, 0.0),
            bh_mass=jnp.where(is_bh, self.bh.bh_mass + dm,
                              self.bh.bh_mass))
        ke_energy = keflag = None
        if par.kinetic_on:
            rho_crit_b = self.CP.OmegaBaryon * 3 \
                * self.CP.Hubble ** 2 \
                / (8 * np.pi * self.CP.GravInternal)
            ke_energy, keflag = bhmod.kinetic_update(
                par, self.bh.bh_mass, self.bh.mdot,
                self.bh.bh_density, self.bh.vdisp,
                jnp.asarray(sums["mgas"]), self.bh.kinetic_energy,
                dtime, self.cfg.units.UnitTime_in_s,
                self.CP.HubbleParam, rho_crit_b,
                self.cfg.units.UnitVelocity_in_cm_per_s)
        key = jax.random.PRNGKey(
            (self.cfg.random_seed + self.ti_current + 5) % (2 ** 31))
        swallowed, ent_new, bhrow, kick = bhmod.swallow_and_feedback(
            par, key, ipos=self.pdata.ipos, mass=self.pdata.mass,
            hsml=self.pdata.hsml, entropy=self.sph.entropy,
            density=self.sph.density, is_bh=is_bh, is_gas=gas,
            pid=self.pdata.pid, bh_mass=self.bh.bh_mass,
            mdot=self.bh.mdot, bh_density=self.bh.bh_density,
            fbweight=jnp.asarray(sums["fbweight"]),
            boxsize=self.cfg.boxsize, atime=atime, dtime=dtime,
            unit_velocity=self.cfg.units.UnitVelocity_in_cm_per_s,
            uu_in_cgs=self.cfg.units.UnitInternalEnergy_in_cgs,
            kernel_type=self.cfg.density_kernel_type,
            ke_energy=ke_energy, keflag=keflag,
            mtrack=self.bh.mtrack)
        self.sph = self.sph.replace(entropy=ent_new)
        if par.kinetic_on:
            self.pdata = self.pdata.replace(
                vel=self.pdata.vel + kick)
            # reset released energy (blackhole.c:986-989)
            self.bh = self.bh.replace(kinetic_energy=jnp.where(
                keflag == 2, 0.0, ke_energy))
        # finalize swallowing ON DEVICE: segment-sum swallowed mass and
        # momentum by swallower row, then route through Mtrack
        # (blackhole_feedback_postprocess, blackhole.c:960-978)
        nsw = int(jnp.sum(swallowed.astype(jnp.int32)))
        if nsw > 0:
            n = self.pdata.capacity
            m = self.pdata.mass
            v = self.pdata.vel
            rows = jnp.where(swallowed, bhrow, n)
            acc_mass = jnp.zeros(n, jnp.float32).at[rows].add(
                jnp.where(swallowed, m, 0.0), mode="drop")
            acc_mom = jnp.zeros((n, 3), jnp.float32).at[rows].add(
                jnp.where(swallowed[:, None], m[:, None] * v, 0.0),
                mode="drop")
            new_mass, new_mtrack, new_vel = \
                bhmod.apply_mtrack_accretion(
                    m, self.bh.mtrack, acc_mass, acc_mom, v, is_bh,
                    par.seed_bh_dyn_mass)
            self.pdata = self.pdata.replace(
                mass=new_mass, vel=new_vel,
                valid=self.pdata.valid & ~swallowed)
            self.bh = self.bh.replace(mtrack=new_mtrack)
        # BH-BH mergers (blackhole.c:495-560)
        nmerge = 0
        if nbh > 1:
            is_bh_now = self.pdata.valid & (self.pdata.ptype == 5)
            soft = self.cfg.gravity_softening * self._dm_mean_sep()
            merge = bhmod.bh_mergers(
                par,
                pos=fixed_to_pos(np.asarray(self.pdata.ipos),
                                 self.cfg.boxsize),
                vel=np.asarray(self.pdata.vel),
                accel=np.asarray(self.pdata.grav_accel)
                + np.asarray(self.pdata.grav_pm),
                df_accel=np.asarray(self.bh.df_accel),
                pid=np.asarray(self.pdata.pid), is_bh=is_bh_now,
                boxsize=self.cfg.boxsize, atime=atime,
                softening=soft)
            nmerge = len(merge["swallowed"])
            if nmerge:
                swr = merge["swallowed"]
                tor = merge["swallower"]
                m = np.array(self.pdata.mass)
                v = np.array(self.pdata.vel)
                bhm = np.array(self.bh.bh_mass)
                progs = np.array(self.bh.count_progs)
                # a swallowed BH still in its Mtrack regime donates its
                # tracked mass, not the fixed dynamical seed mass
                # (blackhole.c:795-798)
                othermass = m[swr]
                if par.seed_bh_dyn_mass > 0:
                    mtk = np.array(self.bh.mtrack)
                    sub = mtk[swr] < par.seed_bh_dyn_mass
                    othermass = np.where(sub, mtk[swr], othermass)
                mom = m[:, None] * v
                np.add.at(mom, tor, othermass[:, None] * v[swr])
                np.add.at(m, tor, othermass)
                np.add.at(bhm, tor, bhm[swr])
                np.add.at(progs, tor, progs[swr] + 1)
                v = np.where((m > 0)[:, None],
                             mom / np.maximum(m, 1e-30)[:, None], v)
                valid = np.array(self.pdata.valid)
                valid[swr] = False
                self.pdata = self.pdata.replace(
                    mass=jnp.asarray(m), vel=jnp.asarray(v),
                    valid=jnp.asarray(valid))
                self.bh = self.bh.replace(
                    bh_mass=jnp.asarray(bhm),
                    count_progs=jnp.asarray(progs))
        # minimum-potential repositioning (blackhole_minpot_ngbiter,
        # bhdynfric.c:199-231 + drift.c:32-49 jump, applied here at
        # the end of the BH step instead of the next drift)
        if par.reposition_enabled:
            is_bh_now = self.pdata.valid & (self.pdata.ptype == 5)
            srcs = self.pdata.valid & (
                (self.pdata.ptype == 0) | (self.pdata.ptype == 1)
                | (self.pdata.ptype == 4) | (self.pdata.ptype == 5))
            # kernel-scale argmin needs the TOTAL potential: the PM
            # part alone is smoothed at the asmth scale and its
            # within-kernel gradient reflects large-scale structure,
            # not the local well (P.Potential = PM + short-range tree,
            # gravshort-tree.c:137)
            pot_tot = self.pdata.potential
            if self.cfg.tree_grav_on and self._tree_grav is not None:
                _, tree_pot = self._tree_grav.compute(
                    self.pdata, return_potential=True)
                pot_tot = pot_tot + tree_pot
            mp_pos, mp_vel, found = bhmod.bh_minpot(
                self.pdata.ipos, self.pdata.hsml,
                pot_tot, self.pdata.vel, srcs, is_bh_now,
                self.cfg.boxsize)
            # store in the offset-free output frame (like Position and
            # FOF MassCenterPosition) so the snapshot block agrees with
            # Position and survives per-PM-step offset re-randomization
            off_pos = jnp.asarray(
                self._ipos_offset.astype(np.float64) * 2.0 ** -32
                * self.cfg.boxsize, jnp.float32)
            mp_out = jnp.mod(mp_pos - off_pos[None, :],
                             jnp.float32(self.cfg.boxsize))
            self.bh = self.bh.replace(
                min_pot_pos=jnp.where(found[:, None], mp_out,
                                      self.bh.min_pot_pos))
            ip_new = pos_to_fixed(mp_pos, self.cfg.boxsize)
            self.pdata = self.pdata.replace(
                ipos=jnp.where(found[:, None], ip_new,
                               self.pdata.ipos))
        self.walltime.stop("BH")
        # blackholes.txt (stats.c analog)
        mdot_tot = float(jnp.sum(self.bh.mdot))
        mbh_tot = float(jnp.sum(jnp.where(is_bh, self.bh.bh_mass, 0.0)))
        with open(os.path.join(self.cfg.output_dir, "blackholes.txt"),
                  "a") as fh:
            fh.write(f"{atime:g} {nbh} {mbh_tot:g} {mdot_tot:g} {nsw}\n")
        if self.cfg.write_bh_details:
            self._write_bh_details(atime)

    def _write_bh_details(self, atime):
        """Per-step per-BH detail records (bhinfo.c:1-204 analog).

        Binary stream of fixed-layout float64 rows appended to
        BlackholeDetails/BH-Details-R0; layout documented in
        tools/read_bh_details.py."""
        is_bh = np.asarray(self.pdata.valid) \
            & (np.asarray(self.pdata.ptype) == 5)
        rows = np.flatnonzero(is_bh)
        if rows.size == 0:
            return
        pos = self._output_pos()[rows]
        rec = np.zeros((rows.size, 12), np.float64)
        rec[:, 0] = np.asarray(self.pdata.pid)[rows]
        rec[:, 1] = atime
        rec[:, 2] = np.asarray(self.bh.bh_mass)[rows]
        rec[:, 3] = np.asarray(self.bh.mdot)[rows]
        rec[:, 4] = np.asarray(self.bh.bh_density)[rows]
        rec[:, 5:8] = pos
        rec[:, 8] = np.asarray(self.pdata.mass)[rows]
        rec[:, 9] = np.asarray(self.bh.mtrack)[rows]
        rec[:, 10] = np.asarray(self.bh.count_progs)[rows]
        rec[:, 11] = np.asarray(self.bh.kinetic_energy)[rows]
        d = os.path.join(self.cfg.output_dir, "BlackholeDetails")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "BH-Details-R0"), "ab") as fh:
            fh.write(rec.tobytes())

    def _ensure_bh(self):
        """Lazily create BhData, giving IC black holes (type-5 rows
        present at init without a BlackholeMass block — the block is
        optional on read, petaio.c) the seed subgrid mass: Bondi
        mdot ~ Mbh^2 would otherwise stay zero forever.  Mirrors the
        restart-path guard above (slot restore)."""
        from .physics import blackhole as bhmod
        if getattr(self, "bh", None) is None:
            self.bh = bhmod.BhData.zeros(self.pdata.capacity)
        is_bh = self.pdata.valid & (self.pdata.ptype == 5)
        fix = is_bh & (self.bh.bh_mass <= 0)
        if bool(jnp.any(fix)):
            self.bh = self.bh.replace(
                bh_mass=jnp.where(
                    fix, jnp.float32(self.cfg.bh_seed_mass),
                    self.bh.bh_mass),
                mtrack=jnp.where(fix, self.pdata.mass,
                                 self.bh.mtrack))

    def seed_black_holes_from_fof(self, cat):
        from .physics import blackhole as bhmod
        if getattr(self, "bh", None) is None:
            self.bh = bhmod.BhData.zeros(self.pdata.capacity)
        self.pdata, self.bh, nseeded = bhmod.seed_black_holes(
            self._bh_params(), cat, self.pdata, self.bh, self.sph,
            self.atime)
        return nseeded

    # -- FOF -----------------------------------------------------------

    def run_fof(self, save=True, label=None):
        """FOF halo finding + PIG catalog output (runfof, run.c:813-852
        and fof_save_groups)."""
        from .physics.fof import fof_catalog, FOFParams
        npart = float(np.asarray(jnp.sum(
            self.pdata.valid & (self.pdata.ptype == 1))))
        mean_sep = self.cfg.boxsize / max(1.0, np.cbrt(npart))
        cfg = FOFParams(
            linking_length=self.cfg.fof_linking_length,
            min_group_length=self.cfg.fof_min_group_length,
            primary_link_types=self.cfg.fof_primary_link_types,
            secondary_link_types=self.cfg.fof_secondary_link_types)
        self.walltime.start("FOF")
        cat = fof_catalog(self.pdata.ipos, self.pdata.vel,
                          self.pdata.mass, self.pdata.ptype,
                          self.pdata.valid, self.cfg.boxsize, mean_sep,
                          cfg, sfr=self.sph.sfr if self.sph else None)
        self.walltime.stop("FOF")
        if save:
            self.write_fof_catalog(cat, label)
        return cat

    def write_fof_catalog(self, cat, label=None):
        """PIG bigfile in the reference's FOFGroups schema
        (fofpetaio.c:540-570)."""
        if label is None:
            label = max(self.snapshot_count - 1, 0)
        path = os.path.join(self.cfg.output_dir,
                            f"{self.cfg.fof_file_base}_{label:03d}")
        bf = BigFile(path, create=True)
        ng = cat["ngroups"]
        atime = self.atime
        # GrNr counts from 1 (fof.c:1127-1133)
        bf.create_from_array("FOFGroups/GroupID",
                             np.arange(1, ng + 1, dtype="<u4"))
        bf.create_from_array("FOFGroups/Mass",
                             cat["masses"].astype("<f4"))
        off = self._ipos_offset.astype(np.float64) / 2.0 ** 32 \
            * self.cfg.boxsize
        bf.create_from_array(
            "FOFGroups/MassCenterPosition",
            np.mod(cat["cm"] - off, self.cfg.boxsize).astype("<f8"))
        bf.create_from_array("FOFGroups/MassCenterVelocity",
                             (cat["vel"] / atime).astype("<f4"))
        bf.create_from_array("FOFGroups/LengthByType",
                             cat["len_by_type"].astype("<u4"))
        bf.create_from_array("FOFGroups/MassByType",
                             cat["mass_by_type"].astype("<f4"))
        bf.create_from_array("FOFGroups/StarFormationRate",
                             cat["sfr"].astype("<f4"))
        ntot = np.zeros(6, np.uint64)
        if self.cfg.fof_save_particles and ng > 0:
            # particles grouped by halo (fofpetaio.c fof_save_particles:
            # select GrNr > 0, sort by GrNr, write the usual blocks +
            # per-particle GroupID)
            gi = np.asarray(cat["group_index"])
            valid = np.asarray(self.pdata.valid)
            insel = valid & (gi >= 0)
            order = np.nonzero(insel)[0][np.argsort(gi[insel],
                                                    kind="stable")]
            ptype = np.asarray(self.pdata.ptype)[order]
            pos = self._output_pos()[order]
            vel = np.asarray(self.pdata.vel)[order]
            mass = np.asarray(self.pdata.mass)[order]
            pid = np.asarray(self.pdata.pid)[order]
            gid = (gi[order] + 1).astype("<u4")
            for t in range(6):
                tsel = ptype == t
                ntot[t] = tsel.sum()
                if ntot[t] == 0:
                    continue
                full = np.zeros(len(valid), bool)
                full[order[tsel]] = True
                extra = self._species_extra_blocks(t, full, atime)
                # _species_extra_blocks selects in array order; remap
                # to group order within the type
                rank = {i_: j_ for j_, i_ in
                        enumerate(np.nonzero(full)[0])}
                rord = np.array([rank[i_] for i_ in order[tsel]],
                                np.int64)
                extra = {k: v[rord] for k, v in extra.items()}
                extra["GroupID"] = gid[tsel]
                snap_io.write_species(
                    bf, t, pos=pos[tsel], vel=vel[tsel], pid=pid[tsel],
                    mass=mass[tsel], atime=atime, use_peculiar=True,
                    extra=extra)
        hdr = bf.create("Header")
        hdr.attrs["NumFOFGroupsTotal"] = np.asarray([ng], "<u8")
        hdr.attrs["NumPartInGroupTotal"] = ntot.astype("<u8")
        hdr.attrs["Time"] = float(atime)
        hdr.attrs["BoxSize"] = float(self.cfg.boxsize)
        hdr.attrs["Omega0"] = float(self.CP.Omega0)
        hdr.attrs["OmegaLambda"] = float(self.CP.OmegaLambda)
        hdr.attrs["HubbleParam"] = float(self.CP.HubbleParam)
        return path

    # -- statistics ------------------------------------------------------

    def energy_statistics(self):
        """energy.txt: kinetic/internal/potential energies per component
        (energy_statistics, stats.c:389-412 — same column layout)."""
        from .utils.constants import GAMMA_MINUS1
        atime = self.atime
        valid = np.asarray(self.pdata.valid)
        ptype = np.asarray(self.pdata.ptype)
        mass = np.asarray(self.pdata.mass, np.float64)
        vel = np.asarray(self.pdata.vel, np.float64)
        pot = np.asarray(self.pdata.potential, np.float64)
        if self.cfg.tree_grav_on and self._tree_grav is not None:
            # full potential = PM + short-range tree (stats.c:389)
            _, tree_pot = self._tree_grav.compute(
                self.pdata, return_potential=True)
            pot = pot + np.asarray(tree_pot, np.float64)
        ekin_p = 0.5 * mass * (vel ** 2).sum(axis=1) / atime ** 2
        epot_p = 0.5 * mass * pot
        if self.sph is not None:
            a3inv = atime ** -3
            rho = np.asarray(self.sph.density, np.float64)
            u = np.asarray(self.sph.entropy, np.float64) \
                / GAMMA_MINUS1 * np.maximum(rho * a3inv,
                                            1e-30) ** GAMMA_MINUS1
            eint_p = mass * u
        else:
            eint_p = np.zeros_like(mass)
        cols = [atime, 0.0]
        ei = ek = ep = 0.0
        comp = []
        for t in range(6):
            sel = valid & (ptype == t)
            eic = float(eint_p[sel].sum()) if t == 0 else 0.0
            epc = float(epot_p[sel].sum())
            ekc = float(ekin_p[sel].sum())
            comp.append((eic, epc, ekc, float(mass[sel].sum())))
            ei += eic
            ep += epc
            ek += ekc
        # mass-weighted mean gas temperature (stats.c:389-412); from
        # u and electron abundance via the cooling mean-weight formula
        gas_sel = valid & (ptype == 0)
        if self.sph is not None and np.any(gas_sel):
            from .utils import constants as C
            ne = np.asarray(self.sph.ne, np.float64)
            xh = C.HYDROGEN_MASSFRAC
            nh_frac = 4.0 / (1.0 + 3.0 * xh + 4.0 * xh * ne)
            uu = self.cfg.units.UnitInternalEnergy_in_cgs
            temp_p = (GAMMA_MINUS1 * C.PROTONMASS / C.BOLTZMANN
                      * nh_frac * u * uu)
            mg = mass[gas_sel].sum()
            cols[1] = float((mass[gas_sel] * temp_p[gas_sel]).sum()
                            / max(mg, 1e-300))
        row = [atime, cols[1], ei, ep, ek]
        for t in range(6):
            row += [comp[t][0], comp[t][1], comp[t][2]]
        row += [comp[t][3] for t in range(6)]
        os.makedirs(self.cfg.output_dir, exist_ok=True)
        with open(os.path.join(self.cfg.output_dir, "energy.txt"),
                  "a") as fh:
            fh.write(" ".join(f"{x:g}" for x in row) + "\n")
        return dict(EnergyInt=ei, EnergyPot=ep, EnergyKin=ek)

    def run_gravity_test(self):
        """Force-accuracy self-test (RestartFlag 99; runtests.c:50-97):
        TreePM short-range vs direct pairwise summation."""
        from .gravity.shortrange import direct_shortrange_pairwise
        from .gravity.treepm import TreeGravity
        self.compute_forces(measure_power=False)
        tg = self._tree_grav
        acc_tree = np.asarray(self.pdata.grav_accel)
        rs_inv = 1.0 / (2 * self.cfg.asmth * self.cfg.boxsize
                        / self.cfg.nmesh)
        rcut = self.cfg.rcut * self.cfg.asmth * self.cfg.boxsize \
            / self.cfg.nmesh
        acc_pair, _ = direct_shortrange_pairwise(
            self.pdata.ipos, self.pdata.mass, self.pdata.valid,
            self.cfg.boxsize, jnp.float32(rs_inv), jnp.float32(rcut),
            jnp.float32(1.0 / tg.softening))
        acc_pair = np.asarray(acc_pair) * self.CP.GravInternal
        valid = np.asarray(self.pdata.valid)
        err = np.linalg.norm(acc_tree - acc_pair, axis=1)[valid]
        ref = np.sqrt(np.mean(np.linalg.norm(acc_pair, axis=1)[valid]
                              ** 2))
        rel = err / (ref + 1e-30)
        stats = {"mean_rel_err": float(rel.mean()),
                 "max_rel_err": float(rel.max()),
                 "p99_rel_err": float(np.percentile(rel, 99))}
        print(f"Force accuracy: mean={stats['mean_rel_err']:.2e} "
              f"p99={stats['p99_rel_err']:.2e} "
              f"max={stats['max_rel_err']:.2e}")
        return stats

    # -- output --------------------------------------------------------

    def _species_extra_blocks(self, t, sel, atime):
        """Type-specific blocks for a boolean selection sel, driven by
        the declarative registry (petaio.c:992-1078 analog) plus the
        derived InternalEnergy block."""
        from .utils.constants import GAMMA_MINUS1
        from .io.registry import blocks_for_type
        extra = {}
        holders = {"pdata": self.pdata, "sph": self.sph,
                   "stars": self.stars, "bh": self.bh}
        for spec in blocks_for_type(t):
            holder = holders.get(spec.holder)
            if holder is None:
                continue
            arr = np.asarray(getattr(holder, spec.field))
            extra[spec.name] = arr[sel].astype(spec.dtype)
        if t == 0 and self.sph is not None:
            a3inv = 1.0 / atime ** 3
            ent = np.asarray(self.sph.entropy)[sel]
            rho = np.asarray(self.sph.density)[sel]
            u = ent / GAMMA_MINUS1 * np.maximum(
                rho * a3inv, 1e-30) ** GAMMA_MINUS1
            extra["InternalEnergy"] = u.astype("<f4")
        return extra

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
        pos = self._output_pos()
        vel = np.asarray(self.pdata.vel)
        mass = np.asarray(self.pdata.mass)
        pid = np.asarray(self.pdata.pid)
        pot = np.asarray(self.pdata.potential)
        if self.cfg.tree_grav_on and self._tree_grav is not None:
            # stored Potential = PM + short-range tree (the reference
            # adds the tree part on output, gravshort-tree.c:137)
            _, tree_pot = self._tree_grav.compute(
                self.pdata, return_potential=True)
            pot = pot + np.asarray(tree_pot)
        ntot = np.zeros(6, np.uint64)
        hubble = self.CP.hubble_function(atime)
        from .utils.constants import GAMMA_MINUS1
        for t in range(6):
            sel = valid & (ptype == t)
            ntot[t] = sel.sum()
            if ntot[t] == 0:
                continue
            extra = self._species_extra_blocks(t, sel, atime)
            extra["Potential"] = pot[sel].astype("<f4")
            # stripe count from the largest block (f8[3] positions),
            # petaio.c EnableAggregatedIO/BytesPerFile sizing
            nfile = max(1, int(np.ceil(
                int(ntot[t]) * 24 / self.cfg.bytes_per_file)))
            snap_io.write_species(
                bf, t, pos=pos[sel], vel=vel[sel], pid=pid[sel],
                mass=mass[sel], atime=atime, use_peculiar=True,
                extra=extra, Nfile=nfile)
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
        if getattr(self, "_nu_table_state", None) is not None:
            snap_io.write_neutrino_state(
                bf, self._nu_table_state.state_dict())
        with open(os.path.join(self.cfg.output_dir, "Snapshots.txt"),
                  "a") as fh:
            fh.write(f"{label:03d} {atime}\n")
        return path
