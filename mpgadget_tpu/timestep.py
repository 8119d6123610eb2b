"""Timestep criteria and timebin machinery.

Host-side policy (mirroring libgadget/timestep.c): the PM (long-range)
step from the max RMS displacement criterion (timestep.c:1220-1300), the
short-range gravity step from the acceleration criterion
(timestep.c:1063-1073), quantized onto the power-of-two integer
timeline.  Per-particle reductions run on device; the scalar policy runs
on host between jitted segments.
"""

from dataclasses import dataclass
import numpy as np
import jax
import jax.numpy as jnp

from .timeline import (TIMEBASE, round_down_power_of_two, get_timestep_bin,
                       dti_from_timebin)


@dataclass
class TimestepParams:
    ErrTolIntAccuracy: float = 0.02
    CourantFac: float = 0.15
    MaxRMSDisplacementFac: float = 0.2
    MaxSizeTimestep: float = 0.1
    MinSizeTimestep: float = 0.0
    ForceEqualTimesteps: bool = False


@jax.jit
def _vel_stats_by_type(vel, mass, ptype, valid):
    """Per-type sum v^2, count, min mass (get_long_range_timestep_dloga)."""
    v2 = jnp.sum(vel * vel, axis=-1)
    w = valid.astype(jnp.float32)
    tid = jnp.where(valid, ptype, 6)
    v_sum = jnp.zeros(7).at[tid].add(v2 * w)[:6]
    count = jnp.zeros(7).at[tid].add(w)[:6]
    min_mass = jnp.full(7, jnp.inf).at[tid].min(
        jnp.where(valid, mass, jnp.inf))[:6]
    return v_sum, count, min_mass


def get_long_range_timestep_dloga(pdata, CP, atime, asmth_len,
                                  par: TimestepParams,
                                  fast_particle_type=2,
                                  omega_per_type=None):
    """Max RMS displacement PM step (timestep.c:1246-1290).

    dloga = fac * H(a) * a^2 * min(asmth, dmean) / sqrt(<v^2>)
    per type; the minimum over non-fast types wins.
    """
    v_sum, count, min_mass = map(np.asarray, _vel_stats_by_type(
        pdata.vel, pdata.mass, pdata.ptype, pdata.valid))
    hubble = CP.hubble_function(atime)
    dloga = par.MaxSizeTimestep
    for t in range(6):
        if count[t] == 0:
            continue
        if omega_per_type is not None:
            omega = omega_per_type[t]
        else:
            omega = (min_mass[t] * count[t]
                     / (CP.RhoCrit * 1.0))  # caller should pass omegas
        if omega <= 0:
            continue
        dmean = (min_mass[t] / (omega * CP.RhoCrit)) ** (1.0 / 3)
        vrms = np.sqrt(v_sum[t] / count[t])
        if vrms <= 0:      # cold start: no displacement constraint
            continue
        d1 = (par.MaxRMSDisplacementFac * hubble * atime * atime
              * min(asmth_len, dmean) / vrms)
        if t != fast_particle_type and d1 < dloga:
            dloga = d1
    return max(dloga, par.MinSizeTimestep)


def get_pm_timestep_ti(dloga, timeline, times_ti_current, pm_kick_ti):
    """Quantize the PM dloga onto the integer timeline and cap at the
    next sync point (get_PM_timestep_ti, timestep.c:1281-1300)."""
    dti = timeline.dti_from_dloga(dloga, times_ti_current)
    dti = round_down_power_of_two(dti)
    nxt = timeline.find_next_sync_point(times_ti_current)
    if nxt is None:
        raise RuntimeError("Trying to go beyond the last sync point")
    dti_max = nxt.ti - pm_kick_ti
    return min(dti, dti_max)


@jax.jit
def _min_accel_dloga_sq(grav_accel, grav_pm, valid, atime, eta_eps,
                        hubble):
    """Per-particle gravity dloga^2 (get_timestep_gravity_dloga,
    timestep.c:1063-1073), reduced to the global min."""
    acc = (grav_accel + grav_pm) / (atime * atime)
    ac2 = jnp.sum(acc * acc, axis=-1)
    ac2 = jnp.maximum(ac2, 1e-60)
    dt2 = eta_eps / jnp.sqrt(ac2)  # dt^2 = 2 eta a eps / |acc|
    dloga2 = dt2 * hubble * hubble
    return jnp.min(jnp.where(valid, dloga2, jnp.inf))


def get_gravity_timestep_dloga(pdata, CP, atime, softening,
                               par: TimestepParams):
    """Minimum gravity-acceleration timestep over particles."""
    hubble = CP.hubble_function(atime)
    eta_eps = 2 * par.ErrTolIntAccuracy * atime * softening
    dloga2 = float(_min_accel_dloga_sq(
        pdata.grav_accel, pdata.grav_pm, pdata.valid,
        jnp.float32(atime), jnp.float32(eta_eps), jnp.float32(hubble)))
    return np.sqrt(max(dloga2, 0.0))


def gravity_timebins(pdata, CP, atime, softening, timeline, ti_current,
                     par: TimestepParams, dti_max):
    """Per-particle power-of-two timebins from the acceleration
    criterion (find_timesteps).  Returns int32 bins array (device)."""
    hubble = CP.hubble_function(atime)
    eta_eps = 2 * par.ErrTolIntAccuracy * atime * softening
    dloga_tick = timeline._interval_dloga(ti_current)
    return _assign_timebins(
        pdata.grav_accel, pdata.grav_pm, pdata.valid,
        jnp.float32(atime), jnp.float32(eta_eps), jnp.float32(hubble),
        jnp.float32(dloga_tick), jnp.int32(get_timestep_bin(dti_max)),
        jnp.float32(par.MaxSizeTimestep))


@jax.jit
def _assign_timebins(grav_accel, grav_pm, valid, atime, eta_eps, hubble,
                     dloga_tick, maxbin, max_dloga):
    acc = (grav_accel + grav_pm) / (atime * atime)
    ac = jnp.sqrt(jnp.maximum(jnp.sum(acc * acc, axis=-1), 1e-60))
    dloga = jnp.sqrt(eta_eps / ac) * hubble
    dloga = jnp.minimum(dloga, max_dloga)
    dti = dloga / dloga_tick
    # timebin = floor(log2(dti)), clamped to [1, maxbin]
    bins = jnp.floor(jnp.log2(jnp.maximum(dti, 2.0))).astype(jnp.int32)
    bins = jnp.clip(bins, 1, maxbin)
    return jnp.where(valid, bins, maxbin)


@jax.jit
def _particle_dloga(grav_accel, grav_pm, valid, is_gas, hsml, dt_hsml,
                    max_signal_vel, atime, eta_eps, hubble,
                    courant_fac, fac3, max_dloga):
    """Per-particle combined dloga: gravity acceleration criterion
    (timestep.c:1063-1073) + Courant/Hsml criteria for gas
    (timestep.c:1075-1090)."""
    acc = (grav_accel + grav_pm) / (atime * atime)
    ac = jnp.sqrt(jnp.maximum(jnp.sum(acc * acc, axis=-1), 1e-60))
    dloga = jnp.sqrt(eta_eps / ac) * hubble
    vsig = jnp.maximum(max_signal_vel, 1e-30)
    dt_c = 2.0 * courant_fac * atime * hsml / (fac3 * vsig)
    dt_h = courant_fac * atime * atime * jnp.abs(
        hsml / (dt_hsml + 1e-20))
    dloga_h = jnp.minimum(dt_c, dt_h) * hubble
    dloga = jnp.where(is_gas, jnp.minimum(dloga, dloga_h), dloga)
    return jnp.where(valid, jnp.minimum(dloga, max_dloga), max_dloga)


def assign_particle_bins(pdata, sph, gas_mask, CP, atime, softening,
                         timeline, ti_current, par: TimestepParams,
                         dti_max):
    """Per-particle power-of-two timebins (find_timesteps,
    timestep.c:298-503): gravity + hydro criteria, clamped to
    [1, bin(dti_max)].  Returns int32[N] bins (device)."""
    from .utils.constants import GAMMA
    hubble = CP.hubble_function(atime)
    eta_eps = 2 * par.ErrTolIntAccuracy * atime * softening
    fac3 = atime ** (3 * (1 - GAMMA) / 2.0)
    if sph is not None:
        msv, hsml, dt_hsml = (sph.max_signal_vel, pdata.hsml,
                              pdata.dt_hsml)
    else:
        z = jnp.zeros(pdata.capacity, jnp.float32)
        msv = hsml = dt_hsml = z
        gas_mask = jnp.zeros(pdata.capacity, bool)
    dloga = _particle_dloga(
        pdata.grav_accel, pdata.grav_pm, pdata.valid, gas_mask,
        hsml, dt_hsml, msv, jnp.float32(atime), jnp.float32(eta_eps),
        jnp.float32(hubble), jnp.float32(par.CourantFac),
        jnp.float32(fac3), jnp.float32(par.MaxSizeTimestep))
    dloga_tick = timeline._interval_dloga(ti_current)
    maxbin = get_timestep_bin(dti_max)
    dti = dloga / jnp.float32(dloga_tick)
    bins = jnp.floor(jnp.log2(jnp.maximum(dti, 2.0))).astype(jnp.int32)
    bins = jnp.clip(bins, 1, maxbin)
    return jnp.where(pdata.valid, bins, maxbin)
