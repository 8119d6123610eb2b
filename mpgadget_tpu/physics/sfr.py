"""Star formation: Springel & Hernquist 2003 effective EOS.

Vectorized re-design of libgadget/sfr_eff.c: the multiphase subgrid
model (cold clouds + hot SN-heated phase in pressure equilibrium),
entropy relaxation onto the effective EOS, stochastic star spawning, and
the quick-Lyman-alpha wholesale conversion mode.  All per-particle math
runs as one vectorized pass; particle conversion/spawning uses the
fixed-capacity free rows of ParticleData (slots_split_particle /
slots_convert analog, slotsmanager.c:62-134).
"""

from dataclasses import dataclass, field
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import constants as C
from .cooling import CoolingRates, CoolingUnits, UVBG

METAL_YIELD = 0.02


@dataclass
class SFRParams:
    StarformationCriterion: int = 1   # density
    CritOverDensity: float = 57.7
    CritPhysDensity: float = 0.0
    FactorSN: float = 0.1
    FactorEVP: float = 1000.0
    TempSupernova: float = 1e8
    TempClouds: float = 1000.0
    MaxSfrTimescale: float = 1.5
    Generations: int = 4
    BoostSFDenseGas: bool = True
    BoostSFOverDenseFactor: float = 1000.0
    BHFeedbackUseTcool: int = 1
    QuickLymanAlphaProbability: float = 0.0
    QuickLymanAlphaTempThresh: float = 1e5
    WindOn: bool = False
    # derived (init_sfr)
    OverDensThresh: float = 0.0
    PhysDensThresh: float = 0.0
    EgySpecCold: float = 0.0
    EgySpecSN: float = 0.0
    temp_to_u: float = 0.0
    UnitSfr_in_solar_per_year: float = 1.0
    avg_baryon_mass: float = 0.0


def init_sfr(par: SFRParams, CP, units, cr: CoolingRates,
             cunits: CoolingUnits, avg_baryon_mass):
    """Derived thresholds (init_cooling_and_star_formation,
    sfr_eff.c:889-1000), including the self-consistent PhysDensThresh
    when CritPhysDensity == 0."""
    par.temp_to_u = (1.0 / C.GAMMA_MINUS1) * (C.BOLTZMANN / C.PROTONMASS) \
        / units.UnitInternalEnergy_in_cgs
    par.UnitSfr_in_solar_per_year = (units.UnitMass_in_g / C.SOLAR_MASS) \
        / (units.UnitTime_in_s / C.SEC_PER_YEAR)
    par.avg_baryon_mass = avg_baryon_mass
    par.OverDensThresh = par.CritOverDensity * CP.OmegaBaryon * CP.RhoCrit
    par.PhysDensThresh = (par.CritPhysDensity * C.PROTONMASS
                          / C.HYDROGEN_MASSFRAC
                          / units.UnitDensity_in_cgs)
    mw_neutral = 4.0 / (1 + 3 * C.HYDROGEN_MASSFRAC)
    par.EgySpecCold = par.temp_to_u / mw_neutral * par.TempClouds
    mw_ion = 4 / (8 - 5 * (1 - C.HYDROGEN_MASSFRAC))
    par.EgySpecSN = par.temp_to_u / mw_ion * par.TempSupernova

    if par.PhysDensThresh == 0:
        # self-consistent threshold at z=0 (sfr_eff.c:933-963)
        egyhot = par.EgySpecSN / par.FactorEVP
        u4 = par.temp_to_u / mw_ion * 1.0e4
        dens = 1.0e6 * CP.RhoCrit
        uvbg = UVBG()
        tcool = get_cooling_time(cr, 0.0, jnp.asarray([egyhot]),
                                 jnp.asarray([dens]), uvbg,
                                 jnp.asarray([1.0]), 0.0, cunits)
        tcool = float(tcool[0])
        coolrate = egyhot / tcool / dens
        x = (egyhot - u4) / (egyhot - par.EgySpecCold)
        par.PhysDensThresh = (
            x / (1 - x) ** 2
            * (par.FactorSN * par.EgySpecSN
               - (1 - par.FactorSN) * par.EgySpecCold)
            / (par.MaxSfrTimescale * coolrate))
    return par


def get_cooling_time(cr: CoolingRates, redshift, u, rho_phys, uvbg, ne,
                     Z, cunits: CoolingUnits):
    """GetCoolingTime (cooling.c:143-163), internal units, vectorized.
    Returns 0 where the gas is net heated."""
    rho_cgs = rho_phys * cunits.density_in_phys_cgs / C.PROTONMASS
    u_cgs = u * cunits.uu_in_cgs
    lam, _ = cr.get_heatingcooling_rate(rho_cgs, u_cgs, redshift, Z,
                                        uvbg, ne)
    tcool = jnp.where(lam < 0, u_cgs / jnp.maximum(-lam, 1e-60), 0.0)
    return tcool / cunits.tt_in_s


def entropy_to_u(density, a3inv):
    return (density * a3inv) ** C.GAMMA_MINUS1 / C.GAMMA_MINUS1


def sfreff_on_eeqos(par: SFRParams, density, delay_time, a3inv):
    """Which gas is on the effective EOS (sfr_eff.c:535-566)."""
    flag = (density * a3inv >= par.PhysDensThresh) \
        & (density >= par.OverDensThresh)
    return flag & (delay_time <= 0)


def get_sfr_eeqos(par: SFRParams, cr, cunits, density, ne, metallicity,
                  dtime, uvbg, redshift, a3inv, on_eeqos):
    """Multiphase model per particle (get_sfr_eeqos, sfr_eff.c:804-842).
    Returns dict: tsfr, egyhot, cloudfrac, trelax, ne."""
    rho_phys = density * a3inv
    ratio = rho_phys / par.PhysDensThresh
    tsfr = jnp.sqrt(1.0 / jnp.maximum(ratio, 1e-30)) * par.MaxSfrTimescale
    if par.BoostSFDenseGas:
        tsfr = jnp.where(ratio > par.BoostSFOverDenseFactor,
                         par.MaxSfrTimescale / jnp.maximum(ratio, 1e-30),
                         tsfr)
    tsfr = jnp.maximum(tsfr, dtime)
    factorEVP = jnp.maximum(ratio, 1e-30) ** -0.8 * par.FactorEVP
    egyhot = par.EgySpecSN / (1 + factorEVP) + par.EgySpecCold
    tcool = get_cooling_time(cr, redshift, egyhot, rho_phys, uvbg, ne,
                             metallicity, cunits)
    tcool = jnp.maximum(tcool, 1e-30)
    y = tsfr / tcool * egyhot / (par.FactorSN * par.EgySpecSN
                                 - (1 - par.FactorSN) * par.EgySpecCold)
    y = jnp.maximum(y, 1e-30)
    cloudfrac = 1 + 1 / (2 * y) - jnp.sqrt(1 / y + 1 / (4 * y * y))
    cloudfrac = jnp.clip(cloudfrac, 0.0, 1.0)
    trelax = tsfr * (1 - cloudfrac) / jnp.maximum(cloudfrac, 1e-10) \
        / (par.FactorSN * (1 + factorEVP))
    return {"tsfr": tsfr, "egyhot": egyhot, "cloudfrac": cloudfrac,
            "trelax": trelax,
            "egyeff": (par.EgySpecCold * cloudfrac
                       + (1 - cloudfrac) * egyhot)}


def cooling_and_starformation(par: SFRParams, cr, cunits, rng_key,
                              *, density, entropy, ne, metallicity,
                              delay_time, mass, pid, valid_gas,
                              redshift, atime, hubble, dloga, uvbg,
                              do_cooling_fn, min_egy_spec):
    """One Strang-split source step for all gas
    (cooling_and_starformation, sfr_eff.c:187-330): gas on the eEOS
    relaxes toward it and may spawn stars; other gas cools normally.

    do_cooling_fn(u, rho_phys, dt, ne, Z) -> (u_new, ne) is the plain
    cooling integrator.  Returns dict with new entropy, ne, sfr,
    metallicity, star conversion probability draws:
      star_mass (0 = no star), convert (bool: full conversion).
    """
    a3inv = 1.0 / atime ** 3
    # dloga may be per-particle (hierarchical bins close with their own
    # interval, timestep.c:298) or a scalar (global stepping)
    dtime = jnp.asarray(dloga, jnp.float32) / hubble
    rho_phys = density * a3inv
    on_eeqos = sfreff_on_eeqos(par, density, delay_time, a3inv) \
        & valid_gas

    enttou = entropy_to_u(density, a3inv)
    u_current = entropy * enttou

    # --- normal cooling branch ---
    u_cooled, ne_cooled = do_cooling_fn(
        u_current, rho_phys,
        jnp.broadcast_to(dtime, u_current.shape).astype(u_current.dtype),
        ne, metallicity)
    ent_cooled = u_cooled / jnp.maximum(enttou, 1e-30)

    # --- eEOS branch ---
    eeqos = get_sfr_eeqos(par, cr, cunits, density, ne, metallicity,
                          dtime, uvbg, redshift, a3inv, on_eeqos)
    # relax toward the effective EOS (cooling_relaxed, sfr_eff.c:667-702)
    egyeff = eeqos["egyeff"]
    ent_relaxed = (egyeff + (u_current - egyeff)
                   * jnp.exp(-dtime / jnp.maximum(eeqos["trelax"],
                                                  1e-30))) \
        / jnp.maximum(enttou, 1e-30)

    # star formation rate (get_starformation_rate_full)
    cloudmass = eeqos["cloudfrac"] * mass
    rate = (1 - par.FactorSN) * cloudmass \
        / jnp.maximum(eeqos["tsfr"], 1e-30)
    rate = jnp.where(on_eeqos, rate, 0.0)
    sm = rate * dtime
    p = sm / jnp.maximum(mass, 1e-30)
    frac = 1 - jnp.exp(-p)
    dM = mass * frac
    sfr = jnp.where(dtime > 0, dM / dtime, rate) \
        * par.UnitSfr_in_solar_per_year

    # metal enrichment of the gas itself (sfr_eff.c:772-774)
    k1, k2, k3 = jax.random.split(rng_key, 3)
    w = _id_uniform(k1, pid)
    met_new = metallicity + jnp.where(
        on_eeqos, w * METAL_YIELD * frac / par.Generations, 0.0)

    # stochastic star formation (starformation, sfr_eff.c:740-800)
    mass_of_star = jnp.minimum(mass, par.avg_baryon_mass
                               / par.Generations)
    prob = dM / jnp.maximum(mass_of_star, 1e-30)
    draw = _id_uniform(k2, pid + 1)
    make_star = on_eeqos & (draw < prob)

    if par.QuickLymanAlphaProbability > 0:
        # quicklyastarformation (sfr_eff.c:707-738)
        mw_ion = 4 / (8 - 5 * (1 - C.HYDROGEN_MASSFRAC))
        temp = u_current * mw_ion / par.temp_to_u
        qla = valid_gas & (density > par.OverDensThresh) \
            & (temp < par.QuickLymanAlphaTempThresh) \
            & (_id_uniform(k3, pid + 1) < par.QuickLymanAlphaProbability)
        make_star = qla
        mass_of_star = mass  # wholesale conversion

    convert = make_star & (mass_of_star >= 0.995 * mass)

    entropy_new = jnp.where(on_eeqos, ent_relaxed,
                            jnp.where(valid_gas, ent_cooled, entropy))
    ne_new = jnp.where(valid_gas & ~on_eeqos, ne_cooled, ne)
    return {"entropy": entropy_new, "ne": ne_new,
            "sfr": jnp.where(valid_gas, sfr, 0.0),
            "metallicity": jnp.where(valid_gas, met_new, metallicity),
            "make_star": make_star, "convert": convert,
            "star_mass": jnp.where(make_star, mass_of_star, 0.0),
            "sm": jnp.where(on_eeqos, dM, 0.0),
            "on_eeqos": on_eeqos}


def _id_uniform(key, pid):
    """Deterministic per-ID uniform deviate (the RandTable analog,
    utils/system.c RNG: reproducible by particle ID)."""
    folded = jax.random.fold_in(key, 0)
    bits = jax.random.bits(folded, (1,), jnp.uint32)[0]
    h = (pid.astype(jnp.uint32) * jnp.uint32(2654435761)) ^ bits
    h = (h ^ (h >> jnp.uint32(16))) * jnp.uint32(0x45d9f3b)
    h = h ^ (h >> jnp.uint32(16))
    return h.astype(jnp.float32) * jnp.float32(2.0 ** -32)


def spawn_stars(pdata, sph, make_star, convert, star_mass, atime,
                stars=None, vdisp=None):
    """Create star particles (make_particle_star + slots_split_particle
    analog): full conversions flip ptype in place; partial conversions
    claim invalid rows for the new star and reduce the gas mass.

    stars: optional StarData (aligned) — new star rows get birth
    density/metallicity from the source gas and formation_time = atime
    (starslots init, sfr_eff.c get_star_slot analog).

    Returns (pdata, sph, stars, n_spawned, overflow)."""
    n = pdata.capacity
    # full conversions: flip type
    ptype = jnp.where(convert, 4, pdata.ptype)
    # partial: allocate free rows
    spawn = make_star & (~convert)
    free = ~pdata.valid
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # rank among free
    free_idx_of_rank = jnp.argsort(~free, stable=True)  # free rows first
    spawn_rank = jnp.cumsum(spawn.astype(jnp.int32)) - 1
    nspawn = jnp.sum(spawn.astype(jnp.int32))
    nfree = jnp.sum(free.astype(jnp.int32))
    overflow = nspawn > nfree
    # destination row for each spawning gas particle
    dest = free_idx_of_rank[jnp.clip(spawn_rank, 0, n - 1)]
    dest = jnp.where(spawn & (spawn_rank < nfree), dest, n)  # drop mode

    def scatter(arr, vals):
        return arr.at[dest].set(vals, mode="drop")

    new_mass = jnp.where(spawn, pdata.mass - star_mass, pdata.mass)
    pdata = pdata.replace(
        ptype=scatter(ptype, jnp.full(n, 4, jnp.int32)),
        ipos=pdata.ipos.at[dest].set(pdata.ipos, mode="drop"),
        vel=pdata.vel.at[dest].set(pdata.vel, mode="drop"),
        # spawned stars inherit the parent gas kernel size
        # (slots_split_particle copies the whole particle incl. Hsml,
        # slotsmanager.c:105) — winds-of-new-stars uses it as the kick
        # radius
        hsml=pdata.hsml.at[dest].set(pdata.hsml, mode="drop"),
        dt_hsml=pdata.dt_hsml.at[dest].set(pdata.dt_hsml, mode="drop"),
        mass=scatter(new_mass, star_mass),
        pid=pdata.pid.at[dest].set(
            pdata.pid + jnp.int64(2 ** 40), mode="drop"),
        valid=pdata.valid.at[dest].set(spawn, mode="drop"),
        timebin=scatter(pdata.timebin, pdata.timebin),
        grav_accel=pdata.grav_accel.at[dest].set(pdata.grav_accel,
                                                 mode="drop"),
        grav_pm=pdata.grav_pm.at[dest].set(pdata.grav_pm, mode="drop"),
    )
    if stars is not None:
        new_star = make_star  # source rows (converted keep their row)
        atime_f = jnp.float32(atime)

        def fill(field, vals):
            # converted rows in place, spawned rows at dest
            out = jnp.where(convert, vals, field) if vals.ndim == 1 \
                else jnp.where(convert[:, None], vals, field)
            return out.at[dest].set(vals, mode="drop")

        stars = stars.replace(
            formation_time=fill(stars.formation_time,
                                jnp.where(new_star, atime_f, 0.0)),
            birth_density=fill(stars.birth_density,
                               jnp.where(new_star, sph.density, 0.0)),
            metallicity=fill(stars.metallicity,
                             jnp.where(new_star, sph.metallicity, 0.0)),
            metals=fill(stars.metals,
                        jnp.where(new_star[:, None], sph.metals, 0.0)),
            total_mass_returned=fill(stars.total_mass_returned,
                                     jnp.zeros_like(star_mass)),
            last_enrichment_myr=fill(stars.last_enrichment_myr,
                                     jnp.zeros_like(star_mass)),
            vdisp=(fill(stars.vdisp, jnp.where(new_star, vdisp, 0.0))
                   if vdisp is not None else stars.vdisp),
        )
    # mask of rows that ARE new stars after the scatters (converted
    # rows in place, spawned rows at dest)
    new_star_rows = jnp.zeros(n, bool).at[dest].set(
        spawn, mode="drop") | convert
    # converted star keeps sph data frozen (ignored for type 4)
    return pdata, sph, stars, nspawn, overflow, new_star_rows
