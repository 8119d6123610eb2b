"""Quasar-driven helium (HeII -> HeIII) reionization.

TPU-native rebuild of the reference's QSO lightup model
(libgadget/cooling_qso_lightup.c:1-690, Upton-Sanderbeck et al. 2019):
quasars are placed in FOF halos within a mass window; each blows an
ionized bubble of Gaussian-distributed radius, flash-heating the gas
inside by the instantaneous short-mean-free-path photoheating Q_inst;
bubbles are added until the global HeIII fraction matches an external
reionization-history table.  A uniform long-mean-free-path heating rate
applies to not-yet-ionized gas.

The reference ionizes each bubble with a treewalk
(ionize_all_part/ionize_ngbiter); at one bubble per iteration a dense
minimum-image distance mask over all gas is simpler and faster on TPU
(one fused elementwise kernel per bubble), so no tree is used here.
"""

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import constants as C

E0_HEII = 54.4          # HeII ionization potential, eV
HEMASS = 4.002602       # amu
EV_IN_ERGS = 1.60217663e-12


@dataclass
class HeIIHistory:
    """Parsed reionization-history table (load_heii_reion_hist,
    cooling_qso_lightup.c:138-246): quasar spectral index, absorption
    threshold, and (a, XHeIII, LMFP heating) columns."""
    alpha_q: float
    emax: float
    atime: np.ndarray       # scale factor, ascending
    xheiii: np.ndarray      # target HeIII fraction
    lmfp: np.ndarray        # uniform heating, erg/s/cm^3 (proper)
    qso_inst_heating: float  # ergs per helium atom

    @property
    def zstart(self):
        return 1.0 / self.atime[0] - 1.0

    @property
    def aend(self):
        return self.atime[-1]


def q_inst(emax, alpha_q):
    """Instantaneous heat per ionization for E < Emax photons, ergs
    (Q_inst, cooling_qso_lightup.c:112-121)."""
    intflux = ((emax ** (-alpha_q + 1.0) - E0_HEII ** (-alpha_q + 1.0))
               / (emax ** -alpha_q - E0_HEII ** -alpha_q))
    return EV_IN_ERGS * ((alpha_q / (alpha_q - 1.0)) * intflux
                         - E0_HEII)


def load_heii_reion_hist(path) -> HeIIHistory:
    rows = []
    scalars = []
    with open(path) as fh:
        for line in fh:
            t = line.split()
            if not t or t[0].startswith("#"):
                continue
            if len(t) == 1:
                scalars.append(float(t[0]))
            else:
                rows.append([float(x) for x in t[:3]])
    if len(scalars) < 2 or len(rows) < 2:
        raise ValueError(f"Malformed HeII reionization table {path}")
    alpha_q, emax = scalars[0], scalars[1]
    arr = np.asarray(rows)
    a = 1.0 / (1.0 + arr[:, 0])
    order = np.argsort(a)
    return HeIIHistory(
        alpha_q=alpha_q, emax=emax, atime=a[order],
        xheiii=arr[order, 1], lmfp=arr[order, 2],
        qso_inst_heating=q_inst(emax, alpha_q))


@dataclass
class QSOParams:
    min_mass: float = 100.0      # QSOMinMass, 1e10 Msun/h
    max_mass: float = 1000.0     # QSOMaxMass
    mean_bubble: float = 20000.0  # internal length
    var_bubble: float = 0.0
    finish_frac: float = 0.995   # QSOHeIIIReionFinishFrac
    heiii_start: float = 4.0     # heIIIreion_start redshift
    unit_internal_energy_cgs: float = 1e10  # (km/s)^2 default units

    def with_units(self, uu_cgs):
        from dataclasses import replace
        return replace(self, unit_internal_energy_cgs=float(uu_cgs))


def desired_heiii_frac(hist: HeIIHistory, atime):
    return float(np.interp(atime, hist.atime, hist.xheiii))


def lmfp_heating(hist: Optional[HeIIHistory], params, atime):
    """Uniform long-mean-free-path heating rate erg/s/cm^3 at atime
    (get_long_mean_free_path_heating); 0 outside the table/epoch."""
    if hist is None:
        return 0.0
    z = 1.0 / atime - 1.0
    if z > params.heiii_start or atime > hist.aend:
        return 0.0
    return float(np.interp(atime, hist.atime, hist.lmfp))


@jax.jit
def _ionize_bubble(ipos, is_gas, ionized, density, entropy, center,
                   radius_box, du_code, a3inv):
    """Mark+heat un-ionized gas within radius of center (the
    ionize_ngbiter analog as one dense mask).  du_code: internal
    energy injection per unit mass, internal units."""
    d = (ipos.astype(jnp.float32) * jnp.float32(2.0 ** -32)
         - center[None, :])
    d = d - jnp.round(d)
    r2 = jnp.sum(d * d, axis=-1)
    hit = is_gas & (~ionized) & (r2 < radius_box * radius_box)
    entropytou = jnp.maximum(density * a3inv, 1e-30) \
        ** jnp.float32(C.GAMMA_MINUS1) / jnp.float32(C.GAMMA_MINUS1)
    new_ent = entropy + du_code / entropytou
    return (ionized | hit, jnp.where(hit, new_ent, entropy),
            jnp.sum(hit.astype(jnp.int32)))


def place_bubbles(ipos, gas, ionized, density, entropy, cat,
                  hist: HeIIHistory, params: QSOParams, atime,
                  boxsize, random_seed, output_dir, write=True):
    """Advance helium reionization one PM step on raw column arrays
    (do_heiii_reionization, cooling_qso_lightup.c:642-660): sequential
    QSO bubble placement around FOF halos until the desired HeIII
    fraction is met, or a flash-ionization past finish_frac.

    The arrays may be single-device or mesh-sharded jax Arrays — the
    kernel is elementwise + global reductions, so XLA partitions it
    (every process must participate in the host loop; the catalog and
    the RNG draws are identical on all ranks).  ``write`` gates the
    helium.txt append (rank 0 only under multi-host).

    Returns (ionized, entropy, nbub)."""
    import os
    desired = desired_heiii_frac(hist, atime)
    n_gas = int(jnp.sum(gas.astype(jnp.int32)))
    if n_gas == 0:
        return ionized, entropy, 0
    cur = float(jnp.sum((ionized & gas).astype(jnp.int32))) / n_gas
    uu = params.unit_internal_energy_cgs
    nheperg = (1.0 - C.HYDROGEN_MASSFRAC) / (C.PROTONMASS * HEMASS)
    du_code = jnp.float32(hist.qso_inst_heating * nheperg / uu)
    a3inv = jnp.float32(1.0 / atime ** 3)
    helium_txt = os.path.join(output_dir, "helium.txt")

    if desired > params.finish_frac:
        # flash-ionize everything left (turn_on_quasars:540-548)
        ion2, ent2, nion = _ionize_bubble(
            ipos, gas, ionized, density, entropy,
            jnp.zeros(3, jnp.float32), jnp.float32(2.0), du_code,
            a3inv)
        if write:
            with open(helium_txt, "a") as fh:
                fh.write(f"{atime:g} flash 0 0 0 1.0 {int(nion)}\n")
        return ion2, ent2, 1

    if cur >= desired:
        return ionized, entropy, 0
    masses = np.asarray(cat["masses"])
    cand = np.flatnonzero((masses > params.min_mass)
                          & (masses < params.max_mass))
    if cand.size == 0:
        return ionized, entropy, 0
    rng = np.random.RandomState(
        (random_seed + int(atime * 1e6)) % (2 ** 31 - 1))
    rng.shuffle(cand)
    nbub = 0
    for qidx in cand:
        if cur >= desired:
            break
        radius = params.mean_bubble
        if params.var_bubble > 0:
            radius = max(rng.normal(params.mean_bubble,
                                    np.sqrt(params.var_bubble)), 0.0)
        center = jnp.asarray(
            np.asarray(cat["cm"][qidx]) / boxsize % 1.0, jnp.float32)
        ionized, entropy, nion = _ionize_bubble(
            ipos, gas, ionized, density, entropy, center,
            jnp.float32(radius / boxsize), du_code, a3inv)
        nion = int(nion)
        cur += nion / n_gas
        nbub += 1
        pos = np.asarray(cat["cm"][qidx])
        if write:
            with open(helium_txt, "a") as fh:
                fh.write(f"{atime:g} {pos[0]:g} {pos[1]:g} "
                         f"{pos[2]:g} {cur:g} {nion}\n")
    return ionized, entropy, nbub


def do_heiii_reionization(sim, cat, hist: HeIIHistory,
                          params: QSOParams):
    """Advance helium reionization one PM step (do_heiii_reionization,
    cooling_qso_lightup.c:642-660).  cat: FOF catalog dict; mutates
    sim.sph (he_iii_ionized, entropy) and appends to helium.txt.

    Returns the number of bubbles placed."""
    atime = sim.atime
    if 1.0 / atime - 1.0 > params.heiii_start or atime > hist.aend:
        return 0
    par = params.with_units(sim.cfg.units.UnitInternalEnergy_in_cgs)
    ionized, entropy, nbub = place_bubbles(
        sim.pdata.ipos, sim.gas_mask, sim.sph.he_iii_ionized > 0,
        sim.sph.density, sim.sph.entropy, cat, hist, par, atime,
        sim.cfg.boxsize, sim.cfg.random_seed, sim.cfg.output_dir)
    sim.sph = sim.sph.replace(
        he_iii_ionized=ionized.astype(jnp.uint8), entropy=entropy)
    return nbub


def lmfp_heat_entropy(entropy, density, notion, rate, dt_s, atime,
                      units, hubble_param):
    """Entropy after uniform long-mean-free-path heating of the
    not-yet-ionized gas rows (pure array form; erg/s/cm^3 proper →
    internal entropy).  Works on single-device or sharded arrays."""
    rho_cgs = (density / atime ** 3 * units.UnitDensity_in_cgs
               * hubble_param ** 2)
    du_cgs = rate * dt_s / jnp.maximum(rho_cgs, 1e-35)
    du_code = du_cgs / units.UnitInternalEnergy_in_cgs
    entropytou = jnp.maximum(density / atime ** 3, 1e-30) \
        ** jnp.float32(C.GAMMA_MINUS1) / jnp.float32(C.GAMMA_MINUS1)
    return jnp.where(notion, entropy + du_code / entropytou,
                     entropy).astype(jnp.float32)


def apply_lmfp_heating(sim, hist: HeIIHistory, params: QSOParams,
                       dloga):
    """Uniform heating of NOT-yet-ionized gas by long-mean-free-path
    photons (applied in cooling_rates.c in the reference; here a
    separate entropy source term over the step)."""
    atime = sim.atime
    rate = lmfp_heating(hist, params, atime)   # erg/s/cm^3 proper
    if rate <= 0:
        return
    hubble = sim.CP.hubble_function(atime)
    dt_s = dloga / hubble * sim.cfg.units.UnitTime_in_s \
        / sim.CP.HubbleParam
    notion = sim.gas_mask & (sim.sph.he_iii_ionized == 0)
    sim.sph = sim.sph.replace(
        entropy=lmfp_heat_entropy(
            sim.sph.entropy, sim.sph.density, notion, rate, dt_s,
            atime, sim.cfg.units, sim.CP.HubbleParam))
