"""Radiative cooling & heating: primordial H/He rate network + UVB.

Vectorized jnp re-design of libgadget/cooling_rates.c + cooling.c: the
reference solves the ionization network per particle with Steffensen
iteration and integrates du implicitly with a bracketing bisection; here
both solvers run as fixed-count vectorized iterations over all gas
particles at once (embarrassingly parallel — ideal for the TPU VPU).

Rate options follow the reference:
* recombination: Cen92 / Verner96 (default) / Badnell06
  (cooling_rates.c:480-650)
* cooling: KWH92 / Enzo2Nyx / Sherwood (default)
  (cooling_rates.c:850-1050)
* UVB photoionization/heating from a TreeCool table interpolated in
  log10(1+z); Rahmati-Schaye 2013 self-shielding (:345-450).
"""

from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import constants as C

# enum values match params.py
KWH92, ENZO2NYX, SHERWOOD = 0, 1, 2
CEN92, VERNER96, BADNELL06 = 0, 1, 2

# Gray opacity table for self-shielding (Rahmati 2012, cooling_rates.c
# GrayOpac): redshifts 0..9, cm^2
GRAYOPAC_Z = np.arange(10.0)
GRAYOPAC = np.array([2.59e-18, 2.37e-18, 2.27e-18, 2.15e-18, 2.02e-18,
                     1.94e-18, 1.82e-18, 1.71e-18, 1.60e-18, 1.60e-18])


@dataclass
class CoolingParams:
    recomb: int = VERNER96
    cooling: int = SHERWOOD
    SelfShieldingOn: bool = True
    PhotoIonizationOn: bool = True
    PhotoIonizeFactor: float = 1.0
    MinGasTemp: float = 5.0
    CMBTemperature: float = 2.7255
    fBar: float = 0.17
    HeliumHeatOn: bool = False
    HeliumHeatThresh: float = 10.0
    HeliumHeatAmp: float = 1.0
    HeliumHeatExp: float = 0.0
    rho_crit_baryon: float = 0.0455 * 1.8788e-29  # cgs, overridden
    UVRedshiftThreshold: float = -1.0


@dataclass
class UVBG:
    """Photoionization (1/s) and heating (erg/s) rates + self-shielding
    density; scalars for the global background."""
    gJH0: float = 0.0
    gJHe0: float = 0.0
    gJHep: float = 0.0
    epsH0: float = 0.0
    epsHe0: float = 0.0
    epsHep: float = 0.0
    self_shield_dens: float = 1e10


class TreeCool:
    """TreeCool table: log10(1+z), Gamma_HI/HeI/HeII [1/s],
    Qdot_HI/HeI/HeII [erg/s] (cooling_rates.c:130-180)."""

    def __init__(self, path: Optional[str], params: CoolingParams):
        self.par = params
        if not path:
            self.table = None
            return
        rows = []
        with open(path) as fh:
            for line in fh:
                t = line.split()
                if not t or t[0].startswith("#"):
                    continue
                rows.append([float(x) for x in t[:7]])
        self.table = np.array(rows)

    def get_global_uvbg(self, redshift) -> UVBG:
        """get_global_UVBG (cooling_rates.c:365-397)."""
        par = self.par
        if (self.table is None or not par.PhotoIonizationOn
                or (par.UVRedshiftThreshold >= 0
                    and redshift > par.UVRedshiftThreshold)):
            return UVBG()
        lzp = np.log10(1 + redshift)
        tab = self.table
        if lzp > tab[-1, 0]:
            return UVBG()  # before the UVB switches on

        def interp(col):
            vals = tab[:, col]
            good = vals > 0
            if not np.any(good):
                return 0.0
            lv = np.interp(lzp, tab[good, 0], np.log10(vals[good]))
            return float(10.0 ** lv)

        fac = par.PhotoIonizeFactor
        uv = UVBG(gJH0=interp(1) * fac, gJHe0=interp(2) * fac,
                  gJHep=interp(3) * fac, epsH0=interp(4) * fac,
                  epsHe0=interp(5) * fac, epsHep=interp(6) * fac)
        uv.self_shield_dens = self_shield_dens(redshift, uv, par)
        return uv


def self_shield_dens(redshift, uvbg: UVBG, par: CoolingParams):
    """Rahmati 2012 self-shielding density, atoms/cm^3
    (get_self_shield_dens, cooling_rates.c:345-361)."""
    if uvbg.gJH0 == 0:
        return 1e10
    G12 = uvbg.gJH0 / 1e-12
    greyopac = np.interp(np.clip(redshift, 0, 9), GRAYOPAC_Z, GRAYOPAC)
    return float(6.73e-3 * (greyopac / 2.49e-18) ** (-2.0 / 3)
                 * G12 ** (2.0 / 3) * (par.fBar / 0.17) ** (-1.0 / 3))


# ---- rate coefficient formulas (vectorized over temp) -----------------

def _verner96(temp, aa, bb, t0, t1):
    s0 = jnp.sqrt(temp / t0)
    s1 = jnp.sqrt(temp / t1)
    return aa / (s0 * (1 + s0) ** (1 - bb) * (1 + s1) ** (1 + bb))


def _voronov96(temp, dE, PP, AA, XX, KK):
    UU = dE / (C.BOLEVK * temp)
    return AA * (1 + PP * jnp.sqrt(UU)) / (XX + UU) * UU ** KK \
        * jnp.exp(-jnp.minimum(UU, 70.0))


def make_rates(par: CoolingParams):
    """Build the rate-function dict for the chosen tables."""
    r = par.recomb
    cmode = par.cooling

    def alphaHp(T):
        if r == CEN92:
            return 8.4e-11 / jnp.sqrt(T) / (T / 1000) ** 0.2 \
                / (1 + (T / 1e6) ** 0.7)
        if r == VERNER96:
            return _verner96(T, 7.982e-11, 0.748, 3.148, 7.036e5)
        return _verner96(T, 8.318e-11, 0.7472, 2.965, 7.001e5)

    def alphaHep(T):
        if r == CEN92:
            return 1.5e-10 / T ** 0.6353
        if r == VERNER96:
            low = _verner96(T, 3.294e-11, 0.6910, 1.554e1, 3.676e7)
            high = _verner96(T, 9.356e-10, 0.7892, 4.266e-2, 4.677e6)
            lo, hi = 6e5, 8e5
            interp = (low * (hi - T) + high * (T - lo)) / (hi - lo)
            return jnp.where(T < lo, low, jnp.where(T > hi, high, interp))
        return _verner96(T, 1.818e-10, 0.7492, 10.17, 2.786e6)

    def alphad(T):
        if r == CEN92:
            return 1.9e-3 / T ** 1.5 * jnp.exp(-4.7e5 / T) \
                * (1 + 0.3 * jnp.exp(-9.4e4 / T))
        return 1.23e-3 / T ** 1.5 * jnp.exp(-4.72e5 / T) \
            * (1 + 0.3 * jnp.exp(-9.4e4 / T))

    def alphaHepd(T):
        return alphad(T) + alphaHep(T)

    def alphaHepp(T):
        if r == CEN92:
            return 4 * alphaHp(T)
        if r == VERNER96:
            return _verner96(T, 1.891e-10, 0.7524, 9.370, 2.774e6)
        return _verner96(T, 5.235e-11,
                         0.6988 + 0.0829 * jnp.exp(-1.682e5 / T),
                         7.301, 4.475e6)

    def GammaeH0(T):
        if r == CEN92:
            return 5.85e-11 * jnp.sqrt(T) * jnp.exp(-157809.1 / T) \
                / (1 + jnp.sqrt(T / 1e5))
        return _voronov96(T, 13.6, 0, 0.291e-07, 0.232, 0.39)

    def GammaeHe0(T):
        if r == CEN92:
            return 2.38e-11 * jnp.sqrt(T) * jnp.exp(-285335.4 / T) \
                / (1 + jnp.sqrt(T / 1e5))
        return _voronov96(T, 24.6, 0, 0.175e-07, 0.180, 0.35)

    def GammaeHep(T):
        if r == CEN92:
            return 5.68e-12 * jnp.sqrt(T) * jnp.exp(-631515.0 / T) \
                / (1 + jnp.sqrt(T / 1e5))
        return _voronov96(T, 54.4, 1, 0.205e-08, 0.265, 0.25)

    def t5(T):
        t0 = 1e5 if cmode == KWH92 else 5e7
        return 1 + jnp.sqrt(T / t0)

    def collisH0(T):
        excite = 7.5e-19 * jnp.exp(-118348.0 / T) / t5(T)
        ionize = 13.5984 * C.EV_IN_ERGS * GammaeH0(T)
        if cmode == ENZO2NYX:
            y = jnp.log(T)
            Ryd = 2.1798741e-11
            tot = -0.75 / C.BOLTZMANN * Ryd / T
            low = [213.7913, 113.9492, 25.06062, 2.762755, 0.1515352,
                   3.290382e-3]
            high = [271.25446, 98.019455, 14.00728, 0.9780842,
                    3.356289e-2, 4.553323e-4]
            for j in range(6):
                tot = tot + jnp.where(T < 1e5, low[j], high[j]) \
                    * (-y) ** j
            return 1e-20 * jnp.exp(tot)
        return excite + ionize

    def collisHe0(T):
        return (9.1e-27 * T ** -0.1687 * jnp.exp(-473638.0 / T) / t5(T)
                + 24.5874 * C.EV_IN_ERGS * GammaeHe0(T))

    def collisHeP(T):
        return (5.54e-17 * T ** -0.397 * jnp.exp(-473638.0 / T) / t5(T)
                + 54.417760 * C.EV_IN_ERGS * GammaeHep(T))

    def recombHp(T):
        if cmode == ENZO2NYX:
            return 2.851e-27 * jnp.sqrt(T) * (
                5.914 - 0.5 * jnp.log(T) + 0.01184 * T ** (1.0 / 3))
        return 0.75 * C.BOLTZMANN * T * alphaHp(T)

    def recombHeP(T):
        return 0.75 * C.BOLTZMANN * T * alphaHep(T) \
            + 6.526e-11 * alphad(T)

    def recombHePP(T):
        if cmode == ENZO2NYX:
            return 1.140e-26 * jnp.sqrt(T) * (
                6.607 - 0.5 * jnp.log(T) + 7.459e-3 * T ** (1.0 / 3))
        return 0.75 * C.BOLTZMANN * T * alphaHepp(T)

    def freefree(T, zz):
        if cmode == ENZO2NYX:
            lt = 2 * jnp.log10(T / zz)
            gff = jnp.where(lt <= np.log10(3.2e5),
                            0.79464 + 0.1243 * lt, 2.13164 - 0.1240 * lt)
        else:
            gff = 1.1 + 0.34 * jnp.exp(-(5.5 - jnp.log10(T)) ** 2 / 3.0)
        return 1.426e-27 * jnp.sqrt(T) * zz ** 2 * gff

    return dict(alphaHp=alphaHp, alphaHepd=alphaHepd,
                alphaHepp=alphaHepp, GammaeH0=GammaeH0,
                GammaeHe0=GammaeHe0, GammaeHep=GammaeHep,
                collisH0=collisH0, collisHe0=collisHe0,
                collisHeP=collisHeP, recombHp=recombHp,
                recombHeP=recombHeP, recombHePP=recombHePP,
                freefree=freefree)


class MetalCoolingTable:
    """Cloudy net metal cooling at solar metallicity on a uniform
    (redshift, log10 nH, log10 T) grid (InitMetalCooling /
    TableMetalCoolingRate, cooling_uvfluc.c:266-323).

    Multilinear interpolation with edge clamping, vectorized over
    particles.  Table values are erg cm^3/s per proton at 1 Zsun.
    """

    def __init__(self, zbins, lognh_bins, logt_bins, table):
        self.mins = jnp.asarray(
            [zbins[0], lognh_bins[0], logt_bins[0]], jnp.float32)
        self.maxs = jnp.asarray(
            [zbins[-1], lognh_bins[-1], logt_bins[-1]], jnp.float32)
        self.dims = (len(zbins), len(lognh_bins), len(logt_bins))
        self.table = jnp.asarray(
            np.asarray(table).reshape(self.dims), jnp.float32)

    @classmethod
    def from_file(cls, path):
        """Read the reference's bigfile layout (read_big_array)."""
        from ..io.bigfile import BigFile
        bf = BigFile(path)
        met = bf.open("MetallicityInSolar_bins").read()
        if len(met) != 1 or met[0] != 0.0:
            raise ValueError(f"MetalCool file {path} wrongly tabulated")
        return cls(bf.open("Redshift_bins").read(),
                   bf.open("HydrogenNumberDensity_bins").read(),
                   bf.open("Temperature_bins").read(),
                   bf.open("NetCoolingRate").read())

    def __call__(self, redshift, nh, temp):
        x = jnp.stack(jnp.broadcast_arrays(
            jnp.asarray(redshift, jnp.float32),
            jnp.log10(jnp.maximum(nh, 1e-30)).astype(jnp.float32),
            jnp.log10(jnp.maximum(temp, 1.0)).astype(jnp.float32)),
            axis=-1)
        dims = jnp.asarray(self.dims, jnp.float32)
        step = (self.maxs - self.mins) / (dims - 1)
        f = jnp.clip((x - self.mins) / step, 0.0, dims - 1)
        i0 = jnp.clip(f.astype(jnp.int32),
                      0, jnp.asarray(self.dims, jnp.int32) - 2)
        w = f - i0
        out = jnp.zeros(x.shape[:-1], jnp.float32)
        for corner in range(8):
            bits = jnp.asarray([(corner >> 2) & 1, (corner >> 1) & 1,
                                corner & 1], jnp.int32)
            idx = i0 + bits
            wt = jnp.prod(jnp.where(bits > 0, w, 1.0 - w), axis=-1)
            out = out + wt * self.table[idx[..., 0], idx[..., 1],
                                        idx[..., 2]]
        return out


class UVFluctuationTable:
    """Patchy (non-uniform) reionization: a gridded reionization
    redshift z_reion(x) (init_uvf_table / get_local_UVBG_from_global,
    cooling_uvfluc.c:114-195).  Gas at z > z_reion(x) sees no UV
    background.  Periodic trilinear interpolation over an Nside^3
    C-ordered table; fixed-point positions make the periodic wrap a
    uint32 overflow."""

    def __init__(self, nside, table, median_zreion=None):
        self.nside = int(nside)
        self.table = jnp.asarray(
            np.asarray(table).reshape((self.nside,) * 3), jnp.float32)
        self.median_zreion = median_zreion

    @classmethod
    def from_file(cls, path, boxsize_internal, unitlength_in_cm):
        """Read the reference layout: Zreion_Table block with attrs
        Nmesh (u8), BoxSize (f8, Mpc/h), Redshift (f8)."""
        from ..io.bigfile import BigFile
        bf = BigFile(path)
        blk = bf.open("Zreion_Table")
        nside = int(np.asarray(blk.attrs["Nmesh"])[0])
        tbox = float(np.asarray(blk.attrs["BoxSize"])[0])
        zre = float(np.asarray(blk.attrs["Redshift"])[0])
        box_mpc = boxsize_internal * unitlength_in_cm / C.CM_PER_MPC
        if abs(tbox - box_mpc) > box_mpc * 1e-5:
            raise ValueError(
                f"UV fluctuation file {path} is for box "
                f"{tbox} Mpc/h, current box is {box_mpc} Mpc/h")
        return cls(nside, blk.read(), median_zreion=zre)

    def zreion(self, ipos):
        """z_reion at fixed-point positions, periodic trilinear."""
        ns = self.nside
        f = ipos.astype(jnp.float32) * jnp.float32(ns * 2.0 ** -32)
        i0 = jnp.floor(f).astype(jnp.int32)
        w = f - i0
        out = jnp.zeros(ipos.shape[0], jnp.float32)
        for corner in range(8):
            bits = jnp.asarray([(corner >> 2) & 1, (corner >> 1) & 1,
                                corner & 1], jnp.int32)
            idx = (i0 + bits) % ns
            wt = jnp.prod(jnp.where(bits > 0, w, 1.0 - w), axis=-1)
            out = out + wt * self.table[idx[..., 0], idx[..., 1],
                                        idx[..., 2]]
        return out


def local_uvbg(global_uvbg: UVBG, zreion_vals, redshift) -> UVBG:
    """Per-particle UVBG: zero rates where the local patch has not yet
    reionized (get_local_UVBG_from_global, cooling_uvfluc.c:174-196)."""
    on = (zreion_vals >= redshift).astype(jnp.float32)
    return UVBG(gJH0=global_uvbg.gJH0 * on,
                gJHe0=global_uvbg.gJHe0 * on,
                gJHep=global_uvbg.gJHep * on,
                epsH0=global_uvbg.epsH0 * on,
                epsHe0=global_uvbg.epsHe0 * on,
                epsHep=global_uvbg.epsHep * on,
                self_shield_dens=global_uvbg.self_shield_dens)


class CoolingRates:
    """Vectorized network: all inputs/outputs are jnp arrays (per
    particle).  density in protons/cm^3, ienergy in erg/g."""

    def __init__(self, params: CoolingParams, treecool: TreeCool,
                 metal_table=None):
        self.par = params
        self.treecool = treecool
        self.rates = make_rates(params)
        self.helium = 1 - C.HYDROGEN_MASSFRAC
        self.metal_table = metal_table

    def get_temp_internal(self, nebynh, ienergy, helium):
        hy_mass = 1 - helium
        mui = 4 / (hy_mass * (3 + 4 * nebynh) + 1) * ienergy
        temp = C.GAMMA_MINUS1 * C.PROTONMASS / C.BOLTZMANN * mui
        return jnp.maximum(temp, self.par.MinGasTemp)

    def _self_shield_corr(self, nh, temp, ssdens):
        if not self.par.SelfShieldingOn:
            return jnp.ones_like(nh)
        T4 = (temp / 1e4) ** 0.17
        nSSh = 1.003 * ssdens * T4
        corr = (0.98 * (1 + (nh / nSSh) ** 1.64) ** -2.28
                + 0.02 * (1 + nh / nSSh) ** -0.84)
        return jnp.where(nh < ssdens * 0.01, 1.0, corr)

    def _network(self, nh, temp, ne, uvbg: UVBG, photofac):
        """Ion fractions at given ne (cgs); returns (nH0, nHp per nH;
        He fractions per nHe... as in nHe_internal)."""
        R = self.rates
        safe_ne = jnp.maximum(ne, 1e-50)
        photoH = jnp.where(ne > 1e-50,
                           uvbg.gJH0 / safe_ne * photofac, 0.0)
        aHp = R["alphaHp"](temp)
        gH0 = R["GammaeH0"](temp)
        nH0 = aHp / (aHp + gH0 + photoH)
        nHp = jnp.maximum(1.0 - nH0, 0.0)
        aHep = R["alphaHepd"](temp)
        aHepp = R["alphaHepp"](temp)
        gHe0 = R["GammaeHe0"](temp) + jnp.where(
            ne > 1e-50, uvbg.gJHe0 / safe_ne * photofac, 0.0)
        gHep = R["GammaeHep"](temp) + jnp.where(
            ne > 1e-50, uvbg.gJHep / safe_ne * photofac, 0.0)
        nHep = jnp.where(gHe0 > 1e-50,
                         nh / (1 + aHep / jnp.maximum(gHe0, 1e-50)
                               + gHep / aHepp), 0.0)
        nHe0 = jnp.where(gHe0 > 1e-50,
                         nHep * aHep / jnp.maximum(gHe0, 1e-50), nh)
        nHepp = jnp.where(gHe0 > 1e-50, nHep * gHep / aHepp, 0.0)
        return nH0, nHp, nHe0, nHep, nHepp

    def _ne_internal(self, nh, ienergy, ne, helium, uvbg):
        yy = helium / 4 / (1 - helium)
        temp = self.get_temp_internal(ne / nh, ienergy, helium)
        photofac = self._self_shield_corr(nh, temp,
                                          uvbg.self_shield_dens)
        nH0, nHp, nHe0, nHep, nHepp = self._network(
            nh, temp, ne, uvbg, photofac)
        return nh * nHp + yy * nHep + 2 * yy * nHepp

    def get_equilib_ne(self, density, ienergy, uvbg, ne_init,
                       helium=None, iters=30):
        """Fixed-point ne solve, vectorized (scipy_optimize_fixed_point
        analog with Steffensen acceleration)."""
        helium = self.helium if helium is None else helium
        nh = density * (1 - helium)
        ne0 = jnp.where(ne_init <= 0, 1.0, ne_init)
        dtype = jnp.result_type(ne0, nh)
        ne0 = ne0.astype(dtype)

        def body(i, ne0):
            ne1 = self._ne_internal(nh, ienergy, ne0 * nh, helium,
                                    uvbg) / nh
            ne2 = self._ne_internal(nh, ienergy, ne1 * nh, helium,
                                    uvbg) / nh
            d = ne0 + ne2 - 2.0 * ne1
            pp = jnp.where(jnp.abs(d) > 1e-15,
                           ne0 - (ne1 - ne0) ** 2
                           / jnp.where(jnp.abs(d) > 1e-15, d, 1.0), ne2)
            return jnp.maximum(pp, 0.0).astype(dtype)

        ne = jax.lax.fori_loop(0, iters, body, ne0)
        return ne * nh

    def get_heatingcooling_rate(self, density, ienergy, redshift,
                                metallicity, uvbg, ne_init,
                                helium=None):
        """Net (heating - cooling) in erg/s/g, + equilibrium ne/nh
        (get_heatingcooling_rate, cooling_rates.c:1249-1310)."""
        helium = self.helium if helium is None else helium
        R = self.rates
        ne = self.get_equilib_ne(density, ienergy, uvbg, ne_init,
                                 helium)
        nh = density * (1 - helium)
        nebynh = ne / nh
        temp = self.get_temp_internal(nebynh, ienergy, helium)
        photofac = self._self_shield_corr(nh, temp,
                                          uvbg.self_shield_dens)
        yy = helium / 4 / (1 - helium)
        nH0, nHp, nHe0, nHep, nHepp = self._network(
            nh, temp, ne, uvbg, photofac)
        nHe0 = nHe0 * yy / nh
        nHep = nHep * yy / nh
        nHepp = nHepp * yy / nh
        LambdaCollis = nebynh * (R["collisH0"](temp) * nH0
                                 + R["collisHe0"](temp) * nHe0
                                 + R["collisHeP"](temp) * nHep)
        LambdaRecomb = nebynh * (R["recombHp"](temp) * nHp
                                 + R["recombHeP"](temp) * nHep
                                 + R["recombHePP"](temp) * nHepp)
        cff = R["freefree"](temp, 1)
        if self.par.cooling == ENZO2NYX:
            LambdaFF = nebynh * (cff * (nHp + nHep)
                                 + R["freefree"](temp, 2) * nHepp)
        else:
            LambdaFF = nebynh * (cff * (nHp + nHep) + 4 * cff * nHepp)
        tcmb = self.par.CMBTemperature * (1 + redshift)
        LambdaCmptn = nebynh * (4 * C.THOMPSON * C.RAD_CONST
                                / (C.ELECTRONMASS * C.LIGHTCGS)
                                * tcmb ** 4 * C.BOLTZMANN
                                * (temp - tcmb)) / nh
        Lambda = LambdaCollis + LambdaRecomb + LambdaFF + LambdaCmptn
        Heat = (nH0 * uvbg.epsH0 + nHe0 * uvbg.epsHe0
                + nHep * uvbg.epsHep) / nh
        if self.par.HeliumHeatOn:
            rho = C.PROTONMASS * density / (1 - helium)
            overden = jnp.minimum(
                rho / (self.par.rho_crit_baryon * (1 + redshift) ** 3),
                self.par.HeliumHeatThresh)
            Heat = Heat * self.par.HeliumHeatAmp \
                * overden ** self.par.HeliumHeatExp
        LambdaNet = Heat - Lambda
        if self.metal_table is not None:
            # cloudy net metal cooling at 1 Zsun, scaled linearly by the
            # particle metallicity (cooling_rates.c:1300-1303)
            LambdaNet = LambdaNet - metallicity * self.metal_table(
                redshift, nh, temp)
        return (LambdaNet * (1 - helium) ** 2 * density / C.PROTONMASS,
                nebynh)

    def get_temp(self, density, ienergy, uvbg, ne_init, helium=None):
        helium = self.helium if helium is None else helium
        ne = self.get_equilib_ne(density, ienergy, uvbg, ne_init,
                                 helium)
        nh = density * (1 - helium)
        return self.get_temp_internal(ne / nh, ienergy, helium)

    def get_neutral_fraction(self, density, ienergy, uvbg, ne_init,
                             helium=None):
        helium = self.helium if helium is None else helium
        ne = self.get_equilib_ne(density, ienergy, uvbg, ne_init,
                                 helium)
        nh = density * (1 - helium)
        temp = self.get_temp_internal(ne / nh, ienergy, helium)
        photofac = self._self_shield_corr(nh, temp,
                                          uvbg.self_shield_dens)
        nH0, _, _, _, _ = self._network(nh, temp, ne, uvbg, photofac)
        return nH0


@dataclass
class CoolingUnits:
    density_in_phys_cgs: float  # UnitDensity * h^2
    uu_in_cgs: float
    tt_in_s: float              # UnitTime / h


def do_cooling(cr: CoolingRates, redshift, u_old, rho, dt, uvbg,
               ne_guess, metallicity, min_egy_spec,
               units: CoolingUnits, bisect_iters=50):
    """Implicit du integration (DoCooling, cooling.c:57-140), vectorized:
    bracket by 1.1^k expansion encoded as wide initial bounds, then
    fixed-count bisection.  All args per-particle jnp arrays except
    scalars.  Returns (u_new internal, ne/nh)."""
    rho_cgs = rho * units.density_in_phys_cgs / C.PROTONMASS
    u_old_cgs = jnp.maximum(u_old * units.uu_in_cgs,
                            min_egy_spec * units.uu_in_cgs)
    dt_s = dt * units.tt_in_s
    min_u = min_egy_spec * units.uu_in_cgs

    def f(u, ne):
        lam, ne = cr.get_heatingcooling_rate(rho_cgs, u, redshift,
                                             metallicity, uvbg, ne)
        return u - u_old_cgs - lam * dt_s, ne

    # bracket: the reference expands by 1.1 from u_old; 1.1^60 ~ 300x
    u_lo = jnp.maximum(u_old_cgs / 300.0, min_u)
    u_hi = u_old_cgs * 300.0
    ne = ne_guess

    dtype = jnp.result_type(u_lo, u_hi, ne)
    u_lo, u_hi, ne = (u_lo.astype(dtype), u_hi.astype(dtype),
                      ne.astype(dtype))

    def body(i, st):
        u_lo, u_hi, ne = st
        u_mid = 0.5 * (u_lo + u_hi)
        val, ne = f(u_mid, ne)
        heat = val < 0  # u too small -> move lower bound up
        u_lo = jnp.where(heat, u_mid, u_lo).astype(dtype)
        u_hi = jnp.where(heat, u_hi, u_mid).astype(dtype)
        return (u_lo, u_hi, ne.astype(dtype))

    u_lo, u_hi, ne = jax.lax.fori_loop(0, bisect_iters, body,
                                       (u_lo, u_hi, ne))
    u = jnp.maximum(0.5 * (u_lo + u_hi), min_u)
    return u / units.uu_in_cgs, ne
