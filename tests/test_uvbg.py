"""Excursion-set reionization (uvbg.c analogs): filter functions, the
radius ladder, and an analytic top-hat source test — a single compact
star cluster must ionize a bubble whose size follows the photon
budget."""

import numpy as np
import jax.numpy as jnp
import pytest

from mpgadget_tpu.physics import uvbg as U
from mpgadget_tpu.cosmology import Cosmology
from mpgadget_tpu.utils import get_unitsystem, constants as C

UNITS = get_unitsystem(C.CM_PER_KPC, 1.989e43, 1e5)


def test_filter_normalization():
    """All filters pass k=0 unchanged and suppress small scales."""
    for ft in (0, 1, 2):
        lo = float(U._filter_fac(jnp.asarray(1e-6), 100.0, ft))
        hi = float(U._filter_fac(jnp.asarray(1.0), 100.0, ft))
        assert np.isclose(lo, 1.0, atol=1e-4), (ft, lo)
        assert abs(hi) < 0.1, (ft, hi)


def test_j21_rates_scaling():
    g, e = U.j21_to_rates(jnp.asarray([0.0, 1.0, 2.0]), 3.0)
    gH = np.asarray(g[0])
    assert gH[0] == 0
    assert np.isclose(gH[2] / gH[1], 2.0)
    # Gamma_HI at J21=1 is ~1e-12 1/s (standard magnitude)
    assert 1e-13 < gH[1] < 1e-11, gH[1]
    # harder spectrum ratio: HeII rate much smaller than HI
    assert np.asarray(g[2])[1] < 0.2 * gH[1]
    # heating per ionization ~ few eV
    assert 0.1 * 13.6 < np.asarray(e[0])[1] / gH[1] / 1.602e-12 < 13.6


def test_escape_fraction_powerlaw():
    f = U.escape_fractions(jnp.asarray([0.0, 0.01, 1.0]), 0.2, 0.5,
                           1.989e43, 0.7)
    f = np.asarray(f)
    assert f[0] == 0.0
    assert np.isclose(f[2] / f[1], 10.0, rtol=1e-4)   # M^0.5
    assert np.all(f <= 1.0)


def test_tophat_bubble_ionization():
    """A point-like star cluster in a uniform box: cells near it cross
    the barrier; far cells stay neutral; the neutral fraction matches
    1 - (ionized photon budget) to first order."""
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, OmegaBaryon=0.05,
                   HubbleParam=0.7, TimeBegin=0.1).init_units(UNITS)
    box = 10000.0
    n_side = 16
    n = n_side ** 3
    grid = np.indices((n_side,) * 3).reshape(3, -1).T
    pos = (grid + 0.5) / n_side * box
    ipos = jnp.asarray((pos / box * 2 ** 32).astype(np.uint64)
                       .astype(np.uint32))
    mass = jnp.full(n + 1, 1e-2, jnp.float32)
    # one star particle at the center holding ~2% of the total mass
    star_pos = jnp.asarray(
        (np.array([[0.5, 0.5, 0.5]]) * 2 ** 32).astype(np.uint64)
        .astype(np.uint32))
    ipos = jnp.concatenate([ipos, star_pos])
    mass = mass.at[n].set(1e-2 * n * 0.02)
    valid = jnp.ones(n + 1, bool)
    is_gas = jnp.arange(n + 1) < n
    is_star = jnp.arange(n + 1) == n
    sfr = jnp.zeros(n + 1, jnp.float32)
    fesc = jnp.ones(n + 1, jnp.float32)

    params = U.UVBGParams(uvbg_dim=32, r_bubble_max=box / 4,
                          r_bubble_min=box / 32, delta_r_factor=1.25,
                          nion_phot_per_bary=4000.0,
                          use_particle_sfr=False)
    out = U.calculate_uvbg(ipos, mass, valid, is_gas, is_star, sfr,
                           fesc, params, cp, UNITS, box, atime=0.125)
    xhi = np.asarray(out["xhi"])
    j21 = np.asarray(out["j21"])
    assert np.all((xhi >= 0) & (xhi <= 1))
    # center ionized, far corner not
    assert xhi[16, 16, 16] < 0.05
    assert xhi[0, 0, 0] > 0.9
    # J21 recorded where ionized, zero where fully neutral
    assert j21[16, 16, 16] > 0
    assert j21[0, 0, 0] == 0
    # the ionized volume is finite and not the whole box
    vol_xhi = out["volume_weighted_global_xHI"]
    assert 0.05 < vol_xhi < 0.999, vol_xhi


def test_readout_j21_max():
    grid = jnp.zeros((8, 8, 8), jnp.float32).at[2, 3, 4].set(7.0)
    # particle whose CIC cloud touches (2,3,4)
    ip = jnp.asarray(np.array(
        [[(1.6 / 8), (2.6 / 8), (3.6 / 8)],     # neighbor cell
         [0.9, 0.9, 0.9]]) * 2 ** 32, jnp.uint32)
    out = np.asarray(U.readout_j21_max(grid, ip))
    assert out[0] == 7.0
    assert out[1] == 0.0
