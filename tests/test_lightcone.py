"""Light cone output (lightcone.c:30-268 analogs): horizon table,
replica shell selection, crossing detection + interpolation, and the
raw file format."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from mpgadget_tpu.physics.lightcone import (Lightcone,
                                            REFERENCE_REDSHIFT)
from mpgadget_tpu.cosmology import Cosmology
from mpgadget_tpu.utils import get_unitsystem, constants as C

UNITS = get_unitsystem(C.CM_PER_KPC, 1.989e43, 1e5)


@pytest.fixture()
def lc(tmp_path):
    cp = Cosmology(Omega0=0.3, OmegaLambda=0.7, HubbleParam=0.7,
                   TimeBegin=0.02).init_units(UNITS)
    return Lightcone(cp, 0.02, 1e5, str(tmp_path), boxsize=100000.0)


def test_horizon_monotone(lc):
    """Comoving horizon decreases toward a=1 and is ~Gpc-scale."""
    d_half = lc.get_horizon(0.5)
    d_low = lc.get_horizon(0.1)
    assert d_low > d_half > 0
    # z=1 comoving distance ~ 2.3 Gpc/h for this cosmology
    d1 = lc.get_horizon(0.5)
    assert 1.5e6 < d1 < 4e6, d1        # internal kpc/h


def test_sample_fraction_rules(lc):
    lc.set_time(1.0 / (1 + 1.0))       # z=1 < reference
    assert lc.sample_fraction == 1.0
    lc.set_time(1.0 / (1 + 6.0))       # z=6 > reference: subsample
    assert 0 < lc.sample_fraction < 1.0
    lc.set_time(1.0 / (1 + 90.0))      # beyond zmax
    assert lc.sample_fraction == 0.0


def test_crossing_written_and_file_layout(lc, tmp_path):
    """A particle placed just inside the horizon that stays put while
    the horizon shrinks past it must be written exactly once with an
    interpolated position on the shell."""
    a1 = 1.0 / (1 + 1.2)
    a2 = 1.0 / (1 + 1.0)
    lc.set_time(a1)
    d1 = lc.get_horizon(a1)
    d2 = lc.get_horizon(a2)
    assert d2 < d1
    # particle radially at (d1+d2)/2 along x, inside box replicas
    r = 0.5 * (d1 + d2)
    n = 8
    pos = np.zeros((n, 3), np.float32)
    pos[0, 0] = r % 100000.0     # the box replica tiling recovers r
    pos[1:] = 123.0              # far from any shell
    vel = np.zeros((n, 3), np.float32)
    is_dm = jnp.ones(n, bool)
    pid = jnp.arange(1, n + 1, dtype=jnp.int64)
    wrote = lc.compute(a2, 0.0, jnp.asarray(pos), jnp.asarray(vel),
                       is_dm, pid)
    assert wrote >= 1
    lc.fd.flush()
    raw = np.fromfile(lc.path, np.float64).reshape(-1, 4)
    assert raw.shape[0] == wrote
    # crossing radius lies between the two horizons
    rr = np.linalg.norm(raw[:, :3], axis=1)
    assert np.all((rr > d2 * 0.999) & (rr < d1 * 1.001)), (rr, d1, d2)
    assert np.all(raw[:, 3] == 1.0)    # z<2: full sampling
