"""Pallas block-pair kernel vs the exact jnp short-range math.

The TPU kernel (gravity/pairkernel.py) uses a fitted window polynomial
(one exp) instead of the reference erfc form (gravshort-tree.c:157-195);
this checks the interpreted kernel against gravity/shortrange.py to
bound the approximation error well below ErrTolForceAcc.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mpgadget_tpu.gravity.pairkernel import block_pair_accumulate
from mpgadget_tpu.gravity.shortrange import (
    shortrange_force_window, shortrange_pot_window,
    softened_force_factor, softened_pot_factor)


def _wrap(d):
    return d - np.round(d)


@pytest.mark.parametrize("with_potential", [False, True])
def test_pallas_pair_kernel_matches_exact(with_potential):
    rng = np.random.RandomState(7)
    nb, G, S = 4, 128, 256
    rs_inv = 42.666668
    h_inv = 300.0       # large softening so all branches are hit
    rcut = 0.0703125
    # targets clustered so some pairs are softened, some near rcut
    tx = rng.rand(nb, G).astype(np.float32)
    ty = rng.rand(nb, G).astype(np.float32)
    tz = rng.rand(nb, G).astype(np.float32)
    sx = (np.tile(tx, (1, S // G + 1))[:, :S]
          + rng.uniform(-0.1, 0.1, (nb, S))).astype(np.float32) % 1.0
    sy = (ty[:, :1] + rng.uniform(-0.1, 0.1, (nb, S))).astype(
        np.float32) % 1.0
    sz = (tz[:, :1] + rng.uniform(-0.1, 0.1, (nb, S))).astype(
        np.float32) % 1.0
    sm = rng.uniform(0.5, 2.0, (nb, S)).astype(np.float32)
    sm[:, -10:] = 0.0   # padding rows
    acc0 = rng.randn(nb, 3, G).astype(np.float32)
    pot0 = rng.randn(nb, G).astype(np.float32)

    acc, pot = block_pair_accumulate(
        jnp.asarray(tx), jnp.asarray(ty), jnp.asarray(tz),
        jnp.asarray(sx), jnp.asarray(sy), jnp.asarray(sz),
        jnp.asarray(sm), jnp.asarray(acc0), jnp.asarray(pot0),
        rs_inv, h_inv, rcut, chunk=128,
        with_potential=with_potential, interpret=True)

    # exact reference: dense pair sum with the shortrange.py math
    dx = _wrap(sx[:, None, :] - tx[:, :, None])
    dy = _wrap(sy[:, None, :] - ty[:, :, None])
    dz = _wrap(sz[:, None, :] - tz[:, :, None])
    rr = np.sqrt(dx * dx + dy * dy + dz * dz)
    ff = np.asarray(softened_force_factor(jnp.asarray(rr), h_inv)
                    * shortrange_force_window(jnp.asarray(rr), rs_inv))
    ff = np.where(rr < rcut, ff * sm[:, None, :], 0.0)
    acc_ref = acc0 + np.stack(
        [np.sum(ff * d, axis=2) for d in (dx, dy, dz)], axis=1)

    assert np.allclose(np.asarray(acc), acc_ref, rtol=2e-3, atol=2e-2), \
        np.max(np.abs(np.asarray(acc) - acc_ref))

    if with_potential:
        pp = np.asarray(softened_pot_factor(jnp.asarray(rr), h_inv)
                        * shortrange_pot_window(jnp.asarray(rr), rs_inv))
        pp = np.where((rr > 0) & (rr < rcut), pp * sm[:, None, :], 0.0)
        pot_ref = pot0 + np.sum(pp, axis=2)
        assert np.allclose(np.asarray(pot), pot_ref, rtol=2e-3,
                           atol=2e-2)
