"""Morton key and CIC deposit/readout tests (analog of test_peano.c)."""

import numpy as np
import jax.numpy as jnp

from mpgadget_tpu.ops.morton import morton_key, morton_decode, MORTON_BITS
from mpgadget_tpu.ops.cic import cic_deposit, cic_readout, cell_and_frac
from mpgadget_tpu.particles import pos_to_fixed, fixed_to_pos, separation


def test_morton_roundtrip():
    rng = np.random.RandomState(1)
    ipos = rng.randint(0, 2 ** 32, size=(1000, 3)).astype(np.uint32)
    keys = morton_key(jnp.asarray(ipos))
    cells = morton_decode(keys)
    expect = ipos >> (32 - MORTON_BITS)
    np.testing.assert_array_equal(np.asarray(cells), expect)


def test_morton_ordering_locality():
    # keys of the 8 octants: x-major ordering
    ipos = np.zeros((8, 3), np.uint32)
    for i in range(8):
        ipos[i] = [(i >> 2 & 1), (i >> 1 & 1), (i & 1)]
    ipos = (ipos * 2 ** 31).astype(np.uint32)
    keys = np.asarray(morton_key(jnp.asarray(ipos)))
    assert list(np.argsort(keys)) == list(range(8))


def test_fixed_point_roundtrip():
    box = 25000.0
    rng = np.random.RandomState(2)
    pos = rng.uniform(0, box, size=(500, 3))
    ipos = pos_to_fixed(pos, box)
    back = fixed_to_pos(ipos, box)
    assert np.abs(back - pos).max() < box / 2 ** 32 * 1.01


def test_separation_minimum_image():
    box = 100.0
    a = pos_to_fixed(np.array([[1.0, 50.0, 99.0]]), box)
    b = pos_to_fixed(np.array([[99.0, 50.0, 1.0]]), box)
    d = np.asarray(separation(jnp.asarray(a), jnp.asarray(b), box))
    # 1 - 99 wraps to +2; 99 - 1 wraps to -2
    np.testing.assert_allclose(d[0], [2.0, 0.0, -2.0], atol=1e-4)


def test_cell_and_frac_exact():
    box = 1.0
    nmesh = 16
    pos = np.array([[0.5, 0.25 + 1.0 / 64, 0.999]])
    ipos = jnp.asarray(pos_to_fixed(pos, box))
    cell, frac = cell_and_frac(ipos, nmesh)
    assert tuple(np.asarray(cell)[0]) == (8, 4, 15)
    np.testing.assert_allclose(np.asarray(frac)[0], [0.0, 0.25, 0.984],
                               atol=1e-3)


def test_cic_mass_conservation():
    rng = np.random.RandomState(3)
    n = 1234
    ipos = jnp.asarray(rng.randint(0, 2 ** 32, size=(n, 3)), jnp.uint32)
    w = jnp.asarray(rng.uniform(0.5, 2.0, n), jnp.float32)
    mesh = cic_deposit(ipos, w, 16)
    assert np.isclose(float(mesh.sum()), float(w.sum()), rtol=1e-5)


def test_cic_deposit_readout_adjoint():
    """Readout of a deposited unit particle at the same position = sum of
    squared CIC weights; at a cell center it's exactly 1."""
    box = 1.0
    ipos = jnp.asarray(pos_to_fixed(np.array([[0.5, 0.5, 0.5]]), box))
    mesh = cic_deposit(ipos, jnp.ones(1, jnp.float32), 8)
    # particle exactly at a cell corner -> all mass in one cell
    val = cic_readout(mesh, ipos)
    assert np.isclose(float(val[0]), 1.0, atol=1e-6)


def test_cic_linear_field_interpolation():
    """CIC readout of a (periodic-safe) linear mesh reproduces linear
    interpolation between cell values."""
    nmesh = 8
    mesh = jnp.asarray(
        np.sin(2 * np.pi * np.arange(nmesh) / nmesh)[:, None, None]
        * np.ones((1, nmesh, nmesh)), jnp.float32)
    pos = np.array([[0.5 + 1.0 / nmesh / 2, 0.3, 0.7]])  # mid-cell in x
    ipos = jnp.asarray(pos_to_fixed(pos, 1.0))
    val = float(cic_readout(mesh, ipos)[0])
    x = np.arange(nmesh)
    f = np.sin(2 * np.pi * x / nmesh)
    i0 = int(pos[0, 0] * nmesh)
    expect = 0.5 * (f[i0] + f[(i0 + 1) % nmesh])
    assert np.isclose(val, expect, atol=1e-5)
