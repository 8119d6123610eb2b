"""Pallas TPU kernel for dense block pair interactions (direct forces).

The direct (opened-leaf) part of the short-range gravity is a dense
(G targets) x (S sources) pair sum per target block — regular shapes,
no divergence: the textbook Pallas case.  The pure-jnp formulation
leaves ~10x on the table because XLA materializes the (B, G, CH)
intermediates of the pair chain in HBM; here each block's targets and
sources live in VMEM and the chunk loop keeps every intermediate
on-chip, so the kernel is VPU-bound.

Math matches gravity/shortrange.py exactly (erfc window + cubic-spline
softening, gravshort-tree.c:157-195); the jnp path in treewalk.py
remains as the CPU/interpret fallback and the parity reference.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SQRT_PI = 1.7724538509055159
TWO_OVER_SQRT_PI = np.float32(2.0 / SQRT_PI)

# Q(u) = erfc(u)*exp(u^2) + (2/sqrt(pi))*u, Chebyshev-fitted monomial
# over u in [0, 3.5] (abs err in w < 1.2e-5, << ErrTolForceAcc);
# extrapolation beyond 3.5 is crushed by exp(-u^2) < 5e-6, so the fit
# is safe for any rcut.  One exp + one Horner chain replaces the
# erfc rational (two exps + a divide) on the Mosaic VPU.
Q_COEF = tuple(np.float32(c) for c in (
    2.15669443e-05, -4.47933422e-04, 4.14920901e-03, -2.27964187e-02,
    8.37462836e-02, -2.21568513e-01, 4.48302245e-01, -7.31138547e-01,
    9.95229753e-01, 4.74558942e-04, 9.99988204e-01))  # descending


def _window_q(u):
    q = Q_COEF[0]
    for c in Q_COEF[1:]:
        q = q * u + c
    return q


def _pair_terms(dx, dy, dz, sm, rs_inv, h_inv, rcut, with_potential):
    """Force factor ff (and pot pp) for pair separations; all (CH, G)."""
    r2 = dx * dx + dy * dy + dz * dz
    rinv = jax.lax.rsqrt(jnp.maximum(r2, np.float32(1e-30)))
    r = r2 * rinv
    u = r * rs_inv
    expmu2 = jnp.exp(-u * u)
    q = _window_q(u)
    w = expmu2 * q
    uh = r * h_inv
    f0 = np.float32(0.0)
    newton = rinv * rinv * rinv
    h3_inv = h_inv * h_inv * h_inv
    uh3 = uh * uh * uh
    uhs = jnp.maximum(uh, np.float32(1e-30))
    inner = h3_inv * (10.666666666667 + uh * uh * (32.0 * uh - 38.4))
    outer = h3_inv * (21.333333333333 - 48.0 * uh + 38.4 * uh * uh
                      - 10.666666666667 * uh3
                      - 0.066666666667 / (uhs * uhs * uhs))
    fac = jnp.where(uh >= 1.0, newton,
                    jnp.where(uh < 0.5, inner, outer))
    ff = jnp.where(r < rcut, fac * w * sm, f0)
    pp = None
    if with_potential:
        wp = expmu2 * (q - TWO_OVER_SQRT_PI * u)   # erfc(u)
        pnewton = -rinv
        wp_in = -2.8 + uh * uh * (5.333333333333
                                  + uh * uh * (6.4 * uh - 9.6))
        wp_out = (-3.2 + 0.066666666667 / jnp.maximum(uh, np.float32(1e-30))
                  + uh * uh * (10.666666666667
                               + uh * (-16.0 + uh * (9.6
                                                     - 2.133333333333
                                                     * uh))))
        pfac = jnp.where(uh >= 1.0, pnewton,
                         h_inv * jnp.where(uh < 0.5, wp_in, wp_out))
        pp = jnp.where((r > 0) & (r < rcut), pfac * wp * sm, f0)
    return ff, pp


def _wrap32(d):
    """Min-image for a difference of two [0,1) coords: d in (-1,1)."""
    one = np.float32(1.0)
    zero = np.float32(0.0)
    return d - jnp.where(d > 0.5, one, zero) \
        + jnp.where(d < -0.5, one, zero)


def _make_kernel(rs_inv, h_inv, rcut, with_potential):
    def kernel(tx, ty, tz, sx, sy, sz, sm, acc0, pot0, acc_out,
               pot_out):
        # grid = (blocks, source-chunks); per step:
        # tx/ty/tz: (1,1,G); sx...: (1,CH,1); acc: (1,3,G); pot (1,1,G).
        # The output block is revisited across the chunk dimension, so
        # it accumulates in VMEM (init from acc0 on the first chunk).
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _():
            acc_out[0] = acc0[0]
            pot_out[0] = pot0[0]

        txv = tx[0]                     # (1, G)
        tyv = ty[0]
        tzv = tz[0]
        sxc = sx[0]                     # (CH, 1)
        syc = sy[0]
        szc = sz[0]
        smc = sm[0]
        dx = _wrap32(sxc - txv)         # (CH, G)
        dy = _wrap32(syc - tyv)
        dz = _wrap32(szc - tzv)
        ff, pp = _pair_terms(dx, dy, dz, smc, rs_inv, h_inv, rcut,
                             with_potential)
        acc_out[0, 0:1, :] += jnp.sum(ff * dx, axis=0, keepdims=True)
        acc_out[0, 1:2, :] += jnp.sum(ff * dy, axis=0, keepdims=True)
        acc_out[0, 2:3, :] += jnp.sum(ff * dz, axis=0, keepdims=True)
        if with_potential:
            pot_out[0] += jnp.sum(pp, axis=0, keepdims=True)

    return kernel


@partial(jax.jit, static_argnames=("rs_inv", "h_inv", "rcut", "chunk",
                                   "with_potential", "interpret"))
def block_pair_accumulate(tx, ty, tz, sx, sy, sz, sm, acc0, pot0,
                          rs_inv, h_inv, rcut, chunk=512,
                          with_potential=False, interpret=False):
    """acc0 (nb,3,G) += dense pair forces of (nb,S) sources on (nb,G)
    targets; returns (acc (nb,3,G), pot (nb,G)).  Geometry in box
    units, minimum-image wrap applied per component."""
    nb, G = tx.shape
    S = sx.shape[1]
    chunk = min(chunk, S)
    if S % chunk:
        chunk = S
    # XLA stages the custom call's operands in VMEM when they are
    # fusion temporaries; batch the blocks so one call's operands fit
    # the 16MB scoped-vmem budget.
    max_rows = max(1, (4 << 20) // (4 * S))
    while max_rows > 1 and nb % max_rows:
        max_rows //= 2
    if nb > max_rows:
        def one(args):
            return block_pair_accumulate(
                *args, rs_inv=rs_inv, h_inv=h_inv, rcut=rcut,
                chunk=chunk, with_potential=with_potential,
                interpret=interpret)
        parts = [a.reshape((nb // max_rows, max_rows) + a.shape[1:])
                 for a in (tx, ty, tz, sx, sy, sz, sm, acc0, pot0)]
        acc, pot = jax.lax.map(one, tuple(parts))
        return (acc.reshape(nb, 3, G), pot.reshape(nb, G))
    kern = _make_kernel(np.float32(rs_inv), np.float32(h_inv),
                        np.float32(rcut), with_potential)
    row3 = lambda b, c: (b, 0, 0)
    chk = lambda b, c: (b, c, 0)
    spec_g = pl.BlockSpec((1, 1, G), row3, memory_space=pltpu.VMEM)
    spec_s = pl.BlockSpec((1, chunk, 1), chk, memory_space=pltpu.VMEM)
    spec_acc = pl.BlockSpec((1, 3, G), row3, memory_space=pltpu.VMEM)
    rg = lambda a: a[:, None, :]        # (nb,G)   -> (nb,1,G)
    rs = lambda a: a[:, :, None]        # (nb,S)   -> (nb,S,1)
    # The package enables jax_enable_x64 (host math is f64); Mosaic
    # cannot lower the stray 64-bit scalars x64 mode injects into the
    # kernel jaxpr, so trace the pallas_call with x64 off — every
    # operand here is an explicit f32 array already.
    with jax.enable_x64(False):
        acc, pot = pl.pallas_call(
            kern,
            grid=(nb, S // chunk),
            in_specs=[spec_g] * 3 + [spec_s] * 4 + [spec_acc, spec_g],
            out_specs=(spec_acc, spec_g),
            out_shape=(jax.ShapeDtypeStruct((nb, 3, G), jnp.float32),
                       jax.ShapeDtypeStruct((nb, 1, G), jnp.float32)),
            interpret=interpret,
        )(rg(tx), rg(ty), rg(tz), rs(sx), rs(sy), rs(sz), rs(sm), acc0,
          pot0[:, None, :])
    return acc, pot[:, 0, :]
