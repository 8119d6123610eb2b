"""Short-range force window and softened gravity kernels.

The reference tabulates the TreePM force-split window because erfc is
slow on CPUs (libgadget/shortrange-kernel.c, generated table;
grav_apply_short_range_window).  On TPU the VPU evaluates erfc directly,
so the window is computed analytically:

    u          = r / (2 * Asmth * cellsize)
    w_force(u) = erfc(u) + 2u/sqrt(pi) * exp(-u^2)
    w_pot(u)   = erfc(u)

(the 'exact' window option of the reference differs from erfc by <1e-3
at Asmth=1.5 — see the table columns in shortrange-kernel.c — and maps
to erfc here).

The softened point force below h = 2.8 * softening uses the standard
cubic-spline mass distribution (gravshort-tree.c:157-195).
"""

from functools import partial
import jax
import jax.numpy as jnp
from jax.scipy.special import erfc

SQRT_PI = 1.7724538509055159


def shortrange_force_window(r, rs_inv):
    """Force window factor; rs_inv = 1/(2 Asmth cellsize)."""
    u = r * rs_inv
    return erfc(u) + (2.0 / SQRT_PI) * u * jnp.exp(-u * u)


def shortrange_pot_window(r, rs_inv):
    return erfc(r * rs_inv)


def softened_force_factor(r, h_inv):
    """fac(r) such that F = m * fac * dx, with spline softening.

    Returns 1/r^3 outside h, the spline-softened equivalent inside
    (gravshort-tree.c:163-186; coefficients are the standard Gadget-2
    cubic-spline force kernel).
    """
    u = r * h_inv
    h3_inv = h_inv * h_inv * h_inv
    rinv = jnp.where(r > 0, 1.0 / jnp.maximum(r, 1e-30), 0.0)
    newton = rinv * rinv * rinv
    inner = h3_inv * (10.666666666667 + u * u * (32.0 * u - 38.4))
    outer = h3_inv * (21.333333333333 - 48.0 * u + 38.4 * u * u
                      - 10.666666666667 * u ** 3
                      - 0.066666666667 / jnp.maximum(u, 1e-30) ** 3)
    fac = jnp.where(u >= 1.0, newton, jnp.where(u < 0.5, inner, outer))
    return fac


def softened_pot_factor(r, h_inv):
    """phi(r) = m * potfac; -1/r outside h, spline inside."""
    u = r * h_inv
    rinv = jnp.where(r > 0, 1.0 / jnp.maximum(r, 1e-30), 0.0)
    newton = -rinv
    wp_in = -2.8 + u * u * (5.333333333333 + u * u * (6.4 * u - 9.6))
    wp_out = (-3.2 + 0.066666666667 / jnp.maximum(u, 1e-30)
              + u * u * (10.666666666667 + u * (-16.0 + u * (9.6 - 2.133333333333 * u))))
    return jnp.where(u >= 1.0, newton,
                     h_inv * jnp.where(u < 0.5, wp_in, wp_out))


@partial(jax.jit, static_argnames=("with_potential",))
def direct_shortrange_pairwise(ipos, mass, valid, boxsize, rs_inv, rcut,
                               h_inv, with_potential=True):
    """O(N^2) direct short-range force — the grav_short_pair analog
    (gravshort-pair.c:22) used by the force-accuracy self-test.

    Returns (accel f32[N,3], potential f32[N]).
    """
    scale = jnp.float32(boxsize / 2.0 ** 32)
    n = ipos.shape[0]

    def one(ipos_i):
        d = (ipos - ipos_i[None, :]).astype(jnp.int32).astype(
            jnp.float32) * scale
        r2 = jnp.sum(d * d, axis=-1)
        r = jnp.sqrt(r2)
        w = shortrange_force_window(r, rs_inv)
        fac = softened_force_factor(r, h_inv) * w
        m = jnp.where(valid & (r > 0) & (r < rcut), mass, 0.0)
        acc = jnp.sum((m * fac)[:, None] * d, axis=0)
        if with_potential:
            wp = shortrange_pot_window(r, rs_inv)
            pot = jnp.sum(m * softened_pot_factor(r, h_inv) * wp)
        else:
            pot = 0.0
        return acc, pot

    acc, pot = jax.lax.map(one, ipos, batch_size=1024)
    return acc, pot
