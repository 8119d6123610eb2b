"""Drift and kick operators (KDK leapfrog pieces).

Device-side elementwise kernels; the exact integrals over the FLRW
background arrive as precomputed host scalars (timefac.py), exactly as
the reference's drift.c / timestep.c apply_half_kick do.

Drift in fixed-point: the comoving displacement vel * ddrift is converted
to an int32 increment of the uint32 positions; periodic wrap is the
integer overflow.  The increment is exact to f32 relative precision of
the *displacement* (not the position), so there is no error growth.
"""

from functools import partial
import jax
import jax.numpy as jnp


@jax.jit
def drift(ipos, vel, ddrift, inv_box):
    """ipos += vel * ddrift (periodic). inv_box = 1/BoxSize."""
    disp_frac = vel * (jnp.float32(ddrift) * jnp.float32(inv_box))
    # frac of box -> fixed-point ticks; f32 keeps ~2^-24 relative accuracy
    # on the displacement which is far below any force error.  A physical
    # displacement is always << box/2 so it fits int32; two's-complement
    # uint32 addition wraps periodically for free.
    dint = jnp.round(disp_frac * jnp.float32(2.0 ** 32)).astype(jnp.int32)
    return ipos + dint.astype(jnp.uint32)


@jax.jit
def kick(vel, accel, dkick):
    """vel += accel * dkick (gravkick factor)."""
    return vel + accel * jnp.float32(dkick)


@jax.jit
def kick_masked(vel, accel, dkick_per_particle):
    """Per-particle kick factors (adaptive timebins)."""
    return vel + accel * dkick_per_particle[:, None]
