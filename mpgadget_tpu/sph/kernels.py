"""SPH smoothing kernels (Price 2011, arXiv:1012.1885 conventions).

Matches libgadget/densitykernel.c: H is the support radius ("big H");
wk(u) with u = r/H; cubic (support 2h), quartic (2.5h), quintic (3h)
splines with the same normalizations.  Branch-free jnp implementations.
"""

from functools import partial
import numpy as np
import jax.numpy as jnp

CUBIC = 1
QUINTIC = 2
QUARTIC = 4

NORM_COEFF = 4.0 / 3 * np.pi  # volume of unit sphere

_SUPPORT = {CUBIC: 2.0, QUINTIC: 3.0, QUARTIC: 2.5}
_SIGMA3 = {CUBIC: 1.0 / np.pi, QUINTIC: 1.0 / (120 * np.pi),
           QUARTIC: 1.0 / (20 * np.pi)}


def _wk_cubic(q):
    q = jnp.asarray(q)
    a = jnp.clip(2.0 - q, 0.0, None) ** 3
    b = jnp.clip(1.0 - q, 0.0, None) ** 3
    return 0.25 * a - b


def _dwk_cubic(q):
    a = jnp.clip(2.0 - q, 0.0, None) ** 2
    b = jnp.clip(1.0 - q, 0.0, None) ** 2
    return -0.75 * a + 3.0 * b


def _wk_quartic(q):
    a = jnp.clip(2.5 - q, 0.0, None) ** 4
    b = jnp.clip(1.5 - q, 0.0, None) ** 4
    c = jnp.clip(0.5 - q, 0.0, None) ** 4
    return a - 5 * b + 10 * c


def _dwk_quartic(q):
    a = jnp.clip(2.5 - q, 0.0, None) ** 3
    b = jnp.clip(1.5 - q, 0.0, None) ** 3
    c = jnp.clip(0.5 - q, 0.0, None) ** 3
    return -4 * a + 20 * b - 40 * c


def _wk_quintic(q):
    a = jnp.clip(3.0 - q, 0.0, None) ** 5
    b = jnp.clip(2.0 - q, 0.0, None) ** 5
    c = jnp.clip(1.0 - q, 0.0, None) ** 5
    return a - 6 * b + 15 * c


def _dwk_quintic(q):
    a = jnp.clip(3.0 - q, 0.0, None) ** 4
    b = jnp.clip(2.0 - q, 0.0, None) ** 4
    c = jnp.clip(1.0 - q, 0.0, None) ** 4
    return -5 * a + 30 * b - 75 * c


_WK = {CUBIC: _wk_cubic, QUINTIC: _wk_quintic, QUARTIC: _wk_quartic}
_DWK = {CUBIC: _dwk_cubic, QUINTIC: _dwk_quintic, QUARTIC: _dwk_quartic}


def kernel_wk(u, hinv, ktype=QUINTIC):
    """W(r, H) = sigma/h^3 * w(q), q = u * support; u = r/H.
    hinv = 1/H (may be an array)."""
    s = _SUPPORT[ktype]
    norm = _SIGMA3[ktype] * (hinv * s) ** 3
    return norm * _WK[ktype](u * s)


def kernel_dwk(u, hinv, ktype=QUINTIC):
    """dW/dr; u = r/H."""
    s = _SUPPORT[ktype]
    norm = _SIGMA3[ktype] * (hinv * s) ** 3 * (hinv * s)
    return norm * _DWK[ktype](u * s)


def kernel_dW(u, wk, dwk, hinv):
    """-(3 W/H + u dW/du...) : d(rho)/dH contribution per neighbor
    (densitykernel.h:47-50)."""
    return -(3.0 * hinv * wk + u * dwk)


def kernel_volume(H, ktype=QUINTIC):
    return NORM_COEFF * H ** 3


def desnumngb(eta, ktype=QUINTIC):
    """Expected neighbor count for resolution eta (Price eq 12;
    densitykernel.c:124-131)."""
    return NORM_COEFF * (_SUPPORT[ktype] * eta) ** 3
