"""SPH per-particle state (sph_particle_data analog, slotsmanager.h:93-129).

Arrays are aligned with the base ParticleData index (not slot-indexed):
on TPU the cost of a few unused rows for non-gas particles is cheaper
than an indirection on every gather.  Only allocated when gas exists.
"""

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SphData:
    entropy: jnp.ndarray          # f32[N] entropic function A = P/rho^gamma
    dt_entropy: jnp.ndarray       # f32[N]
    density: jnp.ndarray          # f32[N] comoving
    egy_wt_density: jnp.ndarray   # f32[N] pressure-entropy density
    dhsml_egy_factor: jnp.ndarray  # f32[N] DhsmlEgyDensityFactor
    dhsml_density_factor: jnp.ndarray  # f32[N]
    div_vel: jnp.ndarray          # f32[N]
    curl_vel: jnp.ndarray         # f32[N]
    max_signal_vel: jnp.ndarray   # f32[N]
    hydro_accel: jnp.ndarray      # f32[N,3]
    ne: jnp.ndarray               # f32[N] electron abundance
    metallicity: jnp.ndarray      # f32[N]
    metals: jnp.ndarray           # f32[N,9] species mass fractions
    sfr: jnp.ndarray              # f32[N] star formation rate
    delay_time: jnp.ndarray       # f32[N] wind decoupling timer
    he_iii_ionized: jnp.ndarray   # u8[N] QSO HeIII flag
    local_j21: jnp.ndarray        # f32[N] excursion-set J21
    zreion: jnp.ndarray           # f32[N] reionization redshift (-1)

    @classmethod
    def zeros(cls, n: int):
        from ..physics.stars import primordial_metals
        z = jnp.zeros((n,), jnp.float32)
        return cls(entropy=z, dt_entropy=z, density=z, egy_wt_density=z,
                   dhsml_egy_factor=z, dhsml_density_factor=z,
                   div_vel=z, curl_vel=z, max_signal_vel=z,
                   hydro_accel=jnp.zeros((n, 3), jnp.float32),
                   ne=jnp.full((n,), 1.0, jnp.float32), metallicity=z,
                   metals=primordial_metals(n),
                   sfr=z, delay_time=z,
                   he_iii_ionized=jnp.zeros((n,), jnp.uint8),
                   local_j21=z,
                   zreion=jnp.full((n,), -1.0, jnp.float32))
