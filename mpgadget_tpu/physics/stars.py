"""Per-particle star state (star_particle_data analog,
slotsmanager.h:76-90).

Arrays are aligned with the base ParticleData index like SphData: a few
unused rows cost less on TPU than a slot indirection on every gather.
Metal species order follows the reference (metal_tables.h:5):
H, He, C, N, O, Ne, Mg, Si, Fe.
"""

import jax.numpy as jnp
from flax import struct

from ..utils import constants as C

NMETALS = 9


@struct.dataclass
class StarData:
    formation_time: jnp.ndarray      # f32[N] scale factor at birth
    birth_density: jnp.ndarray       # f32[N] gas density at formation
    metallicity: jnp.ndarray         # f32[N] total metal mass fraction
    metals: jnp.ndarray              # f32[N,9] metal mass per species
    total_mass_returned: jnp.ndarray  # f32[N] cumulative mass returned
    last_enrichment_myr: jnp.ndarray  # f32[N] age of last enrichment
    vdisp: jnp.ndarray               # f32[N] DM vel disp at formation

    @classmethod
    def zeros(cls, n: int):
        z = jnp.zeros((n,), jnp.float32)
        return cls(formation_time=z, birth_density=z, metallicity=z,
                   metals=jnp.zeros((n, NMETALS), jnp.float32),
                   total_mass_returned=z, last_enrichment_myr=z,
                   vdisp=z)


def primordial_metals(n: int):
    """Initial gas Metals fractions: primordial H/He, zero metals
    (init.c:177-178; Metals are mass fractions — the enrichment
    update metal_return.c:691 mass-averages them)."""
    metals = jnp.zeros((n, NMETALS), jnp.float32)
    metals = metals.at[:, 0].set(C.HYDROGEN_MASSFRAC)
    metals = metals.at[:, 1].set(1.0 - C.HYDROGEN_MASSFRAC)
    return metals
