"""mpgadget_tpu — a TPU-native cosmological TreePM + SPH simulation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of MP-Gadget
(reference: /root/reference, a C99+MPI+OpenMP code). Nothing here is a
translation: the architecture is built around fixed-shape sharded arrays,
XLA collectives over a `jax.sharding.Mesh`, and compiler-friendly control
flow instead of MPI ranks, octree pointers and dynamic buffers.

Core design decisions (vs the reference architecture):

* Positions are stored as ``uint32`` fixed-point fractions of the box
  (reference: double precision, partmanager.h:9-71).  Periodic wrapping is
  integer overflow; the minimum-image separation is a signed int32
  subtraction — both exact.  Separations are cast to f32 *after* the
  subtraction, so no catastrophic cancellation and no emulated f64 on TPU.
* Domain decomposition + particle exchange + distributed sort
  (domain.c, exchange.c, mpsort.c in the reference) collapse into ONE
  primitive: a global sort by Morton key over sharded arrays.
* The pencil-FFT PM solver (petapm.c) becomes a mesh-sharded
  ``jnp.fft.rfftn`` with CIC scatter/gather; XLA inserts the ICI
  collectives.
* The treewalk export/import ghost protocol (treewalk.c) becomes masked,
  bounded-depth vectorized traversal over a Morton-complete octree.
"""

import jax

# Host-side setup math (cosmology tables, kick factors) wants f64; device
# hot paths use explicit f32/uint32 dtypes throughout.
jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
