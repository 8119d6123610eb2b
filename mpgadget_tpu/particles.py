"""Particle state: fixed-capacity structure-of-arrays pytree.

TPU-native redesign of the reference's PartManager/SlotsManager
(libgadget/partmanager.h:9-88, slotsmanager.h): instead of a global AoS
``struct particle_data`` array with per-type slot extensions and explicit
garbage collection, the state is a pytree of fixed-shape arrays with a
validity mask.  Garbage = ``valid == False``; "collection" is a sort that
pushes invalid rows to the tail (no memory movement bookkeeping).

Positions are **uint32 fixed-point** fractions of the box:
``x_internal = ipos * (BoxSize / 2^32)``.
* periodic wrap is integer overflow (exact),
* the minimum-image separation is ``(a - b).astype(int32)`` (exact),
* CIC cell/fraction split is a shift/mask (exact),
so no f64 is needed on the critical path (the reference needs double
positions; TPU f64 is emulated and slow — this is strictly more precise
for separations than f64 absolute coordinates).

Velocity convention matches the reference: internal Vel = a^2 dx/dt
(comoving dx), so drift uses the exact factor int dt/a^2 and snapshots
store peculiar velocity Vel/a (petaio.c:803-830).
"""

from typing import Optional
import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

POS_SCALE_BITS = 32

# particle types, matching the reference convention
TYPE_GAS = 0
TYPE_DM = 1
TYPE_NEUTRINO = 2
TYPE_UNUSED = 3
TYPE_STAR = 4
TYPE_BH = 5
NTYPES = 6


def pos_to_fixed(pos, boxsize):
    """Float comoving positions -> uint32 fixed point (host or device)."""
    frac = np.asarray(pos, dtype=np.float64) / boxsize
    frac = np.mod(frac, 1.0)
    return (frac * 2.0 ** 32).astype(np.uint32)


def fixed_to_pos(ipos, boxsize, dtype=np.float64):
    """uint32 fixed point -> float comoving positions in [0, BoxSize)."""
    return (np.asarray(ipos, dtype=np.float64) * (boxsize / 2.0 ** 32)
            ).astype(dtype)


@struct.dataclass
class ParticleData:
    """Base particle arrays (all types); capacity-N fixed shapes.

    Mirrors struct particle_data (partmanager.h:9-71) minus pointers:
    """
    ipos: jnp.ndarray        # uint32[N,3] fixed-point comoving position
    vel: jnp.ndarray         # f32[N,3] internal velocity a^2 dx/dt
    mass: jnp.ndarray        # f32[N]
    ptype: jnp.ndarray       # int32[N] particle type 0..5
    pid: jnp.ndarray         # int64[N] unique ID
    valid: jnp.ndarray       # bool[N]; False = garbage / unused slot
    timebin: jnp.ndarray     # int32[N] gravity timebin
    timebin_hydro: jnp.ndarray  # int32[N] hydro timebin
    grav_accel: jnp.ndarray  # f32[N,3] short-range gravity accel (comoving)
    grav_pm: jnp.ndarray     # f32[N,3] long-range PM accel
    potential: jnp.ndarray   # f32[N]
    hsml: jnp.ndarray        # f32[N] smoothing length (gas/BH)
    dt_hsml: jnp.ndarray     # f32[N] predicted dHsml/d(drift)
    # bookkeeping
    slot_index: jnp.ndarray  # int32[N] index into the per-type slot arrays

    @property
    def capacity(self):
        return self.ipos.shape[0]

    @property
    def num_valid(self):
        return jnp.sum(self.valid)

    @classmethod
    def zeros(cls, n: int):
        return cls(
            ipos=jnp.zeros((n, 3), jnp.uint32),
            vel=jnp.zeros((n, 3), jnp.float32),
            mass=jnp.zeros((n,), jnp.float32),
            ptype=jnp.full((n,), TYPE_DM, jnp.int32),
            pid=jnp.zeros((n,), jnp.int64),
            valid=jnp.zeros((n,), bool),
            timebin=jnp.zeros((n,), jnp.int32),
            timebin_hydro=jnp.zeros((n,), jnp.int32),
            grav_accel=jnp.zeros((n, 3), jnp.float32),
            grav_pm=jnp.zeros((n, 3), jnp.float32),
            potential=jnp.zeros((n,), jnp.float32),
            hsml=jnp.zeros((n,), jnp.float32),
            dt_hsml=jnp.zeros((n,), jnp.float32),
            slot_index=jnp.zeros((n,), jnp.int32),
        )

    @classmethod
    def from_numpy(cls, pos, vel, mass, ptype, pid, boxsize,
                   capacity: Optional[int] = None):
        """Build from host float arrays (IC/snapshot read path)."""
        n = len(pid)
        cap = capacity or n
        assert cap >= n
        p = cls.zeros(cap)
        pad = cap - n

        def put(field, arr, dtype):
            arr = np.asarray(arr)
            padded = np.concatenate(
                [arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)]) \
                if pad else arr
            return jnp.asarray(padded, dtype=dtype)

        return p.replace(
            ipos=put("ipos", pos_to_fixed(pos, boxsize), jnp.uint32),
            vel=put("vel", vel, jnp.float32),
            mass=put("mass", mass, jnp.float32),
            ptype=put("ptype", ptype, jnp.int32),
            pid=put("pid", pid, jnp.int64),
            valid=jnp.arange(cap) < n,
        )

    def positions(self, boxsize, dtype=jnp.float32):
        """Comoving float positions (lossy beyond 2^-32 of the box)."""
        return self.ipos.astype(jnp.float64).astype(dtype) * jnp.asarray(
            boxsize / 2.0 ** 32, dtype)


def separation(ipos_a, ipos_b, boxsize, dtype=jnp.float32):
    """Minimum-image comoving separation a - b.

    Exact periodic wrap: uint32 subtraction then signed reinterpretation
    (replaces the reference's NEAREST macro, partmanager.h:99).
    """
    d = (ipos_a - ipos_b).astype(jnp.int32)
    return d.astype(dtype) * jnp.asarray(boxsize / 2.0 ** 32, dtype)
