"""Zel'dovich (1LPT) initial conditions on the FFT mesh.

Re-design of libgenic/zeldovich.c for TPU: the Gaussian random field is
generated as real-space white noise from JAX's counter-based threefry
PRNG and transformed (hermitian symmetry for free), instead of the
reference's per-mode GSL ranlxd1 seed table (libgenic/pmesh.h:64-195).
Fields are deterministic in (Seed, Nmesh) and platform-independent, but
not bit-identical to N-GenIC realizations; statistical equivalence is
exact, and UnitaryAmplitude/InvertPhase are supported.

The k-space kernels match zeldovich.c:
* density:       delta_k * exp(-k2/Nmesh^2) [gaussian smoothing, 1 cell]
* displacement:  psi_k = i k/k^2 delta_k    (disp_transfer, :297-313)
* velocity:      psi_k * dlogGrowth(k)      (N-body gauge, :315-323)
with delta_k = whitenoise * sqrt(P(k)/V).

Velocity prefactor (zeldovich.c:193-209): a H(a) [F_Omega(a) if
scale-independent], times sqrt(a) -> internal units if not peculiar.
"""

from functools import partial
import numpy as np
import jax
import jax.numpy as jnp

from .power import DELTA_TOT
from ..pm.gravity import _rfft3, _irfft3
from ..ops.cic import cic_readout
from ..particles import pos_to_fixed


def make_grid(ngrid, boxsize, shift=0.0):
    """Regular particle lattice + IDs (idgen_*, zeldovich.c:48-106).

    IDs: i*Ng^2 + j*Ng + k + 1, positions at lattice points + shift.
    """
    idx = np.arange(ngrid)
    x, y, z = np.meshgrid(idx, idx, idx, indexing="ij")
    pos = np.stack([x, y, z], axis=-1).reshape(-1, 3).astype(np.float64)
    pos = pos * (boxsize / ngrid) + shift
    pid = (x.astype(np.uint64) * ngrid * ngrid
           + y.astype(np.uint64) * ngrid + z.astype(np.uint64) + 1).ravel()
    return pos, pid


@partial(jax.jit, static_argnames=("nmesh", "unitary", "invert"))
def gaussian_modes(seed, nmesh, unitary=False, invert=False):
    """Hermitian white noise delta_k with E|delta_k|^2 = 1.

    Real-space N(0,1) noise -> rfftn / N^{3/2}.  Counter-based threefry:
    deterministic in (seed, nmesh) on every backend.
    """
    key = jax.random.PRNGKey(seed)
    noise = jax.random.normal(key, (nmesh, nmesh, nmesh), jnp.float32)
    fftn = _rfft3 if nmesh > 256 else jnp.fft.rfftn
    modes = fftn(noise) * (1.0 / nmesh ** 1.5)
    if unitary:
        amp = jnp.abs(modes)
        modes = modes / jnp.where(amp > 0, amp, 1.0)
    if invert:
        modes = -modes
    return modes


def _kvecs(nmesh):
    kx = jnp.fft.fftfreq(nmesh, 1.0 / nmesh).astype(jnp.float32)
    kz = jnp.arange(nmesh // 2 + 1, dtype=jnp.float32)
    return kx[:, None, None], kx[None, :, None], kz[None, None, :]


@partial(jax.jit, static_argnames=("nmesh", "boxsize",
                                   "scale_dep_velocity"))
def displacement_fields(modes, delta_table, growth_table, nmesh, boxsize,
                        ipos, scale_dep_velocity=False):
    """Compute Zel'dovich displacements (and velocity factors) at
    particle positions by CIC readout of the three psi meshes.
    Jitted: the TPU backend has no eager complex FFT.

    delta_table: (logk_internal, sqrtP_internal) arrays for jnp.interp —
    the device-side form of DeltaSpec.
    growth_table: same grid, dlogGrowth values (only if scale_dep).
    Returns (disp[N,3], vel_disp[N,3]) in internal length units; vel_disp
    must still be multiplied by the velocity prefactor.
    """
    # all scalars as f32: x64 is enabled for host math, and a single
    # np.float64 here would promote the meshes to f64/complex128,
    # which the TPU backend cannot compile
    kx, ky, kz = _kvecs(nmesh)
    k2 = kx * kx + ky * ky + kz * kz
    kmag = jnp.sqrt(k2) * jnp.float32(2 * np.pi / boxsize)
    logk = jnp.log(jnp.maximum(kmag, 1e-30))
    sqrtP = jnp.exp(jnp.interp(logk, delta_table[0], delta_table[1]))
    sqrtP = jnp.where(k2 == 0, 0.0, sqrtP)
    # delta_k for a field with V^-1 convention; irfftn normalization
    # absorbs N^3 (see pm/gravity.py derivation)
    amp = sqrtP * jnp.float32(float(nmesh) ** 3 / boxsize ** 1.5)
    delta_k = (modes * amp).astype(jnp.complex64)

    k2safe = jnp.where(k2 == 0, 1.0, k2)
    disp = []
    vel = []
    for ka in (kx, ky, kz):
        fac = ka / k2safe * jnp.float32(boxsize / (2 * np.pi))
        psi_k = delta_k * (1j * fac)
        ifftn = _irfft3 if nmesh > 256 else jnp.fft.irfftn
        psi = ifftn(psi_k)
        disp.append(cic_readout(psi, ipos))
        if scale_dep_velocity:
            growth = jnp.interp(logk, growth_table[0], growth_table[1])
            psi_v = delta_k * (1j * fac * growth)
            vel.append(cic_readout(ifftn(psi_v), ipos))
    disp = jnp.stack(disp, axis=-1)
    vel = jnp.stack(vel, axis=-1) if scale_dep_velocity else disp
    return disp, vel


@partial(jax.jit, static_argnames=("nmesh", "boxsize"))
def density_field(modes, delta_table, nmesh, boxsize, ipos):
    """delta(x) at particle positions, smoothed by one mesh cell
    (density_transfer, zeldovich.c:283-296)."""
    kx, ky, kz = _kvecs(nmesh)
    k2 = kx * kx + ky * ky + kz * kz
    kmag = jnp.sqrt(k2) * jnp.float32(2 * np.pi / boxsize)
    logk = jnp.log(jnp.maximum(kmag, 1e-30))
    sqrtP = jnp.exp(jnp.interp(logk, delta_table[0], delta_table[1]))
    sqrtP = jnp.where(k2 == 0, 0.0, sqrtP)
    smooth = jnp.exp(-k2 * jnp.float32(1.0 / nmesh) ** 2)
    amp = sqrtP * smooth * jnp.float32(float(nmesh) ** 3 / boxsize ** 1.5)
    ifftn = _irfft3 if nmesh > 256 else jnp.fft.irfftn
    delta = ifftn((modes * amp).astype(jnp.complex64))
    return cic_readout(delta, ipos)


def delta_table_from_powerspec(pspec, boxsize, nmesh, ptype=DELTA_TOT,
                               npoints=512):
    """Tabulate log sqrt(P) on a log-k grid spanning the mesh modes,
    for device-side jnp.interp."""
    kmin = 2 * np.pi / boxsize * 0.5
    kmax = 2 * np.pi / boxsize * nmesh * np.sqrt(3.0)
    logk = np.linspace(np.log(kmin), np.log(kmax), npoints)
    delta = pspec.delta_spec(np.exp(logk), ptype)
    return (jnp.asarray(logk, jnp.float32),
            jnp.asarray(np.log(np.maximum(delta, 1e-99)), jnp.float32))


def generate_ic_species(pspec, cosmology, seed, ngrid, nmesh, boxsize,
                        atime, ptype=DELTA_TOT, shift=0.0,
                        unitary=True, invert=False,
                        use_peculiar_velocity=True,
                        scale_dep_velocity=False,
                        pre_pos=None):
    """Full Zel'dovich IC for one species.  Returns dict of host arrays:
    pos (displaced, internal units), vel (internal a^2 xdot), pid.

    pre_pos: optional pre-displacement positions (e.g. a relaxed glass
    from genic.glass) replacing the regular lattice; IDs stay the
    lattice IDs (genic/main.c:139-154 keeps idgen ordering)."""
    grid_pos, pid = make_grid(ngrid, boxsize, shift)
    if pre_pos is not None:
        grid_pos = np.asarray(pre_pos, np.float64)
    ipos = jnp.asarray(pos_to_fixed(grid_pos, boxsize))
    modes = gaussian_modes(seed, nmesh, unitary, invert)
    dtab = delta_table_from_powerspec(pspec, boxsize, nmesh, ptype)
    gtab = dtab
    if scale_dep_velocity:
        logk = np.asarray(dtab[0], np.float64)
        growth = pspec.dlog_growth(np.exp(logk), ptype)
        gtab = (dtab[0], jnp.asarray(growth, jnp.float32))
    disp, veldisp = displacement_fields(
        modes, dtab, gtab, nmesh, boxsize, ipos, scale_dep_velocity)
    disp = np.asarray(disp, np.float64)
    veldisp = np.asarray(veldisp, np.float64)

    # File-value velocity exactly as zeldovich.c:193-209: peculiar
    # v_pec = a H f psi, or classic-gadget v_pec/sqrt(a).
    hubble_a = cosmology.hubble_function(atime)
    vel_prefac = atime * hubble_a
    if not use_peculiar_velocity:
        vel_prefac /= np.sqrt(atime)
    if not scale_dep_velocity:
        vel_prefac *= cosmology.F_Omega(atime)

    pos = np.mod(grid_pos + disp, boxsize)
    vel_file = veldisp * vel_prefac
    # Internal velocity per the snapshot reader (petaio.c STVelocity):
    # internal = file * a if peculiar, else file unchanged.
    vel_internal = vel_file * atime if use_peculiar_velocity else vel_file
    return {"pos": pos, "vel": vel_internal, "vel_file": vel_file,
            "pid": pid, "pre_pos": grid_pos, "disp": disp}
