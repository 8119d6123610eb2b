"""Long-range PM gravity: CIC deposit -> FFT -> Green's function -> forces.

TPU-native replacement for the reference's petapm/gravpm stack
(libgadget/petapm.c, libgadget/gravpm.c): the pencil-decomposed PFFT with
explicit alltoallv layouts becomes ``jnp.fft.rfftn`` over a (possibly
sharded) mesh; the per-k-mode transfer callbacks become vectorized
k-space multiplies.

The k-space math matches gravpm.c exactly:
* potential transfer (gravpm.c:384-452):
    fac = -G/(pi*L) * exp(-k2 * (2 pi Asmth/Nmesh)^2) / k2 * deconv^2
  with k2 in integer mode units and deconv = prod_axis 1/sinc^2(pi k_i/N).
  (An extra Nmesh^3 here because jnp.fft.irfftn normalizes; PFFT's c2r
  does not.)
* force transfer (gravpm.c:458-499): the 4th-order "super-Lanczos"
  finite difference i*D(w), D(w) = (8 sin w - sin 2w)/6, w = 2 pi k_i/N,
  scaled by Nmesh/L, with a minus sign for force = -grad phi.
* in-line total-matter power spectrum (powerspectrum.c:120-160):
  log-spaced bins of w*|rho_k|^2*deconv^2, w=2 except on the kz=0 and
  kz=N/2 planes, normalized by |rho_k(0)|^2 and converted to Mpc/h units.
"""

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.cic import cic_deposit, cic_readout, cic_readout_vec
from ..utils import constants as C


@dataclass(frozen=True)
class PMConfig:
    nmesh: int
    boxsize: float          # internal units
    asmth: float = 1.5      # force split scale in mesh cells
    G: float = 43007.1      # internal gravitational constant
    unitlength_in_cm: float = C.CM_PER_KPC


@dataclass
class PowerSpectrum:
    """Binned total-matter P(k), Mpc/h units (powerspectrum_sum)."""
    k: np.ndarray           # mean k per bin, h/Mpc
    power: np.ndarray       # P(k), (Mpc/h)^3
    nmodes: np.ndarray
    norm: float

    def save(self, outdir, time, D1, filename="powerspectrum"):
        import os
        if time <= 1e-4:
            fname = os.path.join(outdir, f"{filename}-{time:0.4e}.txt")
        else:
            fname = os.path.join(outdir, f"{filename}-{time:0.4f}.txt")
        with open(fname, "w") as fp:
            fp.write("# in Mpc/h Units \n")
            fp.write(f"# D1 = {D1:g} \n")
            fp.write("# k P N P(z=0)\n")
            for i in range(len(self.k)):
                if self.nmodes[i] == 0:
                    continue
                fp.write(f"{self.k[i]:g} {self.power[i]:g} "
                         f"{int(self.nmodes[i])} "
                         f"{self.power[i] / (D1 * D1):g}\n")
        return fname


def _kmodes(nmesh):
    """Signed integer mode numbers for an rfftn layout."""
    kx = jnp.fft.fftfreq(nmesh, 1.0 / nmesh).astype(jnp.float32)
    kz = jnp.arange(nmesh // 2 + 1, dtype=jnp.float32)
    return (kx[:, None, None], kx[None, :, None], kz[None, None, :])


def _sinc(x):
    """Unnormalized sinc: sin(x)/x with sinc(0)=1."""
    return jnp.where(jnp.abs(x) < 1e-5, 1.0, jnp.sin(x) / jnp.where(
        jnp.abs(x) < 1e-5, 1.0, x))


def _deconv(nmesh):
    """CIC deconvolution 1/sinc^2 per axis, product over axes."""
    kx, ky, kz = _kmodes(nmesh)
    f = 1.0
    for k in (kx, ky, kz):
        s = _sinc(k * (np.pi / nmesh))
        f = f / (s * s)
    return f


def _diff_kernel(w):
    """4th-order finite-difference kernel, gravpm.c:458-468."""
    return (8.0 * jnp.sin(w) - jnp.sin(2.0 * w)) / 6.0


def _bin_reduce(kint_flat, nbins, *vals):
    """Per-bin sums of each flat vals array, grouped by kint_flat.

    TPU-native replacement for bincount/scatter-add (slow element
    scatters on TPU): chunks of an on-the-fly one-hot matrix are
    contracted against the values on the MXU, so the whole reduction
    is a scan of small matmuls.  kint == nbins rows are dropped.
    """
    K = kint_flat.shape[0]
    CH = min(131072, K)
    pad = (-K) % CH
    kint_p = jnp.pad(kint_flat, (0, pad), constant_values=nbins)
    vals_p = [jnp.pad(v.astype(jnp.float32), (0, pad)) for v in vals]
    nch = (K + pad) // CH
    iota = jnp.arange(nbins + 1, dtype=kint_flat.dtype)

    def body(acc, xs):
        kc = xs[0]
        oh = (kc[:, None] == iota[None, :]).astype(jnp.float32)
        return tuple(a + vc @ oh for a, vc in zip(acc, xs[1:])), None

    init = tuple(jnp.zeros(nbins + 1, jnp.float32) for _ in vals)
    accs, _ = jax.lax.scan(
        body, init,
        tuple(a.reshape(nch, CH) for a in (kint_p, *vals_p)))
    return [a[:nbins] for a in accs]


def potential_transfer_fac(k2, deconv, nmesh, boxsize, gconst, asmth):
    """Green's function x Gaussian split x CIC deconv^2, gravpm.c:384-452.

    k2 in integer mode units.  Includes the nmesh^3 factor cancelling
    the 1/N^3 of a normalized inverse FFT.  Shared by the single-chip
    kernel and the sharded pencil FFT (parallel/pfft.py) so the k-space
    math cannot drift between them.
    """
    asmth2 = (2.0 * np.pi * asmth / nmesh) ** 2
    k2safe = jnp.where(k2 == 0, 1.0, k2)
    fac = (-gconst * float(nmesh) ** 3 / (np.pi * boxsize)
           * jnp.exp(-k2 * asmth2) / k2safe * deconv * deconv)
    return jnp.where(k2 == 0, 0.0, fac)


def force_transfer_fac(k, nmesh, boxsize):
    """i-multiplier for the force along one axis (applied as *1j*fac):
    4th-order super-Lanczos finite difference, gravpm.c:458-499."""
    w = k * (2.0 * np.pi / nmesh)
    return -_diff_kernel(w) * (nmesh / boxsize)


def _rfft3(x):
    """rfftn as three axis-0 1-D passes with explicit transposes.

    XLA's TPU plan for an FFT along a MINOR axis at N=512 factorizes
    512 = 128*4 and materializes an f32[512,512,128,4] temp whose
    trailing dim tiles 32x to 16 GB (measured from the HBM allocation
    dump).  Transforming only along axis 0 keeps the factorization
    reshape's minor dims at their original (tile-friendly) sizes; the
    three 1 GB transposes are pure bandwidth (~ms each)."""
    t = jnp.transpose(x, (2, 0, 1))          # (z, x, y)
    t = jnp.fft.rfft(t, axis=0)              # (zk, x, y)
    t = jnp.transpose(t, (1, 0, 2))          # (x, zk, y)
    t = jnp.fft.fft(t, axis=0)               # (xk, zk, y)
    t = jnp.transpose(t, (2, 1, 0))          # (y, zk, xk)
    t = jnp.fft.fft(t, axis=0)               # (yk, zk, xk)
    return jnp.transpose(t, (2, 0, 1))       # (xk, yk, zk)


def _irfft3(k):
    t = jnp.transpose(k, (1, 2, 0))          # (yk, zk, xk)
    t = jnp.fft.ifft(t, axis=0)              # (y, zk, xk)
    t = jnp.transpose(t, (2, 1, 0))          # (xk, zk, y)
    t = jnp.fft.ifft(t, axis=0)              # (x, zk, y)
    t = jnp.transpose(t, (1, 0, 2))          # (zk, x, y)
    t = jnp.fft.irfft(t, axis=0)             # (z, x, y)
    return jnp.transpose(t, (1, 2, 0))       # (x, y, z)


@partial(jax.jit, static_argnames=("nmesh", "compute_potential", "nbins"))
def _pm_force_kernel(ipos, weights, nmesh, boxsize, gconst, asmth,
                     nu_logk=None, nu_fac=None, compute_potential=True,
                     nbins=None):
    """Core jitted PM computation; returns per-particle accel/potential
    and the raw binned power-spectrum accumulators."""
    boxsize = jnp.float32(boxsize)
    mass_mesh = cic_deposit(ipos, weights, nmesh)
    big = nmesh > 256
    rho_k = _rfft3(mass_mesh) if big else jnp.fft.rfftn(mass_mesh)

    kx, ky, kz = _kmodes(nmesh)
    k2 = kx * kx + ky * ky + kz * kz
    deconv = _deconv(nmesh)

    if nu_logk is not None:
        # massive-neutrino linear response: multiply modes by the
        # interpolated 1 + f_nu delta_nu/delta_cdm table
        # (potential_transfer, gravpm.c:415-436)
        kmag = jnp.sqrt(k2) * (2 * np.pi / boxsize)
        fac_nu = jnp.interp(jnp.log(jnp.maximum(kmag, 1e-30)),
                            nu_logk, nu_fac)
        rho_k = rho_k * jnp.where(k2 > 0, fac_nu, 1.0)

    # -- in-line power spectrum (powerspectrum_add_mode) ---------------
    if nbins is None:
        nbins = nmesh
    m2 = (rho_k.real ** 2 + rho_k.imag ** 2) * deconv * deconv
    w = jnp.where((kz == 0) | (kz == nmesh // 2), 1.0, 2.0) \
        * jnp.ones_like(k2)
    binsperunit = (nbins - 1) / np.log(np.sqrt(3.0) * nmesh / 2.0)
    kint = jnp.floor(binsperunit * 0.5 * jnp.log(
        jnp.maximum(k2, 1e-30))).astype(jnp.int32)
    kint = jnp.where(k2 == 0, nbins, kint)  # drop the zero mode
    keff = jnp.sqrt(k2)
    p_bins, n_bins, k_bins = _bin_reduce(
        kint.ravel(), nbins, (w * m2).ravel(), w.ravel(),
        (w * keff).ravel())
    norm = rho_k[0, 0, 0].real ** 2

    # -- potential transfer --------------------------------------------
    pot_k = rho_k * potential_transfer_fac(k2, deconv, nmesh, boxsize,
                                           gconst, asmth)

    out_pot = None
    if compute_potential:
        pot_mesh = _irfft3(pot_k) if big else jnp.fft.irfftn(pot_k)
        out_pot = cic_readout(pot_mesh, ipos)

    # -- force transfer per axis -------------------------------------
    if nmesh <= 256:
        # single stacked readout pass: one gather for 3 meshes
        meshes = []
        for axis, kk in enumerate((kx, ky, kz)):
            force_k = pot_k * (1j * force_transfer_fac(kk, nmesh,
                                                       boxsize))
            meshes.append(jnp.fft.irfftn(force_k))
        accel = cic_readout_vec(jnp.stack(meshes, axis=-1), ipos)
    else:
        # large meshes: per-component readout keeps only ONE force
        # mesh live at a time (the 3-mesh stack at 512^3 is 1.6 GB —
        # the difference between fitting 256^3 particles in HBM or
        # not)
        comps = []
        for axis, kk in enumerate((kx, ky, kz)):
            force_k = pot_k * (1j * force_transfer_fac(kk, nmesh,
                                                       boxsize))
            comps.append(cic_readout(_irfft3(force_k), ipos))
        accel = jnp.stack(comps, axis=-1)

    return accel, out_pot, (p_bins, n_bins, k_bins, norm)


@partial(jax.jit, static_argnames=("nmesh",))
def _pm_deposit_j(ipos, weights, nmesh):
    return cic_deposit(ipos, weights, nmesh)


@partial(jax.jit, static_argnames=("nmesh", "nbins"))
def _pm_fwd_j(mesh, nmesh, nbins):
    """rfft + in-line power binning as its own XLA program."""
    rho_k = _rfft3(mesh)
    kx, ky, kz = _kmodes(nmesh)
    k2 = kx * kx + ky * ky + kz * kz
    deconv = _deconv(nmesh)
    m2 = (rho_k.real ** 2 + rho_k.imag ** 2) * deconv * deconv
    w = jnp.where((kz == 0) | (kz == nmesh // 2), 1.0, 2.0) \
        * jnp.ones_like(k2)
    binsperunit = (nbins - 1) / np.log(np.sqrt(3.0) * nmesh / 2.0)
    kint = jnp.floor(binsperunit * 0.5 * jnp.log(
        jnp.maximum(k2, 1e-30))).astype(jnp.int32)
    kint = jnp.where(k2 == 0, nbins, kint)
    keff = jnp.sqrt(k2)
    p_bins, n_bins, k_bins = _bin_reduce(
        kint.ravel(), nbins, (w * m2).ravel(), w.ravel(),
        (w * keff).ravel())
    norm = rho_k[0, 0, 0].real ** 2
    return rho_k, (p_bins, n_bins, k_bins, norm)


@partial(jax.jit, static_argnames=("nmesh", "axis"))
def _pm_axis_mesh_j(rho_k, nmesh, boxsize, gconst, asmth, axis):
    """Real-space force mesh for one axis as its own XLA program."""
    kx, ky, kz = _kmodes(nmesh)
    k2 = kx * kx + ky * ky + kz * kz
    deconv = _deconv(nmesh)
    pot_k = rho_k * potential_transfer_fac(k2, deconv, nmesh,
                                           jnp.float32(boxsize),
                                           gconst, asmth)
    kk = (kx, ky, kz)[axis]
    fk = pot_k * (1j * force_transfer_fac(kk, nmesh,
                                          jnp.float32(boxsize)))
    return _irfft3(fk)


@partial(jax.jit, static_argnames=("nmesh",))
def _pm_pot_mesh_j(rho_k, nmesh, boxsize, gconst, asmth):
    kx, ky, kz = _kmodes(nmesh)
    k2 = kx * kx + ky * ky + kz * kz
    deconv = _deconv(nmesh)
    pot_k = rho_k * potential_transfer_fac(k2, deconv, nmesh,
                                           jnp.float32(boxsize),
                                           gconst, asmth)
    return _irfft3(pot_k)


@jax.jit
def _pm_readout3_j(m0, m1, m2, ipos):
    """One CIC pass over all three force meshes: the 8 corner gathers
    fetch 12-byte rows of the stacked mesh instead of 3 separate
    scalar-gather passes (measured 3x cheaper at 16.7M particles)."""
    meshes = jnp.stack([m0, m1, m2], axis=-1)
    return cic_readout_vec(meshes, ipos)


@jax.jit
def _pm_readout4_j(m0, m1, m2, m3, ipos):
    meshes = jnp.stack([m0, m1, m2, m3], axis=-1)
    return cic_readout_vec(meshes, ipos)


def pm_force_split(ipos, weights, nmesh, boxsize, gconst, asmth,
                   compute_potential=False, nbins=None):
    """PM force as SEPARATE XLA programs (deposit / fft+power / one
    ifft per force axis / one vector readout).

    A monolithic program at nmesh=512 lets XLA's layout assignment put
    the FFT factorization temp in a 32x-padded tiling (16 GB, OOM);
    compiled standalone each stage picks compact layouts (measured:
    the same FFT runs in ~90 ms).  Used by the single-chip path when
    nmesh > 256; costs a few extra dispatches per step."""
    if nbins is None:
        nbins = nmesh
    gconst = jnp.float32(gconst)
    asmth = jnp.float32(asmth)
    mesh = _pm_deposit_j(ipos, weights, nmesh)
    rho_k, pk = _pm_fwd_j(mesh, nmesh, nbins)
    meshes = [_pm_axis_mesh_j(rho_k, nmesh, boxsize, gconst, asmth, ax)
              for ax in range(3)]
    if compute_potential:
        meshes.append(_pm_pot_mesh_j(rho_k, nmesh, boxsize, gconst,
                                     asmth))
        out = _pm_readout4_j(*meshes, ipos)
        return out[:, :3], out[:, 3], pk
    accel = _pm_readout3_j(*meshes, ipos)
    return accel, None, pk


def pm_force(ipos, weights, cfg: PMConfig,
             nu_table=None,
             compute_potential: bool = True):
    """PM long-range force for particles at fixed-point positions.

    nu_table: optional (logk, fac) arrays for the neutrino linear
    response multiplier.  Returns (accel f32[N,3] comoving internal,
    potential f32[N] or None, PowerSpectrum).  weights must be zero for
    invalid particles.
    """
    nu_logk, nu_fac = (None, None) if nu_table is None else (
        jnp.asarray(nu_table[0], jnp.float32),
        jnp.asarray(nu_table[1], jnp.float32))
    accel, pot, (p, n, k, norm) = _pm_force_kernel(
        ipos, weights, cfg.nmesh, cfg.boxsize, cfg.G, cfg.asmth,
        nu_logk, nu_fac, compute_potential)
    ps = _finalize_power(np.asarray(p), np.asarray(n), np.asarray(k),
                         float(norm), cfg)
    return accel, pot, ps


def _finalize_power(p, n, k, norm, cfg: PMConfig) -> PowerSpectrum:
    """powerspectrum_sum: normalize and convert to Mpc/h units."""
    box_mpc = cfg.boxsize * cfg.unitlength_in_cm / C.CM_PER_MPC
    good = n > 0
    pk = np.zeros_like(p)
    kk = np.zeros_like(k)
    with np.errstate(invalid="ignore", divide="ignore"):
        pk[good] = p[good] / n[good] / max(norm, 1e-300) * box_mpc ** 3
        kk[good] = k[good] / n[good] * 2 * np.pi / box_mpc
    return PowerSpectrum(k=kk[good], power=pk[good], nmodes=n[good],
                         norm=norm)


@partial(jax.jit, static_argnames=("nmesh", "nbins"))
def _measure_power_kernel(ipos, weights, nmesh, nbins=None):
    """Deposit + FFT + binned |delta_k|^2 only (measure_power_spectrum,
    powerspectrum.c:163-180): used to get delta_cdm for the neutrino
    response before the potential multiplier is applied."""
    mass_mesh = cic_deposit(ipos, weights, nmesh)
    big = nmesh > 256
    rho_k = _rfft3(mass_mesh) if big else jnp.fft.rfftn(mass_mesh)
    kx, ky, kz = _kmodes(nmesh)
    k2 = kx * kx + ky * ky + kz * kz
    deconv = _deconv(nmesh)
    if nbins is None:
        nbins = nmesh
    m2 = (rho_k.real ** 2 + rho_k.imag ** 2) * deconv * deconv
    w = jnp.where((kz == 0) | (kz == nmesh // 2), 1.0, 2.0) \
        * jnp.ones_like(k2)
    binsperunit = (nbins - 1) / np.log(np.sqrt(3.0) * nmesh / 2.0)
    kint = jnp.floor(binsperunit * 0.5 * jnp.log(
        jnp.maximum(k2, 1e-30))).astype(jnp.int32)
    kint = jnp.where(k2 == 0, nbins, kint)
    keff = jnp.sqrt(k2)
    p_bins, n_bins, k_bins = _bin_reduce(
        kint.ravel(), nbins, (w * m2).ravel(), w.ravel(),
        (w * keff).ravel())
    norm = rho_k[0, 0, 0].real ** 2
    return p_bins, n_bins, k_bins, norm


def measure_power(ipos, weights, cfg: PMConfig) -> PowerSpectrum:
    p, n, k, norm = _measure_power_kernel(ipos, weights, cfg.nmesh)
    return _finalize_power(np.asarray(p), np.asarray(n), np.asarray(k),
                           float(norm), cfg)
