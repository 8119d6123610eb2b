"""Weak-lensing potential planes (libgadget/plane.c:572-668 +
lenstools.c:168-320 analog).

At requested output times the matter distribution is cut into slabs
along chosen axis normals; each slab's projected overdensity is
Poisson-solved in 2-D Fourier space into the lensing potential (in
rad^2, the lenstools convention) and written as a FITS image with the
lenstools header keys, so downstream lenstools ray-tracing works
unchanged.

TPU-native notes: the NGP binning is one flat scatter-add; the 2-D
Poisson solve is an rfft2 with the reference's exact multipole factor
-2 (b0 b1/chi^2) / (4 pi^2 l^2) and 1-pixel Gaussian smoothing.  The
optional PM massive-neutrino correction plane (plane.c:389-447) is not
yet implemented; a warning is printed when it would apply.
"""

from dataclasses import dataclass, field
from typing import List

import numpy as np
import jax
import jax.numpy as jnp
from scipy import integrate

from ..utils import constants as C


@dataclass
class PlaneParams:
    output_times: List[float] = field(default_factory=list)
    resolution: int = 256
    thickness: float = -1.0          # internal units; <=0: boxsize
    cut_points: List[float] = field(default_factory=list)
    normals: List[int] = field(default_factory=lambda: [0, 1, 2])
    massive_nu_correction: bool = True
    double_out: bool = False


def comoving_distance(CP, a0, a1, unit_velocity_cm_s):
    """c * int da / (a^2 H) in internal length units
    (compute_comoving_distance, timefac.c:84-98)."""
    val, _ = integrate.quad(
        lambda a: 1.0 / (a * a * CP.hubble_function(a)), a0, a1,
        epsabs=0, epsrel=1e-8, limit=100)
    return C.LIGHTCGS / unit_velocity_cm_s * val


from functools import partial


@partial(jax.jit, static_argnames=("normal_axis", "resolution"))
def _project_slab(ipos, weights, normal_axis, center_box, half_box,
                  resolution):
    """NGP count of particles within the periodic slab, projected onto
    the perpendicular plane (grid3d_ngb + projectDensity analog)."""
    pos = ipos.astype(jnp.float32) * jnp.float32(2.0 ** -32)
    dn = pos[:, normal_axis] - center_box
    dn = dn - jnp.round(dn)
    inside = (jnp.abs(dn) < half_box) & (weights > 0)
    d0 = (normal_axis + 1) % 3
    d1 = (normal_axis + 2) % 3
    i0 = jnp.clip((pos[:, d0] * resolution).astype(jnp.int32), 0,
                  resolution - 1)
    i1 = jnp.clip((pos[:, d1] * resolution).astype(jnp.int32), 0,
                  resolution - 1)
    flat = i0 * resolution + i1
    counts = jnp.zeros(resolution * resolution, jnp.float32).at[
        jnp.where(inside, flat, resolution * resolution)].add(
        1.0, mode="drop")
    return (counts.reshape(resolution, resolution),
            jnp.sum(inside.astype(jnp.int64)))


@jax.jit
def _lensing_potential_fft(density, b0, b1, chi, smooth=1.0):
    """2-D Poisson solve with Gaussian smoothing
    (calculate_lensing_potential, lenstools.c:168-230)."""
    res = density.shape[0]
    dk = jnp.fft.rfft2(density)
    lx = jnp.fft.fftfreq(res).astype(jnp.float32)
    ly = jnp.arange(res // 2 + 1, dtype=jnp.float32) / res
    l2 = lx[:, None] ** 2 + ly[None, :] ** 2
    l2 = l2.at[0, 0].set(1.0)
    fac = (-2.0 * (b0 * b1 / (chi * chi))
           / (l2 * 4.0 * np.pi ** 2)
           * jnp.exp(-0.5 * (2.0 * np.pi * smooth) ** 2 * l2))
    dk = dk * fac
    dk = dk.at[0, 0].set(0.0)
    return jnp.fft.irfft2(dk, s=(res, res))


def cut_plane(ipos, weights, n_tot, boxsize, CP, atime, normal, center,
              thickness, resolution, chi):
    """One lensing-potential plane (cutPlaneGaussianGrid,
    lenstools.c:233-320).  Returns (plane f64[res,res], n_on_plane)."""
    counts, n_plane = _project_slab(
        ipos, weights, normal, jnp.float32(center / boxsize),
        jnp.float32(0.5 * thickness / boxsize), resolution)
    cell = boxsize / resolution
    norm_fac = (boxsize ** 3
                / (cell * cell * thickness)) / max(float(n_tot), 1.0)
    density = counts * jnp.float32(norm_fac)
    pot = _lensing_potential_fft(density, jnp.float32(cell),
                                 jnp.float32(cell), jnp.float32(chi))
    omega_source = CP.Omega0
    if getattr(CP, "MassiveNuLinRespOn", False):
        omega_source -= atime ** 3 * CP.ONu.nopart(atime)
    H0 = 100.0 * CP.HubbleParam * 3.2407793e-20      # 1/s
    cosmo_norm = 1.5 * H0 * H0 * omega_source / C.LIGHTCGS ** 2
    density_norm = (thickness * chi
                    * (C.CM_PER_KPC / CP.HubbleParam) ** 2 / atime)
    return (np.asarray(pot, np.float64) * cosmo_norm * density_norm,
            int(n_plane))


def write_planes(sim, snapnum, params: PlaneParams, ipos=None,
                 weights=None, n_tot=None, write=True):
    """Compute + write all (cut, normal) planes (write_plane,
    plane.c:572-668).

    ipos/weights/n_tot default to the host-side sim.pdata arrays; the
    sharded run passes the mesh-sharded state columns instead (the
    deposit is elementwise + scatter, so XLA partitions it) with
    ``write`` gating the FITS output to rank 0."""
    import os
    from ..io.fits import write_fits_image
    boxsize = sim.cfg.boxsize
    thickness = params.thickness if params.thickness > 0 else boxsize
    cuts = list(params.cut_points)
    if not cuts:
        ncut = max(int(boxsize / thickness), 1)
        cuts = [(0.5 + i) * thickness for i in range(ncut)]
    atime = sim.atime
    chi = comoving_distance(sim.CP, atime, 1.0,
                            sim.cfg.units.UnitVelocity_in_cm_per_s)
    if params.massive_nu_correction \
            and getattr(sim.CP, "MassiveNuLinRespOn", False):
        print("PlaneMassiveNuCorrection: PM neutrino-correction plane "
              "not yet implemented; writing particle planes only")
    if ipos is None:
        weights = jnp.where(sim.pdata.valid, 1.0, 0.0)
        n_tot = int(np.asarray(sim.pdata.num_valid))
        # planes use unshifted positions (random offset removed)
        ip = np.asarray(sim.pdata.ipos)
        ip = (ip.astype(np.uint64)
              - sim._ipos_offset.astype(np.uint64)).astype(np.uint32)
        ip = jnp.asarray(ip)
    else:
        ip = ipos
    ulen = sim.cfg.units.UnitLength_in_cm
    redshift = 1.0 / atime - 1.0
    written = []
    for ci, cut in enumerate(cuts):
        for normal in params.normals:
            plane, n_plane = cut_plane(
                ip, weights, n_tot, boxsize, sim.CP, atime,
                int(normal), float(cut), thickness,
                params.resolution, chi)
            fname = os.path.join(
                sim.cfg.output_dir,
                f"snap{snapnum}_potentialPlane{ci}_normal{normal}"
                ".fits")
            ode0 = sim.CP.OmegaLambda if sim.CP.OmegaLambda > 0 \
                else getattr(sim.CP, "Omega_fld", 0.0)
            header = [
                ("H0", sim.CP.HubbleParam * 100.0,
                 "Hubble constant in km/s*Mpc"),
                ("h", sim.CP.HubbleParam,
                 "Dimensionless Hubble constant"),
                ("OMEGA_M", sim.CP.Omega0, "Dark Matter density"),
                ("OMEGA_L", ode0, "Dark Energy density"),
                ("W0", getattr(sim.CP, "w0_fld", -1.0),
                 "Dark Energy equation of state"),
                ("WA", getattr(sim.CP, "wa_fld", 0.0),
                 "Dark Energy running equation of state"),
                ("Z", redshift, "Redshift of the lens plane"),
                ("CHI", chi * ulen / C.CM_PER_MPC,
                 "Comoving distance in Mpc/h"),
                ("SIDE", boxsize * ulen / C.CM_PER_MPC,
                 "Side length in Mpc/h"),
                ("NPART", n_plane,
                 "Number of particles on the plane"),
                ("UNIT", "rad2", "Pixel value unit"),
            ]
            if write:
                write_fits_image(fname, plane, header,
                                 double=params.double_out)
            written.append(fname)
    return written
