"""IC generation tests: the measured power spectrum of a generated
realization must match the input spectrum (the reference validates this
in examples/travis check-results.py against CLASS linear theory)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mpgadget_tpu.cosmology import Cosmology
from mpgadget_tpu.utils import get_unitsystem, constants as C
from mpgadget_tpu.genic.power import PowerSpec, PowerParams, DELTA_TOT
from mpgadget_tpu.genic.zeldovich import (generate_ic_species, make_grid,
                                          gaussian_modes)
from mpgadget_tpu.pm import pm_force, PMConfig
from mpgadget_tpu.particles import pos_to_fixed

UNITS = get_unitsystem(C.CM_PER_KPC, 1.989e43, 1e5)


def write_powerlaw_table(path, amp=1e4, slope=-1.5):
    """P(k) = amp * k^slope, k in h/Mpc, P in (Mpc/h)^3."""
    k = np.logspace(-4, 3, 200)
    with open(path, "w") as fh:
        fh.write("# k P\n")
        for ki in k:
            fh.write(f"{ki} {amp * ki ** slope}\n")


@pytest.fixture(scope="module")
def cosmo():
    cp = Cosmology(Omega0=0.3, OmegaBaryon=0.0, OmegaLambda=0.7,
                   HubbleParam=0.7, RadiationOn=False)
    return cp.init_units(UNITS)


def test_powerspec_reading(tmp_path, cosmo):
    path = tmp_path / "pk.txt"
    write_powerlaw_table(str(path), amp=1e4, slope=-1.5)
    ps = PowerSpec(PowerParams(FileWithInputSpectrum=str(path)), cosmo,
                   InitTime=1.0)
    # delta^2 = P: at k = 1 h/Mpc = 1/1000 kpc/h
    k_int = 1.0 / 1000.0
    expect = 1e4 * 1.0 ** -1.5 * 1000.0 ** 3  # (kpc/h)^3
    assert np.isclose(ps.delta_spec(k_int, DELTA_TOT) ** 2, expect,
                      rtol=1e-3)
    # power law continues at other k
    k2 = 0.1 / 1000.0
    expect2 = 1e4 * 0.1 ** -1.5 * 1000.0 ** 3
    assert np.isclose(ps.delta_spec(k2, DELTA_TOT) ** 2, expect2, rtol=1e-3)


def test_sigma8_normalization(tmp_path, cosmo):
    path = tmp_path / "pk.txt"
    write_powerlaw_table(str(path))
    ps0 = PowerSpec(PowerParams(FileWithInputSpectrum=str(path)), cosmo,
                    InitTime=1.0)
    s8 = np.sqrt(ps0.tophat_sigma2(8000.0))
    ps = PowerSpec(PowerParams(FileWithInputSpectrum=str(path),
                               Sigma8=0.8), cosmo, InitTime=1.0)
    # renormalized: sigma8 is now 0.8
    s8_new = np.sqrt(ps.tophat_sigma2(8000.0))
    assert np.isclose(s8_new, 0.8, rtol=1e-3)
    assert not np.isclose(s8, 0.8, rtol=0.2)  # original was different


def test_ic_power_matches_input(tmp_path, cosmo):
    """Generate unitary-amplitude ICs; measured P(k) must equal input."""
    path = tmp_path / "pk.txt"
    # keep displacements << particle spacing so the Zel'dovich density is
    # linear and the measured P is not suppressed by nonlinear smearing
    amp = 0.05
    write_powerlaw_table(str(path), amp=amp, slope=-1.0)
    pspec = PowerSpec(PowerParams(FileWithInputSpectrum=str(path)), cosmo,
                      InitTime=1.0)
    ngrid = 32
    nmesh = 64
    box = 32000.0  # 32 Mpc/h
    ic = generate_ic_species(pspec, cosmo, seed=181170, ngrid=ngrid,
                             nmesh=nmesh, boxsize=box, atime=1.0,
                             unitary=True)
    cfg = PMConfig(nmesh=nmesh, boxsize=box, asmth=1.5, G=1.0)
    ipos = jnp.asarray(pos_to_fixed(ic["pos"], box))
    mass = jnp.ones(len(ic["pos"]), jnp.float32)
    _, _, meas = pm_force(ipos, mass, cfg, compute_potential=False)
    # compare in well-sampled range: k between ~4 fundamental modes and
    # half the particle Nyquist
    kf = 2 * np.pi / 32.0  # h/Mpc
    knyq = np.pi * ngrid / 32.0
    sel = (meas.k > 4 * kf) & (meas.k < 0.5 * knyq)
    assert sel.sum() > 5
    p_in = amp * meas.k[sel] ** -1.0
    ratio = meas.power[sel] / p_in
    # Unitary amplitude: no cosmic variance, only binning/CIC effects
    assert np.all(np.abs(ratio - 1) < 0.1), \
        f"P(k) ratios: {ratio}"


def test_ic_displacement_magnitude(tmp_path, cosmo):
    """Zel'dovich displacement rms = sqrt(int d^3k P(k)/k^2 /(2pi)^3)."""
    path = tmp_path / "pk.txt"
    amp = 100.0
    write_powerlaw_table(str(path), amp=amp, slope=0.0)  # white noise P
    pspec = PowerSpec(PowerParams(FileWithInputSpectrum=str(path)), cosmo,
                      InitTime=1.0)
    ngrid = 32
    nmesh = 32
    box = 32000.0
    ic = generate_ic_species(pspec, cosmo, seed=7, ngrid=ngrid,
                             nmesh=nmesh, boxsize=box, atime=1.0,
                             unitary=False)
    disp = ic["disp"]
    # expected per-component variance: (1/3) int_kmin^knyq dk k^2/(2pi^2)
    # * P / k^2 = P (knyq - kmin)/(6 pi^2) roughly (sharp cutoffs)
    box_mpc = 32.0
    p_mpc = amp
    kmin = 2 * np.pi / box_mpc
    knyq = np.pi * nmesh / box_mpc  # mesh Nyquist
    var_1d = p_mpc * (knyq - kmin) / (6 * np.pi ** 2)  # (Mpc/h)^2
    got = disp.std(axis=0).mean() / 1000.0  # Mpc/h
    assert np.isclose(got ** 2, var_1d, rtol=0.3), (got ** 2, var_1d)


def test_make_grid_ids():
    pos, pid = make_grid(4, 100.0)
    assert len(pos) == 64
    assert pid[0] == 1
    assert pid[-1] == 64
    assert len(np.unique(pid)) == 64
    np.testing.assert_allclose(pos[1], [0, 0, 25.0])


def test_gaussian_modes_deterministic():
    m1 = gaussian_modes(42, 16)
    m2 = gaussian_modes(42, 16)
    m3 = gaussian_modes(43, 16)
    assert np.array_equal(np.asarray(m1), np.asarray(m2))
    assert not np.array_equal(np.asarray(m1), np.asarray(m3))
    # inverted phase is exactly negated
    m4 = gaussian_modes(42, 16, invert=True)
    np.testing.assert_allclose(np.asarray(m4), -np.asarray(m1))
    # unitary: all nonzero modes have |delta| = 1
    mu = np.asarray(gaussian_modes(42, 16, unitary=True))
    amps = np.abs(mu)
    assert np.all(np.abs(amps[amps > 1e-6] - 1) < 1e-5)


def test_glass_suppresses_shot_noise():
    """Glass relaxation (genic.glass) must drive small-scale power well
    below the white-noise (Poisson) level of the initial random cloud,
    without leaving lattice order (no single dominant mode)."""
    from mpgadget_tpu.genic.glass import random_positions, glass_evolve
    from mpgadget_tpu.pm.gravity import measure_power, PMConfig

    ngrid, nmesh, box = 16, 32, 1000.0
    pos0 = random_positions(ngrid, box, seed=5)
    mass = np.ones(ngrid ** 3)
    pos = glass_evolve(pos0, mass, nmesh, box, nsteps=14)
    assert pos.shape == pos0.shape
    assert np.all((pos >= 0) & (pos < box))

    cfg = PMConfig(nmesh=nmesh, boxsize=box)
    w = jnp.asarray(mass, jnp.float32)
    p_before = measure_power(jnp.asarray(pos_to_fixed(pos0, box)), w, cfg)
    p_after = measure_power(jnp.asarray(pos_to_fixed(pos, box)), w, cfg)
    # compare total power in the resolved range (k below the particle
    # nyquist, where CIC deconvolution is trustworthy); measure_power
    # reports k in h/Mpc while box is internal kpc/h
    knyq = np.pi * ngrid / (box / 1000.0)
    sel = (p_before.k > 0) & (p_before.k < 0.6 * knyq) \
        & (p_after.nmodes > 0)
    before = np.sum(p_before.power[sel] * p_before.nmodes[sel])
    after = np.sum(p_after.power[sel] * p_after.nmodes[sel])
    assert after < 0.01 * before, (before, after)


def test_glass_wired_into_genic(tmp_path, cosmo):
    """MakeGlassCDM=1 must produce valid ICs whose positions are not on
    the lattice."""
    from mpgadget_tpu.params import create_genic_parameter_set
    from mpgadget_tpu.genic.main import run_genic
    from mpgadget_tpu.io.bigfile import BigFile

    table = tmp_path / "pk.txt"
    write_powerlaw_table(str(table))
    ps = create_genic_parameter_set()
    ps.set("OutputDir", str(tmp_path / "ics"))
    ps.set("FileBase", "IC")
    ps.set("BoxSize", 20000.0)
    ps.set("Ngrid", 8)
    ps.set("Nmesh", 16)
    ps.set("Redshift", 9.0)
    ps.set("Omega0", 0.3)
    ps.set("OmegaLambda", 0.7)
    ps.set("OmegaBaryon", 0.0)
    ps.set("HubbleParam", 0.7)
    ps.set("ProduceGas", 0)
    ps.set("MakeGlassCDM", 1)
    ps.set("WhichSpectrum", 2)
    ps.set("FileWithInputSpectrum", str(table))
    ps.set("InputPowerRedshift", 9.0)
    ps.set("Seed", 42)
    path = run_genic(ps)
    bf = BigFile(path)
    pos = bf.open("1/Position").read()
    assert pos.shape == (512, 3)
    # lattice spacing is 2500; glass positions must be off-lattice
    frac = np.mod(pos / 2500.0, 1.0)
    offlattice = np.minimum(frac, 1 - frac)
    assert np.mean(offlattice) > 0.02
