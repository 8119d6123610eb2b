"""QSO helium reionization (cooling_qso_lightup.c:642-690 analogs):
table parsing, bubble ionization tracking the input history, flash
finish, and long-mean-free-path heating."""

import numpy as np
import jax.numpy as jnp
import pytest

from mpgadget_tpu.physics import qso_lightup as q


REF_TABLE = "/root/reference/examples/HeIIReionizationTable"


def _write_table(path):
    with open(path, "w") as fh:
        fh.write("# test table\n1.7\n150.0\n")
        for z, x, lm in [(4.0, 0.0, 0.0), (3.5, 0.3, 1e-33),
                         (3.0, 0.7, 2e-33), (2.8, 0.999, 1e-33)]:
            fh.write(f"{z} {x} {lm}\n")
    return path


def test_load_hist_and_qinst(tmp_path):
    hist = q.load_heii_reion_hist(_write_table(tmp_path / "t.txt"))
    assert hist.alpha_q == 1.7 and hist.emax == 150.0
    assert np.all(np.diff(hist.atime) > 0)
    assert np.isclose(hist.zstart, 4.0)
    # Q_inst positive and of order tens of eV
    assert 10 * q.EV_IN_ERGS < hist.qso_inst_heating \
        < 100 * q.EV_IN_ERGS
    # desired fraction interpolates
    assert 0.29 < q.desired_heiii_frac(hist, 1 / 4.5) < 0.31


@pytest.mark.skipif(not __import__("os").path.exists(REF_TABLE),
                    reason="reference table unavailable")
def test_load_reference_table():
    hist = q.load_heii_reion_hist(REF_TABLE)
    assert hist.alpha_q > 1.0
    assert np.all((hist.xheiii >= 0) & (hist.xheiii <= 1.001))


def test_bubble_ionizes_and_heats(tmp_path):
    """One bubble ionizes exactly the gas inside it and raises its
    entropy (ionize_single_particle analog)."""
    n = 512
    rng = np.random.RandomState(0)
    ipos = jnp.asarray(rng.randint(0, 2 ** 32, (n, 3)), jnp.uint32)
    is_gas = jnp.ones(n, bool)
    ionized = jnp.zeros(n, bool)
    density = jnp.full(n, 2.0, jnp.float32)
    entropy = jnp.full(n, 1.0, jnp.float32)
    center = jnp.asarray([0.5, 0.5, 0.5], jnp.float32)
    ion2, ent2, nion = q._ionize_bubble(
        ipos, is_gas, ionized, density, entropy, center,
        jnp.float32(0.2), jnp.float32(3.0), jnp.float32(1.0))
    pos = np.asarray(ipos, np.float64) / 2 ** 32
    d = pos - 0.5
    d -= np.round(d)
    inside = np.sqrt((d ** 2).sum(1)) < 0.2
    assert int(nion) == inside.sum()
    assert np.array_equal(np.asarray(ion2), inside)
    assert np.all(np.asarray(ent2)[inside] > 1.0)
    assert np.allclose(np.asarray(ent2)[~inside], 1.0)
    # already-ionized particles are not re-heated
    ion3, ent3, nion2 = q._ionize_bubble(
        ipos, is_gas, ion2, density, ent2, center,
        jnp.float32(0.2), jnp.float32(3.0), jnp.float32(1.0))
    assert int(nion2) == 0
    assert np.allclose(np.asarray(ent3), np.asarray(ent2))
