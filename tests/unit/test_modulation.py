"""QAM modulation: constellation power, STE gradients, SER vs closed form."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sc_tpu.channel import awgn
from multimodal_sc_tpu.channel.modulation import (
    qam_levels,
    qam_modulate,
    qam_ser_awgn_theory,
    symbol_error_rate,
)


@pytest.mark.parametrize("m", [4, 16, 64])
def test_constellation_unit_average_power(m):
    lv = np.asarray(qam_levels(m))
    # Uniform over the constellation: E[I^2 + Q^2] == 1.
    power = 2 * np.mean(lv ** 2)
    np.testing.assert_allclose(power, 1.0, rtol=1e-6)


def test_modulate_snaps_to_levels(key):
    z = jax.random.normal(key, (64, 32, 2))
    zq = qam_modulate(z, 16)
    lv = np.asarray(qam_levels(16))
    flat = np.asarray(zq).ravel()
    d = np.min(np.abs(flat[:, None] - lv[None, :]), axis=1)
    np.testing.assert_allclose(d, 0.0, atol=1e-6)


def test_straight_through_gradient_is_identity(key):
    z = jax.random.normal(key, (4, 8, 2))
    g = jax.grad(lambda z: jnp.sum(qam_modulate(z, 16) * 2.0))(z)
    np.testing.assert_allclose(np.asarray(g), 2.0, rtol=1e-6)


@pytest.mark.parametrize("m,snr_db", [(4, 6.0), (16, 12.0)])
def test_ser_matches_closed_form(key, m, snr_db):
    """Monte-Carlo SER through the AWGN channel ~= textbook formula."""
    z = jax.random.normal(key, (512, 256, 2))
    zq = qam_modulate(z, m)          # uniform-ish constellation usage
    y = awgn(zq, snr_db, jax.random.key(9))
    ser = float(symbol_error_rate(zq, y, m))
    theory = qam_ser_awgn_theory(m, snr_db)
    assert abs(ser - theory) < max(0.15 * theory, 2e-3), (ser, theory)
