"""Analytic-oracle tests for the channel layer (SURVEY.md §4.2).

No reference outputs exist (reference repo is a title-only README), so
correctness is pinned to closed-form channel statistics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sc_tpu.channel import (
    awgn,
    channel,
    power_normalize,
    rayleigh,
)


def _rand_symbols(key, batch=64, k=256):
    z = jax.random.normal(key, (batch, k, 2)) * 3.1 + 0.7
    return z


class TestPowerNormalize:
    def test_unit_average_power(self, key):
        z = _rand_symbols(key)
        zn = power_normalize(z)
        # sum over symbols of |z|^2 == k per example
        p = jnp.sum(jnp.square(zn), axis=(1, 2))
        np.testing.assert_allclose(p, np.full(z.shape[0], z.shape[1]),
                                   rtol=1e-5)

    def test_preserves_direction(self, key):
        z = _rand_symbols(key, batch=4, k=8)
        zn = power_normalize(z)
        for i in range(4):
            a = np.asarray(z[i]).ravel()
            b = np.asarray(zn[i]).ravel()
            cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
            assert cos > 0.999999

    def test_gradient_finite(self, key):
        z = _rand_symbols(key, batch=2, k=16)
        g = jax.grad(lambda z: jnp.sum(power_normalize(z) ** 2))(z)
        assert np.all(np.isfinite(np.asarray(g)))


class TestAWGN:
    def test_measured_snr_matches_requested(self, key):
        """Empirical SNR over many samples ~= requested SNR dB."""
        for snr_db in (0.0, 10.0, 20.0):
            z = power_normalize(_rand_symbols(key, batch=256, k=512))
            y = awgn(z, snr_db, jax.random.key(42))
            noise_p = float(jnp.mean(jnp.sum(jnp.square(y - z), axis=-1)))
            sig_p = float(jnp.mean(jnp.sum(jnp.square(z), axis=-1)))
            measured = 10 * np.log10(sig_p / noise_p)
            assert abs(measured - snr_db) < 0.3, (snr_db, measured)

    def test_per_example_snr_vector(self, key):
        z = power_normalize(_rand_symbols(key, batch=4, k=4096))
        snrs = jnp.array([0.0, 5.0, 10.0, 20.0])
        y = awgn(z, snrs, jax.random.key(1))
        noise_p = jnp.mean(jnp.sum(jnp.square(y - z), axis=-1), axis=-1)
        measured = 10 * np.log10(1.0 / np.asarray(noise_p))
        np.testing.assert_allclose(measured, np.asarray(snrs), atol=0.6)

    def test_gradient_is_identity_wrt_input(self, key):
        """d(awgn)/dz == I since noise is additive and key-independent."""
        z = _rand_symbols(key, batch=2, k=8)
        g = jax.grad(lambda z: jnp.sum(awgn(z, 10.0, jax.random.key(0))))(z)
        np.testing.assert_allclose(np.asarray(g), 1.0, rtol=1e-6)


class TestRayleigh:
    def test_equalization_inverts_fading_exactly(self, key):
        """At effectively infinite SNR, conj(h)/|h|^2 equalization must
        invert the fade exactly: z_hat == z for every h draw (deep fades
        included)."""
        z = power_normalize(_rand_symbols(key, batch=128, k=64))
        y = rayleigh(z, 200.0, jax.random.key(3))
        np.testing.assert_allclose(np.asarray(y), np.asarray(z), atol=1e-4)

    def test_equalized_noise_statistics(self, key):
        """E[|z_hat - z|^2] = sigma^2 * E[1/|h|^2]; heavy-tailed, so just
        check unbiasedness: E[z_hat] == z across noise draws."""
        z = power_normalize(_rand_symbols(key, batch=1, k=64))
        zs = jnp.repeat(z, 4096, axis=0)
        y = rayleigh(zs, 10.0, jax.random.key(5))
        np.testing.assert_allclose(
            np.asarray(jnp.mean(y, axis=0)), np.asarray(z[0]), atol=0.05
        )

    def test_gradient_flows(self, key):
        z = _rand_symbols(key, batch=2, k=8)
        g = jax.grad(
            lambda z: jnp.sum(rayleigh(z, 10.0, jax.random.key(0)) ** 2)
        )(z)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.sum(jnp.abs(g))) > 0


class TestChannelDispatch:
    def test_ideal_is_normalized_identity(self, key):
        z = _rand_symbols(key)
        y = channel(z, 10.0, "ideal", key)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(power_normalize(z)), rtol=1e-5
        )

    def test_unknown_kind_raises(self, key):
        with pytest.raises(ValueError):
            channel(_rand_symbols(key), 10.0, "quantum", key)

    def test_jit_traceable_inside_outer_graph(self, key):
        z = _rand_symbols(key, batch=8, k=32)

        @jax.jit
        def f(z, key):
            return jnp.mean(channel(z, 10.0, "awgn", key) ** 2)

        assert np.isfinite(float(f(z, key)))

    def test_deterministic_under_key(self, key):
        z = _rand_symbols(key)
        y1 = channel(z, 10.0, "rayleigh", jax.random.key(7))
        y2 = channel(z, 10.0, "rayleigh", jax.random.key(7))
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


class TestRician:
    def test_high_k_approaches_awgn_statistics(self, key):
        """K -> inf: equalized Rician == AWGN-like noise level."""
        from multimodal_sc_tpu.channel import rician

        z = power_normalize(_rand_symbols(key, batch=64, k=512))
        y = rician(z, 10.0, jax.random.key(2), k_factor=1e6)
        noise_p = float(jnp.mean(jnp.sum(jnp.square(y - z), axis=-1)))
        measured = 10 * np.log10(1.0 / noise_p)
        assert abs(measured - 10.0) < 0.5

    def test_equalization_exact_at_high_snr(self, key):
        from multimodal_sc_tpu.channel import rician

        z = power_normalize(_rand_symbols(key, batch=64, k=64))
        y = rician(z, 200.0, jax.random.key(3))
        np.testing.assert_allclose(np.asarray(y), np.asarray(z), atol=1e-4)

    def test_mean_h_power_is_unit(self, key):
        """E[|h|^2] == 1 regardless of K (power-preserving fading)."""
        from multimodal_sc_tpu.channel.layer import RICIAN_K

        k_factor = RICIAN_K
        kh = jax.random.key(11)
        scatter = jax.random.normal(kh, (200000, 2)) * np.sqrt(
            0.5 / (k_factor + 1))
        h = scatter.at[:, 0].add(np.sqrt(k_factor / (k_factor + 1)))
        p = float(jnp.mean(jnp.sum(h**2, axis=-1)))
        assert abs(p - 1.0) < 0.01

    def test_dispatch(self, key):
        z = _rand_symbols(key, batch=4, k=16)
        y = channel(z, 10.0, "rician", jax.random.key(0))
        assert y.shape == z.shape


class TestEstimatedCSI:
    """Pilot-based LS channel estimation (channel/layer.py docstring):
    h_hat = h + e with e ~ CN(0, noise_power / pilots) — closed form."""

    def test_many_pilots_recovers_perfect_csi(self, key):
        z = power_normalize(_rand_symbols(key, batch=32, k=64))
        perfect = rayleigh(z, 10.0, jax.random.key(5), pilots=0)
        est = rayleigh(z, 10.0, jax.random.key(5), pilots=10**9)
        np.testing.assert_allclose(np.asarray(est), np.asarray(perfect),
                                   atol=2e-3)

    def test_estimation_error_variance(self, key):
        """var(h_hat - h) == noise_power / pilots per complex coefficient."""
        from multimodal_sc_tpu.channel.layer import _estimate_csi

        snr_db, pilots = 0.0, 4          # noise_power = 1 -> var = 0.25
        h = jnp.zeros((200000, 2))
        h_hat = _estimate_csi(h, jnp.asarray(snr_db), jax.random.key(7),
                              pilots)
        var = float(jnp.mean(jnp.sum(jnp.square(h_hat - h), axis=-1)))
        assert abs(var - 0.25) < 0.01, var

    def test_mse_monotone_in_pilots(self, key):
        """More pilots -> better equalization -> lower MEDIAN MSE.

        Median, not mean: ZF equalization divides by |h_hat|^2 and
        E[1/|h|^2] is infinite under Rayleigh, so the mean per-example
        MSE is heavy-tailed and ungateable at any batch size.
        """
        z = power_normalize(_rand_symbols(key, batch=2048, k=128))
        med = []
        for pilots in (1, 16, 0):         # 0 == perfect genie, best
            y = rayleigh(z, 10.0, jax.random.key(9), pilots=pilots)
            per_ex = jnp.mean(jnp.square(y - z), axis=(1, 2))
            med.append(float(jnp.median(per_ex)))
        assert med[0] > med[1] > med[2], med

    def test_rician_pilots_smoke(self, key):
        from multimodal_sc_tpu.channel import rician

        z = power_normalize(_rand_symbols(key, batch=8, k=32))
        y = rician(z, 10.0, jax.random.key(1), pilots=2)
        assert y.shape == z.shape and np.all(np.isfinite(np.asarray(y)))

    def test_dispatch_and_gradient(self, key):
        z = _rand_symbols(key, batch=4, k=16)

        def loss(z):
            y = channel(z, 10.0, "rayleigh", jax.random.key(0), pilots=4)
            return jnp.sum(jnp.square(y))

        g = jax.grad(loss)(z)
        assert np.all(np.isfinite(np.asarray(g)))


class TestOFDM:
    """Frequency-selective Rayleigh multipath + per-subcarrier equalization
    (channel/layer.py ofdm). Analytic gates: unit average subcarrier power,
    flat response for a single tap, exact inversion at high SNR."""

    def test_pdp_normalized(self):
        from multimodal_sc_tpu.channel import exp_power_delay_profile

        for taps in (1, 4, 8, 16):
            p = exp_power_delay_profile(taps)
            assert abs(float(jnp.sum(p)) - 1.0) < 1e-6
            if taps > 1:                  # strictly decaying
                assert np.all(np.diff(np.asarray(p)) < 0)

    def test_subcarrier_power_is_unit(self, key):
        """E|H_k|^2 = sum_l p_l = 1 for every subcarrier k."""
        from multimodal_sc_tpu.channel import (
            exp_power_delay_profile,
            ofdm_freq_response,
        )

        taps, n_sub, batch = 8, 32, 100000
        pdp = exp_power_delay_profile(taps)
        h = jax.random.normal(jax.random.key(3), (batch, taps, 2))
        h = h * jnp.sqrt(pdp / 2.0)[None, :, None]
        H = ofdm_freq_response(h, n_sub)
        pw = jnp.mean(jnp.sum(jnp.square(H), axis=-1), axis=0)   # (N,)
        np.testing.assert_allclose(np.asarray(pw), 1.0, atol=0.03)

    def test_single_tap_response_is_flat(self, key):
        from multimodal_sc_tpu.channel import ofdm_freq_response

        h = jax.random.normal(jax.random.key(4), (16, 1, 2))
        H = ofdm_freq_response(h, 64)
        mag = np.asarray(jnp.sum(jnp.square(H), axis=-1))        # (16, 64)
        np.testing.assert_allclose(
            mag, np.broadcast_to(mag[:, :1], mag.shape), rtol=1e-5)

    def test_equalization_exact_at_high_snr(self, key):
        from multimodal_sc_tpu.channel import ofdm

        z = power_normalize(_rand_symbols(key, batch=32, k=256))
        y = ofdm(z, 200.0, jax.random.key(6))
        np.testing.assert_allclose(np.asarray(y), np.asarray(z), atol=1e-3)

    def test_pilots_monotone(self, key):
        """Median per-example MSE (see TestEstimatedCSI for why median)."""
        from multimodal_sc_tpu.channel import ofdm

        z = power_normalize(_rand_symbols(key, batch=2048, k=256))
        med = []
        for pilots in (1, 16, 0):
            y = ofdm(z, 10.0, jax.random.key(8), pilots=pilots)
            per_ex = jnp.mean(jnp.square(y - z), axis=(1, 2))
            med.append(float(jnp.median(per_ex)))
        assert med[0] > med[1] > med[2], med

    def test_per_example_snr_vector(self, key):
        from multimodal_sc_tpu.channel import ofdm

        z = power_normalize(_rand_symbols(key, batch=8, k=64))
        snr = jnp.linspace(-5.0, 25.0, 8)
        y = ofdm(z, snr, jax.random.key(2))
        assert y.shape == z.shape and np.all(np.isfinite(np.asarray(y)))

    def test_dispatch_and_gradient(self, key):
        def loss(z):
            y = channel(z, 10.0, "ofdm", jax.random.key(0),
                        subcarriers=16, taps=4)
            return jnp.sum(jnp.square(y))

        z = _rand_symbols(jax.random.key(12), batch=4, k=32)
        g = jax.grad(loss)(z)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_deterministic_under_key(self, key):
        from multimodal_sc_tpu.channel import ofdm

        z = _rand_symbols(jax.random.key(13), batch=4, k=32)
        y1 = ofdm(z, 10.0, jax.random.key(21))
        y2 = ofdm(z, 10.0, jax.random.key(21))
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    def test_config_validation(self):
        from multimodal_sc_tpu.config.configs import ChannelConfig

        ChannelConfig(kind="ofdm", pilots=2)            # valid
        with pytest.raises(ValueError):
            ChannelConfig(kind="ofdm", ofdm_taps=0)
        with pytest.raises(ValueError):
            ChannelConfig(pilots=-1)
