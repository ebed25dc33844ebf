"""Semantic-importance unequal power allocation on the VQ digital path
(codec/semantic_vq.py token_damage / uep_weights, channel.uep_alpha).

Oracles: the VJP damage estimator against the exact Jacobian (jacrev) on
a tiny model; exact unit-mean-power weights; receiver transparency over
an ideal channel; damage-weighted error reduction over AWGN.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import multimodal_sc_tpu as msc
from multimodal_sc_tpu.channel.digital import index_bits
from multimodal_sc_tpu.train import jscc


def _cfg(**channel_overrides):
    over = ["camera.arch=vq", "camera.image_hw=32,32",
            "camera.features=16,16,16,16", "camera.vq_codes=16",
            "camera.vq_dim=8", "train.batch_size=8"]
    cfg = msc.get_preset("c1").override_str(over)
    for k, v in channel_overrides.items():
        cfg = cfg.override_str([f"channel.{k}={v}"])
    return cfg


def _tiny_cfg(**channel_overrides):
    """Smallest legal model for the exact-Jacobian oracle."""
    over = ["camera.arch=vq", "camera.image_hw=8,8",
            "camera.features=4,4,4,4", "camera.vq_codes=4",
            "camera.vq_dim=4", "train.batch_size=1"]
    cfg = msc.get_preset("c1").override_str(over)
    for k, v in channel_overrides.items():
        cfg = cfg.override_str([f"channel.{k}={v}"])
    return cfg


class TestDamageEstimator:
    @pytest.mark.slow
    def test_matches_exact_jacobian(self, key):
        """E over probes of the VJP estimate == mean_b ||J_t de_b||^2,
        computed exactly with jacrev on a tiny model."""
        cfg = _tiny_cfg(uep_alpha=0.5, uep_probes=512)
        model = jscc.build_model(cfg)
        params = jscc.create_train_state(cfg, key).params
        img = jax.random.uniform(jax.random.key(1), (1, 8, 8, 3))
        idx, _, _ = model.apply({"params": params}, img,
                                method="encode_tokens")
        est = model.apply({"params": params}, idx, jax.random.key(2),
                          method="token_damage")          # (1, N)

        cb = params["codebook"]                           # (4, 4)
        z = cb[idx]                                       # (1, N, D)
        f = lambda zz: model.apply({"params": params}, zz,
                                   method="codes_to_image")
        jac = jax.jacrev(f)(z)[0]                         # (H,W,3,1,N,D)
        jac = jac[:, :, :, 0]                             # (H,W,3,N,D)
        n_bits = index_bits(cfg.camera.vq_codes)
        shifts = 1 << jnp.arange(n_bits, dtype=jnp.int32)
        delta = cb[idx[0][:, None] ^ shifts[None, :]] - z[0][:, None, :]
        exact = np.zeros(idx.shape[1])
        for t in range(idx.shape[1]):
            for b in range(n_bits):
                jd = jnp.einsum("hwcd,d->hwc", jac[:, :, :, t], delta[t, b])
                exact[t] += float(jnp.sum(jd * jd))
        exact /= n_bits
        np.testing.assert_allclose(np.asarray(est[0]), exact, rtol=0.25)

    def test_weights_exact_unit_mean_power(self, key):
        cfg = _cfg(uep_alpha=1.0)
        model = jscc.build_model(cfg)
        params = jscc.create_train_state(cfg, key).params
        img = jax.random.uniform(jax.random.key(1), (8, 32, 32, 3))
        idx, _, _ = model.apply({"params": params}, img,
                                method="encode_tokens")
        w = model.apply({"params": params}, idx, 5.0, jax.random.key(2),
                        method="uep_weights")
        assert bool(jnp.all(w > 0))
        np.testing.assert_allclose(
            np.asarray(jnp.mean(jnp.square(w), axis=1)), 1.0, rtol=1e-5)


class TestDeployment:
    def test_ideal_channel_receiver_transparent(self, key):
        """Over an ideal channel UEP scaling must not change a single
        hard decision: recon identical with UEP on vs off."""
        base = _cfg(kind="ideal")
        params = jscc.create_train_state(base, key).params
        img = jax.random.uniform(jax.random.key(1), (8, 32, 32, 3))
        snr = jnp.full((8,), 10.0)
        outs = []
        for alpha in (0.0, 1.0):
            cfg = _cfg(kind="ideal", uep_alpha=alpha)
            model = jscc.build_model(cfg)
            recon, aux = model.apply({"params": params}, img, snr,
                                     jax.random.key(2))
            assert float(aux["index_error_rate"]) == 0.0
            outs.append(np.asarray(recon))
        np.testing.assert_array_equal(outs[0], outs[1])

    def test_parameter_transparent_init(self, key):
        """A checkpoint trained with alpha=0 deploys under alpha>0: the
        param trees are identical and the UEP apply runs finite."""
        p0 = jscc.create_train_state(_cfg(), key).params
        p1 = jscc.create_train_state(_cfg(uep_alpha=0.7), key).params
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), p0, p1)
        model = jscc.build_model(_cfg(uep_alpha=0.7))
        img = jax.random.uniform(jax.random.key(1), (8, 32, 32, 3))
        recon, aux = model.apply({"params": p0}, img,
                                 jnp.full((8,), 2.0), jax.random.key(2))
        assert bool(jnp.all(jnp.isfinite(recon)))
        assert float(aux["uep_power_spread"]) > 0.0

    def test_uep_cuts_damage_weighted_errors_over_awgn(self, key):
        """The quantity UEP optimizes — index errors weighted by token
        damage — must drop at a waterfall SNR, at identical total power."""
        img = jax.random.uniform(jax.random.key(1), (32, 32, 32, 3))
        snr = jnp.full((32,), 0.0)
        base = _cfg()
        params = jscc.create_train_state(base, key).params
        model0 = jscc.build_model(base)
        idx_tx, _, _ = model0.apply({"params": params}, img,
                                    method="encode_tokens")
        damage = jscc.build_model(_cfg(uep_alpha=1.0)).apply(
            {"params": params}, idx_tx, jax.random.key(5),
            method="token_damage")

        # Per-token error indicators need the rx indices; drive the
        # symbol path manually with the same machinery.
        from multimodal_sc_tpu.channel import awgn
        from multimodal_sc_tpu.channel.digital import (
            indices_to_qpsk, qpsk_to_indices)

        sym = indices_to_qpsk(idx_tx, base.camera.vq_codes)
        w = jscc.build_model(_cfg(uep_alpha=1.0)).apply(
            {"params": params}, idx_tx, 0.0, jax.random.key(5),
            method="uep_weights")
        spt = sym.shape[1] // idx_tx.shape[1]
        sym_uep = sym * jnp.repeat(w, spt, axis=1)[..., None]
        # Identical total power budgets.
        np.testing.assert_allclose(
            float(jnp.mean(jnp.sum(jnp.square(sym_uep), -1))),
            float(jnp.mean(jnp.sum(jnp.square(sym), -1))), rtol=1e-5)

        ck = jax.random.key(11)
        rx_uni = qpsk_to_indices(awgn(sym, snr, ck),
                                 base.camera.vq_codes, idx_tx.shape[1])
        rx_uep = qpsk_to_indices(awgn(sym_uep, snr, ck),
                                 base.camera.vq_codes, idx_tx.shape[1])
        err_uni = (rx_uni != idx_tx).astype(jnp.float32)
        err_uep = (rx_uep != idx_tx).astype(jnp.float32)
        dw_uni = float(jnp.sum(damage * err_uni) / jnp.sum(damage))
        dw_uep = float(jnp.sum(damage * err_uep) / jnp.sum(damage))
        assert dw_uep < 0.8 * dw_uni, (dw_uep, dw_uni)


class TestWaterfill:
    """Chernoff water-filling allocator (VQCameraJSCC.waterfill_power)."""

    def _damage(self, key):
        # Log-spread damage profile, strictly positive.
        return jnp.exp(jax.random.normal(key, (4, 64)) * 1.5)

    def test_power_budget_exact(self, key):
        from multimodal_sc_tpu.codec.semantic_vq import VQCameraJSCC

        d = self._damage(key)
        for snr in (-5.0, 5.0, 25.0):
            w2 = VQCameraJSCC.waterfill_power(d, snr)
            assert bool(jnp.all(w2 >= 0))
            np.testing.assert_allclose(
                np.asarray(jnp.mean(w2, axis=1)), 1.0, rtol=1e-4)

    def test_kkt_equal_marginals_on_active_set(self, key):
        """Active tokens share one marginal (s/2)·D·e^{−s·w²/2} = λ; the
        water-filling optimality condition."""
        from multimodal_sc_tpu.codec.semantic_vq import VQCameraJSCC

        d = self._damage(key)
        snr = 0.0
        s = 10.0 ** (snr / 10.0)
        w2 = VQCameraJSCC.waterfill_power(d, snr)
        marg = (s / 2.0) * d * jnp.exp(-s * w2 / 2.0)
        for b in range(d.shape[0]):
            active = np.asarray(w2[b]) > 1e-4
            assert active.sum() >= 2
            lam = np.asarray(marg[b])[active]
            assert lam.std() / lam.mean() < 1e-3, lam

    def test_snr_adaptivity(self, key):
        """Allocation spread shrinks monotonically with SNR: aggressive
        in deep noise, near-uniform when errors are already rare."""
        from multimodal_sc_tpu.codec.semantic_vq import VQCameraJSCC

        d = self._damage(key)
        spreads = [float(jnp.std(VQCameraJSCC.waterfill_power(d, snr)))
                   for snr in (-5.0, 5.0, 25.0)]
        assert spreads[0] > spreads[1] > spreads[2], spreads
        assert spreads[2] < 0.2, spreads

    def test_per_example_snr_vector(self, key):
        """(B,) SNR vector: each example allocated at its own SNR."""
        from multimodal_sc_tpu.codec.semantic_vq import VQCameraJSCC

        d = self._damage(key)
        snrs = jnp.array([-5.0, 0.0, 10.0, 25.0])
        w2 = VQCameraJSCC.waterfill_power(d, snrs)
        for b, snr in enumerate(snrs):
            ref = VQCameraJSCC.waterfill_power(d[b:b + 1], float(snr))
            np.testing.assert_allclose(
                np.asarray(w2[b]), np.asarray(ref[0]), rtol=1e-5)

    def test_coded_exponent_milder_allocation(self, key):
        """Under FEC the waterfill uses the coded error exponent
        (d_min × SNR), so the allocation must be strictly milder than
        the uncoded one at the same channel SNR."""
        params = jscc.create_train_state(_cfg(), key).params
        img = jax.random.uniform(jax.random.key(1), (8, 32, 32, 3))
        idx, _, _ = jscc.build_model(_cfg()).apply(
            {"params": params}, img, method="encode_tokens")
        spreads = {}
        for fec in ("none", "hamming74", "hamming74_soft"):
            cfg = _cfg(uep_alpha=1.0, uep_mode="waterfill", fec=fec)
            w = jscc.build_model(cfg).apply(
                {"params": params}, idx, 0.0, jax.random.key(2),
                method="uep_weights")
            spreads[fec] = float(jnp.std(jnp.square(w)))
        assert (spreads["none"] > spreads["hamming74"]
                > spreads["hamming74_soft"]), spreads

    def test_end_to_end_waterfill_deploy(self, key):
        """Full pipeline with uep_mode=waterfill runs finite on the same
        alpha=0-trained params (parameter transparency)."""
        params = jscc.create_train_state(_cfg(), key).params
        cfg = _cfg(uep_alpha=1.0, uep_mode="waterfill")
        model = jscc.build_model(cfg)
        img = jax.random.uniform(jax.random.key(1), (8, 32, 32, 3))
        recon, aux = model.apply({"params": params}, img,
                                 jnp.full((8,), 2.0), jax.random.key(2))
        assert bool(jnp.all(jnp.isfinite(recon)))
        assert float(aux["uep_power_spread"]) > 0.0


class TestConfigValidation:
    def test_negative_alpha_rejected(self):
        with pytest.raises(ValueError, match="uep_alpha"):
            msc.get_preset("c1").override_str(["channel.uep_alpha=-1"])

    def test_zero_probes_rejected(self):
        with pytest.raises(ValueError, match="uep_probes"):
            msc.get_preset("c1").override_str(["channel.uep_probes=0"])

    def test_bad_mode_rejected(self):
        with pytest.raises(ValueError, match="uep_mode"):
            msc.get_preset("c1").override_str(["channel.uep_mode=fancy"])
