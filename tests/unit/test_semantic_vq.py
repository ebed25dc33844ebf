"""Discrete semantic-token codec (codec/semantic_vq.py) + digital index
transmission (channel/digital.py): analytic QPSK oracles, VQ algebra,
and the end-to-end noise-aware training pipeline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import multimodal_sc_tpu as msc
from multimodal_sc_tpu.channel.digital import (
    index_bits,
    indices_to_qpsk,
    qpsk_ber_awgn_theory,
    qpsk_to_indices,
)


class TestDigitalMapping:
    def test_roundtrip_exact_over_ideal_channel(self, key):
        idx = jax.random.randint(key, (8, 64), 0, 256)
        sym = indices_to_qpsk(idx, 256)
        assert sym.shape == (8, 64 * 4, 2)      # 8 bits -> 4 QPSK symbols
        # Unit power per symbol, exactly.
        np.testing.assert_allclose(
            np.asarray(jnp.sum(jnp.square(sym), axis=-1)), 1.0, rtol=1e-6)
        back = qpsk_to_indices(sym, 256, 64)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(idx))

    def test_ber_matches_closed_form(self, key):
        """Measured per-bit error over AWGN == Q(sqrt(snr)) (digital.py)."""
        from multimodal_sc_tpu.channel import awgn

        idx = jax.random.randint(key, (64, 256), 0, 256)
        sym = indices_to_qpsk(idx, 256)
        n_bits = index_bits(256)
        for snr_db in (0.0, 5.0):
            y = awgn(sym, snr_db, jax.random.key(7))
            bits_tx = (sym > 0)
            bits_rx = (y > 0)
            ber = float(jnp.mean(bits_tx != bits_rx))
            theory = qpsk_ber_awgn_theory(snr_db)
            assert abs(ber - theory) < 0.15 * theory + 2e-4, (
                snr_db, ber, theory)

    def test_codes_must_be_power_of_four(self):
        with pytest.raises(ValueError, match="power of 4"):
            index_bits(128)
        assert index_bits(4) == 2 and index_bits(1024) == 10


class TestVectorQuantize:
    def test_nearest_code_and_ste(self, key):
        from multimodal_sc_tpu.codec.semantic_vq import vector_quantize

        cb = jax.random.normal(key, (16, 8))
        z = jax.random.normal(jax.random.key(1), (5, 8))
        z_ste, idx, vq_loss = vector_quantize(z, cb)
        # idx is the argmin of true distances.
        d = np.linalg.norm(np.asarray(z)[:, None] - np.asarray(cb)[None],
                           axis=-1)
        np.testing.assert_array_equal(np.asarray(idx), d.argmin(1))
        # Forward value equals the quantized code.
        np.testing.assert_allclose(np.asarray(z_ste), np.asarray(cb)[
            np.asarray(idx)], atol=1e-6)
        # STE: gradient wrt z_e is identity through the quantizer.
        g = jax.grad(lambda z: jnp.sum(vector_quantize(z, cb)[0]))(z)
        np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)

    def test_loss_zero_on_codebook_rows(self, key):
        from multimodal_sc_tpu.codec.semantic_vq import vector_quantize

        cb = jax.random.normal(key, (16, 8))
        _, _, vq_loss = vector_quantize(cb[:4], cb)
        assert float(vq_loss) < 1e-10


class TestVQCodec:
    def _cfg(self):
        return msc.get_preset("c1").override_str([
            "camera.arch=vq", "camera.vq_codes=64", "camera.vq_dim=16",
            "camera.features=8,16,16,16",
            "train.batch_size=4", "train.steps=2",
        ])

    def test_init_and_token_shapes(self, key):
        from multimodal_sc_tpu.train import jscc

        cfg = self._cfg()
        state = jscc.create_train_state(cfg, key)
        model = jscc.build_model(cfg)
        img = jax.random.uniform(jax.random.key(1), (4, 32, 32, 3))
        idx, vq_loss, z = model.apply({"params": state.params}, img,
                                      method="encode_tokens")
        assert idx.shape == (4, 64) and idx.dtype == jnp.int32
        assert int(idx.max()) < 64 and int(idx.min()) >= 0
        rec = model.apply({"params": state.params}, idx,
                          method="decode_tokens")
        assert rec.shape == (4, 32, 32, 3)

    def test_train_step_and_error_rates(self, key):
        from multimodal_sc_tpu.train import jscc

        cfg = self._cfg()
        state = jscc.create_train_state(cfg, key)
        model = jscc.build_model(cfg)
        step = jscc.make_train_step(cfg, model)
        img = jax.random.uniform(jax.random.key(1), (4, 32, 32, 3))
        state, m = step(state, img, None, jax.random.key(2))
        assert np.isfinite(float(m["loss"]))
        # Index error rate: ~0 at very high SNR, substantial at -5 dB.
        snr_hi = jnp.full((4,), 60.0)
        snr_lo = jnp.full((4,), -5.0)
        _, aux_hi = model.apply({"params": state.params}, img, snr_hi,
                                jax.random.key(3))
        _, aux_lo = model.apply({"params": state.params}, img, snr_lo,
                                jax.random.key(3))
        assert float(aux_hi["index_error_rate"]) == 0.0
        assert float(aux_lo["index_error_rate"]) > 0.1

    def test_data_dependent_codebook_init(self, key):
        """init_codebook_from_batch (the collapse fix): after seeding from
        encoder outputs the codebook is actually USED — assignment
        perplexity on a real batch is far above the collapsed ~1."""
        from multimodal_sc_tpu.codec.semantic_vq import (
            init_codebook_from_batch,
        )
        from multimodal_sc_tpu.train import jscc

        cfg = self._cfg()
        state = jscc.create_train_state(cfg, key)
        model = jscc.build_model(cfg)
        img = jax.random.uniform(jax.random.key(1), (8, 32, 32, 3))
        params = init_codebook_from_batch(model, state.params, img,
                                          jax.random.key(2))
        assert params["codebook"].shape == state.params["codebook"].shape
        _, aux = model.apply({"params": params}, img,
                             jnp.full((8,), 60.0), jax.random.key(3))
        assert float(aux["code_perplexity"]) > 10.0, dict(aux)

    def test_sweep_camera_vq_wiring(self, key):
        from multimodal_sc_tpu.evaluation import snr_sweep
        from multimodal_sc_tpu.train import jscc

        cfg = self._cfg()
        state = jscc.create_train_state(cfg, key)
        img = jax.random.uniform(jax.random.key(1), (4, 32, 32, 3))
        curves = snr_sweep.sweep_camera_vq(
            cfg, state.params, img, key, snrs_db=(0.0, 20.0),
            kinds=("awgn",), batches_per_point=1)
        pts = curves["awgn"]
        assert len(pts) == 2
        assert pts[0]["index_err"] > pts[1]["index_err"]  # errors fall w/ SNR


@pytest.mark.slow
@pytest.mark.slower  # ~7.5 min CPU train; the per-round TPU c1_vq arm
                     # (scripts/run_baselines.py) is the main quality gate
def test_vq_trains_and_shows_digital_cliff():
    """300-step tiny VQ codec: PSNR climbs well above the untrained floor,
    and the trained model shows the canonical digital behavior — clean
    above the waterfall, degraded below it."""
    from multimodal_sc_tpu.evaluation import snr_sweep
    from multimodal_sc_tpu.train import jscc

    cfg = msc.get_preset("c1").override_str([
        "camera.arch=vq", "camera.vq_codes=64", "camera.vq_dim=16",
        "camera.features=8,16,16,16", "channel.snr_db=10.0",
        "train.steps=300", "train.batch_size=16", "train.log_every=150",
    ])
    state, last = jscc.run(cfg)
    assert float(last["psnr"]) > 14.0, dict(last)
    assert float(last["index_error_rate"]) < 0.2
    # Codebook stays in use (no re-collapse after the data-dependent init).
    assert float(last["code_perplexity"]) > 8.0, dict(last)

    from multimodal_sc_tpu.envs.datasets import ImageDataset

    img = jax.numpy.asarray(next(ImageDataset(
        cfg.train.dataset, 16, seed=cfg.train.seed + 999)))
    curves = snr_sweep.sweep_camera_vq(
        cfg, state.params, img, jax.random.key(2),
        snrs_db=(-5.0, 10.0, 25.0), kinds=("awgn",), batches_per_point=2)
    pts = curves["awgn"]
    # Digital cliff: -5 dB clearly worse than 10 dB; 10 ~= 25 (above
    # waterfall the reconstruction is index-error-free and flat).
    assert pts[0]["psnr"] < pts[1]["psnr"] - 1.0, pts
    assert abs(pts[2]["psnr"] - pts[1]["psnr"]) < 0.8, pts
