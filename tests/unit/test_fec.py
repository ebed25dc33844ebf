"""Hamming(7,4) FEC on the digital semantic-token path (channel/fec.py):
exhaustive single-error correction, analytic block-error oracle over
AWGN, and the end-to-end coded-beats-uncoded index error comparison on
one set of params (FEC is parameter-transparent).
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sc_tpu.channel.fec import (
    hamming74_block_error_theory,
    hamming74_decode,
    hamming74_decode_soft,
    hamming74_encode,
)


class TestHamming74:
    def test_roundtrip_all_16_words(self):
        data = jnp.array(list(itertools.product((0, 1), repeat=4)),
                         jnp.int32)                      # (16, 4)
        coded = hamming74_encode(data)
        assert coded.shape == (16, 7)
        np.testing.assert_array_equal(np.asarray(hamming74_decode(coded)),
                                      np.asarray(data))

    def test_corrects_every_single_bit_error(self):
        """Exhaustive: 16 data words x 7 flip positions all decode clean."""
        data = jnp.array(list(itertools.product((0, 1), repeat=4)),
                         jnp.int32)
        coded = hamming74_encode(data)                   # (16, 7)
        for pos in range(7):
            flipped = coded.at[:, pos].set(1 - coded[:, pos])
            np.testing.assert_array_equal(
                np.asarray(hamming74_decode(flipped)), np.asarray(data),
                err_msg=f"flip at {pos}")

    def test_min_distance_is_three(self):
        """All 16 codewords pairwise differ in >= 3 bits (the property
        that buys single-error correction)."""
        data = jnp.array(list(itertools.product((0, 1), repeat=4)),
                         jnp.int32)
        c = np.asarray(hamming74_encode(data))
        d = (c[:, None] != c[None, :]).sum(-1)
        np.fill_diagonal(d, 3)
        assert d.min() >= 3

    def test_multi_bit_payloads_reshape(self, key):
        bits = jax.random.randint(key, (8, 48), 0, 2)    # 12 nibbles
        coded = hamming74_encode(bits)
        assert coded.shape == (8, 84)
        np.testing.assert_array_equal(np.asarray(hamming74_decode(coded)),
                                      np.asarray(bits))

    def test_shape_validation(self):
        with pytest.raises(ValueError, match="multiple of 4"):
            hamming74_encode(jnp.zeros((2, 6), jnp.int32))
        with pytest.raises(ValueError, match="multiple of 7"):
            hamming74_decode(jnp.zeros((2, 8), jnp.int32))

    def test_block_error_matches_closed_form(self, key):
        """Monte-Carlo block error at iid bit-flip prob p == the analytic
        1-(1-p)^7-7p(1-p)^6 (channel/fec.py oracle)."""
        p = 0.05
        data = jax.random.randint(key, (2000, 4), 0, 2)
        coded = hamming74_encode(data)
        flips = (jax.random.uniform(jax.random.key(1), coded.shape)
                 < p).astype(jnp.int32)
        decoded = hamming74_decode((coded + flips) % 2)
        measured = float(jnp.mean(jnp.any(decoded != data, axis=-1)))
        theory = hamming74_block_error_theory(p)
        assert abs(measured - theory) < 0.25 * theory + 1e-3, (
            measured, theory)


class TestSoftDecision:
    def test_noiseless_roundtrip(self, key):
        bits = jax.random.randint(key, (8, 48), 0, 2)
        soft = 2.0 * hamming74_encode(bits).astype(jnp.float32) - 1.0
        np.testing.assert_array_equal(
            np.asarray(hamming74_decode_soft(soft)), np.asarray(bits))

    def test_soft_beats_hard_over_awgn(self, key):
        """ML correlation decode uses reliability the syndrome decoder
        throws away: strictly fewer block errors at waterfall SNRs."""
        from multimodal_sc_tpu.channel import awgn
        from multimodal_sc_tpu.channel.digital import (
            bits_to_qpsk,
            qpsk_soft_bits,
            qpsk_to_bits,
        )

        data = jax.random.randint(key, (4096, 8), 0, 2)   # 2 blocks/row
        coded = hamming74_encode(data)                    # (4096, 14)
        y = awgn(bits_to_qpsk(coded), 1.0, jax.random.key(3))
        hard = hamming74_decode(qpsk_to_bits(y))
        soft = hamming74_decode_soft(qpsk_soft_bits(y))
        err_hard = float(jnp.mean(jnp.any(
            hard.reshape(-1, 4) != data.reshape(-1, 4), axis=-1)))
        err_soft = float(jnp.mean(jnp.any(
            soft.reshape(-1, 4) != data.reshape(-1, 4), axis=-1)))
        # ~2 dB coding-gain difference shows up as a clear ratio here.
        assert err_soft < 0.75 * err_hard, (err_soft, err_hard)
        assert err_soft > 0  # the SNR is low enough to be informative


class TestVQWithFEC:
    def _cfg(self, fec="hamming74"):
        import multimodal_sc_tpu as msc

        return msc.get_preset("c1").override_str([
            "camera.arch=vq", "camera.vq_codes=64", "camera.vq_dim=16",
            "camera.features=8,16,16,16", f"channel.fec={fec}",
        ])

    def test_fec_reduces_index_errors_same_params(self, key):
        """One param tree, two deployments: at mid SNR the coded path's
        index error rate is well below the uncoded one."""
        from multimodal_sc_tpu.train import jscc

        cfg = self._cfg()
        state = jscc.create_train_state(cfg, key)
        img = jax.random.uniform(jax.random.key(1), (8, 32, 32, 3))
        snr = jnp.full((8,), 3.0)
        model_fec = jscc.build_model(cfg)
        model_raw = jscc.build_model(self._cfg("none"))
        _, aux_fec = model_fec.apply({"params": state.params}, img, snr,
                                     jax.random.key(2))
        _, aux_raw = model_raw.apply({"params": state.params}, img, snr,
                                     jax.random.key(2))
        assert (float(aux_fec["index_error_rate"])
                < 0.5 * float(aux_raw["index_error_rate"])), (
            dict(aux_fec), dict(aux_raw))

    def test_soft_fec_end_to_end_beats_hard(self, key):
        """Same params, three deployments: soft <= hard <= uncoded index
        error rates at a waterfall SNR."""
        from multimodal_sc_tpu.train import jscc

        img = jax.random.uniform(jax.random.key(1), (8, 32, 32, 3))
        snr = jnp.full((8,), 2.0)
        cfg = self._cfg()
        state = jscc.create_train_state(cfg, key)
        errs = {}
        for fec in ("none", "hamming74", "hamming74_soft"):
            model = jscc.build_model(self._cfg(fec))
            _, aux = model.apply({"params": state.params}, img, snr,
                                 jax.random.key(2))
            errs[fec] = float(aux["index_error_rate"])
        assert errs["hamming74_soft"] < errs["hamming74"] < errs["none"], (
            errs)

    def test_fec_payload_validation(self, key):
        """9x5 images -> 2 tokens x 6 bits = 12 bits, not divisible by 8:
        construction must fail loudly."""
        from multimodal_sc_tpu.train import jscc

        cfg = self._cfg().override_str(["camera.image_hw=9,5"])
        with pytest.raises(ValueError, match="divisible by 8"):
            jscc.create_train_state(cfg, key)

    def test_fec_name_validation(self):
        with pytest.raises(ValueError, match="channel.fec"):
            self._cfg("turbo")
