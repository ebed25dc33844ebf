"""Type-I HARQ (channel/harq.py): CRC-8 algebra, chase-combining gain,
adaptive bandwidth accounting, and the VQ deployment evaluator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import multimodal_sc_tpu as msc
from multimodal_sc_tpu.channel.harq import (
    crc_append,
    crc_check,
    crc_matrix,
    harq_transmit,
)


class TestCRC:
    def test_roundtrip_passes(self, key):
        bits = jax.random.bernoulli(key, 0.5, (4, 8, 64)).astype(jnp.int32)
        coded = crc_append(bits)
        assert coded.shape == (4, 8, 72)
        assert bool(jnp.all(crc_check(coded)))

    def test_every_single_bit_flip_detected(self, key):
        bits = jax.random.bernoulli(key, 0.5, (1, 1, 32)).astype(jnp.int32)
        coded = np.asarray(crc_append(bits))
        for pos in range(coded.shape[-1]):
            bad = coded.copy()
            bad[0, 0, pos] ^= 1
            assert not bool(crc_check(jnp.asarray(bad))[0, 0]), pos

    def test_random_corruption_detected_with_crc8_strength(self, key):
        """Undetected-error probability of a random nonzero pattern is
        ~2^-8; over 2000 corrupted blocks expect ~8 misses."""
        bits = jax.random.bernoulli(key, 0.5, (2000, 1, 64)).astype(
            jnp.int32)
        coded = crc_append(bits)
        noise = jax.random.bernoulli(
            jax.random.key(1), 0.5, coded.shape).astype(jnp.int32)
        # Ensure nonzero corruption per block.
        noise = noise.at[:, :, 0].set(
            jnp.maximum(noise[:, :, 0],
                        (jnp.sum(noise, axis=-1) == 0).astype(jnp.int32)))
        ok = crc_check((coded + noise) % 2)
        missed = float(jnp.mean(ok.astype(jnp.float32)))
        assert missed < 0.02, missed             # ~0.004 expected

    def test_linearity_matches_reference_bitwise_crc(self):
        """The generator-matrix CRC equals the bit-serial reference on a
        non-one-hot message (linearity sanity)."""
        from multimodal_sc_tpu.channel.harq import _crc8_of_message

        msg = [1, 0, 1, 1, 0, 0, 1, 0, 1, 1, 1, 0, 0, 1, 0, 1]
        g = crc_matrix(len(msg))
        crc_lin = np.asarray(msg) @ g % 2
        ref = _crc8_of_message(msg)
        ref_bits = [(ref >> (7 - j)) & 1 for j in range(8)]
        np.testing.assert_array_equal(crc_lin, ref_bits)


class TestHARQTransmit:
    def test_ideal_channel_one_round_exact(self, key):
        bits = jax.random.bernoulli(key, 0.5, (4, 512)).astype(jnp.int32)
        out, info = harq_transmit(bits, jnp.full((4,), 10.0), "ideal",
                                  jax.random.key(1))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(bits))
        assert float(info["mean_rounds"]) == 1.0
        assert float(info["residual_fail_rate"]) == 0.0
        # 8 blocks x 36 symbols, one round each.
        assert float(info["symbols_per_item"]) == 8 * 36
        assert float(info["oneshot_symbols"]) == 256

    def test_deep_noise_exhausts_rounds(self, key):
        bits = jax.random.bernoulli(key, 0.5, (4, 512)).astype(jnp.int32)
        out, info = harq_transmit(bits, jnp.full((4,), -20.0), "awgn",
                                  jax.random.key(1), max_rounds=3)
        assert float(info["mean_rounds"]) > 2.9
        assert float(info["residual_fail_rate"]) > 0.5

    def test_chase_combining_beats_one_shot(self, key):
        """At a waterfall SNR, HARQ residual bit errors are far below the
        one-shot hard-decision error, at adaptive bandwidth between 1x
        and max_rounds x."""
        from multimodal_sc_tpu.channel import awgn
        from multimodal_sc_tpu.channel.digital import (
            bits_to_qpsk,
            qpsk_to_bits,
        )

        bits = jax.random.bernoulli(key, 0.5, (32, 512)).astype(jnp.int32)
        snr = jnp.full((32,), 0.0)
        out, info = harq_transmit(bits, snr, "awgn", jax.random.key(1),
                                  max_rounds=4)
        harq_ber = float(jnp.mean((out != bits).astype(jnp.float32)))
        y = awgn(bits_to_qpsk(bits), snr, jax.random.key(2))
        oneshot_ber = float(jnp.mean(
            (qpsk_to_bits(y) != bits).astype(jnp.float32)))
        assert oneshot_ber > 0.05                # 0 dB: ~7.8% theory
        assert harq_ber < 0.2 * oneshot_ber, (harq_ber, oneshot_ber)
        rounds = float(info["mean_rounds"])
        assert 1.0 < rounds <= 4.0

    def test_bandwidth_is_adaptive_in_snr(self, key):
        bits = jax.random.bernoulli(key, 0.5, (16, 512)).astype(jnp.int32)
        costs = []
        for snr in (10.0, 2.0, -5.0):
            _, info = harq_transmit(bits, jnp.full((16,), snr), "awgn",
                                    jax.random.key(1))
            costs.append(float(info["symbols_per_item"]))
        assert costs[0] < costs[1] < costs[2]    # worse channel pays more

    def test_payload_shape_validation(self, key):
        bits = jnp.zeros((2, 100), jnp.int32)
        with pytest.raises(ValueError, match="not divisible"):
            harq_transmit(bits, 10.0, "awgn", key)
        with pytest.raises(ValueError, match="whole QPSK"):
            harq_transmit(jnp.zeros((2, 128), jnp.int32), 10.0, "awgn",
                          key, block_bits=32, crc_bits=7)


def test_cli_eval_hard_errors_on_missing_checkpoint(tmp_path):
    """The r3 HARQ flat-curve incident: `eval` with a set-but-empty
    checkpoint_dir must hard-error (like eval-policy/export), and
    --allow-untrained must opt back in."""
    from multimodal_sc_tpu import cli

    args = ["eval", "--config", "c1", "--kinds", "awgn",
            "--set", "camera.features=8,16,16,16", "--set", "camera.c_sym=2",
            "--set", "train.batch_size=4",
            "--set", f"train.checkpoint_dir={tmp_path}/nothing_here"]
    with pytest.raises(SystemExit, match="no checkpoint"):
        cli.main(args)


class TestHARQEvaluator:
    def test_vq_harq_sweep_wiring(self, key):
        from multimodal_sc_tpu.evaluation import snr_sweep
        from multimodal_sc_tpu.train import jscc

        cfg = msc.get_preset("c1").override_str([
            "camera.arch=vq", "camera.vq_codes=64", "camera.vq_dim=16",
            "camera.features=8,16,16,16", "train.batch_size=4",
        ])
        state = jscc.create_train_state(cfg, key)
        img = jax.random.uniform(jax.random.key(1), (4, 32, 32, 3))
        # 64 tokens x 6 bits = 384 bits -> 6 blocks of 64.
        curves = snr_sweep.sweep_camera_vq_harq(
            cfg, state.params, img, key, snrs_db=(0.0, 20.0),
            kinds=("awgn",), batches_per_point=1)
        pts = curves["awgn"]
        assert len(pts) == 2
        assert pts[0]["symbols_per_item"] > pts[1]["symbols_per_item"]
        assert pts[1]["index_err"] <= pts[0]["index_err"]
        for p in pts:
            assert np.isfinite(p["psnr"])


class TestHARQControlPath:
    """Type-I HARQ deployed on the RL digital token links (r5, VERDICT r4
    item 4): same checkpoint, channel.harq is a pure deploy-time flag;
    the policy sweep records the adaptive-bandwidth accounting."""

    def _cfg(self, *extra):
        import multimodal_sc_tpu as msc

        return msc.get_preset("c4").override_str([
            "camera.arch=vq", "camera.features=8,16,16,16",
            "camera.image_hw=16,16", "camera.vq_codes=16", "camera.vq_dim=8",
            "lidar.arch=vq", "lidar.pillar_dim=16", "lidar.bev_hw=8,8",
            "lidar.vq_codes=16", "lidar.vq_dim=8",
            "env.image_hw=16,16", "env.num_npcs=2", "env.lidar_rays=16",
            "env.max_steps=8",
            "fusion.dim=32", "fusion.depth=1", "fusion.heads=2",
            "fusion.state_dim=32",
            "rl.replay_capacity=32", "rl.batch_size=8",
            *extra,
        ])

    def test_validate_rules(self):
        import multimodal_sc_tpu as msc

        self._cfg("channel.harq=true").validate()
        with pytest.raises(ValueError, match="harq"):
            self._cfg("channel.harq=true",
                      "channel.fec=hamming74_soft").validate()
        with pytest.raises(ValueError, match="digital"):
            msc.get_preset("c4").override_str(
                ["channel.harq=true"]).validate()
        with pytest.raises(ValueError, match="harq-sweep"):
            msc.get_preset("c1").override_str(
                ["camera.arch=vq", "channel.harq=true"]).validate()

    def test_policy_sweep_records_adaptive_bandwidth(self, key):
        from multimodal_sc_tpu.evaluation import policy_sweep
        from multimodal_sc_tpu.rl import dqn as dqn_lib

        cfg = self._cfg("channel.harq=true", "channel.harq_rounds=3")
        params = dqn_lib.init_params(cfg, key)
        curves = policy_sweep.policy_snr_sweep(
            cfg, params, key, snrs=(-5.0, 20.0), kinds=("awgn",),
            num_envs=4)
        lo, hi = curves["awgn"]
        # Fixed-bandwidth floor: camera 16 tok x 4 b = 64 payload bits ->
        # 1 block of 72 coded bits = 36 syms; lidar 64 tok x 4 b = 256 ->
        # 4 blocks = 144 syms; total one-shot = 180 syms/step.
        assert hi["link_syms_per_step"] >= 180.0 - 1e-3
        # Adaptive: the bad channel pays retransmissions, the good one
        # pays ~the CRC-only overhead.
        assert lo["link_syms_per_step"] > 1.5 * hi["link_syms_per_step"]
        assert hi["link_syms_per_step"] < 1.2 * 180.0
        assert lo["harq_mean_rounds"] > hi["harq_mean_rounds"]
        assert 0.0 <= lo["harq_residual_fail_rate"] <= 1.0

    def test_harq_transparent_same_params(self, key):
        # The flag changes only the link: same params apply cleanly and
        # produce finite Q-values with and without HARQ.
        import jax.numpy as jnp

        from multimodal_sc_tpu.envs import driving
        from multimodal_sc_tpu.rl.perception import QNetwork

        cfg0 = self._cfg()
        cfg1 = self._cfg("channel.harq=true")
        states = driving.reset_batch(cfg0.env, key, 2)
        img, pts, mask = driving.observe_batch(cfg0.env, states)
        params = QNetwork(cfg0).init(key, img, pts, mask,
                                     jax.random.key(0))["params"]
        q0 = QNetwork(cfg0).apply({"params": params}, img, pts, mask,
                                  jax.random.key(1))
        q1 = QNetwork(cfg1).apply({"params": params}, img, pts, mask,
                                  jax.random.key(1))
        assert np.all(np.isfinite(np.asarray(q0)))
        assert np.all(np.isfinite(np.asarray(q1)))
