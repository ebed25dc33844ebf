"""BEV semantic token pruning (lidar.vq_prune, r5 — VERDICT r4 item 5):
the digital-bandwidth-elasticity machinery ported from the camera
(codec/semantic_vq.py vq_prune) to the LiDAR BEV codec and the RL trunk."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import multimodal_sc_tpu as msc
from multimodal_sc_tpu.envs.datasets import synthetic_pointcloud_batch


def _cfg(*extra):
    return msc.get_preset("c3").override_str([
        "lidar.arch=vq", "lidar.bev_hw=8,8", "lidar.pillar_dim=16",
        "lidar.vq_codes=16", "lidar.vq_dim=8", "lidar.max_points=64",
        "lidar.vq_prune=true",
        "camera.image_hw=16,16", "camera.dim=32", "camera.depth=1",
        "camera.heads=2", "camera.patch=4", "train.batch_size=4",
        *extra,
    ])


def _model_and_params(cfg, key):
    from multimodal_sc_tpu.train.fusion_jscc import build_lidar_codec

    model = build_lidar_codec(cfg)
    pts, mask, _ = synthetic_pointcloud_batch(
        key, 4, cfg.lidar.max_points, cfg.lidar.x_range, cfg.lidar.y_range,
        with_classes=True)
    snr = jnp.full((4,), 10.0)
    params = model.init(jax.random.fold_in(key, 1), pts, mask, snr,
                        jax.random.key(0))["params"]
    return model, params, pts, mask, snr


class TestCodecPrune:
    def test_mask_embed_exists_and_keep_frac_reported(self, key):
        cfg = _cfg()
        model, params, pts, mask, snr = _model_and_params(cfg, key)
        assert "mask_embed" in params
        keep = jnp.full((4,), 0.5)
        logits, aux = model.apply({"params": params}, pts, mask, snr,
                                  jax.random.key(2), keep=keep,
                                  select="scatter")
        # ceil(0.5 * 64) = 32 of 64 kept.
        np.testing.assert_allclose(float(aux["token_keep_frac"]), 0.5,
                                   atol=1e-6)
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_all_selection_rules_run(self, key):
        cfg = _cfg()
        model, params, pts, mask, snr = _model_and_params(cfg, key)
        keep = jnp.full((4,), 0.25)
        outs = {}
        for sel in ("scatter", "random", "drop_damage",
                    "drop_damage_scatter"):
            logits, aux = model.apply({"params": params}, pts, mask, snr,
                                      jax.random.key(3), keep=keep,
                                      select=sel)
            outs[sel] = np.asarray(logits)
            assert np.all(np.isfinite(outs[sel])), sel
        # Different rules keep different tokens -> different logits.
        assert not np.allclose(outs["scatter"], outs["random"])

    def test_keep_defaults_to_channel_token_keep(self, key):
        cfg = _cfg("channel.token_keep=0.25")
        model, params, pts, mask, snr = _model_and_params(cfg, key)
        _, aux = model.apply({"params": params}, pts, mask, snr,
                             jax.random.key(2))
        np.testing.assert_allclose(float(aux["token_keep_frac"]), 0.25,
                                   atol=1e-6)

    def test_dropped_tokens_transmit_zero_power(self, key):
        # keep=tiny: almost all symbol weights are zero — received codes
        # at dropped positions never affect the output (mask embedding
        # decodes instead), so two different channel keys agree wherever
        # only dropped tokens differ. Indirect check: keep=1.0 vs keep
        # tiny at terrible SNR — the tiny-keep output is FINITE and the
        # index error rate is counted over kept tokens only.
        cfg = _cfg()
        model, params, pts, mask, snr = _model_and_params(cfg, key)
        _, aux = model.apply({"params": params}, pts, mask,
                             jnp.full((4,), -20.0), jax.random.key(5),
                             keep=jnp.full((4,), 0.125), select="scatter")
        assert 0.0 <= float(aux["index_error_rate"]) <= 1.0

    def test_validate_rules(self):
        with pytest.raises(ValueError, match="vq_prune requires"):
            msc.get_preset("c3").override_str(["lidar.vq_prune=true"])
        # token_keep now accepts lidar-side pruning.
        _cfg("channel.token_keep=0.5").validate()
        with pytest.raises(ValueError, match="token_keep"):
            msc.get_preset("c3").override_str(
                ["lidar.arch=vq", "channel.token_keep=0.5"]).validate()


class TestKeepSweep:
    @pytest.mark.slow
    def test_sweep_lidar_vq_keep(self, key):
        from multimodal_sc_tpu.codec.lidar_bev import semantic_bev_target
        from multimodal_sc_tpu.evaluation.snr_sweep import (
            sweep_lidar_vq_keep,
        )

        cfg = _cfg()
        model, params, pts, mask, snr = _model_and_params(cfg, key)
        _, _, cls = synthetic_pointcloud_batch(
            key, 4, cfg.lidar.max_points, cfg.lidar.x_range,
            cfg.lidar.y_range, with_classes=True)
        target = semantic_bev_target(pts, mask, cls, cfg.lidar.bev_hw,
                                     cfg.lidar.x_range, cfg.lidar.y_range,
                                     num_classes=cfg.lidar.seg_classes)
        out = sweep_lidar_vq_keep(
            cfg, params, pts, mask, target, key, keeps=(0.25, 1.0),
            selects=("scatter", "random"), batches_per_point=1)
        for sel in ("scatter", "random"):
            assert [r["keep"] for r in out[sel]] == [0.25, 1.0]
            for r in out[sel]:
                assert 0.0 <= r["miou"] <= 1.0


class TestRLPrune:
    def test_rl_trunk_prunes_and_trains(self, key):
        from multimodal_sc_tpu.rl import dqn as dqn_lib

        cfg = msc.get_preset("c4").override_str([
            "camera.arch=vq", "camera.features=8,16,16,16",
            "camera.image_hw=16,16", "camera.vq_codes=16", "camera.vq_dim=8",
            "lidar.arch=vq", "lidar.pillar_dim=16", "lidar.bev_hw=8,8",
            "lidar.vq_codes=16", "lidar.vq_dim=8", "lidar.vq_prune=true",
            "env.image_hw=16,16", "env.num_npcs=2", "env.lidar_rays=16",
            "fusion.dim=32", "fusion.depth=1", "fusion.heads=2",
            "fusion.state_dim=32",
            "rl.replay_capacity=32", "rl.batch_size=8",
        ]).validate()
        state = dqn_lib.init(cfg, key, num_envs=4)
        assert "lid_mask_embed" in state.params["perception"]
        it = dqn_lib.make_iteration(cfg)
        for _ in range(4):
            state, m = it(state)
        assert int(state.step) >= 1
        assert np.isfinite(float(m["loss"]))

    def test_deploy_keep_changes_q_and_validates(self, key):
        from multimodal_sc_tpu.rl.perception import QNetwork
        from multimodal_sc_tpu.envs import driving

        base = [
            "camera.arch=vq", "camera.features=8,16,16,16",
            "camera.image_hw=16,16", "camera.vq_codes=16", "camera.vq_dim=8",
            "lidar.arch=vq", "lidar.pillar_dim=16", "lidar.bev_hw=8,8",
            "lidar.vq_codes=16", "lidar.vq_dim=8", "lidar.vq_prune=true",
            "env.image_hw=16,16", "env.num_npcs=2", "env.lidar_rays=16",
            "fusion.dim=32", "fusion.depth=1", "fusion.heads=2",
            "fusion.state_dim=32",
        ]
        cfg_full = msc.get_preset("c4").override_str(base).validate()
        cfg_half = msc.get_preset("c4").override_str(
            base + ["channel.token_keep=0.5"]).validate()
        with pytest.raises(ValueError, match="content-free"):
            msc.get_preset("c4").override_str(
                base + ["channel.token_keep=0.5",
                        "channel.token_select=drop_damage"]).validate()
        states = driving.reset_batch(cfg_full.env, key, 2)
        img, pts, mask = driving.observe_batch(cfg_full.env, states)
        params = QNetwork(cfg_full).init(key, img, pts, mask,
                                         jax.random.key(0))["params"]
        q_full = QNetwork(cfg_full).apply({"params": params}, img, pts,
                                          mask, jax.random.key(1))
        q_half = QNetwork(cfg_half).apply({"params": params}, img, pts,
                                          mask, jax.random.key(1))
        assert np.all(np.isfinite(np.asarray(q_full)))
        assert np.all(np.isfinite(np.asarray(q_half)))
        assert not np.allclose(np.asarray(q_full), np.asarray(q_half))
