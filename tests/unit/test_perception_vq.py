"""VQ digital semantic codec on the RL control path (rl/perception.py
arch="vq" + codec/semantic_vq.py transmit_indices): the driving agent's
camera branch ships discrete codebook indices over the QPSK digital link
(VERDICT r3 item 2 — previously `--config c4 --set camera.arch=vq`
silently built the CNN codec).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import multimodal_sc_tpu as msc
from multimodal_sc_tpu.rl import dqn as dqn_lib


def _tiny_c4_vq(*extra):
    return msc.get_preset("c4").override_str([
        "camera.arch=vq", "camera.features=8,16,16,16",
        "camera.image_hw=16,16", "camera.vq_codes=16", "camera.vq_dim=8",
        "env.image_hw=16,16",
        "lidar.pillar_dim=16", "lidar.c_sym=2", "lidar.bev_hw=8,8",
        "fusion.dim=32", "fusion.depth=1", "fusion.heads=2",
        "fusion.state_dim=32", "env.num_npcs=2", "env.lidar_rays=16",
        "rl.replay_capacity=64", "rl.batch_size=4",
        "rl.target_update_period=2", *extra,
    ])


class TestVQTrunk:
    def test_forward_shapes_and_vq_param_tree(self, key):
        cfg = _tiny_c4_vq()
        params = dqn_lib.init_params(cfg, key)
        per = params["perception"]
        assert "cam_vq" in per and "cam_enc" not in per
        # Transmitter firmware tree mirrors the c1_vq codec's encoder half
        # (warm-start contract, codec/semantic_vq.py VQEncoderTokens).
        assert {"enc0", "enc1", "enc2", "enc3", "to_code",
                "codebook"} <= set(per["cam_vq"])
        assert per["cam_vq"]["codebook"].shape == (16, 8)
        es = msc.envs.driving.reset_batch(cfg.env, key, 2)
        img, pts, mask = msc.envs.driving.observe_batch(cfg.env, es)
        q = dqn_lib.act(cfg, params, img, pts, mask, key)
        assert q.shape == (2,)

    @pytest.mark.slow
    def test_gradients_reach_encoder_and_codebook(self, key):
        """TD loss gradients must flow through the straight-through path
        into the conv trunk, and the sown VQ loss must move the codebook
        (rl.vq_loss_coef)."""
        cfg = _tiny_c4_vq()
        state = dqn_lib.init(cfg, key, num_envs=4)
        it = dqn_lib.make_iteration(cfg, learn=True)
        for _ in range(6):                        # past replay warmup
            state, m = it(state)
        assert int(state.step) >= 1
        assert all(np.isfinite(float(v))
                   for v in jax.tree_util.tree_leaves(m))
        p0 = dqn_lib.init(cfg, key, num_envs=4).params["perception"]
        p1 = state.params["perception"]
        moved = lambda a, b: float(jnp.max(jnp.abs(a - b))) > 0  # noqa: E731
        assert moved(p0["cam_vq"]["enc0"]["kernel"],
                     p1["cam_vq"]["enc0"]["kernel"])
        assert moved(p0["cam_vq"]["codebook"], p1["cam_vq"]["codebook"])

    def test_fec_is_parameter_transparent(self, key):
        """Deploy-time FEC (hamming74_soft) must not change the param
        tree: the same checkpoint deploys coded or uncoded."""
        base = dqn_lib.init_params(_tiny_c4_vq(), key)
        coded_cfg = _tiny_c4_vq("channel.fec=hamming74_soft")
        coded = dqn_lib.init_params(coded_cfg, key)
        assert (jax.tree_util.tree_structure(base)
                == jax.tree_util.tree_structure(coded))
        for a, b in zip(jax.tree_util.tree_leaves(base),
                        jax.tree_util.tree_leaves(coded)):
            assert a.shape == b.shape
        # And the coded forward runs.
        es = msc.envs.driving.reset_batch(coded_cfg.env, key, 2)
        img, pts, mask = msc.envs.driving.observe_batch(coded_cfg.env, es)
        a = dqn_lib.act(coded_cfg, base, img, pts, mask, key)
        assert a.shape == (2,)

    @pytest.mark.slow
    def test_channel_errors_change_tokens_at_low_snr(self, key):
        """At -5 dB the digital link must corrupt indices (nonzero index
        error rate sown by the trunk); at ideal kind it must not."""
        from multimodal_sc_tpu.rl.perception import QNetwork

        cfg = _tiny_c4_vq("channel.snr_db=-5")
        params = dqn_lib.init_params(cfg, key)
        es = msc.envs.driving.reset_batch(cfg.env, key, 4)
        img, pts, mask = msc.envs.driving.observe_batch(cfg.env, es)
        _, col = QNetwork(cfg).apply(
            {"params": params}, img, pts, mask, key,
            mutable=["intermediates"])
        err = float(col["intermediates"]["perception"]
                    ["index_error_rate"][0])
        assert err > 0.05
        cfg_id = _tiny_c4_vq("channel.kind=ideal")
        _, col0 = QNetwork(cfg_id).apply(
            {"params": params}, img, pts, mask, key,
            mutable=["intermediates"])
        err0 = float(col0["intermediates"]["perception"]
                     ["index_error_rate"][0])
        assert err0 == 0.0

    @pytest.mark.slow
    def test_codebook_seeding(self, key):
        """seed_vq_codebook_params replaces the tight default-init cluster
        with rows drawn from the encoder's output distribution."""
        from multimodal_sc_tpu.rl.warmstart import seed_vq_codebook_params

        cfg = _tiny_c4_vq()
        params = dqn_lib.init_params(cfg, key)
        seeded = seed_vq_codebook_params(cfg, params)
        cb0 = params["perception"]["cam_vq"]["codebook"]
        cb1 = seeded["perception"]["cam_vq"]["codebook"]
        assert cb0.shape == cb1.shape
        assert float(jnp.max(jnp.abs(cb0 - cb1))) > 0
        # Only the codebook changed.
        f0 = jax.tree_util.tree_leaves(params)
        f1 = jax.tree_util.tree_leaves(seeded)
        diffs = sum(float(jnp.max(jnp.abs(a - b))) > 0
                    for a, b in zip(f0, f1))
        assert diffs == 1

    @pytest.mark.slow
    def test_warmstart_from_vq_codec_checkpoint(self, key, tmp_path):
        """A c1_vq reconstruction checkpoint warm-starts the RL trunk's
        cam_vq submodule subtree-by-name."""
        from multimodal_sc_tpu.codec.semantic_vq import VQCameraJSCC
        from multimodal_sc_tpu.io.checkpoint import CheckpointManager
        from multimodal_sc_tpu.rl.warmstart import load_jscc_into_perception

        cfg = _tiny_c4_vq()
        codec_cfg = cfg.override_str(["train.task=jscc"])
        model = VQCameraJSCC(codec_cfg)
        img = jnp.zeros((2, 16, 16, 3))
        src = model.init(key, img, jnp.full((2,), 10.0),
                         jax.random.fold_in(key, 1))["params"]
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(100, {"params": src})
        mgr.close()

        params = dqn_lib.init_params(cfg, key)
        warm = load_jscc_into_perception(cfg, params, str(tmp_path / "ck"))
        for k in ("enc0", "to_code", "codebook"):
            np.testing.assert_array_equal(
                np.asarray(jax.tree_util.tree_leaves(
                    warm["perception"]["cam_vq"][k])[0]),
                np.asarray(jax.tree_util.tree_leaves(src[k])[0]))

    @pytest.mark.slow
    def test_ppo_update_with_vq(self, key):
        from multimodal_sc_tpu.rl import ppo as ppo_lib

        cfg = _tiny_c4_vq(
            "rl.algo=ppo", "train.task=ppo", "rl.rollout_length=4",
            "rl.num_envs=4", "rl.num_minibatches=2", "rl.ppo_epochs=1")
        state = ppo_lib.init(cfg, key)
        step = ppo_lib.make_train_step(cfg)
        state, m = step(state)
        assert all(np.isfinite(float(v))
                   for v in jax.tree_util.tree_leaves(m))
        assert int(state.update) == 1


class TestConfigValidation:
    """validate() turns every accepted-but-ignored flag combo into a hard
    error (VERDICT r3 item 6). Audit (grep over config consumers, r4):
    snr_conditioning (rl/perception.py cnn-only), adaptive_rate /
    vq_prune / uep_alpha / token_keep (codec-only paths), fec /
    modulation (digital-vs-analog exclusivity)."""

    def test_rl_snr_conditioning_requires_cnn(self):
        cfg = msc.get_preset("c4").override_str(
            ["camera.arch=vit", "camera.snr_conditioning=true"])
        with pytest.raises(ValueError, match="snr_conditioning"):
            cfg.validate()

    def test_rl_adaptive_rate_rejected(self):
        cfg = msc.get_preset("c4").override_str(
            ["camera.adaptive_rate=true"])
        with pytest.raises(ValueError, match="adaptive_rate"):
            cfg.validate()

    def test_rl_uep_rejected(self):
        cfg = _tiny_c4_vq("channel.uep_alpha=0.25")
        with pytest.raises(ValueError, match="uep_alpha"):
            cfg.validate()

    def test_fec_requires_vq(self):
        cfg = msc.get_preset("c1").override_str(
            ["channel.fec=hamming74"])
        with pytest.raises(ValueError, match="fec"):
            cfg.validate()

    def test_modulation_conflicts_with_vq(self):
        cfg = msc.get_preset("c1").override_str(
            ["camera.arch=vq", "channel.modulation=16"])
        with pytest.raises(ValueError, match="modulation"):
            cfg.validate()

    def test_fusion_task_rejects_vq_camera(self):
        # ADVICE r4 (medium): c3 + camera.arch=vq used to pass validation
        # while fusion_jscc silently built the analog CNN (and channel.fec
        # then passed while coding nothing).
        cfg = msc.get_preset("c3").override_str(["camera.arch=vq"])
        with pytest.raises(ValueError, match="fusion"):
            cfg.validate()

    def test_lidar_vq_requires_enabled_on_recon_tasks(self):
        cfg = msc.get_preset("c1").override_str(["lidar.arch=vq"])
        with pytest.raises(ValueError, match="lidar.enabled"):
            cfg.validate()

    def test_valid_presets_pass(self):
        for name in ("c1", "c2", "c3", "c4", "c5"):
            msc.get_preset(name).validate()
        _tiny_c4_vq().validate()
        _tiny_c4_vq("channel.fec=hamming74_soft").validate()
        msc.get_preset("c1").override_str(
            ["camera.arch=vq", "channel.uep_alpha=0.25"]).validate()
