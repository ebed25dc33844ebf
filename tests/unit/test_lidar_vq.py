"""Digital LiDAR semantic codec (codec/lidar_bev.py LidarBEVVQCodec,
lidar.arch="vq"): the BEV pillar encoder's discrete-token counterpart of
the camera VQ codec (VERDICT r3 item 4 — the digital rows were all
camera-only). Shares transmit_indices, so FEC deploys identically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import multimodal_sc_tpu as msc
from multimodal_sc_tpu.envs.datasets import synthetic_pointcloud_batch
from multimodal_sc_tpu.train import fusion_jscc


def _tiny_c3_vq(*extra):
    return msc.get_preset("c3").override_str([
        "lidar.arch=vq", "lidar.bev_hw=8,8", "lidar.pillar_dim=16",
        "lidar.vq_codes=16", "lidar.vq_dim=8", "lidar.max_points=64",
        "camera.image_hw=16,16", "camera.dim=32", "camera.depth=1",
        "camera.heads=2", "camera.patch=4",
        "train.batch_size=4", *extra,
    ])


def _points(cfg, key, batch=4):
    return synthetic_pointcloud_batch(
        key, batch, cfg.lidar.max_points, cfg.lidar.x_range,
        cfg.lidar.y_range, with_classes=True)


class TestLidarVQ:
    def test_roundtrip_shapes_and_aux(self, key):
        cfg = _tiny_c3_vq()
        model = fusion_jscc.build_lidar_codec(cfg)
        pts, mask, _ = _points(cfg, key)
        snr = jnp.full((4,), 10.0)
        params = model.init(key, pts, mask, snr,
                            jax.random.fold_in(key, 1))["params"]
        logits, aux = model.apply({"params": params}, pts, mask, snr,
                                  jax.random.fold_in(key, 2))
        assert logits.shape == (4, 8, 8, cfg.lidar.seg_classes)
        assert {"vq_loss", "index_error_rate",
                "code_perplexity"} <= set(aux)
        idx, _, z = model.apply({"params": params}, pts, mask,
                                method="encode_tokens")
        assert idx.shape == (4, 64) and idx.dtype == jnp.int32
        assert z.shape == (4, 64, 8)

    def test_errors_at_low_snr_clean_at_ideal(self, key):
        cfg = _tiny_c3_vq("channel.snr_db=-5")
        model = fusion_jscc.build_lidar_codec(cfg)
        pts, mask, _ = _points(cfg, key)
        params = model.init(key, pts, mask, jnp.full((4,), 10.0),
                            jax.random.fold_in(key, 1))["params"]
        _, aux = model.apply({"params": params}, pts, mask,
                             jnp.full((4,), -5.0),
                             jax.random.fold_in(key, 2))
        assert float(aux["index_error_rate"]) > 0.05
        model_id = fusion_jscc.build_lidar_codec(
            _tiny_c3_vq("channel.kind=ideal"))
        _, aux0 = model_id.apply({"params": params}, pts, mask,
                                 jnp.full((4,), -5.0),
                                 jax.random.fold_in(key, 2))
        assert float(aux0["index_error_rate"]) == 0.0

    def test_fec_parameter_transparent(self, key):
        cfg = _tiny_c3_vq()
        coded = _tiny_c3_vq("channel.fec=hamming74_soft")
        m0 = fusion_jscc.build_lidar_codec(cfg)
        m1 = fusion_jscc.build_lidar_codec(coded)
        pts, mask, _ = _points(cfg, key)
        snr = jnp.full((4,), 10.0)
        p0 = m0.init(key, pts, mask, snr, jax.random.fold_in(key, 1))[
            "params"]
        p1 = m1.init(key, pts, mask, snr, jax.random.fold_in(key, 1))[
            "params"]
        assert (jax.tree_util.tree_structure(p0)
                == jax.tree_util.tree_structure(p1))
        logits, aux = m1.apply({"params": p0}, pts, mask, snr,
                               jax.random.fold_in(key, 2))
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_bandwidth_matches_analog_at_c3_shapes(self):
        """256 codes on the 32x32 c3 grid -> 4096 QPSK symbols == the
        analog payload 32*32*c_sym(4) — the bandwidth-matched comparison
        the c3_vq baseline arm claims."""
        from multimodal_sc_tpu.channel.digital import index_bits

        cfg = msc.get_preset("c3").override_str(["lidar.arch=vq"])
        n_tok = cfg.lidar.bev_hw[0] * cfg.lidar.bev_hw[1]
        bits = n_tok * index_bits(cfg.lidar.vq_codes)
        assert bits // 2 == n_tok * cfg.lidar.c_sym == 4096

    @pytest.mark.slow
    def test_fusion_train_step_and_seeding(self, key, tmp_path):
        """One c3 train step with the digital LiDAR branch: finite
        metrics, vq aux present, codebook moves; run() seeds the codebook
        on a fresh run."""
        # run() pulls images from the dataset, whose size is fixed by the
        # dataset name (synthetic_cifar = 32x32) — align the camera.
        cfg = _tiny_c3_vq(
            "train.steps=2", "train.log_every=1", "train.eval_every=100",
            "train.checkpoint_every=100", "train.dataset=synthetic_cifar",
            "camera.image_hw=32,32",
            f"train.checkpoint_dir={tmp_path}/ck")
        state, last = fusion_jscc.run(cfg)
        assert np.isfinite(last["loss"])
        assert "lidar_vq_loss" in last and "lidar_index_err" in last
        # Seeding happened: codebook rows are spread (perplexity > 1-ish
        # would need training; instead check rows differ from each other).
        cb = np.asarray(state.params["lidar"]["codebook"])
        assert np.std(cb) > 0
        d = np.linalg.norm(cb[None] - cb[:, None], axis=-1)
        assert np.median(d[np.triu_indices(len(cb), 1)]) > 1e-3

    @pytest.mark.slow
    def test_sweep_lidar_vq(self, key):
        from multimodal_sc_tpu.codec.lidar_bev import semantic_bev_target
        from multimodal_sc_tpu.evaluation import snr_sweep

        cfg = _tiny_c3_vq()
        model = fusion_jscc.build_lidar_codec(cfg)
        pts, mask, cls = _points(cfg, key)
        params = model.init(key, pts, mask, jnp.full((4,), 10.0),
                            jax.random.fold_in(key, 1))["params"]
        target = semantic_bev_target(pts, mask, cls, cfg.lidar.bev_hw,
                                     cfg.lidar.x_range, cfg.lidar.y_range,
                                     num_classes=cfg.lidar.seg_classes)
        curves = snr_sweep.sweep_lidar_vq(
            cfg, params, pts, mask, target, key, snrs_db=(-5.0, 20.0),
            kinds=("awgn",), batches_per_point=1)
        c = curves["awgn"]
        assert len(c) == 2
        assert c[0]["index_err"] > c[1]["index_err"]  # -5 dB worse

    @pytest.mark.slow
    def test_rl_full_digital_iteration(self, key):
        """The WHOLE multimodal agent over digital links: camera VQ +
        LiDAR VQ + fog + V2X (the RSU tokens ride the digital LiDAR
        codec too). One learning DQN iteration chain with finite metrics
        and both codebooks moving."""
        import numpy as np

        from multimodal_sc_tpu.rl import dqn as dqn_lib

        cfg = msc.get_preset("c4").override_str([
            "camera.arch=vq", "camera.features=8,16,16,16",
            "camera.image_hw=16,16", "camera.vq_codes=16",
            "camera.vq_dim=8", "env.image_hw=16,16",
            "lidar.arch=vq", "lidar.vq_codes=16", "lidar.vq_dim=8",
            "lidar.pillar_dim=16", "lidar.bev_hw=8,8",
            "env.fog_range=10", "env.v2x_rays=16",
            "fusion.dim=32", "fusion.depth=1", "fusion.heads=2",
            "fusion.state_dim=32", "env.num_npcs=2", "env.lidar_rays=16",
            "rl.replay_capacity=64", "rl.batch_size=4",
            "rl.target_update_period=2",
        ]).validate()
        p0 = dqn_lib.init(cfg, key, num_envs=4).params["perception"]
        assert "lid_codebook" in p0 and "lid_to_code" in p0
        assert "lid_sym_head" not in p0
        state = dqn_lib.init(cfg, key, num_envs=4)
        it = dqn_lib.make_iteration(cfg, learn=True)
        for _ in range(6):
            state, m = it(state)
        assert int(state.step) >= 1
        assert all(np.isfinite(float(v))
                   for v in jax.tree_util.tree_leaves(m))
        p1 = state.params["perception"]
        assert float(jnp.max(jnp.abs(
            p0["lid_codebook"] - p1["lid_codebook"]))) > 0
        assert float(jnp.max(jnp.abs(
            p0["cam_vq"]["codebook"] - p1["cam_vq"]["codebook"]))) > 0

    @pytest.mark.slow
    def test_warmstart_c3vq_into_rl_trunk(self, key, tmp_path):
        """A c3_vq fusion checkpoint warm-starts the RL trunk's digital
        LiDAR firmware (to_code/codebook/from_code by name)."""
        import numpy as np

        from multimodal_sc_tpu.io.checkpoint import CheckpointManager
        from multimodal_sc_tpu.rl import dqn as dqn_lib
        from multimodal_sc_tpu.rl.warmstart import load_jscc_into_perception

        c3 = _tiny_c3_vq()
        src_state = fusion_jscc.create_train_state(c3, key)
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(10, {"params": src_state.params})
        mgr.close()

        cfg = msc.get_preset("c4").override_str([
            "lidar.arch=vq", "lidar.vq_codes=16", "lidar.vq_dim=8",
            "lidar.pillar_dim=16", "lidar.bev_hw=8,8",
            "camera.features=8,16,16,16", "camera.image_hw=16,16",
            "env.image_hw=16,16", "fusion.dim=32", "fusion.depth=1",
            "fusion.heads=2", "fusion.state_dim=32", "env.num_npcs=2",
            "env.lidar_rays=16",
        ]).validate()
        params = dqn_lib.init_params(cfg, key)
        warm = load_jscc_into_perception(cfg, params, str(tmp_path / "ck"))
        np.testing.assert_array_equal(
            np.asarray(warm["perception"]["lid_codebook"]),
            np.asarray(src_state.params["lidar"]["codebook"]))
        np.testing.assert_array_equal(
            np.asarray(warm["perception"]["lid_to_code"]["kernel"]),
            np.asarray(src_state.params["lidar"]["to_code"]["kernel"]))
