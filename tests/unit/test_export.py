"""Deployment export (io/export.py): serialized StableHLO artifacts must
reproduce the live model bit-for-bit (same platform, same XLA program) and
stay batch-size polymorphic — the transmitter/receiver/agent deployment
split of the semantic-communication pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sc_tpu.config.presets import get_preset
from multimodal_sc_tpu.io import export as export_lib


def _tiny_jscc():
    return get_preset("c2").override_str([
        "camera.features=8,16,16,16", "camera.c_sym=2",
        "camera.image_hw=16,16",
    ])


@pytest.mark.slow
def test_camera_codec_export_roundtrip(key, tmp_path):
    from multimodal_sc_tpu.train import jscc

    cfg = _tiny_jscc()
    state = jscc.create_train_state(cfg, key)
    parts = export_lib.export_camera_codec(cfg, state.params)
    assert set(parts) == {"encoder", "decoder", "decoder_seg"}

    export_lib.save_artifact(str(tmp_path), parts, cfg)
    fns = export_lib.load_artifact(str(tmp_path))
    model = jscc.build_model(export_lib._portable(cfg))

    # Batch polymorphism: one artifact, multiple batch sizes.
    for b in (3, 5):
        img = jax.random.uniform(jax.random.fold_in(key, b), (b, 16, 16, 3))
        snr = jnp.full((b,), 10.0)
        z = fns["encoder"](img, snr)
        z_ref = model.apply({"params": state.params}, img, snr,
                            method="encode")
        np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                                   rtol=1e-6, atol=1e-6)
        assert z.shape[-1] == 2  # trailing real/imag pair convention
        rec = fns["decoder"](z, snr)
        rec_ref = model.apply({"params": state.params}, z, snr,
                              method="decode")
        np.testing.assert_allclose(np.asarray(rec), np.asarray(rec_ref),
                                   rtol=1e-6, atol=1e-6)
        _, seg = fns["decoder_seg"](z, snr)
        assert seg.shape == (b, 16, 16, cfg.camera.seg_classes)

    # The artifact pins its config + manifest beside the blobs.
    assert (tmp_path / "config.json").exists()
    assert (tmp_path / "manifest.json").exists()


@pytest.mark.slow
def test_vq_codec_export_roundtrip(key, tmp_path):
    """VQ arch exports int32 token payloads: encoder img -> indices,
    decoder indices -> image, both batch-polymorphic, matching the live
    model exactly (codec/semantic_vq.py deployment split)."""
    from multimodal_sc_tpu.train import jscc

    cfg = get_preset("c1").override_str([
        "camera.arch=vq", "camera.vq_codes=64", "camera.vq_dim=16",
        "camera.features=8,16,16,16",
    ])
    state = jscc.create_train_state(cfg, key)
    parts = export_lib.export_camera_codec(cfg, state.params)
    assert set(parts) == {"encoder", "decoder"}

    export_lib.save_artifact(str(tmp_path), parts, cfg)
    fns = export_lib.load_artifact(str(tmp_path))
    model = jscc.build_model(export_lib._portable(cfg))

    for b in (2, 5):
        img = jax.random.uniform(jax.random.fold_in(key, b), (b, 32, 32, 3))
        idx = fns["encoder"](img)
        idx_ref, _, _ = model.apply({"params": state.params}, img,
                                    method="encode_tokens")
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
        assert idx.dtype == jnp.int32
        rec = fns["decoder"](idx)
        rec_ref = model.apply({"params": state.params}, idx,
                              method="decode_tokens")
        np.testing.assert_allclose(np.asarray(rec), np.asarray(rec_ref),
                                   rtol=1e-6, atol=1e-6)


def test_lidar_codec_export_roundtrip(key):
    from multimodal_sc_tpu.train.fusion_jscc import build_lidar_codec

    cfg = get_preset("c3").override_str([
        "lidar.pillar_dim=16", "lidar.c_sym=2", "lidar.bev_hw=8,8",
        "lidar.max_points=64", "lidar.max_pillars=32",
    ])
    model = build_lidar_codec(export_lib._portable(cfg))
    pts = jax.random.uniform(key, (2, 64, 4)) * 10.0
    mask = jnp.ones((2, 64), bool)
    snr = jnp.full((2,), 10.0)
    params = model.init(jax.random.fold_in(key, 1), (pts, mask), snr)[
        "params"]

    parts = export_lib.export_lidar_codec(cfg, params)
    enc = jax.export.deserialize(parts["lidar_encoder"]).call
    dec = jax.export.deserialize(parts["lidar_decoder"]).call

    z = enc(pts, mask, snr)
    z_ref = model.apply({"params": params}, (pts, mask), snr,
                        method="encode")
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref),
                               rtol=1e-6, atol=1e-6)
    logits = dec(z, snr)
    ref = model.apply({"params": params}, z, snr, method="decode")
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    assert logits.shape == (2, 8, 8, cfg.lidar.seg_classes)


@pytest.mark.slow
def test_policy_export_matches_greedy_act(key):
    """The exported policy must take EXACTLY the live greedy actions —
    the packed fused-block param tree runs through the XLA twin
    (mha_block_kernel=False), same as the learner losses."""
    from multimodal_sc_tpu.envs import driving
    from multimodal_sc_tpu.rl import dqn as dqn_lib
    from multimodal_sc_tpu.rl.perception import QNetwork

    cfg = get_preset("c4").override_str([
        "camera.features=8,16,16,16", "camera.c_sym=2",
        "camera.image_hw=16,16", "env.image_hw=16,16",
        "lidar.pillar_dim=16", "lidar.c_sym=2", "lidar.bev_hw=8,8",
        "fusion.dim=32", "fusion.depth=1", "fusion.heads=2",
        "fusion.state_dim=32", "env.num_npcs=2", "env.lidar_rays=16",
    ])
    assert cfg.pallas_mha_block  # preset default: packed param tree
    params = dqn_lib.init_params(cfg, key)
    pol = jax.export.deserialize(export_lib.export_policy(cfg, params)).call

    pcfg = export_lib._portable(cfg)
    for b, seed in ((2, 7), (5, 123)):
        es = driving.reset_batch(cfg.env, jax.random.fold_in(key, b), b)
        img, pts, mask = driving.observe_batch(cfg.env, es)
        a = pol(img, pts, mask, jnp.int32(seed))
        q = QNetwork(pcfg).apply({"params": params}, img, pts, mask,
                                 jax.random.key(jnp.int32(seed)))
        np.testing.assert_array_equal(np.asarray(a),
                                      np.argmax(np.asarray(q), axis=-1))


@pytest.mark.slow
def test_cli_export_use_ema_exports_the_ema_tree(key, tmp_path):
    """`export --use-ema` must serialize the Polyak-averaged deployment
    policy (DQNState.ema_params), not the online params: the artifact's
    actions match the EMA tree's greedy argmax bit-exactly."""
    from multimodal_sc_tpu.cli import main
    from multimodal_sc_tpu.envs import driving
    from multimodal_sc_tpu.io.checkpoint import CheckpointManager
    from multimodal_sc_tpu.rl import dqn as dqn_lib
    from multimodal_sc_tpu.rl.perception import QNetwork

    tiny = [
        "camera.features=8,16,16,16", "camera.c_sym=2",
        "camera.image_hw=16,16", "env.image_hw=16,16",
        "lidar.pillar_dim=16", "lidar.c_sym=2", "lidar.bev_hw=8,8",
        "fusion.dim=32", "fusion.depth=1", "fusion.heads=2",
        "fusion.state_dim=32", "env.num_npcs=2", "env.lidar_rays=16",
        "rl.replay_capacity=64", "rl.batch_size=4", "rl.ema_tau=0.25",
    ]
    ckpt = tmp_path / "ckpt"
    cfg = get_preset("c4").override_str(
        tiny + [f"train.checkpoint_dir={ckpt}"])
    state = dqn_lib.init(cfg, key, num_envs=4)
    it = dqn_lib.make_iteration(cfg)
    for _ in range(4):
        state, _ = it(state)
    assert int(state.step) >= 1  # the EMA has genuinely moved off init
    mgr = CheckpointManager(str(ckpt))
    mgr.save(4, jax.device_get(state), wait=True)
    mgr.close()

    out = tmp_path / "artifact"
    rc = main(["export", "--config", "c4", "--use-ema", "--out", str(out)]
              + [a for o in tiny + [f"train.checkpoint_dir={ckpt}"]
                 for a in ("--set", o)])
    assert rc == 0
    pol = export_lib.load_artifact(str(out))["policy"]

    pcfg = export_lib._portable(cfg)
    es = driving.reset_batch(cfg.env, key, 3)
    img, pts, mask = driving.observe_batch(cfg.env, es)
    a = pol(img, pts, mask, jnp.int32(11))
    q_ema = QNetwork(pcfg).apply({"params": state.ema_params},
                                 img, pts, mask, jax.random.key(11))
    np.testing.assert_array_equal(np.asarray(a),
                                  np.argmax(np.asarray(q_ema), axis=-1))


@pytest.mark.slow
def test_cli_export_verb(tmp_path):
    """`export --config c1` writes a loadable artifact directory (untrained
    params + a loud warning when no checkpoint dir is set)."""
    from multimodal_sc_tpu.cli import main

    out = tmp_path / "artifact"
    rc = main(["export", "--config", "c1",
               "--set", "camera.features=8,16,16,16",
               "--set", "camera.c_sym=2",
               "--set", "camera.image_hw=16,16",
               "--out", str(out)])
    assert rc == 0
    fns = export_lib.load_artifact(str(out))
    assert "encoder" in fns and "decoder" in fns
    img = jnp.zeros((2, 16, 16, 3), jnp.float32)
    snr = jnp.full((2,), 10.0)
    rec = fns["decoder"](fns["encoder"](img, snr), snr)
    assert rec.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(rec)).all()
