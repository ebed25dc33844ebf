"""JSCC-pretrain -> RL warm-start mapping (SURVEY.md §7 hard-part 4).

The perception trunk's submodule param trees mirror the codec modules by
construction (rl/perception.py); these tests pin that contract: a c1-style
CameraJSCC checkpoint fills ``perception.cam_enc`` and a c3-style
LateFusionJSCC checkpoint additionally fills the five LiDAR trunk modules,
all shape-checked.
"""

import jax
import numpy as np
import pytest

import multimodal_sc_tpu as msc
from multimodal_sc_tpu.io.checkpoint import CheckpointManager
from multimodal_sc_tpu.rl import dqn as dqn_lib
from multimodal_sc_tpu.rl.warmstart import load_jscc_into_perception

CAM = [
    "camera.features=8,16,16,16", "camera.c_sym=2", "camera.image_hw=16,16",
]
TINY = CAM + [
    "env.image_hw=16,16", "lidar.pillar_dim=16", "lidar.c_sym=2",
    "lidar.bev_hw=8,8", "fusion.dim=32", "fusion.depth=1", "fusion.heads=2",
    "fusion.state_dim=32", "env.num_npcs=2", "env.lidar_rays=16",
    "rl.replay_capacity=32", "rl.batch_size=8",
]


def _save(tmp_path, state, name):
    mgr = CheckpointManager(str(tmp_path / name))
    mgr.save(1, state, wait=True)
    mgr.close()
    return str(tmp_path / name)


def test_camera_jscc_warmstarts_cam_enc(tmp_path, key):
    from multimodal_sc_tpu.train import jscc

    c1 = msc.get_preset("c1").override_str(CAM)
    src_state = jscc.create_train_state(c1, key)
    ckpt = _save(tmp_path, src_state, "c1")

    c4 = msc.get_preset("c4").override_str(TINY)
    dqn_state = dqn_lib.init(c4, jax.random.key(1), num_envs=2)
    loaded = load_jscc_into_perception(c4, dqn_state.params, ckpt)

    src = src_state.params["encoder"]
    dst = loaded["perception"]["cam_enc"]
    for a, b in zip(jax.tree_util.tree_leaves(src),
                    jax.tree_util.tree_leaves(dst)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # Non-codec modules untouched (fusion stays at its RL init).
    for a, b in zip(
            jax.tree_util.tree_leaves(dqn_state.params["perception"]["fusion"]),
            jax.tree_util.tree_leaves(loaded["perception"]["fusion"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fusion_jscc_warmstarts_lidar_trunk(tmp_path, key):
    from multimodal_sc_tpu.train import fusion_jscc

    c3 = msc.get_preset("c3").override_str(
        CAM + ["camera.arch=cnn", "lidar.pillar_dim=16", "lidar.c_sym=2",
               "lidar.bev_hw=8,8"])
    src_state = fusion_jscc.create_train_state(c3, key)
    ckpt = _save(tmp_path, src_state, "c3")

    c4 = msc.get_preset("c4").override_str(TINY)
    dqn_state = dqn_lib.init(c4, jax.random.key(1), num_envs=2)
    loaded = load_jscc_into_perception(c4, dqn_state.params, ckpt)

    pairs = [("pfn", "pfn"), ("backbone", "lid_backbone"),
             ("sym_head", "lid_sym_head"), ("sym_embed", "lid_sym_embed"),
             ("dec_backbone", "lid_dec"), ("encoder", "cam_enc")]
    for src_name, dst_name in pairs:
        src = (src_state.params["lidar"][src_name]
               if src_name != "encoder"
               else src_state.params["camera"]["encoder"])
        dst = loaded["perception"][dst_name]
        for a, b in zip(jax.tree_util.tree_leaves(src),
                        jax.tree_util.tree_leaves(dst)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       err_msg=f"{src_name}->{dst_name}")


def test_shape_mismatch_raises_not_corrupts(tmp_path, key):
    from multimodal_sc_tpu.train import jscc

    # c1 with a DIFFERENT c_sym: encoder shapes can't map into the trunk.
    c1 = msc.get_preset("c1").override_str(
        ["camera.features=8,16,16,16", "camera.c_sym=4",
         "camera.image_hw=16,16"])
    ckpt = _save(tmp_path, jscc.create_train_state(c1, key), "bad")

    c4 = msc.get_preset("c4").override_str(TINY)
    dqn_state = dqn_lib.init(c4, jax.random.key(1), num_envs=2)
    with pytest.raises(ValueError, match="mapped nothing"):
        load_jscc_into_perception(c4, dqn_state.params, ckpt)


def test_analog_to_analog_warmstart_warns_nothing(tmp_path, key):
    """ADVICE r4 (low): the digital-trunk assignment rows are gated on the
    TARGET tree, so an analog c3 -> analog c4 warm-start must not emit a
    misleading "skipped ['lid_to_code', ...]" warning for modules that
    exist in neither source nor target."""
    import warnings

    from multimodal_sc_tpu.train import fusion_jscc

    c3 = msc.get_preset("c3").override_str(
        CAM + ["camera.arch=cnn", "lidar.pillar_dim=16", "lidar.c_sym=2",
               "lidar.bev_hw=8,8"])
    ckpt = _save(tmp_path, fusion_jscc.create_train_state(c3, key), "c3ok")

    c4 = msc.get_preset("c4").override_str(TINY)
    dqn_state = dqn_lib.init(c4, jax.random.key(1), num_envs=2)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        loaded, names = load_jscc_into_perception(
            c4, dqn_state.params, ckpt, return_loaded=True)
    skips = [str(x.message) for x in w if "skipped" in str(x.message)]
    assert skips == [], f"spurious skip warning: {skips}"
    assert "lid_sym_head" in names and "lid_to_code" not in names


def test_analog_source_into_vq_trunk_reports_missing_codebook(tmp_path, key):
    """ADVICE r4 (low): warm-starting a digital (lidar.arch=vq) trunk from
    an ANALOG c3 checkpoint maps the shared pillar trunk but NOT the
    codebook — return_loaded exposes that so the drivers re-seed it
    (train/dqn.py / train/ppo.py), and seed_vq_codebook_params with
    seed_lidar=True then replaces the collapsed default init."""
    from multimodal_sc_tpu.rl.warmstart import seed_vq_codebook_params
    from multimodal_sc_tpu.train import fusion_jscc

    c3 = msc.get_preset("c3").override_str(
        CAM + ["camera.arch=cnn", "lidar.pillar_dim=16", "lidar.c_sym=2",
               "lidar.bev_hw=8,8"])
    ckpt = _save(tmp_path, fusion_jscc.create_train_state(c3, key), "c3a")

    c4 = msc.get_preset("c4").override_str(
        TINY + ["lidar.arch=vq", "lidar.vq_dim=8", "lidar.vq_codes=16"])
    dqn_state = dqn_lib.init(c4, jax.random.key(1), num_envs=2)
    warm, names = load_jscc_into_perception(
        c4, dqn_state.params, ckpt, return_loaded=True)
    assert "pfn" in names and "lid_backbone" in names
    assert "lid_codebook" not in names

    before = np.asarray(warm["perception"]["lid_codebook"])
    seeded = seed_vq_codebook_params(c4, warm, seed_camera=False,
                                     seed_lidar=True)
    after = np.asarray(seeded["perception"]["lid_codebook"])
    assert after.shape == before.shape
    # Data-dependent seeding spreads the rows far beyond the tight
    # default-init cluster (the collapse signature).
    assert np.std(after) > np.std(before)
    # Camera (analog) untouched.
    for a, b in zip(
            jax.tree_util.tree_leaves(seeded["perception"]["cam_enc"]),
            jax.tree_util.tree_leaves(warm["perception"]["cam_enc"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
