"""Chunked JSCC dispatch (train/jscc.py make_train_step_chunked): a scan
of K steps per dispatch must replay the EXACT per-step stream — same
fold_in(root_key, global_step) keys, same batches — as K single
dispatches. Mirrors the DQN chunk-equivalence gate (test_obs_carry.py):
state equality at float-noise scale, metric trajectory at rtol 1e-6."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sc_tpu.config.presets import get_preset
from multimodal_sc_tpu.train import jscc


def _run_pair(cfg, key, steps, chunk):
    state_c = jscc.create_train_state(cfg, key)
    state_s = jax.tree_util.tree_map(jnp.copy, state_c)
    model = jscc.build_model(cfg)
    single = jscc.make_train_step(cfg, model)
    chunked = jscc.make_train_step_chunked(cfg, model, chunk)

    root_key = jax.random.fold_in(jax.random.key(cfg.train.seed), 0x5EED)
    with_seg = cfg.camera.seg_classes > 0 and cfg.camera.arch == "cnn"
    kb = jax.random.fold_in(key, 0xDA7A)
    imgs = jax.random.uniform(kb, (steps, cfg.train.batch_size,
                                   *cfg.camera.image_hw, 3))
    segs = (jax.random.randint(jax.random.fold_in(kb, 1),
                               (steps, cfg.train.batch_size,
                                *cfg.camera.image_hw), 0,
                               cfg.camera.seg_classes)
            if with_seg else None)

    singles = []
    for i in range(steps):
        state_s, m = single(state_s, imgs[i],
                            segs[i] if with_seg else None,
                            jax.random.fold_in(root_key, i))
        singles.append(m)

    stacked_all = []
    for c0 in range(0, steps, chunk):
        state_c, stacked = chunked(
            state_c, imgs[c0:c0 + chunk],
            segs[c0:c0 + chunk] if with_seg else None,
            root_key, jnp.int32(c0))
        stacked_all.append(stacked)

    return state_s, state_c, singles, stacked_all


def test_chunked_matches_singles(key):
    cfg = get_preset("c1").override_str([
        "camera.features=8,16,16,16", "camera.c_sym=2",
        "camera.image_hw=16,16", "train.batch_size=8", "train.steps=8",
    ])
    state_s, state_c, singles, stacked_all = _run_pair(cfg, key, 8, 4)

    flat = [m for st in stacked_all
            for m in ({k: v[j] for k, v in st.items()}
                      for j in range(4))]
    # Per-step metric trajectories are the gate: accumulated-params
    # comparisons across two compiled graphs are ungateable (AdamW
    # sign-amplifies ~1-ULP fusion-reassociation noise — the same lesson
    # the DQN chunk test learned, tests/unit/test_obs_carry.py history).
    for i, (ms, mc) in enumerate(zip(singles, flat)):
        for k in ms:
            np.testing.assert_allclose(np.asarray(ms[k]), np.asarray(mc[k]),
                                       rtol=1e-6, atol=1e-7,
                                       err_msg=f"step {i} metric {k}")
    assert int(state_c.step) == int(state_s.step) == 8


@pytest.mark.slow
def test_fusion_chunked_matches_singles(key):
    """c3 late-fusion: the chunked scan regenerates point clouds in-graph
    from the same fold_in(data_key, global_step) stream the host loop
    draws, so chunked == singles step-for-step."""
    from multimodal_sc_tpu.envs.datasets import synthetic_pointcloud_batch
    from multimodal_sc_tpu.train import fusion_jscc

    cfg = get_preset("c3").override_str([
        "camera.dim=32", "camera.depth=1", "camera.heads=2",
        "camera.c_sym=2", "camera.image_hw=16,16", "camera.patch=4",
        "lidar.pillar_dim=16", "lidar.c_sym=2", "lidar.bev_hw=8,8",
        "lidar.max_points=64", "lidar.max_pillars=32",
        "train.batch_size=4", "train.steps=4",
    ])
    state_c = fusion_jscc.create_train_state(cfg, key)
    state_s = jax.tree_util.tree_map(jnp.copy, state_c)
    single = fusion_jscc.make_train_step(cfg)
    chunked = fusion_jscc.make_train_step_chunked(cfg, 2)

    root_key = jax.random.fold_in(jax.random.key(cfg.train.seed), 0x5EED)
    data_key = jax.random.key(cfg.train.seed + 1)
    imgs = jax.random.uniform(
        jax.random.fold_in(key, 0xDA7A), (4, 4, 16, 16, 3))

    singles = []
    for i in range(4):
        pts, mask, cls = synthetic_pointcloud_batch(
            jax.random.fold_in(data_key, i), 4, cfg.lidar.max_points,
            cfg.lidar.x_range, cfg.lidar.y_range, with_classes=True)
        state_s, m = single(state_s, imgs[i], pts, mask, cls,
                            jax.random.fold_in(root_key, i))
        singles.append(m)

    for c0 in (0, 2):
        state_c, stacked = chunked(state_c, imgs[c0:c0 + 2], root_key,
                                   data_key, jnp.int32(c0))
        for j in range(2):
            for k in singles[c0 + j]:
                np.testing.assert_allclose(
                    np.asarray(singles[c0 + j][k]),
                    np.asarray(stacked[k][j]), rtol=1e-6, atol=1e-7,
                    err_msg=f"step {c0 + j} metric {k}")
    # Metric trajectories are the gate (see test_chunked_matches_singles);
    # the 4-step metric match above requires the same params at every
    # step boundary to float precision.


@pytest.mark.slow
def test_ppo_chunked_matches_singles(key):
    """PPO updates are self-contained (PRNG in state), so a chunked scan
    is identical by construction — pin the metric trajectory anyway."""
    from multimodal_sc_tpu.rl import ppo as ppo_lib

    cfg = get_preset("c5").override_str([
        "camera.features=8,16,16,16", "camera.c_sym=2",
        "camera.image_hw=16,16", "env.image_hw=16,16",
        "lidar.pillar_dim=16", "lidar.c_sym=2", "lidar.bev_hw=8,8",
        "fusion.dim=32", "fusion.depth=1", "fusion.heads=2",
        "fusion.state_dim=32", "env.num_npcs=2", "env.lidar_rays=16",
        "rl.num_envs=4", "rl.rollout_length=8", "rl.num_minibatches=2",
        "rl.ppo_epochs=1",
    ])
    s_single = ppo_lib.init(cfg, key)
    s_chunk = jax.tree_util.tree_map(jnp.copy, s_single)
    single = ppo_lib.make_train_step(cfg)
    chunked = ppo_lib.make_train_step_chunked(cfg, 2)

    singles = []
    for _ in range(2):
        s_single, m = single(s_single)
        singles.append(m)
    s_chunk, stacked = chunked(s_chunk)

    for j in range(2):
        for k in singles[j]:
            # atol 5e-7: the scan-body and standalone compilations may
            # fuse reductions differently (XLA reassociation, the same
            # ~1-ULP class CLAUDE.md documents for accumulated params);
            # pg_loss sits near zero at update 0, so rtol alone is too
            # tight. A REAL equivalence break (key-stream or batching
            # divergence) shows up at O(1), far above this.
            np.testing.assert_allclose(
                np.asarray(singles[j][k]), np.asarray(stacked[k][j]),
                rtol=1e-5, atol=5e-7, err_msg=f"update {j} metric {k}")
    assert int(s_chunk.update) == int(s_single.update) == 2


def test_chunked_matches_singles_seg_branch(key):
    """The c2-style seg-head loss (image MSE + seg CE) through the chunk."""
    cfg = get_preset("c2").override_str([
        "camera.features=8,16,16,16", "camera.c_sym=2",
        "camera.image_hw=16,16", "train.batch_size=8", "train.steps=4",
    ])
    state_s, state_c, singles, stacked_all = _run_pair(cfg, key, 4, 2)
    assert "miou" in singles[0]
    for i, st_idx in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        ci, j = st_idx
        for k in singles[i]:
            np.testing.assert_allclose(
                np.asarray(singles[i][k]),
                np.asarray(stacked_all[ci][k][j]), rtol=1e-6, atol=1e-7,
                err_msg=f"step {i} metric {k}")
