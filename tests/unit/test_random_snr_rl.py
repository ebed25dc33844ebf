"""Randomized-SNR RL training + channel-aware policy conditioning (r3).

`channel.random_snr` draws a per-env deployed SNR each act (and per batch
in the DQN learner / per transition reused in the PPO loss), so policies
train robust across the SNR range instead of overfitting the config
constant; `camera.snr_conditioning` additionally FiLMs the camera branch
on the current SNR (the receiver knows its own link quality).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import multimodal_sc_tpu as msc
from multimodal_sc_tpu.rl import dqn as dqn_lib
from multimodal_sc_tpu.rl import ppo as ppo_lib

TINY = [
    "camera.features=8,16,16,16", "camera.c_sym=2",
    "camera.image_hw=16,16", "env.image_hw=16,16",
    "lidar.pillar_dim=16", "lidar.c_sym=2", "lidar.bev_hw=8,8",
    "fusion.dim=32", "fusion.depth=1", "fusion.heads=2",
    "fusion.state_dim=32", "env.num_npcs=2", "env.lidar_rays=16",
    "rl.num_envs=4", "rl.batch_size=8", "rl.replay_capacity=64",
]

ROBUST = ["channel.random_snr=true", "camera.snr_conditioning=true"]


def test_snr_conditioning_adds_film_params(key):
    cfg = msc.get_preset("c4").override_str(TINY + ROBUST)
    params = dqn_lib.init_params(cfg, key)
    paths = {jax.tree_util.keystr(p)
             for p, _ in jax.tree_util.tree_leaves_with_path(params)}
    assert any("snr_film" in p for p in paths)
    # Default (unconditioned) tree is unchanged — no film modules.
    base = dqn_lib.init_params(msc.get_preset("c4").override_str(TINY), key)
    base_paths = {jax.tree_util.keystr(p)
                  for p, _ in jax.tree_util.tree_leaves_with_path(base)}
    assert not any("snr_film" in p for p in base_paths)


def test_dqn_sample_snr_range_and_flag(key):
    cfg = msc.get_preset("c4").override_str(TINY + ROBUST)
    snr = dqn_lib._sample_snr(cfg, key, 4096)
    assert snr.shape == (4096,)
    lo, hi = cfg.channel.snr_min_db, cfg.channel.snr_max_db
    assert float(snr.min()) >= lo and float(snr.max()) <= hi
    # Spread covers the range, not a constant.
    assert float(snr.std()) > (hi - lo) / 6
    assert dqn_lib._sample_snr(
        msc.get_preset("c4").override_str(TINY), key, 4) is None


@pytest.mark.slow
def test_dqn_iteration_under_random_snr(key):
    cfg = msc.get_preset("c4").override_str(TINY + ROBUST)
    state = dqn_lib.init(cfg, key, 4)
    it = dqn_lib.make_iteration(cfg)
    for _ in range(4):
        state, m = it(state)
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_ppo_update_under_random_snr(key):
    cfg = msc.get_preset("c5").override_str(TINY + ROBUST + [
        "rl.rollout_length=8", "rl.num_minibatches=2"])
    state = ppo_lib.init(cfg, key)
    step = ppo_lib.make_train_step(cfg)
    state, m = step(state)
    assert all(np.isfinite(float(v)) for v in m.values())


def test_default_config_stream_unchanged(key):
    """With random_snr off the iteration's numerics are bit-identical to
    pre-change behavior: the SNR draw is gated statically and folded off
    an existing key, so the 4-way split stream is untouched. Gate: two
    fresh builds of the default iteration agree bit-exactly (trivially),
    AND the default trunk ignores an explicit constant-snr vector equal
    to the config value (same graph inputs -> same actions)."""
    cfg = msc.get_preset("c4").override_str(TINY)
    state = dqn_lib.init(cfg, key, 4)
    img = dqn_lib.dequantize_image(state.obs_image)
    k = jax.random.key(3)
    a1 = dqn_lib.act(cfg, state.params, img, state.obs_points,
                     state.obs_mask, k, 0.0)
    snr_const = jnp.full((4,), cfg.channel.snr_db, jnp.float32)
    a2 = dqn_lib.act(cfg, state.params, img, state.obs_points,
                     state.obs_mask, k, 0.0, snr_db=snr_const)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


@pytest.mark.slow
def test_sharded_matches_unsharded_under_random_snr(key):
    """The 1-shard SPMD twin stays bit-equivalent with random_snr on
    (both sides fold the same constant off k_act — rl/dqn_sharded.py)."""
    from multimodal_sc_tpu.rl import dqn_sharded
    from multimodal_sc_tpu.runtime.mesh import make_mesh

    cfg = msc.get_preset("c4").override_str(TINY + ROBUST + [
        "rl.replay_capacity=32", "rl.target_update_period=4"])
    mesh1 = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    base = dqn_lib.init(cfg, key, num_envs=4)
    cp = jax.tree_util.tree_map(jnp.copy, base)
    sharded = dqn_sharded.ShardedDQNState(
        params=cp.params, target_params=cp.target_params,
        ema_params=cp.ema_params,
        opt_state=cp.opt_state, env_states=cp.env_states,
        buffer_data=jax.tree_util.tree_map(lambda x: x[None], cp.buffer.data),
        buffer_cursor=cp.buffer.cursor[None], buffer_size=cp.buffer.size[None],
        window=jax.tree_util.tree_map(lambda x: x[None], cp.window),
        keys=cp.key[None], step=cp.step, ep_return=cp.ep_return,
        last_return=cp.last_return, obs_image=cp.obs_image,
        obs_points=cp.obs_points, obs_mask=cp.obs_mask)
    it_plain = dqn_lib.make_iteration(cfg)
    it_shard = dqn_sharded.make_iteration(cfg, mesh1)
    state_p, state_s = base, sharded
    for i in range(5):
        state_p, m_p = it_plain(state_p)
        state_s, m_s = it_shard(state_s)
        for k_ in ("loss", "reward", "episode_return"):
            np.testing.assert_allclose(
                np.asarray(m_p[k_]), np.asarray(m_s[k_]), rtol=1e-6,
                err_msg=f"iter {i} metric {k_}")
    for a, b in zip(jax.tree_util.tree_leaves(state_p.params),
                    jax.tree_util.tree_leaves(state_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
