"""SPMD DQN under shard_map on the 8-virtual-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import multimodal_sc_tpu as msc
from multimodal_sc_tpu.rl import dqn_sharded
from multimodal_sc_tpu.runtime.mesh import make_mesh


def _tiny():
    return msc.get_preset("c4").override_str([
        "camera.features=8,16,16,16", "camera.c_sym=2",
        "camera.image_hw=16,16", "env.image_hw=16,16",
        "lidar.pillar_dim=16", "lidar.c_sym=2", "lidar.bev_hw=8,8",
        "fusion.dim=32", "fusion.depth=1", "fusion.heads=2",
        "fusion.state_dim=32",
        "env.num_npcs=2", "env.lidar_rays=16",
        "rl.replay_capacity=32", "rl.batch_size=8",
        "rl.target_update_period=4",
    ])


@pytest.mark.slow
def test_sharded_dqn_runs_and_learns(mesh8, key):
    cfg = _tiny()
    state = dqn_sharded.init(cfg, key, mesh8, envs_per_shard=2)
    it = dqn_sharded.make_iteration(cfg, mesh8)
    for i in range(6):
        state, metrics = it(state)
    m = jax.device_get(metrics)
    assert np.isfinite(m["loss"])
    # Per-shard buffers: 6 iterations minus the n-step window fill
    # (rl/nstep.py), 2 transitions per add.
    expect = (6 - (cfg.rl.n_step - 1)) * 2
    np.testing.assert_array_equal(np.asarray(state.buffer_size),
                                  np.full(8, expect))
    # Gradient steps happened once every shard warmed up (8 >= 8).
    assert int(jax.device_get(state.step)) >= 1
    # Params stay replicated-identical (one logical copy).
    p = jax.tree_util.tree_leaves(state.params)[0]
    assert "data" not in str(p.sharding.spec)


@pytest.mark.slow
def test_sharded_matches_unsharded_on_one_shard(key):
    """A 1-shard SPMD iteration is bit-equivalent to the plain iteration on
    identical streams (same init arrays, same PRNG key) — VERDICT r1 item 2.
    pmean over one device is the identity, and both iterations split/use
    keys in the same order by construction (rl/dqn.py)."""
    from multimodal_sc_tpu.rl import dqn as dqn_lib

    cfg = _tiny()
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
    for i in range(6):
        state_p, m_p = it_plain(state_p)
        state_s, m_s = it_shard(state_s)
        for k in ("loss", "epsilon", "reward", "episode_return",
                  "buffer_size"):
            np.testing.assert_allclose(
                np.asarray(m_p[k]), np.asarray(m_s[k]), rtol=1e-6,
                err_msg=f"iter {i} metric {k}")
    for a, b in zip(jax.tree_util.tree_leaves(state_p.params),
                    jax.tree_util.tree_leaves(state_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_train_driver_uses_sharded_path_on_mesh(tmp_path):
    """train/dqn.run routes through rl/dqn_sharded on a >1-shard mesh."""
    from multimodal_sc_tpu.train import dqn as dqn_train

    cfg = _tiny().override_str([
        "train.steps=3", "train.log_every=10", "rl.num_envs=8",
    ])
    state, last = dqn_train.run(cfg, metrics_path=str(tmp_path / "m.jsonl"))
    assert isinstance(state, dqn_sharded.ShardedDQNState)
    assert state.keys.shape[0] == 8          # one PRNG stream per shard
    assert np.isfinite(last["loss"])


@pytest.mark.slow
def test_sharded_buffers_are_independent(mesh8, key):
    """Different shards collect different transitions (per-shard envs)."""
    cfg = _tiny()
    state = dqn_sharded.init(cfg, key, mesh8, envs_per_shard=2)
    it = dqn_sharded.make_iteration(cfg, mesh8)
    state, _ = it(state)
    rewards = np.asarray(state.buffer_data.reward)[:, 0]  # first slot/shard
    assert len(np.unique(np.round(rewards, 6))) > 1
