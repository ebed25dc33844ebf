"""DQN / PPO smoke tests: tiny configs, a few iterations, finite metrics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sc_tpu.config.presets import get_preset


def _tiny(preset):
    return get_preset(preset).override_str([
        "camera.features=8,16,16,16",
        "camera.c_sym=2",
        "lidar.pillar_dim=16",
        "lidar.c_sym=2",
        "lidar.bev_hw=8,8",
        "fusion.dim=32",
        "fusion.depth=1",
        "fusion.heads=2",
        "fusion.state_dim=32",
        "env.num_npcs=2",
        "env.lidar_rays=32",
        "env.image_hw=16,16",
        "camera.image_hw=16,16",
        "rl.replay_capacity=256",
        "rl.batch_size=16",
        "rl.rollout_length=8",
        "rl.num_envs=4",
        "rl.num_minibatches=2",
        "rl.ppo_epochs=2",
    ])


@pytest.mark.slow
def test_dqn_iteration_runs_and_learns_shape(key):
    from multimodal_sc_tpu.rl import dqn as dqn_lib

    cfg = _tiny("c4")
    state = dqn_lib.init(cfg, key, num_envs=4)
    it = dqn_lib.make_iteration(cfg)
    for _ in range(20):
        state, metrics = it(state)
    m = jax.device_get(metrics)
    assert np.isfinite(m["loss"])
    # The n-step window swallows the first n-1 iterations (rl/nstep.py).
    assert m["buffer_size"] == (20 - (cfg.rl.n_step - 1)) * 4
    # After warmup (16 samples), gradient steps happened.
    assert int(jax.device_get(state.step)) > 0


@pytest.mark.slow
def test_ppo_train_step_runs(key):
    from multimodal_sc_tpu.rl import ppo as ppo_lib

    cfg = _tiny("c5")
    state = ppo_lib.init(cfg, key)
    step = ppo_lib.make_train_step(cfg)
    for _ in range(2):
        state, metrics = step(state)
    m = jax.device_get(metrics)
    for k in ("loss", "pg_loss", "v_loss", "entropy", "reward"):
        assert np.isfinite(m[k]), k
    assert int(jax.device_get(state.update)) == 2


@pytest.mark.slow
def test_dqn_act_epsilon_extremes(key):
    from multimodal_sc_tpu.rl import dqn as dqn_lib

    cfg = _tiny("c4")
    state = dqn_lib.init(cfg, key, num_envs=4)
    from multimodal_sc_tpu.envs import driving

    img, pts, mask = driving.observe_batch(cfg.env, state.env_states)
    a1 = dqn_lib.act(cfg, state.params, img, pts, mask, key,
                     epsilon=jnp.float32(0.0))
    a2 = dqn_lib.act(cfg, state.params, img, pts, mask, key,
                     epsilon=jnp.float32(0.0))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert np.asarray(a1).min() >= 0 and np.asarray(a1).max() < 9


@pytest.mark.slow
def test_dqn_soft_target_update(key):
    """rl.target_tau > 0 Polyak-averages the target every learn step;
    tau=0 keeps the hard periodic copy (target frozen until the period)."""
    from multimodal_sc_tpu.rl import dqn as dqn_lib

    def run(extra):
        cfg = _tiny("c4").override_str(
            ["rl.batch_size=8", "rl.eps_decay_steps=100", *extra])
        state = dqn_lib.init(cfg, key, num_envs=4)
        init_target = jax.tree_util.tree_map(jnp.copy, state.target_params)
        it = dqn_lib.make_iteration(cfg)
        for _ in range(4):  # buffer warm (>=8) after 2 iters; >=2 learn steps
            state, m = it(state)
        assert float(m["loss"]) != 0.0, "learner never engaged"
        return init_target, state

    # tau=1: the target IS the online params after any learn step.
    init_t, s = run(["rl.target_tau=1.0"])
    jax.tree_util.tree_map(
        lambda t, p: np.testing.assert_array_equal(np.asarray(t),
                                                   np.asarray(p)),
        s.target_params, s.params)

    # tau=0 (default), long period: target still at its initial copy.
    init_t, s = run(["rl.target_update_period=1000"])
    jax.tree_util.tree_map(
        lambda t, t0: np.testing.assert_array_equal(np.asarray(t),
                                                    np.asarray(t0)),
        s.target_params, init_t)

    # 0 < tau < 1: target strictly between its init and the online params.
    init_t, s = run(["rl.target_tau=0.5"])
    moved = jax.tree_util.tree_map(
        lambda t, t0: float(np.max(np.abs(np.asarray(t) - np.asarray(t0)))),
        s.target_params, init_t)
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0
    not_equal = jax.tree_util.tree_map(
        lambda t, p: float(np.max(np.abs(np.asarray(t) - np.asarray(p)))),
        s.target_params, s.params)
    assert max(jax.tree_util.tree_leaves(not_equal)) > 0.0


@pytest.mark.slow
def test_ppo_rollout_quantize_runs_and_stays_close(key):
    """rl.rollout_quantize stores rollout frames as uint8; the update must
    run to finite metrics, and one update from identical init must land
    within quantization-noise distance of the f32-store update (the loss
    consumes dequantized frames whose worst-case error is 1/510/pixel —
    same magnitude class as the accepted per-minibatch channel-noise
    resampling, rl/ppo.py)."""
    from multimodal_sc_tpu.rl import ppo as ppo_lib

    cfg_f32 = _tiny("c5")
    cfg_q = cfg_f32.override_str(["rl.rollout_quantize=true"])

    outs = {}
    for name, cfg in (("f32", cfg_f32), ("q", cfg_q)):
        state = ppo_lib.init(cfg, key)
        step = ppo_lib.make_train_step(cfg)
        state, metrics = step(state)
        m = jax.device_get(metrics)
        for k in ("loss", "pg_loss", "v_loss", "entropy", "reward"):
            assert np.isfinite(m[k]), (name, k)
        outs[name] = (m, jax.device_get(state.params))

    # Same env stream (rewards identical: acting uses the f32 render in
    # both modes); only the stored frames differ by <=1/510.
    assert outs["f32"][0]["reward"] == outs["q"][0]["reward"]
    # Updated params stay close: quantization perturbs the loss inputs,
    # not the trajectory, so one Adam step differs by o(lr).
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - b))),
        outs["f32"][1], outs["q"][1])
    assert max(jax.tree_util.tree_leaves(diffs)) < 5e-3
