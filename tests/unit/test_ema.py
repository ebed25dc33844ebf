"""Deployment-EMA of the online params (rl.ema_tau): the tracked tree is
exactly the Polyak recursion over the param trajectory — per learn step
for DQN, per update for PPO."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from multimodal_sc_tpu.config.presets import get_preset

TINY = [
    "camera.features=8,16,16,16", "camera.c_sym=2",
    "camera.image_hw=16,16", "env.image_hw=16,16",
    "lidar.pillar_dim=16", "lidar.c_sym=2", "lidar.bev_hw=8,8",
    "fusion.dim=32", "fusion.depth=1", "fusion.heads=2",
    "fusion.state_dim=32",
    "env.num_npcs=2", "env.lidar_rays=16",
    "rl.replay_capacity=64", "rl.batch_size=4",
]


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


@pytest.mark.slow
def test_ema_matches_manual_recursion(key):
    from multimodal_sc_tpu.rl import dqn as dqn_lib

    tau = 0.25
    cfg = get_preset("c4").override_str(TINY + [f"rl.ema_tau={tau}"])
    state = dqn_lib.init(cfg, key, num_envs=4)
    it = dqn_lib.make_iteration(cfg)

    # Manual recursion on host: ema starts at the init params and folds in
    # the post-update online params after every LEARN step (batch_size=4 =
    # num_envs, so learning starts at the first iteration).
    ema = _leaves(state.params)
    for i in range(5):
        state, m = it(state)
        if float(m["loss"]) != 0.0 or int(state.step) > 0:
            p = _leaves(state.params)
            ema = [(1.0 - tau) * e + tau * x for e, x in zip(ema, p)]
    assert int(state.step) >= 3, "learner never ran; test is vacuous"
    for e_ref, e_got in zip(ema, _leaves(state.ema_params)):
        np.testing.assert_allclose(e_got, e_ref, rtol=1e-6, atol=1e-7)
    # And the EMA genuinely differs from both endpoints.
    assert any(np.max(np.abs(a - b)) > 0 for a, b in
               zip(_leaves(state.params), _leaves(state.ema_params)))


@pytest.mark.slow
def test_ema_frozen_when_tau_zero(key):
    from multimodal_sc_tpu.rl import dqn as dqn_lib

    cfg = get_preset("c4").override_str(TINY + ["rl.ema_tau=0.0"])
    state = dqn_lib.init(cfg, key, num_envs=4)
    init_ema = _leaves(state.ema_params)
    it = dqn_lib.make_iteration(cfg)
    for _ in range(3):
        state, _ = it(state)
    assert int(state.step) >= 1
    for a, b in zip(init_ema, _leaves(state.ema_params)):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_ema_in_chunked_dispatch_matches_singles(key):
    """chunk>1 scans the same body: the EMA after one 4-chunk dispatch
    equals four single dispatches bit-exactly."""
    from multimodal_sc_tpu.rl import dqn as dqn_lib

    cfg = get_preset("c4").override_str(TINY + ["rl.ema_tau=0.125"])
    s1 = dqn_lib.init(cfg, key, num_envs=4)
    s2 = jax.tree_util.tree_map(jnp.copy, s1)
    it1 = dqn_lib.make_iteration(cfg, chunk=1)
    it4 = dqn_lib.make_iteration(cfg, chunk=4)
    for _ in range(4):
        s1, _ = it1(s1)
    s2, _ = it4(s2)
    for a, b in zip(_leaves(s1.ema_params), _leaves(s2.ema_params)):
        np.testing.assert_array_equal(a, b)


TINY_PPO = TINY + [
    "rl.num_envs=4", "rl.rollout_length=4",
    "rl.num_minibatches=2", "rl.ppo_epochs=1",
]


@pytest.mark.slow
def test_ppo_ema_matches_manual_recursion(key):
    """PPO lerps the EMA once per UPDATE with the post-epochs params."""
    from multimodal_sc_tpu.rl import ppo as ppo_lib

    tau = 0.25
    cfg = get_preset("c5").override_str(TINY_PPO + [f"rl.ema_tau={tau}"])
    state = ppo_lib.init(cfg, key)
    step = ppo_lib.make_train_step(cfg)
    ema = _leaves(state.params)
    for _ in range(3):
        state, _ = step(state)
        p = _leaves(state.params)
        ema = [(1.0 - tau) * e + tau * x for e, x in zip(ema, p)]
    for e_ref, e_got in zip(ema, _leaves(state.ema_params)):
        np.testing.assert_allclose(e_got, e_ref, rtol=1e-6, atol=1e-7)
    assert any(np.max(np.abs(a - b)) > 0 for a, b in
               zip(_leaves(state.params), _leaves(state.ema_params)))


@pytest.mark.slow
def test_ppo_ema_frozen_when_tau_zero(key):
    from multimodal_sc_tpu.rl import ppo as ppo_lib

    cfg = get_preset("c5").override_str(TINY_PPO + ["rl.ema_tau=0.0"])
    state = ppo_lib.init(cfg, key)
    init_ema = _leaves(state.ema_params)
    step = ppo_lib.make_train_step(cfg)
    for _ in range(2):
        state, _ = step(state)
    for a, b in zip(init_ema, _leaves(state.ema_params)):
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_ppo_ema_in_chunked_dispatch_matches_singles(key):
    """Unlike the DQN case above, jit(body) and jit(scan(body)) are two
    DIFFERENT compiled graphs for the PPO update and XLA reassociates the
    minibatch reductions differently, so accumulated params (and hence the
    EMA of them) agree only to float noise, not bit-exactly or to any fixed
    tolerance (CLAUDE.md: chunk-vs-singles gates on metrics; param
    comparisons across graphs are ungateable). The EMA is a CONVEX
    combination of the param trajectory, so its cross-graph divergence is
    bounded by the params' own divergence — gate it there: a cadence bug
    (lerping once per chunk instead of once per update) would move the EMA
    by ~tau * (params - init), orders of magnitude above the float noise."""
    from multimodal_sc_tpu.rl import ppo as ppo_lib

    cfg = get_preset("c5").override_str(TINY_PPO + ["rl.ema_tau=0.125"])
    s1 = ppo_lib.init(cfg, key)
    s2 = jax.tree_util.tree_map(jnp.copy, s1)
    step1 = ppo_lib.make_train_step(cfg)
    step3 = ppo_lib.make_train_step_chunked(cfg, 3)
    for _ in range(3):
        s1, _ = step1(s1)
    s2, _ = step3(s2)
    param_noise = max(
        float(np.max(np.abs(a - b)))
        for a, b in zip(_leaves(s1.params), _leaves(s2.params)))
    bound = max(4.0 * param_noise, 1e-6)
    ema_div = max(
        float(np.max(np.abs(a - b)))
        for a, b in zip(_leaves(s1.ema_params), _leaves(s2.ema_params)))
    assert ema_div <= bound, (ema_div, param_noise)
    # And the chunked EMA genuinely moved off init (tau was applied).
    init_ema = _leaves(ppo_lib.init(cfg, key).ema_params)
    moved = max(float(np.max(np.abs(a - b)))
                for a, b in zip(_leaves(s2.ema_params), init_ema))
    assert moved > bound, (moved, bound)
