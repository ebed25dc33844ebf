"""Policy evaluator smoke tests (episode-reward parity gate surface)."""

import jax
import numpy as np
import pytest

import multimodal_sc_tpu as msc
from multimodal_sc_tpu.evaluation.policy_eval import evaluate_dqn, evaluate_ppo


def _tiny(preset):
    return msc.get_preset(preset).override_str([
        "camera.features=8,16,16,16", "camera.c_sym=2",
        "camera.image_hw=16,16", "env.image_hw=16,16",
        "lidar.pillar_dim=16", "lidar.c_sym=2", "lidar.bev_hw=8,8",
        "fusion.dim=32", "fusion.depth=1", "fusion.heads=2",
        "fusion.state_dim=32",
        "env.num_npcs=2", "env.lidar_rays=32", "env.max_steps=16",
    ])


@pytest.mark.slow
def test_evaluate_dqn_random_params(key):
    from multimodal_sc_tpu.rl import dqn as dqn_lib

    cfg = _tiny("c4")
    state = dqn_lib.init(cfg, key, num_envs=4)
    out = evaluate_dqn(cfg, state.params, key, num_envs=4)
    assert np.isfinite(out["episode_return_mean"])
    assert 0.0 <= out["episodes_terminated_frac"] <= 1.0


@pytest.mark.slow
def test_evaluate_dqn_epsilon_changes_behavior(key):
    """eval epsilon plumbs through: eps=1 (pure random) must produce a
    different action stream — and thus different returns — than argmax on
    the same params/seed, while eps=0 twice is deterministic."""
    from multimodal_sc_tpu.rl import dqn as dqn_lib

    cfg = _tiny("c4")
    state = dqn_lib.init(cfg, key, num_envs=4)
    g1 = evaluate_dqn(cfg, state.params, key, num_envs=4, epsilon=0.0)
    g2 = evaluate_dqn(cfg, state.params, key, num_envs=4, epsilon=0.0)
    r1 = evaluate_dqn(cfg, state.params, key, num_envs=4, epsilon=1.0)
    assert g1 == g2                                  # greedy deterministic
    assert np.isfinite(r1["episode_return_mean"])
    assert r1 != g1                                  # epsilon took effect


@pytest.mark.slow
def test_evaluate_ppo_greedy_deterministic(key):
    from multimodal_sc_tpu.rl import ppo as ppo_lib

    cfg = _tiny("c5")
    state = ppo_lib.init(cfg, key)
    o1 = evaluate_ppo(cfg, state.params, key, num_envs=4, greedy=True)
    o2 = evaluate_ppo(cfg, state.params, key, num_envs=4, greedy=True)
    # Channel noise keys differ per call? No: same eval key -> identical.
    assert o1["episode_return_mean"] == o2["episode_return_mean"]
