"""Best-snapshot selection (rl.eval_snapshot_every): the DQN driver
greedy-evals the online params in-training with a fixed key, keeps the
best tree, persists it under <checkpoint_dir>/best, and eval-policy
--use-best deploys it. Deployment antidote to TD snapshot oscillation
(results_r3/collapse_investigation.md)."""

import json

import jax
import numpy as np
import pytest

import multimodal_sc_tpu as msc
from multimodal_sc_tpu import cli
from multimodal_sc_tpu.evaluation import policy_eval
from multimodal_sc_tpu.io.checkpoint import CheckpointManager
from multimodal_sc_tpu.train import dqn as dqn_driver

TINY = [
    "camera.features=8,16,16,16", "camera.c_sym=2",
    "camera.image_hw=16,16", "env.image_hw=16,16",
    "lidar.pillar_dim=16", "lidar.c_sym=2", "lidar.bev_hw=8,8",
    "fusion.dim=32", "fusion.depth=1", "fusion.heads=2",
    "fusion.state_dim=32",
    "env.num_npcs=2", "env.lidar_rays=32", "env.max_steps=8",
    "rl.replay_capacity=64", "rl.batch_size=8", "rl.num_envs=8",
    "rl.eval_snapshot_every=2", "rl.eval_snapshot_envs=4",
    "train.log_every=1000",
]


def _cfg(tmp_path, steps, extra=()):
    return msc.get_preset("c4").override_str(TINY + [
        f"train.steps={steps}", f"train.checkpoint_dir={tmp_path}",
        f"train.checkpoint_every={steps}", *extra,
    ])


@pytest.mark.slow
def test_best_snapshot_selected_and_reproducible(tmp_path):
    """The persisted best tree re-evals (same fixed key/env count) to
    exactly the recorded best return, and best >= the final snapshot's
    score by construction (max over the trace)."""
    cfg = _cfg(tmp_path, steps=6)
    state, out = dqn_driver.run(cfg)
    assert "best_eval_return" in out
    assert out["best_eval_iter"] in (2, 4, 6)

    mgr = CheckpointManager(str(tmp_path))
    best = mgr.restore_best_policy()
    mgr.close()
    assert best is not None
    assert int(best["step"]) == out["best_eval_iter"]

    k_snap = jax.random.key(cfg.train.seed + 0xBE57)
    # Compare against the UNROUNDED stored return (the driver's metrics
    # record rounds to 3 decimals for the JSONL stream).
    stored = float(best["eval_return"])
    np.testing.assert_allclose(out["best_eval_return"], stored, atol=5e-4)
    re = policy_eval.evaluate_dqn(cfg, best["params"], k_snap,
                                  num_envs=cfg.rl.eval_snapshot_envs)
    np.testing.assert_allclose(re["episode_return_mean"], stored, rtol=1e-5)
    # Selection is the max over the trace: the FINAL params cannot score
    # higher than the kept best under the same fixed-key eval.
    fin = policy_eval.evaluate_dqn(cfg, jax.device_get(state.params), k_snap,
                                   num_envs=cfg.rl.eval_snapshot_envs)
    assert fin["episode_return_mean"] <= stored + 1e-5


@pytest.mark.slow
def test_best_snapshot_never_regresses_on_rerun(tmp_path):
    """save_best_policy only overwrites on improvement: a later run with a
    worse best leaves the stored snapshot untouched."""
    mgr = CheckpointManager(str(tmp_path))
    tree = {"params": {"w": np.ones(3)}, "target_params": {"w": np.ones(3)},
            "step": 10, "eval_return": 50.0}
    assert mgr.save_best_policy(tree)
    worse = {**tree, "step": 20, "eval_return": 12.0}
    assert not mgr.save_best_policy(worse)
    got = mgr.restore_best_policy()
    assert int(got["step"]) == 10 and float(got["eval_return"]) == 50.0
    better = {**tree, "step": 30, "eval_return": 61.5}
    assert mgr.save_best_policy(better)
    got = mgr.restore_best_policy()
    mgr.close()
    assert int(got["step"]) == 30 and float(got["eval_return"]) == 61.5


@pytest.mark.slow
def test_cli_use_best(tmp_path, capsys):
    """--use-best evaluates the stored best tree end-to-end, including on
    this 8-virtual-device backend where train auto-shards (device_get of
    replicated params)."""
    ov = TINY + ["train.steps=4", f"train.checkpoint_dir={tmp_path}",
                 "train.checkpoint_every=4"]
    args = [x for pair in (("--set", o) for o in ov) for x in pair]
    rc = cli.main(["train", "--config", "c4", *args])
    assert rc == 0
    capsys.readouterr()

    rc = cli.main(["eval-policy", "--config", "c4", "--episodes", "4",
                   "--use-best", *args])
    captured = capsys.readouterr()
    assert rc == 0
    out = json.loads(captured.out.strip().splitlines()[-1])
    assert np.isfinite(out["episode_return_mean"])
    assert "best snapshot: iter" in captured.err
