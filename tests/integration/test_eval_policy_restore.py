"""cli eval-policy restores params-only from BOTH unsharded-DQNState and
ShardedDQNState checkpoints (r2 review: train/dqn.run auto-shards on
multi-device hosts, so the train->eval-policy flow must not depend on the
checkpointed state class)."""

import json

import numpy as np
import pytest

import multimodal_sc_tpu as msc
from multimodal_sc_tpu import cli


def _overrides(tmp_path, steps):
    return [
        "camera.features=8,16,16,16", "camera.c_sym=2",
        "camera.image_hw=16,16", "env.image_hw=16,16",
        "lidar.pillar_dim=16", "lidar.c_sym=2", "lidar.bev_hw=8,8",
        "fusion.dim=32", "fusion.depth=1", "fusion.heads=2",
        "fusion.state_dim=32",
        "env.num_npcs=2", "env.lidar_rays=32", "env.max_steps=16",
        "rl.replay_capacity=64", "rl.batch_size=8", "rl.num_envs=8",
        f"train.steps={steps}", f"train.checkpoint_dir={tmp_path}",
        f"train.checkpoint_every={steps}", "train.log_every=1000",
    ]


def _run_cli(argv, capsys):
    rc = cli.main(argv)
    out = capsys.readouterr().out.strip().splitlines()
    return rc, json.loads(out[-1])


@pytest.mark.slow
def test_eval_policy_after_sharded_dqn_train(tmp_path, capsys):
    """On this 8-virtual-device backend, `cli train` routes through
    rl/dqn_sharded and checkpoints a ShardedDQNState; eval-policy must
    still evaluate it (params-only raw restore)."""
    ov = _overrides(tmp_path, steps=3)
    args = [x for pair in (("--set", o) for o in ov) for x in pair]
    rc, _ = _run_cli(["train", "--config", "c4", *args], capsys)
    assert rc == 0

    rc, out = _run_cli(
        ["eval-policy", "--config", "c4", "--episodes", "4", *args], capsys)
    assert rc == 0
    assert np.isfinite(out["episode_return_mean"])


@pytest.mark.slower  # ~38 min on the 1-core CI box: full PPO train +
# both eval modes; the sharded-DQN twin below keeps driver-eval
# coverage inside the slow gate
@pytest.mark.slow
def test_eval_policy_after_ppo_train(tmp_path, capsys):
    ov = _overrides(tmp_path, steps=2)
    args = [x for pair in (("--set", o) for o in ov) for x in pair]
    rc, _ = _run_cli(["train", "--config", "c5", *args], capsys)
    assert rc == 0

    rc, out = _run_cli(
        ["eval-policy", "--config", "c5", "--episodes", "4", *args], capsys)
    assert rc == 0
    assert np.isfinite(out["episode_return_mean"])


@pytest.mark.slow
def test_eval_policy_unsharded_checkpoint(tmp_path, capsys):
    """Single-device-style checkpoint (plain DQNState written directly)
    also restores — the production single-chip flow."""
    import jax

    from multimodal_sc_tpu.io.checkpoint import CheckpointManager
    from multimodal_sc_tpu.rl import dqn as dqn_lib

    ov = _overrides(tmp_path, steps=2)
    cfg = msc.get_preset("c4").override_str(ov)
    state = dqn_lib.init(cfg, jax.random.key(0), num_envs=4)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(1, state, wait=True)
    mgr.close()

    args = [x for pair in (("--set", o) for o in ov) for x in pair]
    rc, out = _run_cli(
        ["eval-policy", "--config", "c4", "--episodes", "4", *args], capsys)
    assert rc == 0
    assert np.isfinite(out["episode_return_mean"])


@pytest.mark.slow
def test_eval_policy_use_target_restores_target_subtree(tmp_path, capsys):
    """--use-target evaluates the TARGET network: with a checkpoint whose
    target differs from the online params, the two eval modes must see
    different parameter trees (verified via the restore layer directly),
    and the CLI flag path must run to a finite return."""
    import jax
    import jax.numpy as jnp

    from multimodal_sc_tpu.io.checkpoint import CheckpointManager
    from multimodal_sc_tpu.rl import dqn as dqn_lib

    ov = _overrides(tmp_path, steps=2)
    cfg = msc.get_preset("c4").override_str(ov)
    state = dqn_lib.init(cfg, jax.random.key(0), num_envs=4)
    # Make the target tree distinguishable from the online tree.
    state = state._replace(target_params=jax.tree_util.tree_map(
        lambda x: x + 1.0, state.params))
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(1, state, wait=True)

    mgr.close()

    # Fresh manager per field: orbax pins an item-handler signature per
    # CheckpointManager instance (the CLI also builds one per call).
    fresh = dqn_lib.init_params(cfg, jax.random.key(1))
    mgr_p = CheckpointManager(str(tmp_path))
    got_p = mgr_p.restore_params_latest(fresh)
    mgr_p.close()
    mgr_t = CheckpointManager(str(tmp_path))
    got_t = mgr_t.restore_params_latest(fresh, field="target_params")
    mgr_t.close()
    leaves_p = jax.tree_util.tree_leaves(got_p)
    leaves_t = jax.tree_util.tree_leaves(got_t)
    np.testing.assert_allclose(np.asarray(leaves_t[0]),
                               np.asarray(leaves_p[0]) + 1.0, rtol=1e-6)

    args = [x for pair in (("--set", o) for o in ov) for x in pair]
    rc, out = _run_cli(
        ["eval-policy", "--config", "c4", "--episodes", "4",
         "--use-target", *args], capsys)
    assert rc == 0
    assert np.isfinite(out["episode_return_mean"])
