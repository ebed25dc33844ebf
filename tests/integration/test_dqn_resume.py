"""DQN full-state checkpoint round-trip: params, opt state, replay buffer,
env states, PRNG key, counters (SURVEY.md §5.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import multimodal_sc_tpu as msc
from multimodal_sc_tpu.io.checkpoint import CheckpointManager
from multimodal_sc_tpu.rl import dqn as dqn_lib


def _tiny():
    return msc.get_preset("c4").override_str([
        "camera.features=8,16,16,16", "camera.c_sym=2",
        "camera.image_hw=16,16", "env.image_hw=16,16",
        "lidar.pillar_dim=16", "lidar.c_sym=2", "lidar.bev_hw=8,8",
        "fusion.dim=32", "fusion.depth=1", "fusion.heads=2",
        "fusion.state_dim=32",
        "env.num_npcs=2", "env.lidar_rays=32",
        "rl.replay_capacity=64", "rl.batch_size=8",
    ])


@pytest.mark.slow
def test_dqn_state_checkpoint_roundtrip(tmp_path, key):
    cfg = _tiny()
    state = dqn_lib.init(cfg, key, num_envs=4)
    it = dqn_lib.make_iteration(cfg)
    for _ in range(10):
        state, _ = it(state)

    mgr = CheckpointManager(str(tmp_path))
    mgr.save(10, state, wait=True)

    fresh = dqn_lib.init(cfg, jax.random.key(123), num_envs=4)
    restored = dqn_lib.DQNState(*mgr.restore_latest(fresh))
    mgr.close()

    # Every array leaf must round-trip exactly (incl. replay buffer data,
    # cursor/size, PRNG key, step counter, env states).
    ref_leaves = jax.tree_util.tree_leaves(state)
    got_leaves = jax.tree_util.tree_leaves(restored)
    assert len(ref_leaves) == len(got_leaves)
    for a, b in zip(ref_leaves, got_leaves):
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) or True:
            ka = jax.random.key_data(a) if jnp.issubdtype(
                getattr(a, "dtype", jnp.float32), jax.dtypes.prng_key) else a
            kb = jax.random.key_data(b) if jnp.issubdtype(
                getattr(b, "dtype", jnp.float32), jax.dtypes.prng_key) else b
            np.testing.assert_array_equal(np.asarray(ka), np.asarray(kb))

    # And the continuation must be identical from both states.
    s1, m1 = it(state)
    s2, m2 = it(restored)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)


@pytest.mark.slow
def test_dqn_driver_resume_no_step_collision(tmp_path, key):
    """Driver resumes at the restored iteration (no StepAlreadyExists).

    On the 8-virtual-device test backend this exercises the SPMD driver
    path (train/dqn.py routes to rl/dqn_sharded when data shards > 1),
    including sharded-state checkpoint save/restore."""
    from multimodal_sc_tpu.train import dqn as dqn_train

    cfg = _tiny().override_str([
        "train.steps=4", "train.log_every=10",
        "train.checkpoint_every=2",
        f"train.checkpoint_dir={tmp_path}/d",
    ])
    dqn_train.run(cfg, num_envs=8)          # saves steps 2, 4
    cfg2 = cfg.override_str(["train.steps=6"])
    state, _ = dqn_train.run(cfg2, num_envs=8)   # resumes at 4, runs 2 more
    from multimodal_sc_tpu.io.checkpoint import CheckpointManager

    mgr = CheckpointManager(f"{tmp_path}/d")
    assert mgr.latest_step() == 6
    mgr.close()
