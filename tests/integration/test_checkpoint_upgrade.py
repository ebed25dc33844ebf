"""Pre-r4 checkpoint format upgrade (VERDICT r4 item 8 / ADVICE r4).

r4 added the runtime fog scalar to ``EnvState`` (``envs/driving.py
EnvState.fog``); FULL-state checkpoints written before that miss the leaf
and a strict orbax restore dies with a raw tree-structure error.
``CheckpointManager.restore_latest_upgrading`` (io/checkpoint.py) detects
the missing leaf, fills it from the fresh-init target (which carries
``cfg.env.fog_range``), and restores everything else exactly.
"""

import warnings

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
        "env.num_npcs=2", "env.lidar_rays=16",
        "rl.replay_capacity=64", "rl.batch_size=8",
    ])


def _to_plain(x):
    """Mimic the on-disk layout of a saved state: nested dicts for
    NamedTuples (orbax stores them keyed by field name), lists for
    tuples."""
    if hasattr(x, "_fields"):
        return {f: _to_plain(getattr(x, f)) for f in x._fields}
    if isinstance(x, dict):
        return {k: _to_plain(v) for k, v in x.items()}
    if isinstance(x, (tuple, list)):
        return [_to_plain(v) for v in x]
    return x


def _leaves_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        kx = (jax.random.key_data(x) if jnp.issubdtype(
            getattr(x, "dtype", jnp.float32), jax.dtypes.prng_key) else x)
        ky = (jax.random.key_data(y) if jnp.issubdtype(
            getattr(y, "dtype", jnp.float32), jax.dtypes.prng_key) else y)
        np.testing.assert_array_equal(np.asarray(kx), np.asarray(ky))


def test_pre_r4_checkpoint_missing_fog_leaf_resumes(tmp_path, key):
    cfg = _tiny().override_str(["env.fog_range=17.5"])
    state = dqn_lib.init(cfg, key, num_envs=2)

    # Forge a pre-r4 checkpoint: same state with EnvState.fog dropped.
    old = _to_plain(state)
    del old["env_states"]["fog"]
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(3, old, wait=True)

    fresh = dqn_lib.init(cfg, jax.random.key(99), num_envs=2)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        restored = dqn_lib.DQNState(*mgr.restore_latest_upgrading(fresh))
    mgr.close()
    assert any("fog" in str(x.message) for x in w)

    # The filled leaf comes from the FRESH target (cfg.env.fog_range).
    np.testing.assert_allclose(np.asarray(restored.env_states.fog),
                               np.asarray(fresh.env_states.fog))
    # Everything that WAS saved round-trips exactly.
    _leaves_equal(state.params, restored.params)
    _leaves_equal(state.buffer, restored.buffer)
    np.testing.assert_array_equal(np.asarray(restored.env_states.ego),
                                  np.asarray(state.env_states.ego))
    # And the restored state steps (dtype/sharding preserved end-to-end).
    it = dqn_lib.make_iteration(cfg)
    s, m = it(restored)
    assert np.isfinite(float(m["reward"]))


def test_current_checkpoint_still_restores_strict(tmp_path, key):
    cfg = _tiny()
    state = dqn_lib.init(cfg, key, num_envs=2)
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(1, state, wait=True)
    fresh = dqn_lib.init(cfg, jax.random.key(7), num_envs=2)
    restored = dqn_lib.DQNState(*mgr.restore_latest_upgrading(fresh))
    mgr.close()
    _leaves_equal(state, restored)


def test_missing_non_upgradeable_leaf_raises_clearly(tmp_path, key):
    cfg = _tiny()
    state = dqn_lib.init(cfg, key, num_envs=2)
    old = _to_plain(state)
    del old["ep_return"]
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(1, old, wait=True)
    fresh = dqn_lib.init(cfg, jax.random.key(7), num_envs=2)
    with pytest.raises(ValueError, match="ep_return"):
        mgr.restore_latest_upgrading(fresh)
    mgr.close()
