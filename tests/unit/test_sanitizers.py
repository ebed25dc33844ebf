"""JAX sanitizer equivalents of the race/leak detectors (SURVEY.md §5.2).

``jax.checking_leaks`` catches tracer leaks (a traced value escaping its
transform — the JAX analog of a use-after-scope bug) around the fused DQN
actor+learner iteration, the largest single jitted graph in the framework.
NaN debugging (``jax_debug_nans``) is enabled suite-wide for the
integration tests (tests/integration/conftest.py).
"""

import jax
import numpy as np
import pytest

import multimodal_sc_tpu as msc
from multimodal_sc_tpu.rl import dqn as dqn_lib


def _tiny():
    return msc.get_preset("c4").override_str([
        "camera.features=8,16,16,16", "camera.c_sym=2",
        "camera.image_hw=16,16", "env.image_hw=16,16",
        "lidar.pillar_dim=16", "lidar.c_sym=2", "lidar.bev_hw=8,8",
        "fusion.dim=32", "fusion.depth=1", "fusion.heads=2",
        "fusion.state_dim=32", "env.num_npcs=2", "env.lidar_rays=16",
        "rl.replay_capacity=32", "rl.batch_size=4",
    ])


@pytest.mark.slow  # checking_leaks makes tracing ~60x slower; slow gate only
def test_fused_iteration_has_no_tracer_leaks(key):
    cfg = _tiny()
    with jax.checking_leaks():
        state = dqn_lib.init(cfg, key, num_envs=2)
        iteration = dqn_lib.make_iteration(cfg)
        state, metrics = iteration(state)
        jax.block_until_ready(metrics)
    assert np.isfinite(float(metrics["reward"]))
