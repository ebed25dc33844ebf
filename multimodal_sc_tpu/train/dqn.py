"""DQN training driver (config 4, BASELINE.json:10).

Host loop around the single jitted actor+learner iteration; metrics pulled
every K steps in one device_get (BASELINE.json:5 no-host-round-trips rule).
"""

from __future__ import annotations

from typing import Optional

import jax

from multimodal_sc_tpu.config.configs import ExperimentConfig
from multimodal_sc_tpu.obs.profiling import NaNWatchdog, maybe_trace
from multimodal_sc_tpu.obs.metrics_writer import (
    MetricsWriter,
    Timer,
    steps_per_sec_per_chip,
)
from multimodal_sc_tpu.rl import dqn as dqn_lib


def run(cfg: ExperimentConfig, num_envs: int = 16,
        metrics_path: Optional[str] = None):
    key = jax.random.key(cfg.train.seed)
    key, k_init = jax.random.split(key)
    state = dqn_lib.init(cfg, k_init, num_envs)
    iteration = dqn_lib.make_iteration(cfg)

    writer = MetricsWriter(metrics_path, config_json=cfg.to_json())
    watchdog = NaNWatchdog()
    ckpt_mgr = None
    if cfg.train.checkpoint_dir:
        from multimodal_sc_tpu.io.checkpoint import CheckpointManager

        ckpt_mgr = CheckpointManager(cfg.train.checkpoint_dir)
        ckpt_mgr.save_config(cfg.to_json())
        restored = ckpt_mgr.restore_latest(state)
        if restored is not None:
            state = dqn_lib.DQNState(*restored)

    last = {}
    # Resume from the restored checkpoint's iteration (orbax step number);
    # re-saving an existing step would raise StepAlreadyExistsError and the
    # loop must not redo completed iterations.
    start_it = (ckpt_mgr.latest_step() or 0) if ckpt_mgr else 0
    with maybe_trace(cfg.train.profile_dir), Timer() as t:
        for it in range(start_it, cfg.train.steps):
            state, metrics = iteration(state)
            last = metrics
            if (it + 1) % cfg.train.log_every == 0:
                writer.write(it + 1, metrics)
                watchdog.check(it + 1, metrics)
            if ckpt_mgr and (it + 1) % cfg.train.checkpoint_every == 0:
                ckpt_mgr.save(it + 1, state)
    jax.block_until_ready(last)
    sps = steps_per_sec_per_chip(
        (cfg.train.steps - start_it) * num_envs, t.elapsed)
    writer.write(cfg.train.steps, {**last, "agent_steps_per_sec_per_chip": sps})
    writer.close()
    if ckpt_mgr:
        ckpt_mgr.close()
    return state, {**jax.device_get(last),
                   "agent_steps_per_sec_per_chip": sps}
