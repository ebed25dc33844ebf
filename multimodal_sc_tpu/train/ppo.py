"""PPO training driver (config 5, BASELINE.json:11).

Each train_step is a full on-device rollout + GAE + minibatch epochs; the
host loop only counts updates, pulls metrics, and checkpoints. The
steps/sec/chip benchmark counts env steps = updates * T * B (the north-star
metric path, BASELINE.json:2).
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
from multimodal_sc_tpu.rl import ppo as ppo_lib


def run(cfg: ExperimentConfig, metrics_path: Optional[str] = None,
        init_from: Optional[str] = None):
    key = jax.random.key(cfg.train.seed)
    key, k_init = jax.random.split(key)
    state = ppo_lib.init(cfg, k_init)
    if init_from:
        from multimodal_sc_tpu.rl.warmstart import load_jscc_into_perception

        state = state._replace(params=load_jscc_into_perception(
            cfg, state.params, init_from))
    # Shard envs/accumulators over the device mesh (degrades to 1 chip).
    from multimodal_sc_tpu.runtime import mesh as mesh_lib

    dev_mesh = mesh_lib.make_mesh(
        data=cfg.mesh.data_axis, model=cfg.mesh.model_axis,
        axis_names=cfg.mesh.axis_names)
    state = ppo_lib.shard_state(state, dev_mesh)
    train_step = ppo_lib.make_train_step(cfg)

    writer = MetricsWriter(metrics_path, config_json=cfg.to_json())
    watchdog = NaNWatchdog()
    ckpt_mgr = None
    if cfg.train.checkpoint_dir:
        from multimodal_sc_tpu.io.checkpoint import CheckpointManager

        ckpt_mgr = CheckpointManager(cfg.train.checkpoint_dir)
        ckpt_mgr.save_config(cfg.to_json())
        restored = ckpt_mgr.restore_latest(state)
        if restored is not None:
            state = ppo_lib.PPOState(*restored)

    last = {}
    # Resume from the restored checkpoint's iteration (orbax step number);
    # re-saving an existing step would raise StepAlreadyExistsError and the
    # loop must not redo completed iterations.
    start_it = (ckpt_mgr.latest_step() or 0) if ckpt_mgr else 0
    # First-update wall (compile + first run) recorded separately for the
    # compile-vs-steady breakdown (VERDICT r2 item 3; see train/dqn.py).
    import time as _time

    first_s = None
    ckpt_s = 0.0  # in-loop checkpoint-save wall (D2H + prior-save waits)
    with maybe_trace(cfg.train.profile_dir), Timer() as t:
        for it in range(start_it, cfg.train.steps):
            t0 = _time.perf_counter() if first_s is None else None
            state, metrics = train_step(state)
            if t0 is not None:
                jax.block_until_ready(metrics)
                first_s = _time.perf_counter() - t0
            last = metrics
            if (it + 1) % cfg.train.log_every == 0:
                writer.write(it + 1, metrics)
                watchdog.check(it + 1, metrics)
            if ckpt_mgr and (it + 1) % cfg.train.checkpoint_every == 0:
                t_ck = _time.perf_counter()
                ckpt_mgr.save(it + 1, state)
                ckpt_s += _time.perf_counter() - t_ck
    jax.block_until_ready(last)
    close_s = 0.0
    if ckpt_mgr:
        # Close before the final metrics record so the async-save drain
        # lands in the accounted checkpoint time (see train/dqn.py).
        t_ck = _time.perf_counter()
        ckpt_mgr.close()
        close_s = _time.perf_counter() - t_ck
    env_steps = ((cfg.train.steps - start_it)
                 * cfg.rl.rollout_length * cfg.rl.num_envs)
    sps = steps_per_sec_per_chip(env_steps, t.elapsed)
    extra = {"agent_steps_per_sec_per_chip": sps}
    if ckpt_mgr:
        extra["ckpt_save_s"] = round(ckpt_s, 2)
        extra["ckpt_close_s"] = round(close_s, 2)
    n_upd = cfg.train.steps - start_it
    if first_s is not None and n_upd > 1 and t.elapsed > first_s + ckpt_s:
        extra["first_dispatch_s"] = round(first_s, 2)
        extra["steady_steps_per_sec_per_chip"] = steps_per_sec_per_chip(
            (n_upd - 1) * cfg.rl.rollout_length * cfg.rl.num_envs,
            t.elapsed - first_s - ckpt_s)
    writer.write(cfg.train.steps, {**last, **extra})
    writer.close()
    return state, {**jax.device_get(last), **extra}
