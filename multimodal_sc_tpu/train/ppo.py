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
        from multimodal_sc_tpu.rl.warmstart import (
            load_jscc_into_perception,
            seed_vq_codebook_params,
        )

        warm, loaded = load_jscc_into_perception(
            cfg, state.params, init_from, return_loaded=True)
        # VQ trunk warm-started from an ANALOG source: no codebook came
        # over — seed it from data or the trunk collapses (ADVICE r4; see
        # train/dqn.py).
        seed_cam = cfg.camera.arch == "vq" and "cam_vq" not in loaded
        seed_lid = cfg.lidar.arch == "vq" and "lid_codebook" not in loaded
        if seed_cam or seed_lid:
            warm = seed_vq_codebook_params(
                cfg, warm, seed_camera=seed_cam, seed_lidar=seed_lid)
        state = state._replace(
            params=warm,
            ema_params=jax.tree_util.tree_map(jax.numpy.copy, warm))
    elif cfg.camera.arch == "vq" or cfg.lidar.arch == "vq":
        # Cold VQ start: codebook seeding from rendered observations (see
        # train/dqn.py — a resume overwrites this below).
        from multimodal_sc_tpu.rl.warmstart import seed_vq_codebook_params

        params = seed_vq_codebook_params(cfg, state.params)
        state = state._replace(
            params=params,
            ema_params=jax.tree_util.tree_map(jax.numpy.copy, params))
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
        # Upgrading restore: fills pre-r4 checkpoints' missing
        # EnvState.fog leaf from the fresh reset (io/checkpoint.py).
        restored = ckpt_mgr.restore_latest_upgrading(state)
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

    chunk = max(1, cfg.train.iters_per_dispatch)
    chunked_step = (ppo_lib.make_train_step_chunked(cfg, chunk)
                    if chunk > 1 else None)

    def _chunk_ok(it: int) -> bool:
        """See train/dqn.py — exact checkpoint cadence around chunks."""
        if chunk == 1 or it % chunk != 0 or it + chunk > cfg.train.steps:
            return False
        if ckpt_mgr and any((it + j) % cfg.train.checkpoint_every == 0
                            for j in range(1, chunk)):
            return False
        return True

    first_s = None
    first_n = 0
    ckpt_s = 0.0  # in-loop checkpoint-save wall (D2H + prior-save waits)
    with maybe_trace(cfg.train.profile_dir), Timer() as t:
        it = start_it
        while it < cfg.train.steps:
            t0 = _time.perf_counter() if first_s is None else None
            if _chunk_ok(it):
                state, stacked = chunked_step(state)
                if t0 is not None:
                    jax.block_until_ready(stacked["loss"])
                    first_s = _time.perf_counter() - t0
                    first_n = chunk
                for j in range(chunk):
                    g = it + 1 + j
                    if g % cfg.train.log_every == 0:
                        m_j = {k: v[j] for k, v in stacked.items()}
                        writer.write(g, m_j)
                        watchdog.check(g, m_j)
                last = {k: v[-1] for k, v in stacked.items()}
                it += chunk
            else:
                state, metrics = train_step(state)
                if t0 is not None:
                    jax.block_until_ready(metrics)
                    first_s = _time.perf_counter() - t0
                    first_n = 1
                last = metrics
                it += 1
                if it % cfg.train.log_every == 0:
                    writer.write(it, metrics)
                    watchdog.check(it, metrics)
            if ckpt_mgr and it % cfg.train.checkpoint_every == 0:
                t_ck = _time.perf_counter()
                ckpt_mgr.save(it, state)
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
    if first_s is not None and n_upd > first_n and \
            t.elapsed > first_s + ckpt_s:
        extra["first_dispatch_s"] = round(first_s, 2)
        extra["steady_steps_per_sec_per_chip"] = steps_per_sec_per_chip(
            (n_upd - first_n) * cfg.rl.rollout_length * cfg.rl.num_envs,
            t.elapsed - first_s - ckpt_s)
    writer.write(cfg.train.steps, {**last, **extra})
    writer.close()
    return state, {**jax.device_get(last), **extra}
