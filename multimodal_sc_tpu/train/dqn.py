"""DQN training driver (config 4, BASELINE.json:10).

Host loop around the single jitted actor+learner iteration; metrics pulled
every K steps in one device_get (BASELINE.json:5 no-host-round-trips rule).

Multi-chip: when the mesh has more than one ``data`` shard, the driver
builds the SPMD iteration (``rl/dqn_sharded.py`` — per-shard envs + replay
under ``shard_map``, one grad pmean over ICI) instead of the single-device
one, so ``python -m multimodal_sc_tpu.cli train --config c4`` trains
data-parallel on any mesh with no config changes.
"""

from __future__ import annotations

from typing import Optional

import jax

from multimodal_sc_tpu.config.configs import ExperimentConfig
from multimodal_sc_tpu.obs.profiling import (CollapseWatchdog, NaNWatchdog,
                                             maybe_trace)
from multimodal_sc_tpu.obs.metrics_writer import (
    MetricsWriter,
    Timer,
    steps_per_sec_per_chip,
)
from multimodal_sc_tpu.rl import dqn as dqn_lib
from multimodal_sc_tpu.runtime import mesh as mesh_lib


def _guard_replay_dtype(cfg: ExperimentConfig) -> None:
    """Refuse to resume across an rl.replay_quantize flip.

    Orbax's shape-dtype-struct restore silently CASTS a float32 [0,1]
    image store into a uint8 target (every frame becomes 0) and vice
    versa (0-255 floats fed to the net with no dequantize) — no error,
    just corrupted replay. The config pinned beside the checkpoints
    (save_config) records the training-time flag; mismatches must be
    explicit (`--set rl.replay_quantize=...`), not silent."""
    import json
    import os

    path = os.path.join(cfg.train.checkpoint_dir, "config.json")
    if not os.path.exists(path):
        return
    try:
        saved = json.load(open(path))
        # Pre-r2 checkpoints predate the flag entirely = f32 stores.
        saved_flag = saved["rl"].get("replay_quantize", False)
    except (json.JSONDecodeError, KeyError, TypeError):
        return  # unreadable/foreign config: nothing to compare against
    if bool(saved_flag) != bool(cfg.rl.replay_quantize):
        raise ValueError(
            f"checkpoint dir {cfg.train.checkpoint_dir!r} was trained with "
            f"rl.replay_quantize={saved_flag} but the current config has "
            f"{cfg.rl.replay_quantize}; restoring across the flip would "
            "silently corrupt the replay image store (orbax casts dtypes "
            "without rescaling). Re-run with --set "
            f"rl.replay_quantize={str(bool(saved_flag)).lower()} or start "
            "a fresh checkpoint dir.")


def run(cfg: ExperimentConfig, num_envs: Optional[int] = None,
        metrics_path: Optional[str] = None,
        init_from: Optional[str] = None):
    """Train config-4 DQN. `num_envs` defaults to cfg.rl.num_envs (the same
    count eval-policy restores with — orbax shape-checks the env/replay
    arrays). `init_from` warm-starts the perception trunk from a JSCC
    checkpoint directory (SURVEY §7 hard-part 4)."""
    if num_envs is None:
        num_envs = cfg.rl.num_envs
    key = jax.random.key(cfg.train.seed)
    key, k_init = jax.random.split(key)

    chunk = max(1, cfg.train.iters_per_dispatch)
    mesh = mesh_lib.make_mesh()
    n_shards = mesh.shape[mesh_lib.DATA_AXIS]
    sharded = n_shards > 1
    if sharded:
        from multimodal_sc_tpu.rl import dqn_sharded

        if num_envs % n_shards != 0:
            raise ValueError(
                f"num_envs {num_envs} not divisible by data shards {n_shards}")
        state = dqn_sharded.init(cfg, k_init, mesh,
                                 envs_per_shard=num_envs // n_shards)
        iteration = dqn_sharded.make_iteration(cfg, mesh, chunk=chunk)
        iteration_1 = (iteration if chunk == 1
                       else dqn_sharded.make_iteration(cfg, mesh))
        state_cls = dqn_sharded.ShardedDQNState
    else:
        state = dqn_lib.init(cfg, k_init, num_envs)
        iteration = dqn_lib.make_iteration(cfg, chunk=chunk)
        iteration_1 = (iteration if chunk == 1
                       else dqn_lib.make_iteration(cfg))
        state_cls = dqn_lib.DQNState

    if init_from:
        from multimodal_sc_tpu.rl.warmstart import (
            load_jscc_into_perception,
            seed_vq_codebook_params,
        )

        params, loaded = load_jscc_into_perception(
            cfg, state.params, init_from, return_loaded=True)
        # A VQ trunk warm-started from an ANALOG checkpoint gets no
        # codebook from the source; without data-dependent seeding the
        # default init collapses to a code-independent trunk (ADVICE r4).
        seed_cam = cfg.camera.arch == "vq" and "cam_vq" not in loaded
        seed_lid = cfg.lidar.arch == "vq" and "lid_codebook" not in loaded
        if seed_cam or seed_lid:
            params = seed_vq_codebook_params(
                cfg, params, seed_camera=seed_cam, seed_lidar=seed_lid)
        # Target AND deployment EMA restart from the warm params — leaving
        # either at the random-init copy would blend junk into early TD
        # targets / the averaged deployment policy.
        state = state._replace(
            params=params,
            target_params=jax.tree_util.tree_map(jax.numpy.copy, params),
            ema_params=jax.tree_util.tree_map(jax.numpy.copy, params))
    elif cfg.camera.arch == "vq" or cfg.lidar.arch == "vq":
        # Cold VQ start: data-dependent codebook seeding from rendered env
        # observations (the default init collapses to a code-independent
        # trunk — codec/semantic_vq.py init_codebook_from_batch). A resume
        # overwrites this below; a warm start brings its own codebook.
        from multimodal_sc_tpu.rl.warmstart import seed_vq_codebook_params

        params = seed_vq_codebook_params(cfg, state.params)
        state = state._replace(
            params=params,
            target_params=jax.tree_util.tree_map(jax.numpy.copy, params),
            ema_params=jax.tree_util.tree_map(jax.numpy.copy, params))

    writer = MetricsWriter(metrics_path, config_json=cfg.to_json())
    watchdog = NaNWatchdog()
    collapse_dog = CollapseWatchdog(num_actions=cfg.rl.num_actions)
    ckpt_mgr = None
    if cfg.train.checkpoint_dir:
        from multimodal_sc_tpu.io.checkpoint import CheckpointManager

        ckpt_mgr = CheckpointManager(cfg.train.checkpoint_dir)
        _guard_replay_dtype(cfg)
        ckpt_mgr.save_config(cfg.to_json())
        # Upgrading restore: pre-r4 full-state checkpoints miss the
        # EnvState.fog leaf — the shim fills it from the fresh reset
        # (io/checkpoint.py UPGRADE_FILL_LEAVES) instead of dying on a raw
        # orbax tree-structure error.
        restored = ckpt_mgr.restore_latest_upgrading(state)
        if restored is not None:
            state = state_cls(*restored)

    last = {}
    # Resume from the restored checkpoint's iteration (orbax step number);
    # re-saving an existing step would raise StepAlreadyExistsError and the
    # loop must not redo completed iterations.
    start_it = (ckpt_mgr.latest_step() or 0) if ckpt_mgr else 0
    ce = cfg.train.checkpoint_every

    def _chunk_ok(it: int) -> bool:
        """Chunked dispatch only when it keeps checkpoint semantics exact:
        aligned start, no overrun, and no checkpoint boundary strictly
        inside the chunk (state is only on host at dispatch boundaries)."""
        if chunk == 1 or it % chunk != 0 or it + chunk > cfg.train.steps:
            return False
        if ckpt_mgr and any((it + j) % ce == 0 for j in range(1, chunk)):
            return False
        return True

    # First-dispatch wall (compile + first run) recorded separately so the
    # artifact can state the compile-vs-steady-state breakdown (VERDICT r2
    # item 3: account for where training wall goes).
    import time as _time

    first_s = None
    first_n = 0
    ckpt_s = 0.0  # in-loop checkpoint-save wall (D2H + prior-save waits)

    # Best-snapshot selection (rl.eval_snapshot_every > 0): greedy-eval the
    # online params with a FIXED key every ~ese iterations and keep the
    # best tree (host copies — params are MBs; the donated device state is
    # never aliased). TD training is earned by a param TRAJECTORY, so the
    # final snapshot can land in a transient bad basin while an earlier one
    # evals far better (snapshot oscillation,
    # results_r3/collapse_investigation.md) — deploy on measured return,
    # not recency. Evals fire at dispatch boundaries (first boundary at or
    # after each multiple of ese), with wall time excluded from the steady
    # rate like checkpoint IO.
    ese = cfg.rl.eval_snapshot_every
    snap_s = 0.0
    snap_done = (start_it // ese) if ese else 0
    best_ret, best_it, best_tree = None, None, None
    if ese:
        from multimodal_sc_tpu.evaluation import policy_eval

        k_snap = jax.random.key(cfg.train.seed + 0xBE57)

    def _maybe_snapshot_eval(it, state):
        nonlocal snap_s, snap_done, best_ret, best_it, best_tree
        if not ese or it // ese <= snap_done:
            return
        snap_done = it // ese
        t_ev = _time.perf_counter()
        # Host copies: works for replicated (sharded) params too, and the
        # kept tree survives donation of the device state.
        p = jax.device_get(state.params)
        out = policy_eval.evaluate_dqn(cfg, p, k_snap,
                                       num_envs=cfg.rl.eval_snapshot_envs)
        r = out["episode_return_mean"]
        writer.write(it, {"snapshot_eval_return": r})
        if best_ret is None or r > best_ret:
            best_ret, best_it = r, it
            best_tree = {"params": p,
                         "target_params": jax.device_get(state.target_params),
                         "ema_params": jax.device_get(state.ema_params)}
        snap_s += _time.perf_counter() - t_ev

    def _mark_first(t0, done, n):
        nonlocal first_s, first_n
        if t0 is not None:
            jax.block_until_ready(done)
            first_s = _time.perf_counter() - t0
            first_n = n

    with maybe_trace(cfg.train.profile_dir), Timer() as t:
        it = start_it
        while it < cfg.train.steps:
            t0 = _time.perf_counter() if first_s is None else None
            if _chunk_ok(it):
                # One dispatch = `chunk` scanned iterations; metrics come
                # back stacked (chunk,) so the log cadence is unchanged.
                state, stacked = iteration(state)
                _mark_first(t0, stacked, chunk)
                for j in range(chunk):
                    g = it + 1 + j
                    if g % cfg.train.log_every == 0:
                        m_j = {k: v[j] for k, v in stacked.items()}
                        writer.write(g, m_j)
                        watchdog.check(g, m_j)
                        collapse_dog.check(g, m_j)
                last = {k: v[-1] for k, v in stacked.items()}
                it += chunk
            else:
                # Tail / alignment path (also the whole loop when chunk=1).
                state, metrics = iteration_1(state)
                _mark_first(t0, metrics, 1)
                last = metrics
                it += 1
                if it % cfg.train.log_every == 0:
                    writer.write(it, metrics)
                    watchdog.check(it, metrics)
                    collapse_dog.check(it, metrics)
            _maybe_snapshot_eval(it, state)
            if ckpt_mgr and it % cfg.train.checkpoint_every == 0:
                t_ck = _time.perf_counter()
                ckpt_mgr.save(it, state)
                ckpt_s += _time.perf_counter() - t_ck
    jax.block_until_ready(last)
    close_s = 0.0
    if ckpt_mgr:
        # Close before the final metrics record so the async-save drain
        # lands in the accounted checkpoint time, not off the books.
        t_ck = _time.perf_counter()
        ckpt_mgr.close()
        close_s = _time.perf_counter() - t_ck
    sps = steps_per_sec_per_chip(
        (cfg.train.steps - start_it) * num_envs, t.elapsed)
    extra = {"agent_steps_per_sec_per_chip": sps}
    if ckpt_mgr:
        # In-loop saves (inside the timed loop) + the final async drain
        # (outside it) — recorded separately so the wall decomposes as
        # t.elapsed = first_dispatch + steady + ckpt_save, plus ckpt_close.
        extra["ckpt_save_s"] = round(ckpt_s, 2)
        extra["ckpt_close_s"] = round(close_s, 2)
    if best_ret is not None:
        extra["best_eval_return"] = round(best_ret, 3)
        extra["best_eval_iter"] = best_it
        extra["snapshot_eval_s"] = round(snap_s, 2)
        if ckpt_mgr:
            ckpt_mgr.save_best_policy({
                **best_tree, "step": best_it, "eval_return": best_ret})
    steady_steps = cfg.train.steps - start_it - first_n
    # Steady rate = the jitted-step rate: exclude the first (compile)
    # dispatch, in-loop checkpoint IO (replay-buffer D2H through the
    # tunnel dominates c4's non-compile overhead — VERDICT r2 item 3),
    # and in-training snapshot evals.
    if first_s is not None and steady_steps > 0 and \
            t.elapsed > first_s + ckpt_s + snap_s:
        extra["first_dispatch_s"] = round(first_s, 2)
        extra["steady_steps_per_sec_per_chip"] = steps_per_sec_per_chip(
            steady_steps * num_envs, t.elapsed - first_s - ckpt_s - snap_s)
    writer.write(cfg.train.steps, {**last, **extra})
    writer.close()
    return state, {**{k: float(v) for k, v in jax.device_get(last).items()},
                   **extra}
