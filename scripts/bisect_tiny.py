"""Tiny-scale (CPU) repro + fix arms for the cold-c4 snapshot oscillation.

Recreates the bisect_tiny setup from results_r3/collapse_investigation.md —
the r3 stack at 1/8 scale (16x16 obs, dim-32 fusion, 16 envs, 3000 iters,
eps annealed to 0.05 by 1500) — where the greedy quality of frozen
snapshots was observed oscillating 14.6 <-> 55.3 <-> 15.4 <-> 84.5 between
trace points 250 iters apart while the train return climbed.

Arms (the standard value-learning damping levers):
  base      : hard target sync every 200 learn steps (the r3 default)
  F tau=.005: soft (Polyak) target updates, rl.target_tau=0.005
  G tau=.02 : faster soft target
  H lr=3e-4 : lower Adam lr (damps the TD chatter directly)

Every trace point evals BOTH the online params (greedy) and the target
network (under soft updates the target IS the Polyak average — the natural
smoothed deployment policy). Each arm ends with a uniform average of the
last-20%-of-dispatches params evaluated greedily (oscillation probe) plus
256-episode greedy/eps05 finals.

Runs on the CPU backend (safe alongside TPU jobs, CLAUDE.md).

Usage: python scripts/bisect_tiny.py [outfile.json]
"""

from __future__ import annotations

import json
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, ".")
import multimodal_sc_tpu as msc  # noqa: E402
from multimodal_sc_tpu.evaluation import policy_eval  # noqa: E402
from multimodal_sc_tpu.rl import dqn as dqn_lib  # noqa: E402

ITERS = 3000
CHUNK = 50
TRACE_EVERY = 250
NUM_ENVS = 16


def tiny_cfg():
    return msc.get_preset("c4").override_str([
        "camera.image_hw=16,16",
        "camera.features=16,32",
        "env.image_hw=16,16",
        "env.lidar_rays=32",
        "lidar.max_points=256",
        "lidar.max_pillars=64",
        "lidar.pillar_dim=32",
        "fusion.dim=32",
        "fusion.state_dim=32",
        "fusion.heads=2",
        "rl.num_envs=16",
        "rl.replay_capacity=8192",
        "rl.eps_decay_steps=1500",
        "train.steps=3000",
    ])


def run_arm(name, cfg, avg_last_frac=0.2):
    rec = {"trace": []}
    state = dqn_lib.init(cfg, jax.random.key(0), NUM_ENVS)
    it = dqn_lib.make_iteration(cfg, carry_obs=True, chunk=CHUNK)
    t0 = time.time()
    n_disp = ITERS // CHUNK
    avg_start = int(n_disp * (1.0 - avg_last_frac))
    p_avg, n_avg = None, 0
    last = None
    for i in range(n_disp):
        state, m = it(state)
        last = m
        if i >= avg_start:
            p_avg = (jax.tree_util.tree_map(jnp.copy, state.params)
                     if p_avg is None else
                     jax.tree_util.tree_map(jnp.add, p_avg, state.params))
            n_avg += 1
        done = (i + 1) * CHUNK
        if done % TRACE_EVERY == 0:
            g = policy_eval.evaluate_dqn(cfg, state.params,
                                         jax.random.key(0), num_envs=32)
            t = policy_eval.evaluate_dqn(cfg, state.target_params,
                                         jax.random.key(0), num_envs=32)
            point = {
                "iters": done,
                "greedy32": round(g["episode_return_mean"], 2),
                "target32": round(t["episode_return_mean"], 2),
                "train_return": round(float(m["episode_return"][-1]), 2),
                "action_entropy": round(float(jnp.mean(m["action_entropy"])), 3),
            }
            rec["trace"].append(point)
            print(f"{name}@{done}: {point}", flush=True)
    jax.block_until_ready(last)
    rec["train_s"] = round(time.time() - t0, 1)
    for eps, label in ((0.0, "greedy"), (0.05, "eps05")):
        out = policy_eval.evaluate_dqn(cfg, state.params, jax.random.key(0),
                                       num_envs=256, epsilon=eps)
        rec[f"eval_{label}"] = {k: round(v, 3) for k, v in out.items()}
    out = policy_eval.evaluate_dqn(cfg, state.target_params,
                                   jax.random.key(0), num_envs=256)
    rec["eval_greedy_target"] = {k: round(v, 3) for k, v in out.items()}
    if n_avg:
        p_mean = jax.tree_util.tree_map(lambda x: x / n_avg, p_avg)
        out = policy_eval.evaluate_dqn(cfg, p_mean, jax.random.key(0),
                                       num_envs=256)
        rec["eval_greedy_avgparams"] = {k: round(v, 3)
                                        for k, v in out.items()}
        rec["avg_dispatches"] = n_avg
    print(f"{name} FINAL: greedy={rec['eval_greedy']['episode_return_mean']}"
          f" target={rec['eval_greedy_target']['episode_return_mean']}"
          f" avg={rec.get('eval_greedy_avgparams', {}).get('episode_return_mean')}",
          flush=True)
    return rec


def main():
    outfile = sys.argv[1] if len(sys.argv) > 1 else "results_r3/bisect_tiny.json"
    base = tiny_cfg()
    arms = {
        "base": base,
        "F_tau_005": base.override_str(["rl.target_tau=0.005"]),
        "G_tau_02": base.override_str(["rl.target_tau=0.02"]),
        "H_lr_3e4": base.override_str(["train.lr=0.0003"]),
    }
    results = {}
    for name, cfg in arms.items():
        results[name] = run_arm(name, cfg)
        with open(outfile, "w") as f:
            json.dump(results, f, indent=1)
    print(f"wrote {outfile}")


if __name__ == "__main__":
    main()
