"""Bisect the r3 cold-c4 greedy collapse (BASELINE.md config-4).

Each arm trains the full 5000-iteration budget and evals IN-PROCESS from
the live ``state.params`` (no checkpoint plumbing), so a wrong answer
cannot come from save/restore. Arm D additionally traces greedy eval and
the executed-action entropy every 1000 iterations to time the collapse
(late-training collapse vs never-learned vs stale train metric).

Arms:
  A kernel-off : unfused module tree (pallas_mha_block=false), carry+chunk
  B no-carry   : fused tree, r2-style re-render at the top of each iter
  C r2-style   : kernel off + no carry + chunk=1 (the full r2 stack)
  D r3-trace   : production r3 stack with the eval/entropy timeline
  E no-curbs   : r3 stack on the pre-curb env (the r2->r3 ENV delta,
                 which arms A-D all carry)

Every arm also evals the uniform average of the last 20% of param
snapshots: train-time returns are earned by a param TRAJECTORY (one env
step per iteration), so avg-params >> snapshot at eval is the signature
of an oscillating (non-converging) Q-function rather than a bad one.

Usage: python scripts/bisect_c4.py [outfile.json]
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from multimodal_sc_tpu.runtime.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import multimodal_sc_tpu as msc  # noqa: E402
from multimodal_sc_tpu.evaluation import policy_eval  # noqa: E402
from multimodal_sc_tpu.rl import dqn as dqn_lib  # noqa: E402

ITERS = 5000


def run_arm(name, cfg, carry_obs=True, chunk=50, eval_every=None,
            avg_last_frac=0.2, seed=0):
    rec = {"carry_obs": carry_obs, "chunk": chunk, "trace": []}
    try:
        state = dqn_lib.init(cfg, jax.random.key(seed), cfg.rl.num_envs)
        it = dqn_lib.make_iteration(cfg, carry_obs=carry_obs, chunk=chunk)
        t0 = time.time()
        last = None
        n_disp = ITERS // chunk
        # Oscillation probe: uniform param average over the last fraction
        # of dispatches. Train-time episodes span ~max_steps ITERATIONS
        # (one env step per iteration, params updating every step), so the
        # train return is earned by a param TRAJECTORY; if snapshots
        # collapse to constant-argmax while this average evals well, the
        # Q-function is oscillating around a good mean rather than
        # converging (train 29 vs eval 3.95 at the SAME epsilon).
        avg_start = int(n_disp * (1.0 - avg_last_frac))
        p_avg, n_avg = None, 0
        for i in range(n_disp):
            state, m = it(state)
            last = m
            if i >= avg_start:
                # Copy on first touch: `state` is donated into the next
                # dispatch, so aliasing its buffers would dangle.
                p_avg = (jax.tree_util.tree_map(jnp.copy, state.params)
                         if p_avg is None else
                         jax.tree_util.tree_map(jnp.add, p_avg,
                                                state.params))
                n_avg += 1
            done_iters = (i + 1) * chunk
            if eval_every and done_iters % eval_every == 0:
                out = policy_eval.evaluate_dqn(
                    cfg, state.params, jax.random.key(0), num_envs=64)
                ent = float(jnp.mean(m["action_entropy"])
                            if chunk > 1 else m["action_entropy"])
                point = {"iters": done_iters,
                         "greedy64": round(out["episode_return_mean"], 2),
                         "rps": round(out["reward_per_step"], 3),
                         "action_entropy": round(ent, 3)}
                rec["trace"].append(point)
                print(f"{name}@{done_iters}: {point}", flush=True)
        jax.block_until_ready(last)

        def _final(k):
            v = last[k]
            return float(v[-1] if chunk > 1 else v)

        rec["train_s"] = round(time.time() - t0, 1)
        rec["final_train_return"] = round(_final("episode_return"), 2)
        rec["final_reward"] = round(_final("reward"), 3)
        rec["final_action_entropy"] = round(_final("action_entropy"), 3)
        for eps, label in ((0.0, "greedy"), (0.05, "eps05")):
            out = policy_eval.evaluate_dqn(
                cfg, state.params, jax.random.key(0), num_envs=256,
                epsilon=eps)
            rec[f"eval_{label}"] = {
                k: round(v, 3) for k, v in out.items()}
        if n_avg:
            scale = 1.0 / n_avg
            p_mean = jax.tree_util.tree_map(lambda x: x * scale, p_avg)
            out = policy_eval.evaluate_dqn(
                cfg, p_mean, jax.random.key(0), num_envs=256, epsilon=0.0)
            rec["eval_greedy_avgparams"] = {
                k: round(v, 3) for k, v in out.items()}
            rec["avg_dispatches"] = n_avg
        # Target-network eval: under soft updates the target IS the Polyak
        # average (the deployable smoothed policy); under hard sync it is
        # a <=target_update_period-old snapshot — either way diagnostic
        # for the oscillation hypothesis.
        out = policy_eval.evaluate_dqn(
            cfg, state.target_params, jax.random.key(0), num_envs=256,
            epsilon=0.0)
        rec["eval_greedy_target"] = {k: round(v, 3) for k, v in out.items()}
        print(f"{name}: {json.dumps(rec)[:400]}", flush=True)
    except Exception:
        rec["error"] = traceback.format_exc()
        print(f"{name}: FAILED\n{rec['error']}", flush=True)
    return rec


def main():
    outfile = sys.argv[1] if len(sys.argv) > 1 else "results_r3/bisect_c4.json"
    base = msc.get_preset("c4")
    results = {}
    results["A_kernel_off"] = run_arm(
        "A kernel-off", base.override_str(["pallas_mha_block=false"]))
    results["B_no_carry"] = run_arm("B no-carry", base, carry_obs=False)
    results["C_r2_style"] = run_arm(
        "C r2-style", base.override_str(["pallas_mha_block=false"]),
        carry_obs=False, chunk=1)
    results["D_r3_trace"] = run_arm("D r3-trace", base, eval_every=1000)
    # Env-change arm: the r2->r3 env delta (curb returns in the LiDAR
    # scan) is in EVERY arm above; this one removes it. If A-D all
    # collapse and E learns, the collapse is the richer point cloud, not
    # the r3 execution stack.
    results["E_no_curbs"] = run_arm(
        "E no-curbs", base.override_str(["env.lidar_road=false"]))
    with open(outfile, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {outfile}")


if __name__ == "__main__":
    main()
