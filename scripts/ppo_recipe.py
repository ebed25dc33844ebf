"""PPO (c5) learning-rate recipe study — does the c4 lesson transfer?

The cold-c4 collapse hunt (results_r3/collapse_investigation.md) ended
with: the TrainConfig.lr=1e-3 default was the whole story — at 1e-4 the
same budget trains policies 2-3x better. c5 trains at the SAME 1e-3
default (the preset never overrides lr), so this brackets the PPO knee:

  A lr3e4      : lr 3e-4, 150 updates (the production budget)
  B lr1e4      : lr 1e-4, 150 updates
  C lr3e4_300  : lr 3e-4, 300 updates (lower lr may need more budget)

Each arm evals greedy, sampled, and EMA-greedy (rl.ema_tau=0.02 preset
Polyak average) at 256 episodes, in-process from the live state — no
checkpoint plumbing. Reference arm (lr 1e-3, 150 updates) is the r3
baselines artifact: train 55.4, sampled 46.7 +/- 28.3, greedy 44.4.

Stage 2 (`--stage2`): seed-1 confirmation of the two winning lrs.
Stage-1 found 3e-4/1e-4 both beat 1e-3 at seed 0 on every deployment
mode; the collapse hunt's lesson (collapse_investigation.md) is that
recipe selection must use min-across-seeds, so the preset flip waits
for these.

Usage: python scripts/ppo_recipe.py [outfile.json] [--stage2]
"""

from __future__ import annotations

import json
import sys
import time

import jax

sys.path.insert(0, ".")
from multimodal_sc_tpu.runtime.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import multimodal_sc_tpu as msc  # noqa: E402
from multimodal_sc_tpu.evaluation import policy_eval  # noqa: E402
from multimodal_sc_tpu.rl import ppo as ppo_lib  # noqa: E402


def run_arm(name, cfg, updates, seed=0):
    rec = {"updates": updates, "lr": cfg.train.lr, "seed": seed}
    state = ppo_lib.init(cfg, jax.random.key(seed))
    step = ppo_lib.make_train_step(cfg)
    t0 = time.time()
    last = None
    for _ in range(updates):
        state, m = step(state)
        last = m
    jax.block_until_ready(last)
    rec["train_s"] = round(time.time() - t0, 1)
    rec["final_train_return"] = round(float(last["episode_return"]), 2)
    rec["final_entropy"] = round(float(last["entropy"]), 3)
    rec["final_v_loss"] = round(float(last["v_loss"]), 2)
    for label, params, greedy in (
            ("greedy", state.params, True),
            ("sampled", state.params, False),
            ("ema_greedy", state.ema_params, True)):
        out = policy_eval.evaluate_ppo(
            cfg, params, jax.random.key(0), num_envs=256, greedy=greedy)
        rec[f"eval_{label}"] = {k: round(v, 3) for k, v in out.items()}
    print(f"{name}: {json.dumps(rec)}", flush=True)
    return rec


def main():
    argv = [a for a in sys.argv[1:] if a != "--stage2"]
    stage2 = "--stage2" in sys.argv[1:]
    outfile = argv[0] if argv else "results_r3/ppo_recipe.json"
    base = msc.get_preset("c5").override_str(["rl.num_envs=64"])
    results = {}
    try:
        with open(outfile) as f:
            results = json.load(f)   # merge stage 2 into stage 1
    except FileNotFoundError:
        pass
    if stage2:
        results["D_lr3e4_s1"] = run_arm(
            "D lr3e4 s1", base.override_str(
                ["train.lr=0.0003", "train.seed=1"]), 150, seed=1)
        results["E_lr1e4_s1"] = run_arm(
            "E lr1e4 s1", base.override_str(
                ["train.lr=0.0001", "train.seed=1"]), 150, seed=1)
    else:
        results["A_lr3e4"] = run_arm(
            "A lr3e4", base.override_str(["train.lr=0.0003"]), 150)
        results["B_lr1e4"] = run_arm(
            "B lr1e4", base.override_str(["train.lr=0.0001"]), 150)
        results["C_lr3e4_300"] = run_arm(
            "C lr3e4 300u", base.override_str(["train.lr=0.0003"]), 300)
    with open(outfile, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {outfile}")


if __name__ == "__main__":
    main()
