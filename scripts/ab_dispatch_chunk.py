"""Interleaved A/B: per-step vs chunked dispatch for the JSCC-family and
PPO drivers (train.iters_per_dispatch, extended to all drivers in r3).

Short runs through the real drivers; the comparison metric is the
driver's own steady rate (first/compile dispatch and checkpoint IO
excluded by construction — train/jscc.py accounting). Two interleaved
rounds cancel tunnel drift (the r2/r3 A/B methodology).

Usage: python scripts/ab_dispatch_chunk.py [steps] [rounds]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")
from multimodal_sc_tpu.runtime.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import multimodal_sc_tpu as msc  # noqa: E402

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 300
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

ARMS = [
    # (name, preset, runner, steps, extra overrides)
    ("c1", "c1", "jscc", STEPS, []),
    ("c2", "c2", "jscc", STEPS, []),
    ("c3", "c3", "fusion_jscc", STEPS, ["train.batch_size=32"]),
    # PPO updates are 4096 env-steps each; 30 updates is plenty of signal.
    ("c5", "c5", "ppo", min(30, STEPS), ["rl.num_envs=64"]),
]


def run_arm(preset, runner, steps, extra, chunk):
    import importlib

    mod = importlib.import_module(f"multimodal_sc_tpu.train.{runner}")
    cfg = msc.get_preset(preset).override_str([
        f"train.steps={steps}", "train.log_every=1000000",
        "train.eval_every=1000000", f"train.iters_per_dispatch={chunk}",
        *extra,
    ])
    _, out = mod.run(cfg)
    return out.get("steady_steps_per_sec",
                   out.get("steady_steps_per_sec_per_chip"))


def main():
    results = {name: {"chunk1": [], "chunk50": []} for name, *_ in ARMS}
    for r in range(ROUNDS):
        for name, preset, runner, steps, extra in ARMS:
            for chunk, key in ((1, "chunk1"), (50, "chunk50")):
                rate = run_arm(preset, runner, steps, extra, chunk)
                results[name][key].append(rate)
                print(f"round {r} {name} chunk={chunk}: steady {rate}",
                      flush=True)
    for name in results:
        c1 = results[name]["chunk1"]
        c50 = results[name]["chunk50"]
        if all(c1) and all(c50):
            results[name]["ratio"] = round(
                (sum(c50) / len(c50)) / (sum(c1) / len(c1)), 3)
    print(json.dumps(results, indent=1))
    with open("results_r3/ab_dispatch_chunk.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
