"""Stage-4 of the cold-c4 recipe hunt: bracket the lr knee, seed-check.

Stage-3 (results_r3/bisect_fixes2.json): lr 1e-4 seed-0 greedy 108.8 /
avg-params 104.5 — better than lr 3e-4 (84.0) and than composing 3e-4
with tau=0.02 (48.0 s0 / 72.5 s1). Seed variance is +/-25, so the recipe
pick needs min-across-seeds, and the tau=0.02 arms' TARGET network was
the most seed-stable deployment (72.9/83.4). These arms finish the
bracket:

  M s1      : lr 1e-4 on the second seed
  N / N s1  : lr 1e-4 + tau 0.02 (Polyak target = deployable EMA), both seeds
  P         : lr 3e-5 — does even lower under-fit the 5000-iter budget?

Usage: python scripts/bisect_fixes3.py [outfile.json]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")
from scripts.bisect_c4 import run_arm  # noqa: E402  (enables compile cache)

import multimodal_sc_tpu as msc  # noqa: E402


def main():
    outfile = (sys.argv[1] if len(sys.argv) > 1
               else "results_r3/bisect_fixes3.json")
    base = msc.get_preset("c4")
    lr1 = base.override_str(["train.lr=0.0001"])
    combo = base.override_str(["train.lr=0.0001", "rl.target_tau=0.02"])
    results = {}
    results["M_lr1e4_s1"] = run_arm("M s1", lr1, seed=1)
    results["N_lr1e4_tau02"] = run_arm("N lr1e4+tau02", combo)
    results["N_lr1e4_tau02_s1"] = run_arm("N s1", combo, seed=1)
    results["P_lr3e5"] = run_arm(
        "P lr3e5", base.override_str(["train.lr=0.00003"]))
    with open(outfile, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {outfile}")


if __name__ == "__main__":
    main()
