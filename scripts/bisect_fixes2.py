"""Stage-3 of the cold-c4 recipe hunt: combine + seed-check the winners.

Stage-2 fix arms (results_r3/bisect_fixes.json) found cold c4 was not
merely collapsing — it was badly under-tuned: lr 3e-4 (vs the 1e-3
default) evals greedy 84.0 and its last-20%-averaged params eval 112.2;
soft targets tau=0.02 eval 64.1 / avg 92.7. Both beat the r3 warm-start
production bar (30.0) by 2-3x. These arms pick the production recipe:

  J lr3e4+tau02  : both levers, seed 0 — do they compose?
  K lr3e4 s1     : lr winner on a second training seed (robustness)
  J s1           : combination on the second seed
  M lr1e4        : is even lower lr better, or is 3e-4 the knee?

Usage: python scripts/bisect_fixes2.py [outfile.json]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")
from scripts.bisect_c4 import run_arm  # noqa: E402  (enables compile cache)

import multimodal_sc_tpu as msc  # noqa: E402


def main():
    outfile = (sys.argv[1] if len(sys.argv) > 1
               else "results_r3/bisect_fixes2.json")
    base = msc.get_preset("c4")
    combo = base.override_str(["train.lr=0.0003", "rl.target_tau=0.02"])
    lr3 = base.override_str(["train.lr=0.0003"])
    results = {}
    results["J_lr3e4_tau02"] = run_arm("J lr3e4+tau02", combo)
    results["K_lr3e4_s1"] = run_arm("K lr3e4 s1", lr3, seed=1)
    results["J_lr3e4_tau02_s1"] = run_arm("J s1", combo, seed=1)
    results["M_lr1e4"] = run_arm(
        "M lr1e4", base.override_str(["train.lr=0.0001"]))
    with open(outfile, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {outfile}")


if __name__ == "__main__":
    main()
