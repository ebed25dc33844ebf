"""Stage-2 of the cold-c4 collapse hunt: candidate stabilizers.

Runs AFTER scripts/bisect_c4.py localizes the failure. Each arm is a cold
config-4 run at the full budget with the same eval battery (greedy /
eps05 / averaged-params). If the stage-1 avg-params probe shows an
oscillating Q-function (avg >> snapshot), these are the standard damping
levers; whichever arm restores cold greedy >= the warm bar becomes the
recommended cold recipe in BASELINE.md.

Arms:
  F tau=0.005 : soft (Polyak) target updates (rl.target_tau)
  G tau=0.02  : faster soft target (less lag, more chase)
  H lr=3e-4   : lower Adam lr (damps the TD chatter directly)

Usage: python scripts/bisect_fixes.py [outfile.json]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")
from scripts.bisect_c4 import run_arm  # noqa: E402  (enables compile cache)

import multimodal_sc_tpu as msc  # noqa: E402


def main():
    outfile = sys.argv[1] if len(sys.argv) > 1 else "results_r3/bisect_fixes.json"
    base = msc.get_preset("c4")
    results = {}
    results["F_tau_005"] = run_arm(
        "F tau=0.005", base.override_str(["rl.target_tau=0.005"]),
        eval_every=1000)
    results["G_tau_02"] = run_arm(
        "G tau=0.02", base.override_str(["rl.target_tau=0.02"]))
    results["H_lr_3e4"] = run_arm(
        "H lr=3e-4", base.override_str(["train.lr=0.0003"]))
    with open(outfile, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {outfile}")


if __name__ == "__main__":
    main()
