"""Roofline accounting for the flagship fused iteration (act & act+learn).

Prints XLA's own cost analysis (FLOPs / bytes accessed) per iteration, the
arithmetic intensity, and the achieved fraction of the chip's peak given
the measured wall time — so 'speed-of-light' claims are grounded in
compiler-reported numbers, not guesses (VERDICT r1 item 6). Covers both the
act-only path (the north-star metric) and the full actor+learner iteration
(the regression number for the learner half), optionally with the Pallas
attention kernel enabled.

Usage: python scripts/roofline.py [num_envs] [--pallas]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# v5e (v5 lite) public peak numbers.
PEAK_BF16_FLOPS = 197e12
PEAK_F32_FLOPS = 98.5e12   # MXU fp32 ~ half of bf16
HBM_BW = 819e9             # bytes/s


def profile(cfg, num_envs: int, learn: bool, label: str) -> None:
    from multimodal_sc_tpu.rl import dqn as dqn_lib

    state = dqn_lib.init(cfg, jax.random.key(0), num_envs)
    iteration = dqn_lib.make_iteration(cfg, learn=learn)

    compiled = iteration.lower(state).compile()
    ca = compiled.cost_analysis()
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    state2, m = iteration(state)
    jax.block_until_ready(m)
    iters = 20
    t0 = time.perf_counter()
    s = state2
    for _ in range(iters):
        s, m = iteration(s)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / iters

    intensity = flops / max(bytes_acc, 1.0)
    achieved_flops = flops / dt
    achieved_bw = bytes_acc / dt
    ridge = PEAK_F32_FLOPS / HBM_BW

    print(f"== {label} (num_envs={num_envs}) ==")
    print(f"XLA flops / iteration   : {flops:.3e}")
    print(f"XLA bytes  / iteration  : {bytes_acc:.3e}")
    print(f"arithmetic intensity    : {intensity:.1f} flop/byte "
          f"(ridge ~{ridge:.0f} -> "
          f"{'compute' if intensity > ridge else 'memory'}-bound regime)")
    print(f"wall / iteration        : {dt*1e3:.2f} ms")
    print(f"achieved FLOP/s         : {achieved_flops:.3e} "
          f"({achieved_flops/PEAK_F32_FLOPS:.1%} of f32 peak)")
    print(f"achieved HBM bandwidth  : {achieved_bw:.3e} B/s "
          f"({achieved_bw/HBM_BW:.1%} of peak)")
    print(f"agent steps/sec/chip    : {num_envs/dt:.0f}")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    num_envs = int(args[0]) if args else 1024
    pallas = "--pallas" in sys.argv

    from multimodal_sc_tpu.config.presets import get_preset

    cfg = get_preset("c4")
    if pallas:
        cfg = cfg.override_str(["pallas_attention=true"])
    profile(cfg, num_envs, learn=False,
            label="act-only" + (" +pallas-attn" if pallas else ""))
    profile(cfg, num_envs, learn=True,
            label="act+learn" + (" +pallas-attn" if pallas else ""))


if __name__ == "__main__":
    main()
