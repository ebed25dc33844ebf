"""A/B: f32 vs bf16-activation act path on env v2 (roofline follow-up).

The act path measures ~95% of HBM peak (scripts/roofline.py), so halving
activation bytes via bf16 is the one lever with 2x headroom. Round 1
measured bf16 LOSING (22.9k vs 38.1k on env v1) — this probe re-measures
on the v2 env with state threading (the tunnel dedups independent
identical dispatches; see BASELINE.md methodology note).

Usage: python scripts/bench_bf16_act.py [num_envs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from multimodal_sc_tpu.runtime.cache import enable_compilation_cache


def measure(cfg, num_envs: int, label: str) -> float:
    from multimodal_sc_tpu.rl import dqn as dqn_lib

    state = dqn_lib.init(cfg, jax.random.key(0), num_envs)
    iteration = dqn_lib.make_iteration(cfg, learn=False)
    state, m = iteration(state)
    jax.block_until_ready(m)
    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = iteration(state)
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    sps = iters * num_envs / dt
    print(f"{label}: {sps:,.0f} agent steps/s/chip "
          f"({dt/iters*1e3:.2f} ms/iter)", flush=True)
    return sps


def main() -> None:
    enable_compilation_cache()
    from multimodal_sc_tpu.config.presets import get_preset

    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    base = get_preset("c4")
    # Interleaved A/B/A/B to split tunnel drift from the effect.
    f32_a = measure(base, num_envs, "f32      (pass 1)")
    bf16_a = measure(base.override_str(["train.bf16=true"]), num_envs,
                     "bf16-act (pass 1)")
    f32_b = measure(base, num_envs, "f32      (pass 2)")
    bf16_b = measure(base.override_str(["train.bf16=true"]), num_envs,
                     "bf16-act (pass 2)")
    f32 = max(f32_a, f32_b)
    bf16 = max(bf16_a, bf16_b)
    print(f"ratio bf16/f32: {bf16 / f32:.3f}")


if __name__ == "__main__":
    main()
