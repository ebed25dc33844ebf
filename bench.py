"""Benchmark harness: fused camera+LiDAR agent steps/sec/chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
North star (BASELINE.json:2,5): >=10k fused camera+LiDAR agent steps/sec on
v5e-8; the reference publishes no numbers (BASELINE.md), so vs_baseline is
measured against the 10k-aggregate floor scaled to the visible chip count.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    import sys

    from multimodal_sc_tpu.runtime.cache import enable_compilation_cache

    enable_compilation_cache()
    from multimodal_sc_tpu.config.presets import get_preset
    from multimodal_sc_tpu.envs import driving
    from multimodal_sc_tpu.rl import dqn as dqn_lib

    # Flagship act path: config-4 fused perception + policy, vmapped envs.
    cfg = get_preset("c4")
    # A/B hooks for kernel experiments (the driver runs plain `python
    # bench.py`, which measures the production default).
    if "--pallas-attention" in sys.argv:
        cfg = cfg.override_str(["pallas_attention=true"])
    if "--no-pallas-attention" in sys.argv:
        cfg = cfg.override_str(["pallas_attention=false"])
    # 1024 parallel envs saturate the chip (measured: 23.5k steps/s/chip at
    # 256 envs -> 37.7k at 1024; 2048+ hits compile/HBM limits).
    num_envs = 1024
    key = jax.random.key(0)
    state = dqn_lib.init(cfg, key, num_envs)
    iteration = dqn_lib.make_iteration(cfg, learn=False)  # pure actor path

    # Warmup / compile.
    state, m = iteration(state)
    jax.block_until_ready(m)

    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = iteration(state)
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0

    n_chips = jax.device_count()
    steps_per_sec_per_chip = iters * num_envs / dt / n_chips
    # Floor target: 10k aggregate on 8 chips = 1250/chip (BASELINE.md).
    baseline_per_chip = 1250.0
    print(json.dumps({
        "metric": "fused_agent_steps_per_sec_per_chip",
        "value": round(steps_per_sec_per_chip, 1),
        "unit": "steps/s/chip",
        "vs_baseline": round(steps_per_sec_per_chip / baseline_per_chip, 3),
    }))


if __name__ == "__main__":
    main()
