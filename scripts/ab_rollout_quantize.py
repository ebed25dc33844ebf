"""Interleaved A/B: PPO rollout frame store f32 vs uint8 (rl.rollout_quantize).

The c5 update's biggest arrays are the (T,B,H,W,3) rollout image stack and
its per-minibatch gathers; uint8 storage cuts those bytes 4x (the same
lever that bought +22% on the DQN replay path — BASELINE.md). Measures
steady-state update wall over N updates, interleaved R rounds to cancel
drift (the r2/r3 A/B methodology).

Usage: python scripts/ab_rollout_quantize.py [updates_per_round] [rounds]
"""

from __future__ import annotations

import sys
import time

import jax

sys.path.insert(0, ".")
from multimodal_sc_tpu.runtime.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import multimodal_sc_tpu as msc  # noqa: E402
from multimodal_sc_tpu.rl import ppo as ppo_lib  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def make(quantize: bool):
    cfg = msc.get_preset("c5").override_str(
        [f"rl.rollout_quantize={str(quantize).lower()}"])
    state = ppo_lib.init(cfg, jax.random.key(0))
    step = ppo_lib.make_train_step(cfg)
    state, m = step(state)  # compile + warmup
    jax.block_until_ready(m["loss"])
    return cfg, state, step


def main():
    arms = {name: make(q) for name, q in (("f32", False), ("uint8", True))}
    env_steps = (arms["f32"][0].rl.rollout_length
                 * arms["f32"][0].rl.num_envs)
    for r in range(ROUNDS):
        for name in ("f32", "uint8"):
            cfg, state, step = arms[name]
            t0 = time.perf_counter()
            for _ in range(N):
                state, m = step(state)
            jax.block_until_ready(m["loss"])
            dt = time.perf_counter() - t0
            arms[name] = (cfg, state, step)
            print(f"round {r} {name}: {dt / N * 1e3:.1f} ms/update, "
                  f"{N * env_steps / dt / jax.device_count():.0f} "
                  f"env-steps/s/chip, loss {float(m['loss']):.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
