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
    # A/B hooks for kernel / byte experiments (the driver runs plain
    # `python bench.py`, which measures the production default).
    if "--pallas-attention" in sys.argv:
        cfg = cfg.override_str(["pallas_attention=true"])
    if "--no-pallas-attention" in sys.argv:
        cfg = cfg.override_str(["pallas_attention=false"])
    if "--mha-block" in sys.argv:
        cfg = cfg.override_str(["pallas_mha_block=true"])
    if "--no-mha-block" in sys.argv:   # A/B arm vs the (now default-on)
        cfg = cfg.override_str(["pallas_mha_block=false"])  # fused block
    if "--vq" in sys.argv:             # digital control path A/B arm:
        # camera branch = codebook indices over QPSK (rl/perception.py
        # arch="vq") instead of analog symbols.
        cfg = cfg.override_str(["camera.arch=vq"])
    carry_obs = "--no-carry-obs" not in sys.argv   # r2-behavior A/B arm
    # 1024 parallel envs saturate the chip (measured: 23.5k steps/s/chip at
    # 256 envs -> 37.7k at 1024; 2048+ hits compile/HBM limits).
    num_envs = 1024
    key = jax.random.key(0)
    state = dqn_lib.init(cfg, key, num_envs)
    iteration = dqn_lib.make_iteration(cfg, learn=False, carry_obs=carry_obs)

    def timed_round(it, state, envs, iters=30):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = it(state)
        jax.block_until_ready(m)
        return state, iters * envs / (time.perf_counter() - t0)

    n_chips = jax.device_count()
    it_act = iteration
    it_learn = dqn_lib.make_iteration(cfg, learn=True, carry_obs=carry_obs)

    # Warmup/compile both graphs, then time R interleaved rounds per
    # metric (act, learn, act, learn, ...) and report the MEDIAN — the
    # one-shot r3 bench read ~1% below the interleaved-A/B means the
    # BASELINE.md gates were calibrated on, purely from tunnel run-to-run
    # variance (VERDICT r3 weak 1). Interleaving makes both metrics see
    # the same drift; the median rejects a single tunnel hiccup; the
    # recorded spread documents the noise the regression gate must clear.
    # Rounds thread state output->input: back-to-back identical dispatches
    # get deduplicated by the tunnel (BASELINE.md measurement methodology).
    # r5 (VERDICT r4 weak 3 / item 9): FIVE rounds instead of three — the
    # r4 in-bench act spread (5.8% peak-to-peak) exceeded the 4% gate
    # margin, so a median-of-3 could still be flipped by two hiccups in
    # one bench. Timing cost of the extra rounds is ~4 s against the
    # ~10 min compile-dominated bench wall; the median of 5 rejects two
    # bad rounds. act+learn (spread ~0.5%) is the PRIMARY regression
    # signal per BASELINE.md; the act gate keeps its 4% margin.
    for it in (it_act, it_learn):
        state, m = it(state)
        jax.block_until_ready(m)
    rounds = 5
    act_r, al_r = [], []
    for _ in range(rounds):
        state, r = timed_round(it_act, state, num_envs)
        act_r.append(r / n_chips)
        state, r = timed_round(it_learn, state, num_envs)
        al_r.append(r / n_chips)
    act_sps = sorted(act_r)[rounds // 2]
    al_sps = sorted(al_r)[rounds // 2]

    # Floor target: 10k aggregate on 8 chips = 1250/chip (BASELINE.md).
    baseline_per_chip = 1250.0
    print(json.dumps({
        "metric": "fused_agent_steps_per_sec_per_chip",
        "value": round(act_sps, 1),
        "unit": "steps/s/chip",
        "vs_baseline": round(act_sps / baseline_per_chip, 3),
        "act_learn_steps_per_sec_per_chip": round(al_sps, 1),
        "act_rounds": [round(r, 1) for r in act_r],
        "act_learn_rounds": [round(r, 1) for r in al_r],
        "act_spread": round(max(act_r) - min(act_r), 1),
        "act_learn_spread": round(max(al_r) - min(al_r), 1),
    }))


if __name__ == "__main__":
    main()
