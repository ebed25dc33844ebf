"""Policy evaluation: mean episode reward over N on-device episodes.

Spec: BASELINE.json:2 — "episode-reward parity" is one of the two parity
gates; the reference publishes no numbers (BASELINE.md), so this evaluator
CREATES the baseline: fixed seed, greedy policy, full episodes via
``lax.scan`` (no host round-trips).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from multimodal_sc_tpu.config.configs import ExperimentConfig
from multimodal_sc_tpu.envs import driving

Array = jax.Array


def evaluate_dqn(cfg: ExperimentConfig, params, key: Array,
                 num_envs: int = 32) -> Dict[str, float]:
    """Greedy DQN policy, episodes run to cfg.env.max_steps."""
    from multimodal_sc_tpu.rl import dqn as dqn_lib

    k_env, k_run = jax.random.split(key)
    states = driving.reset_batch(cfg.env, k_env, num_envs)

    @jax.jit
    def rollout(states, key):
        def body(carry, _):
            states, key, ret, done_seen = carry
            key, k = jax.random.split(key)
            img, pts, mask = driving.observe_batch(cfg.env, states)
            a = dqn_lib.act(cfg, params, img, pts, mask, k,
                            epsilon=jnp.float32(0.0))
            states, ts = driving.step_batch(cfg.env, states, a)
            # Accumulate reward only until each env's FIRST done.
            ret = ret + ts.reward * (1.0 - done_seen)
            done_seen = jnp.maximum(done_seen, ts.done.astype(jnp.float32))
            return (states, key, ret, done_seen), ts.reward

        init = (states, key, jnp.zeros(num_envs), jnp.zeros(num_envs))
        (states, _, ret, done_seen), rewards = jax.lax.scan(
            body, init, None, length=cfg.env.max_steps)
        return ret, done_seen, rewards

    ret, done_seen, rewards = rollout(states, k_run)
    return {
        "episode_return_mean": float(jnp.mean(ret)),
        "episode_return_std": float(jnp.std(ret)),
        "episodes_terminated_frac": float(jnp.mean(done_seen)),
        "reward_per_step": float(jnp.mean(rewards)),
    }


def evaluate_ppo(cfg: ExperimentConfig, params, key: Array,
                 num_envs: int = 32, greedy: bool = True) -> Dict[str, float]:
    """PPO policy (argmax or sampled), episodes to cfg.env.max_steps."""
    from multimodal_sc_tpu.rl.perception import ActorCritic

    k_env, k_run = jax.random.split(key)
    states = driving.reset_batch(cfg.env, k_env, num_envs)
    ac = ActorCritic(cfg)

    @jax.jit
    def rollout(states, key):
        def body(carry, _):
            states, key, ret, done_seen = carry
            key, k_net, k_smp = jax.random.split(key, 3)
            img, pts, mask = driving.observe_batch(cfg.env, states)
            logits, _ = ac.apply({"params": params}, img, pts, mask, k_net)
            if greedy:
                a = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                a = jax.random.categorical(k_smp, logits).astype(jnp.int32)
            states, ts = driving.step_batch(cfg.env, states, a)
            ret = ret + ts.reward * (1.0 - done_seen)
            done_seen = jnp.maximum(done_seen, ts.done.astype(jnp.float32))
            return (states, key, ret, done_seen), ts.reward

        init = (states, key, jnp.zeros(num_envs), jnp.zeros(num_envs))
        (states, _, ret, done_seen), rewards = jax.lax.scan(
            body, init, None, length=cfg.env.max_steps)
        return ret, done_seen, rewards

    ret, done_seen, rewards = rollout(states, k_run)
    return {
        "episode_return_mean": float(jnp.mean(ret)),
        "episode_return_std": float(jnp.std(ret)),
        "episodes_terminated_frac": float(jnp.mean(done_seen)),
        "reward_per_step": float(jnp.mean(rewards)),
    }
