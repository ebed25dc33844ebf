"""Policy evaluation: mean episode reward over N on-device episodes.

Spec: BASELINE.json:2 — "episode-reward parity" is one of the two parity
gates; the reference publishes no numbers (BASELINE.md), so this evaluator
CREATES the baseline: fixed seed, greedy policy, full episodes via
``lax.scan`` (no host round-trips).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from multimodal_sc_tpu.config.configs import ExperimentConfig
from multimodal_sc_tpu.envs import driving

Array = jax.Array

# act_fn(params, image, points, mask, key, v2x_off) -> int32 actions (B,)
ActFn = Callable[..., Array]


def _rollout_returns(
    cfg: ExperimentConfig, params, act_fn: ActFn, key: Array, num_envs: int,
) -> Dict[str, float]:
    """Shared episode-return rollout: accumulate reward to each env's FIRST
    done over cfg.env.max_steps, entirely on device.

    Deployment knobs that don't change the graph are RUNTIME arguments of
    the jitted rollout — the params tree (so every checkpoint/field of a
    config family reuses one compiled executable via the persistent cache),
    the fog range (inside the env states), and the V2X link offset — per
    VERDICT r3 item 5 (708 s recompiles per fog/V2X eval variant)."""
    k_env, k_run = jax.random.split(key)
    states = driving.reset_batch(cfg.env, k_env, num_envs)
    v2x_off = jnp.float32(cfg.channel.v2x_snr_offset_db)

    @jax.jit
    def rollout(params, states, key, v2x_off):
        def body(carry, _):
            states, key, ret, done_seen = carry
            key, k = jax.random.split(key)
            img, pts, mask = driving.observe_batch(cfg.env, states)
            a = act_fn(params, img, pts, mask, k, v2x_off)
            states, ts = driving.step_batch(cfg.env, states, a)
            ret = ret + ts.reward * (1.0 - done_seen)
            done_seen = jnp.maximum(done_seen, ts.done.astype(jnp.float32))
            return (states, key, ret, done_seen), ts.reward

        init = (states, key, jnp.zeros(num_envs), jnp.zeros(num_envs))
        (states, _, ret, done_seen), rewards = jax.lax.scan(
            body, init, None, length=cfg.env.max_steps)
        return ret, done_seen, rewards

    ret, done_seen, rewards = rollout(params, states, k_run, v2x_off)
    return {
        "episode_return_mean": float(jnp.mean(ret)),
        "episode_return_std": float(jnp.std(ret)),
        "episodes_terminated_frac": float(jnp.mean(done_seen)),
        "reward_per_step": float(jnp.mean(rewards)),
    }


def evaluate_dqn(cfg: ExperimentConfig, params, key: Array,
                 num_envs: int = 32,
                 epsilon: float = 0.0) -> Dict[str, float]:
    """DQN policy eval, episodes run to cfg.env.max_steps.

    ``epsilon=0`` is pure argmax. The standard DQN protocol (Atari) uses
    a small eval epsilon (0.05) because a cold-trained Q-function whose
    action gaps sit below its approximation error can collapse to a
    constant argmax — observed on the r3 cold c4 seed (BASELINE.md):
    greedy 3.9 vs the same checkpoint at eps 0.05 recovering the train
    behavior. Both modes are recorded; the gate states which it uses."""
    from multimodal_sc_tpu.rl import dqn as dqn_lib

    def act_fn(params, img, pts, mask, k, v2x_off):
        return dqn_lib.act(cfg, params, img, pts, mask, k,
                           epsilon=jnp.float32(epsilon),
                           v2x_offset_db=v2x_off)

    return _rollout_returns(cfg, params, act_fn, key, num_envs)


def evaluate_ppo(cfg: ExperimentConfig, params, key: Array,
                 num_envs: int = 32, greedy: bool = True,
                 temperature: float = 1.0) -> Dict[str, float]:
    """PPO policy (argmax or sampled), episodes to cfg.env.max_steps.

    ``temperature`` scales the sampling logits (sampled mode only): the
    deployment-sharpening study of VERDICT r4 item 7 — T=1 is the trained
    policy, T->0 approaches argmax; if return degrades monotonically as
    T -> 0, the policy's stochasticity is load-bearing and no
    deterministic deployment within the sampled band exists."""
    from multimodal_sc_tpu.rl.perception import ActorCritic

    ac = ActorCritic(cfg)
    inv_t = 1.0 / max(temperature, 1e-6)

    def act_fn(params, img, pts, mask, k, v2x_off):
        k_net, k_smp = jax.random.split(k)
        logits, _ = ac.apply({"params": params}, img, pts, mask, k_net,
                             v2x_offset_db=v2x_off)
        if greedy:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jax.random.categorical(k_smp, logits * inv_t).astype(
            jnp.int32)

    return _rollout_returns(cfg, params, act_fn, key, num_envs)
