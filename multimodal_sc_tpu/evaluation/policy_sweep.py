"""Policy robustness vs channel quality: episode return across an SNR sweep.

The JSCC sweeps (evaluation/snr_sweep.py) measure RECONSTRUCTION vs SNR;
this measures the thing the system exists for — closed-loop episode return
of the deployed DQN/PPO agent as the channel its perception runs over
degrades (BASELINE.json:2's episode-reward metric × BASELINE.json:8's
sweep protocol). The semantic-communication headline curve: a policy
trained at one SNR should degrade gracefully, not cliff, as the deployed
channel departs from the training point.

TPU-shaped: per channel kind the rollout is jitted ONCE with the SNR as a
dynamic scalar argument (the channel math is snr-polymorphic; only the
kind string changes the graph), so a 7-point sweep costs one compile, not
seven. Every sweep point reuses the same env-reset and action keys —
paired evaluation, so curve differences are channel effects, not reseeded
episode noise.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp

from multimodal_sc_tpu.config.configs import ExperimentConfig
from multimodal_sc_tpu.envs import driving

Array = jax.Array

DEFAULT_SNRS = (-5.0, 0.0, 5.0, 10.0, 15.0, 20.0, 25.0)


def _sweep_one_kind(cfg: ExperimentConfig, params, act_fn, key: Array,
                    num_envs: int, snrs: Sequence[float]) -> List[Dict]:
    """Rollout `num_envs` full episodes at each SNR; one compile for all.
    Params, fog range (in the env states), and the V2X link offset are
    runtime args too, so checkpoints and fog/V2X deployment variants of a
    config family share the executable (VERDICT r3 item 5).

    ``act_fn`` returns ``(action, stats)`` where stats is a (possibly
    empty) dict of per-step scalars — e.g. the HARQ adaptive-bandwidth
    accounting (r5, VERDICT r4 item 4) — accumulated over the rollout and
    reported as per-step means in each row."""
    k_env, k_run = jax.random.split(key)
    states0 = driving.reset_batch(cfg.env, k_env, num_envs)
    v2x_off = jnp.float32(cfg.channel.v2x_snr_offset_db)
    img0, pts0, mask0 = driving.observe_batch(cfg.env, states0)
    _, stats0 = jax.eval_shape(
        act_fn, params, img0, pts0, mask0, jax.random.key(0),
        jnp.zeros((num_envs,), jnp.float32), v2x_off)
    zero_stats = jax.tree_util.tree_map(
        lambda x: jnp.zeros(x.shape, x.dtype), stats0)

    @jax.jit
    def rollout(params, states, key, snr_db, v2x_off):
        snr_vec = jnp.full((num_envs,), snr_db, jnp.float32)

        def body(carry, _):
            states, key, ret, done_seen, acc = carry
            key, k = jax.random.split(key)
            img, pts, mask = driving.observe_batch(cfg.env, states)
            a, stats = act_fn(params, img, pts, mask, k, snr_vec, v2x_off)
            acc = jax.tree_util.tree_map(lambda a_, b: a_ + b, acc, stats)
            states, ts = driving.step_batch(cfg.env, states, a)
            ret = ret + ts.reward * (1.0 - done_seen)
            done_seen = jnp.maximum(done_seen, ts.done.astype(jnp.float32))
            return (states, key, ret, done_seen, acc), ts.reward

        init = (states, key, jnp.zeros(num_envs), jnp.zeros(num_envs),
                zero_stats)
        (_, _, ret, done_seen, acc), rewards = jax.lax.scan(
            body, init, None, length=cfg.env.max_steps)
        return ret, done_seen, rewards, acc

    rows = []
    for snr in snrs:
        ret, done_seen, rewards, acc = rollout(params, states0, k_run,
                                               jnp.float32(snr), v2x_off)
        row = {
            "snr_db": float(snr),
            "episode_return_mean": float(jnp.mean(ret)),
            "episode_return_std": float(jnp.std(ret)),
            "episodes_terminated_frac": float(jnp.mean(done_seen)),
            "reward_per_step": float(jnp.mean(rewards)),
        }
        for name, v in acc.items():
            row[name] = float(v) / cfg.env.max_steps
        rows.append(row)
    return rows


def policy_snr_sweep(
    cfg: ExperimentConfig, params, key: Array,
    snrs: Sequence[float] = DEFAULT_SNRS,
    kinds: Sequence[str] = ("awgn", "rayleigh"),
    num_envs: int = 256,
    epsilon: float = 0.0,
    sample: bool = False,
) -> Dict[str, List[Dict]]:
    """Return-vs-SNR curves for the config's policy (cfg.rl.algo picks the
    head). ``epsilon`` is the DQN eval epsilon; ``sample`` switches PPO
    from argmax to sampled actions. The deployed channel kind/SNR override
    the training-time config; everything else (modulation, normalization)
    deploys as configured."""
    # Link accounting (r5): under channel.harq the perception trunk sows
    # the adaptive-bandwidth numbers per link call; the rollout pulls them
    # through mutable=["intermediates"] and the rows report per-step
    # means (`link_syms_per_step` sums the camera + LiDAR + V2X links).
    collect_link = cfg.channel.harq

    def _link_stats(col) -> Dict:
        per = col["intermediates"]["perception"]
        syms = list(per.get("harq_syms", ()))
        if "cam_vq" in per:
            syms += list(per["cam_vq"].get("harq_syms", ()))
        rounds = list(per.get("harq_rounds", ()))
        resid = list(per.get("harq_resid", ()))
        return {
            "link_syms_per_step": sum(syms),
            "harq_mean_rounds": (sum(rounds) / max(len(rounds), 1)),
            "harq_residual_fail_rate": (sum(resid) / max(len(resid), 1)),
        }

    curves: Dict[str, List[Dict]] = {}
    for kind in kinds:
        cfg_k = cfg.override_str([f"channel.kind={kind}"])
        if cfg.rl.algo == "ppo":
            from multimodal_sc_tpu.rl.perception import ActorCritic

            ac = ActorCritic(cfg_k)

            def act_fn(params, img, pts, mask, k, snr_vec, v2x_off, ac=ac):
                k_net, k_smp = jax.random.split(k)
                stats = {}
                if collect_link:
                    (logits, _), col = ac.apply(
                        {"params": params}, img, pts, mask, k_net,
                        snr_db=snr_vec, v2x_offset_db=v2x_off,
                        mutable=["intermediates"])
                    stats = _link_stats(col)
                else:
                    logits, _ = ac.apply({"params": params}, img, pts, mask,
                                         k_net, snr_db=snr_vec,
                                         v2x_offset_db=v2x_off)
                if sample:
                    a = jax.random.categorical(k_smp, logits)
                else:
                    a = jnp.argmax(logits, axis=-1)
                return a.astype(jnp.int32), stats
        else:
            from multimodal_sc_tpu.rl.perception import QNetwork

            net = QNetwork(cfg_k)
            n_actions = cfg.rl.num_actions

            def act_fn(params, img, pts, mask, k, snr_vec, v2x_off, net=net,
                       n_actions=n_actions):
                k_net, k_eps, k_rand = jax.random.split(k, 3)
                stats = {}
                if collect_link:
                    q, col = net.apply(
                        {"params": params}, img, pts, mask, k_net,
                        snr_db=snr_vec, v2x_offset_db=v2x_off,
                        mutable=["intermediates"])
                    stats = _link_stats(col)
                else:
                    q = net.apply({"params": params}, img, pts, mask, k_net,
                                  snr_db=snr_vec, v2x_offset_db=v2x_off)
                greedy = jnp.argmax(q, axis=-1)
                rand = jax.random.randint(k_rand, greedy.shape, 0, n_actions)
                explore = jax.random.uniform(k_eps, greedy.shape) < epsilon
                return (jnp.where(explore, rand, greedy).astype(jnp.int32),
                        stats)

        curves[kind] = _sweep_one_kind(cfg_k, params, act_fn, key,
                                       num_envs, snrs)
    return curves


def format_table(curves: Dict[str, List[Dict]],
                 metric: str = "episode_return_mean") -> str:
    kinds = sorted(curves)
    snrs = [r["snr_db"] for r in curves[kinds[0]]]
    lines = ["SNR(dB)  " + "  ".join(f"{k:>12s}" for k in kinds)]
    for i, snr in enumerate(snrs):
        vals = "  ".join(f"{curves[k][i][metric]:12.2f}" for k in kinds)
        lines.append(f"{snr:7.1f}  {vals}")
    return "\n".join(lines)


def save_curves(curves, path: str) -> None:
    import json

    with open(path, "w") as f:
        json.dump(curves, f, indent=1)
