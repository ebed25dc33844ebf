"""PPO actor-critic over the semantic-communication perception trunk.

Spec: BASELINE.json:5,:11 ("Closed-loop PPO driving agent (CARLA-style env)
with end-to-end semantic-comm on a TPU mesh"). Reference repo has no RL code
(``/root/reference/README.md:1-2``).

Design (SURVEY.md §3.2d): one jitted ``train_step`` containing the whole
update — rollout as ``lax.scan`` of env.step ∘ act (closed loop, on-device),
GAE as a reverse scan, then clipped-surrogate minibatch epochs as nested
scans over permuted indices. No host round-trips anywhere in the update.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from multimodal_sc_tpu.config.configs import ExperimentConfig
from multimodal_sc_tpu.envs import driving
from multimodal_sc_tpu.rl.gae import gae
from multimodal_sc_tpu.rl.perception import ActorCritic
from multimodal_sc_tpu.rl.replay import dequantize_frame, quantize_frame

Array = jax.Array


class PPOState(NamedTuple):
    params: Any
    ema_params: Any        # Polyak-averaged params (rl.ema_tau>0), one lerp
    # per UPDATE — the deployment policy, mirroring DQNState.ema_params
    # (collapse_investigation.md: the param trajectory's mean out-evals
    # endpoint snapshots); frozen at the init copy when rl.ema_tau == 0.
    opt_state: Any
    env_states: Any
    key: Array
    update: Array          # () int32 update counter
    ep_return: Array       # (B,)
    last_return: Array     # (B,)


class Rollout(NamedTuple):
    image: Array           # (T, B, H, W, 3)
    points: Array          # (T, B, N, 4)
    mask: Array            # (T, B, N)
    action: Array          # (T, B)
    logp: Array            # (T, B)
    value: Array           # (T, B)
    reward: Array          # (T, B)
    done: Array            # (T, B)
    snr_db: Array          # (T, B) deployed SNR each transition was acted
    # under (channel.random_snr draws; the config constant otherwise) —
    # the loss re-forwards under the SAME link conditions (fresh noise,
    # same SNR: the SNR is an environment condition, not noise).


def make_optimizer(cfg: ExperimentConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip),
        optax.adam(cfg.train.lr),
    )


def init_params(cfg: ExperimentConfig, key: Array):
    """Actor-critic params alone (e.g. as a raw-restore target for eval)
    — no env states or accumulators allocated. Splits `key` exactly like
    :func:`init`, so the same seed yields the same fresh network either
    way (param values depend only on the init rng, not on the example
    observation)."""
    _, k_par, _ = jax.random.split(key, 3)
    env_states = driving.reset_batch(cfg.env, jax.random.key(0), 1)
    img, pts, mask = driving.observe_batch(cfg.env, env_states)
    return ActorCritic(cfg).init(k_par, img, pts, mask,
                                 jax.random.key(0))["params"]


def init(cfg: ExperimentConfig, key: Array) -> PPOState:
    k_env, k_par, k_state = jax.random.split(key, 3)
    env_states = driving.reset_batch(cfg.env, k_env, cfg.rl.num_envs)
    img, pts, mask = driving.observe_batch(cfg.env, env_states)
    params = init_params(cfg, key)
    opt_state = make_optimizer(cfg).init(params)
    zeros = jnp.zeros((cfg.rl.num_envs,), jnp.float32)
    # Distinct buffer: the jitted update donates the whole state and XLA
    # rejects donating the same buffer twice (see rl/dqn.py init).
    ema_params = jax.tree_util.tree_map(jnp.copy, params)
    return PPOState(params=params, ema_params=ema_params,
                    opt_state=opt_state, env_states=env_states,
                    key=k_state, update=jnp.int32(0), ep_return=zeros,
                    last_return=jnp.copy(zeros))


def act(cfg: ExperimentConfig, params, image, points, mask, key,
        snr_db=None):
    """Sample (action, logp, value) — public API verb for PPO.

    ``snr_db`` (optional (B,)): per-env deployed channel SNR — defaults
    to the config constant inside the trunk."""
    k_net, k_smp = jax.random.split(key)
    logits, value = ActorCritic(cfg).apply(
        {"params": params}, image, points, mask, k_net, snr_db=snr_db)
    action = jax.random.categorical(k_smp, logits)
    logp = jax.nn.log_softmax(logits)[
        jnp.arange(logits.shape[0]), action]
    return action.astype(jnp.int32), logp, value


def _sample_snr(cfg: ExperimentConfig, key: Array, batch: int) -> Array:
    """Per-env deployed-SNR vector: uniform in [snr_min_db, snr_max_db]
    under channel.random_snr, else the config constant."""
    if not cfg.channel.random_snr:
        return jnp.full((batch,), cfg.channel.snr_db, jnp.float32)
    return jax.random.uniform(
        key, (batch,), minval=cfg.channel.snr_min_db,
        maxval=cfg.channel.snr_max_db)


def _collect_rollout(cfg: ExperimentConfig, params, env_states, ep_return,
                     last_return, key):
    def step_fn(carry, _):
        env_states, ep_ret, last_ret, key = carry
        key, k_act, = jax.random.split(key)
        img, pts, mask = driving.observe_batch(cfg.env, env_states)
        # Per-env deployed SNR (channel.random_snr) — folded off k_act so
        # the key stream is untouched when the flag is off.
        snr = _sample_snr(cfg, jax.random.fold_in(k_act, 0x57A2),
                          img.shape[0])
        action, logp, value = act(cfg, params, img, pts, mask, k_act,
                                  snr_db=snr)
        env_states, ts = driving.step_batch(cfg.env, env_states, action)
        ep_ret = ep_ret + ts.reward
        last_ret = jnp.where(ts.done, ep_ret, last_ret)
        ep_ret = jnp.where(ts.done, 0.0, ep_ret)
        # Store the frame at replay dtype: uint8 under rl.rollout_quantize
        # cuts the (T,B,H,W,3) stack and its minibatch gathers to 1/4 the
        # bytes; acting above used the full-precision render.
        store = quantize_frame(img) if cfg.rl.rollout_quantize else img
        out = Rollout(image=store, points=pts, mask=mask, action=action,
                      logp=logp, value=value, reward=ts.reward, done=ts.done,
                      snr_db=snr)
        return (env_states, ep_ret, last_ret, key), out

    (env_states, ep_return, last_return, key), rollout = jax.lax.scan(
        step_fn, (env_states, ep_return, last_return, key), None,
        length=cfg.rl.rollout_length)
    return env_states, ep_return, last_return, key, rollout


def _ppo_loss(params, batch, cfg: ExperimentConfig, key: Array,
              entropy_coef):
    if cfg.pallas_mha_block and cfg.mha_block_kernel:
        # Differentiated context — XLA twin on the same packed param tree
        # (see rl/dqn.py:_td_loss; kernel stays on the fwd-only rollout).
        cfg = cfg.override(mha_block_kernel=False)
    vq_loss = None
    reseed_stats = {}
    # BEV token pruning (lidar.vq_prune, r5): random per-example kept
    # fractions in the loss forwards (see rl/dqn.py:_td_loss).
    keep = None
    if cfg.lidar.vq_prune:
        keep = jax.random.uniform(
            jax.random.fold_in(key, 0x6EEA), (batch["image"].shape[0],),
            minval=cfg.lidar.vq_keep_min, maxval=1.0)
    if cfg.camera.arch == "vq" or cfg.lidar.arch == "vq":
        # VQ codebook+commitment losses sown by the trunk, one per
        # digital branch call (see rl/dqn.py:_td_loss — the PPO
        # surrogate's STE gradients never move the codebooks either).
        from multimodal_sc_tpu.rl.perception import collect_reseed_stats

        (logits, value), col = ActorCritic(cfg).apply(
            {"params": params}, dequantize_frame(batch["image"]),
            batch["points"], batch["mask"], key, snr_db=batch["snr"],
            lidar_keep=keep, mutable=["intermediates"])
        vq_loss = sum(col["intermediates"]["perception"]["vq_loss"])
        reseed_stats = jax.lax.stop_gradient(
            collect_reseed_stats(cfg, col["intermediates"]))
    else:
        logits, value = ActorCritic(cfg).apply(
            {"params": params}, dequantize_frame(batch["image"]),
            batch["points"], batch["mask"], key, snr_db=batch["snr"])
    logp_all = jax.nn.log_softmax(logits)
    logp = jnp.take_along_axis(logp_all, batch["action"][:, None],
                               axis=-1)[:, 0]
    ratio = jnp.exp(logp - batch["logp"])
    adv = batch["adv"]
    adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)
    clipped = jnp.clip(ratio, 1 - cfg.rl.clip_eps, 1 + cfg.rl.clip_eps)
    pg_loss = -jnp.mean(jnp.minimum(ratio * adv, clipped * adv))
    v_loss = 0.5 * jnp.mean((value - batch["ret"]) ** 2)
    entropy = -jnp.mean(jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1))
    total = (pg_loss + cfg.rl.value_coef * v_loss
             - entropy_coef * entropy)
    if cfg.rl.entropy_floor > 0:
        # Hinge entropy floor (r5, VERDICT r4 item 3): inactive above the
        # floor — healthy seeds train unchanged — and pushes back only
        # when the policy starts collapsing below it.
        total = total + cfg.rl.entropy_floor_coef * jax.nn.relu(
            cfg.rl.entropy_floor - entropy)
    if vq_loss is not None:
        total = total + cfg.rl.vq_loss_coef * vq_loss
    return total, {"pg_loss": pg_loss, "v_loss": v_loss, "entropy": entropy,
                   "reseed_stats": reseed_stats}


def _entropy_coef(cfg: ExperimentConfig, update: Array) -> Array:
    """Entropy coefficient at `update`: constant, or linearly annealed to
    rl.entropy_coef_final over train.steps updates (sharpens the policy so
    short runs eval well greedily — r3 experiment, BASELINE.md)."""
    c0 = cfg.rl.entropy_coef
    c1 = cfg.rl.entropy_coef_final
    if c1 < 0:
        return jnp.float32(c0)
    frac = jnp.clip(update.astype(jnp.float32)
                    / max(1, cfg.train.steps - 1), 0.0, 1.0)
    return jnp.float32(c0) + frac * (c1 - c0)


def shard_state(state: PPOState, mesh, tp: bool = True) -> PPOState:
    """Place a PPOState on a mesh: envs/accumulators over `data`, params
    TP-sharded over `model` (when tp and the axis exists), rest replicated.
    Degrades to a no-op layout on a 1x1 mesh. Used by the train driver and
    the multichip dry run (BASELINE.json:5 'sharded over a TPU mesh')."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodal_sc_tpu.runtime import mesh as mesh_lib
    from multimodal_sc_tpu.runtime.tp import apply_tp

    repl = NamedSharding(mesh, P())

    def data_sh(ndim):
        return NamedSharding(
            mesh, P(mesh_lib.DATA_AXIS, *([None] * (ndim - 1))))

    def shard_env_leaf(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, data_sh(x.ndim))
        return jax.device_put(x, repl)

    use_tp = tp and mesh.shape.get(mesh_lib.MODEL_AXIS, 1) > 1
    params = (apply_tp(state.params, mesh) if use_tp
              else jax.device_put(state.params, repl))
    ema_params = (apply_tp(state.ema_params, mesh) if use_tp
                  else jax.device_put(state.ema_params, repl))
    return PPOState(
        params=params,
        ema_params=ema_params,
        opt_state=jax.device_put(state.opt_state, repl),
        env_states=jax.tree_util.tree_map(shard_env_leaf, state.env_states),
        key=jax.device_put(state.key, repl),
        update=jax.device_put(state.update, repl),
        ep_return=jax.device_put(state.ep_return, data_sh(1)),
        last_return=jax.device_put(state.last_return, data_sh(1)),
    )


def _update_body(cfg: ExperimentConfig):
    """Un-jitted full PPO update (rollout + GAE + minibatch epochs);
    shared by the per-update and chunked dispatch paths."""
    tx = make_optimizer(cfg)
    T, B = cfg.rl.rollout_length, cfg.rl.num_envs
    n_mb = cfg.rl.num_minibatches
    if (T * B) % n_mb != 0:
        raise ValueError(
            f"rollout_length*num_envs ({T}*{B}) must be divisible by "
            f"num_minibatches ({n_mb}); the tail would be silently dropped")
    mb_size = (T * B) // n_mb

    def train_step(state: PPOState):
        key, k_roll, k_last, k_perm = jax.random.split(state.key, 4)
        ent_coef = _entropy_coef(cfg, state.update)

        env_states, ep_return, last_return, _, ro = _collect_rollout(
            cfg, state.params, state.env_states, state.ep_return,
            state.last_return, k_roll)

        # Bootstrap value of the final state (fresh SNR draw under
        # channel.random_snr, like any other transition).
        img, pts, mask = driving.observe_batch(cfg.env, env_states)
        snr_last = _sample_snr(cfg, jax.random.fold_in(k_last, 0x57A2),
                               img.shape[0])
        _, _, last_value = act(cfg, state.params, img, pts, mask, k_last,
                               snr_db=snr_last)

        adv, ret = gae(ro.reward, ro.value, ro.done, last_value,
                       cfg.rl.gamma, cfg.rl.gae_lambda)

        flat = {
            "image": ro.image.reshape(T * B, *ro.image.shape[2:]),
            "points": ro.points.reshape(T * B, *ro.points.shape[2:]),
            "mask": ro.mask.reshape(T * B, *ro.mask.shape[2:]),
            "action": ro.action.reshape(T * B),
            "logp": ro.logp.reshape(T * B),
            "adv": adv.reshape(T * B),
            "ret": ret.reshape(T * B),
            "snr": ro.snr_db.reshape(T * B),
        }

        def epoch_fn(carry, k_epoch):
            params, opt_state = carry
            k_mix, k_loss_e = jax.random.split(k_epoch)
            perm = jax.random.permutation(k_mix, T * B)

            def mb_fn(carry, i):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, i * mb_size, mb_size)
                batch = {k: v[idx] for k, v in flat.items()}
                # Fresh channel-noise key per (epoch, minibatch). The loss
                # recomputes log-probs under RESAMPLED observation noise, so
                # the clipped ratio mixes policy change with noise change
                # even at the first update — an accepted bias (the policy is
                # optimized in expectation over the channel; reusing the
                # rollout keys would overfit to one noise draw).
                k_i = jax.random.fold_in(k_loss_e, i)
                (loss, aux), grads = jax.value_and_grad(
                    lambda p: _ppo_loss(p, batch, cfg, k_i, ent_coef),
                    has_aux=True)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                rs = aux.pop("reseed_stats")
                if rs:
                    # Dead-code re-seeding per minibatch step (r5 usage
                    # fix; key from the state's PRNG stream — resume-
                    # deterministic, replicated under GSPMD).
                    from multimodal_sc_tpu.rl.perception import (
                        apply_codebook_reseed,
                    )

                    params = apply_codebook_reseed(
                        cfg, params, rs, jax.random.fold_in(k_i, 0xD0D0))
                return (params, opt_state), (loss, aux)

            (params, opt_state), (losses, auxs) = jax.lax.scan(
                mb_fn, (params, opt_state), jnp.arange(n_mb))
            return (params, opt_state), (losses, auxs)

        (params, opt_state), (losses, auxs) = jax.lax.scan(
            epoch_fn, (state.params, state.opt_state),
            jax.random.split(k_perm, cfg.rl.ppo_epochs))

        # Deployment EMA: one lerp per update (DQN lerps per learn step;
        # a PPO update is the analogous unit). Static flag — no traced
        # branch; pass-through keeps the donated buffer alive when off.
        if cfg.rl.ema_tau > 0:
            e = cfg.rl.ema_tau
            ema_params = jax.tree_util.tree_map(
                lambda m, p: (1.0 - e) * m + e * p, state.ema_params, params)
        else:
            ema_params = state.ema_params

        new_state = PPOState(
            params=params, ema_params=ema_params, opt_state=opt_state,
            env_states=env_states,
            key=key, update=state.update + 1, ep_return=ep_return,
            last_return=last_return)
        metrics = {
            "loss": jnp.mean(losses),
            "pg_loss": jnp.mean(auxs["pg_loss"]),
            "v_loss": jnp.mean(auxs["v_loss"]),
            "entropy": jnp.mean(auxs["entropy"]),
            "entropy_coef": ent_coef,
            "reward": jnp.mean(ro.reward),
            "episode_return": jnp.mean(last_return),
        }
        return new_state, metrics

    return train_step


def make_train_step(cfg: ExperimentConfig):
    import functools

    return functools.partial(jax.jit, donate_argnums=(0,))(_update_body(cfg))


def make_train_step_chunked(cfg: ExperimentConfig, chunk: int):
    """``chunk`` full PPO updates per device dispatch via ``lax.scan``.

    The update is self-contained (env rollout, GAE, epochs all in-graph;
    PRNG threaded through PPOState), so chunking is a pure scan with
    identical numerics — it only removes the per-update host round trip.
    Metrics come back stacked ``(chunk,)`` per key."""
    import functools

    body = _update_body(cfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chunked(state: PPOState):
        return jax.lax.scan(lambda s, _: body(s), state, None, length=chunk)

    return chunked
