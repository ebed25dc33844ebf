"""On-device n-step return window for DQN (VERDICT r1 item 8).

A ring buffer of the last ``n`` per-env (obs, action, reward, done) entries
lives inside the jitted iteration. Each step pushes the newest entry and
emits the n-step transition anchored at the OLDEST one:

    R = sum_{k=0}^{n-1} gamma^k r_k * prod_{j<k}(1 - done_j)
    bootstrap from s_{t+n} with gamma^n, zeroed when any done in the window

(the standard truncated n-step target — rewards stop at the first episode
end inside the window, and no bootstrap crosses it). ``n = 1`` reduces
exactly to one-step DQN, so a single code path serves both.

Everything is static-shape, scan/vmap-friendly, and donation-safe (part of
the DQNState pytree). Reference repo has no RL code (``README.md:1-2``).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class NStepWindow(NamedTuple):
    entries: Any       # pytree; leaves (n, B, ...) — obs + action at entry
    reward: Array      # (n, B)
    done: Array        # (n, B) bool
    cursor: Array      # () int32 next write slot
    fill: Array        # () int32 valid entries (saturates at n)


def create(example_entry: Any, n: int, batch: int) -> NStepWindow:
    """example_entry: pytree of batched leaves (B, ...)."""
    entries = jax.tree_util.tree_map(
        lambda x: jnp.zeros((n,) + jnp.shape(x), jnp.asarray(x).dtype),
        example_entry)
    return NStepWindow(
        entries=entries,
        reward=jnp.zeros((n, batch), jnp.float32),
        done=jnp.zeros((n, batch), bool),
        cursor=jnp.int32(0),
        fill=jnp.int32(0),
    )


def push(win: NStepWindow, entry: Any, reward: Array, done: Array,
         gamma: float) -> Tuple[NStepWindow, Any, Array, Array, Array]:
    """Push the newest entry; emit the oldest-anchored n-step transition.

    Returns (win', oldest_entry, R, done_any, valid) where `valid` is a
    scalar bool: the window only emits real transitions once full.
    """
    n = win.reward.shape[0]
    entries = jax.tree_util.tree_map(
        lambda s, x: jax.lax.dynamic_update_slice(
            s, x[None].astype(s.dtype), (win.cursor,) + (0,) * x.ndim),
        win.entries, entry)
    reward = jax.lax.dynamic_update_slice(
        win.reward, reward[None].astype(jnp.float32), (win.cursor, 0))
    done = jax.lax.dynamic_update_slice(
        win.done, done[None], (win.cursor, 0))

    # Slot order oldest -> newest AFTER this write.
    order = (win.cursor + 1 + jnp.arange(n)) % n
    r_ord = jnp.take(reward, order, axis=0)            # (n, B)
    d_ord = jnp.take(done, order, axis=0)
    alive = jnp.cumprod(1.0 - d_ord.astype(jnp.float32), axis=0)
    alive_before = jnp.concatenate(
        [jnp.ones_like(alive[:1]), alive[:-1]], axis=0)
    disc = (gamma ** jnp.arange(n, dtype=jnp.float32))[:, None]
    big_r = jnp.sum(disc * r_ord * alive_before, axis=0)   # (B,)
    done_any = jnp.any(d_ord, axis=0)                      # (B,)

    oldest = jax.tree_util.tree_map(
        lambda s: jnp.take(s, order[0], axis=0), entries)
    fill = jnp.minimum(win.fill + 1, n)
    new_win = NStepWindow(entries=entries, reward=reward, done=done,
                          cursor=(win.cursor + 1) % n, fill=fill)
    return new_win, oldest, big_r, done_any, fill >= n
