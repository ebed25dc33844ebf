"""Generalized Advantage Estimation, on-device via lax.scan.

Spec: BASELINE.json:5 ("advantage computation live[s] on-device").
Tested against a naive O(T^2) Python oracle (SURVEY.md §4.2).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def gae(
    rewards: Array,      # (T, B)
    values: Array,       # (T, B) V(s_t)
    dones: Array,        # (T, B) episode ended AT step t (after reward)
    last_value: Array,   # (B,) V(s_T)
    gamma: float,
    lam: float,
) -> Tuple[Array, Array]:
    """Returns (advantages (T,B), returns (T,B) = adv + values).

    done_t masks the bootstrap across episode boundaries: delta_t =
    r_t + gamma * V_{t+1} * (1 - done_t) - V_t, and the GAE recursion is
    cut at dones the same way.
    """
    dones = dones.astype(values.dtype)

    def body(carry, xs):
        adv_next, v_next = carry
        r, v, d = xs
        nonterm = 1.0 - d
        delta = r + gamma * v_next * nonterm - v
        adv = delta + gamma * lam * nonterm * adv_next
        return (adv, v), adv

    (_, _), advs = jax.lax.scan(
        body,
        (jnp.zeros_like(last_value), last_value),
        (rewards, values, dones),
        reverse=True,
    )
    return advs, advs + values
