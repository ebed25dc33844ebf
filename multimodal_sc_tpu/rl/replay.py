"""On-device circular replay buffer.

Spec: BASELINE.json:5 — "Replay buffer and advantage computation live
on-device to avoid host round-trips", :10 ("batched replay on-device").
Reference repo has no replay code (``/root/reference/README.md:1-2``).

Design (SURVEY.md §2.2): struct-of-arrays pytree of preallocated device
arrays; ``add`` via dynamic_update_slice at the write cursor; ``sample`` via
on-device PRNG integer draws over the valid prefix. Everything is pure and
jit/donate friendly; under data parallelism each shard owns an independent
buffer (add/sample are per-shard, no cross-shard gathers — SURVEY §2.2).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


def quantize_frame(img: Array) -> Array:
    """uint8-quantize a [0,1] rendered frame for storage (replay / n-step
    window / PPO rollout stacks). The act/learn paths run at the HBM
    roofline (BASELINE.md), so storing frames at 1/4 the bytes is the
    measured byte lever (+22% DQN steps/s/chip); the 1/255 step is far
    below sensor/channel noise. Identity for already-uint8 frames."""
    if img.dtype == jnp.uint8:
        return img
    return jnp.round(jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def dequantize_frame(img: Array) -> Array:
    """Inverse of :func:`quantize_frame` (identity for float frames)."""
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32) * (1.0 / 255.0)
    return img


class ReplayBuffer(NamedTuple):
    data: Any          # pytree; each leaf (capacity, ...) preallocated
    cursor: Array      # () int32 next write slot
    size: Array        # () int32 number of valid entries
    capacity: int      # static


def create(sample_tree: Any, capacity: int) -> ReplayBuffer:
    """Allocate from one example transition pytree (no leading batch dim)."""
    data = jax.tree_util.tree_map(
        lambda x: jnp.zeros((capacity,) + jnp.shape(x), jnp.asarray(x).dtype),
        sample_tree,
    )
    return ReplayBuffer(data=data, cursor=jnp.int32(0), size=jnp.int32(0),
                        capacity=capacity)


def add(buf: ReplayBuffer, transition: Any) -> ReplayBuffer:
    """Insert one transition (pytree, no batch dim) at the cursor."""
    idx = buf.cursor

    def put(store, x):
        return jax.lax.dynamic_update_slice(
            store, jnp.asarray(x, store.dtype)[None], (idx,) + (0,) * x.ndim)

    data = jax.tree_util.tree_map(put, buf.data, transition)
    return ReplayBuffer(
        data=data,
        cursor=(idx + 1) % buf.capacity,
        size=jnp.minimum(buf.size + 1, buf.capacity),
        capacity=buf.capacity,
    )


def add_batch(buf: ReplayBuffer, transitions: Any) -> ReplayBuffer:
    """Insert a batch (leading dim B) with wraparound via scatter."""
    b = jax.tree_util.tree_leaves(transitions)[0].shape[0]
    # Static (trace-time) check via the store's leading dim (always a
    # concrete shape, even when buf.capacity itself is traced under jit):
    # duplicate scatter indices would make surviving writes order-undefined
    # and `size` would over-count.
    cap = jax.tree_util.tree_leaves(buf.data)[0].shape[0]
    if b > cap:
        raise ValueError(
            f"add_batch of {b} transitions exceeds capacity {cap}")
    idx = (buf.cursor + jnp.arange(b)) % buf.capacity

    def put(store, x):
        return store.at[idx].set(jnp.asarray(x, store.dtype))

    data = jax.tree_util.tree_map(put, buf.data, transitions)
    return ReplayBuffer(
        data=data,
        cursor=(buf.cursor + b) % buf.capacity,
        size=jnp.minimum(buf.size + b, buf.capacity),
        capacity=buf.capacity,
    )


def sample(buf: ReplayBuffer, key: Array, batch_size: int) -> Any:
    """Uniform with-replacement draw over the valid prefix (on-device)."""
    idx = jax.random.randint(key, (batch_size,), 0,
                             jnp.maximum(buf.size, 1))
    return jax.tree_util.tree_map(lambda store: store[idx], buf.data)
