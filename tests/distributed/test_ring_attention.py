"""Ring attention == full attention, sequence-sharded over the mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sc_tpu.kernels.attention import attention_reference
from multimodal_sc_tpu.kernels.ring_attention import (
    ring_attention,
    shard_sequence,
)


@pytest.mark.parametrize("shape", [(2, 2, 64, 16), (1, 4, 128, 32)])
def test_ring_matches_full_attention(mesh8, key, shape):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, shape)
    k = jax.random.normal(kk, shape)
    v = jax.random.normal(kv, shape)
    ref = attention_reference(q, k, v)

    qs = shard_sequence(q, mesh8)
    ks = shard_sequence(k, mesh8)
    vs = shard_sequence(v, mesh8)
    out = ring_attention(qs, ks, vs, mesh8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_output_stays_sequence_sharded(mesh8, key):
    shape = (1, 2, 64, 16)
    q = jax.random.normal(key, shape)
    qs = shard_sequence(q, mesh8)
    out = ring_attention(qs, qs, qs, mesh8)
    assert "data" in str(out.sharding.spec)


def test_ring_under_jit_and_grad(mesh8, key):
    shape = (1, 2, 64, 16)
    q = jax.random.normal(key, shape)
    qs = shard_sequence(q, mesh8)

    @jax.jit
    def loss(q):
        return jnp.sum(ring_attention(q, q, q, mesh8) ** 2)

    def loss_ref(q):
        return jnp.sum(attention_reference(q, q, q) ** 2)

    g = jax.grad(loss)(qs)
    g_ref = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=1e-3, rtol=1e-3)


def test_ulysses_matches_full_attention(mesh8, key):
    from multimodal_sc_tpu.kernels.ring_attention import ulysses_attention

    shape = (2, 8, 64, 16)   # 8 heads over 8 shards
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, shape)
    k = jax.random.normal(kk, shape)
    v = jax.random.normal(kv, shape)
    ref = attention_reference(q, k, v)
    out = ulysses_attention(shard_sequence(q, mesh8),
                            shard_sequence(k, mesh8),
                            shard_sequence(v, mesh8), mesh8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ulysses_rejects_indivisible_heads(mesh8, key):
    from multimodal_sc_tpu.kernels.ring_attention import ulysses_attention

    q = jax.random.normal(key, (1, 3, 64, 16))
    with pytest.raises(ValueError, match="divisible"):
        ulysses_attention(q, q, q, mesh8)
