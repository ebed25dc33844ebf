"""Pallas flash attention vs XLA reference twin (SURVEY.md §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sc_tpu.kernels.attention import (
    attention_reference,
    flash_attention,
)


@pytest.mark.parametrize("shape", [
    (2, 4, 64, 32),        # self-attention-like
    (1, 2, 100, 32),       # non-multiple seq length (padding path)
    (2, 2, 17, 64),        # tiny ragged
])
def test_flash_matches_reference_self(key, shape):
    b, h, l, d = shape
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, shape)
    k = jax.random.normal(kk, shape)
    v = jax.random.normal(kv, shape)
    out_ref = attention_reference(q, k, v)
    out_pal = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_matches_reference_cross(key):
    """Different q/kv lengths (cross-attention)."""
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 4, 33, 32))
    k = jax.random.normal(kk, (2, 4, 70, 32))
    v = jax.random.normal(kv, (2, 4, 70, 32))
    out_ref = attention_reference(q, k, v)
    out_pal = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_gradients_match_reference(key):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 2, 32, 32))
    k = jax.random.normal(kk, (1, 2, 48, 32))
    v = jax.random.normal(kv, (1, 2, 48, 32))

    def loss_pal(q, k, v):
        return jnp.sum(flash_attention(q, k, v, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_flash_under_jit_and_vmap(key):
    q = jax.random.normal(key, (2, 2, 64, 32))

    @jax.jit
    def f(q):
        return flash_attention(q, q, q, interpret=True)

    out = f(q)
    assert out.shape == q.shape
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("shape_q,shape_k", [
    ((1, 2, 100, 32), (1, 2, 70, 32)),   # ragged both sides (padding paths)
    ((2, 4, 64, 48), (2, 4, 64, 48)),    # non-128 head dim
])
def test_flash_backward_ragged_matches_reference(key, shape_q, shape_k):
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, shape_q)
    k = jax.random.normal(kk, shape_k)
    v = jax.random.normal(kv, shape_k)
    g = jax.random.normal(kg, shape_q)

    def f_pal(q, k, v):
        return jnp.vdot(flash_attention(q, k, v, interpret=True), g)

    def f_ref(q, k, v):
        return jnp.vdot(attention_reference(q, k, v), g)

    g_pal = jax.grad(f_pal, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)
