"""Packed-head Pallas attention vs its XLA twin (SURVEY.md §4.2).

Covers the flagship shapes (dim=128, heads=4, d=32 — the case where the
generic flash kernel lost round-1's A/B by padding d to 128) plus
multi-lane-group and ragged-length cases, forward and backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sc_tpu.kernels.attention import attention_reference
from multimodal_sc_tpu.kernels.attention_packed import (
    packed_attention,
    packed_attention_reference,
    packed_eligible,
)


@pytest.mark.parametrize("heads,lq,lk,dm", [
    (4, 65, 256, 128),    # flagship: fusion cam(+CLS) x lidar tokens
    (4, 256, 65, 128),    # reverse cross direction
    (4, 33, 70, 128),     # ragged lengths (padding paths)
    (8, 64, 64, 256),     # two lane groups
    (2, 17, 100, 128),    # d=64 (two heads per group)
    (1, 40, 40, 128),     # single head, d=128
])
def test_packed_matches_twin(key, heads, lq, lk, dm):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, lq, dm))
    k = jax.random.normal(kk, (2, lk, dm))
    v = jax.random.normal(kv, (2, lk, dm))
    out_ref = packed_attention_reference(q, k, v, heads)
    out_pal = packed_attention(q, k, v, heads, interpret=True)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               atol=2e-5, rtol=2e-5)


def test_twin_matches_unpacked_reference(key):
    """The packed twin is itself pinned to the generic (B,H,L,d) oracle."""
    b, h, l, d = 2, 4, 48, 32
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, l, h * d))
    k = jax.random.normal(kk, (b, l, h * d))
    v = jax.random.normal(kv, (b, l, h * d))

    def split(x):
        return x.reshape(b, l, h, d).transpose(0, 2, 1, 3)

    out_unpacked = attention_reference(split(q), split(k), split(v))
    out_packed = packed_attention_reference(q, k, v, h)
    np.testing.assert_allclose(
        np.asarray(out_packed),
        np.asarray(out_unpacked.transpose(0, 2, 1, 3).reshape(b, l, h * d)),
        atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("heads,lq,lk,dm", [
    (4, 33, 70, 128),     # ragged + flagship head dim
    (8, 40, 24, 256),     # two lane groups
    (4, 200, 48, 128),    # multiple q blocks -> dk/dv grid accumulation
])
def test_packed_gradients_match_twin(key, heads, lq, lk, dm):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, lq, dm))
    k = jax.random.normal(kk, (1, lk, dm))
    v = jax.random.normal(kv, (1, lk, dm))

    def loss_pal(q, k, v):
        return jnp.sum(packed_attention(q, k, v, heads, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(packed_attention_reference(q, k, v, heads) ** 2)

    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_packed_bf16_mxu_mode_close(key):
    """Production TPU mode (bf16 operands, f32 accumulate): loose gate."""
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (2, 65, 128))
    k = jax.random.normal(kk, (2, 256, 128))
    v = jax.random.normal(kv, (2, 256, 128))
    out_ref = packed_attention_reference(q, k, v, 4)
    out_pal = packed_attention(q, k, v, 4, interpret=True, mxu_bf16=True)
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               atol=3e-2, rtol=3e-2)


def test_eligibility():
    assert packed_eligible(4, 32, 256)       # flagship
    assert packed_eligible(1, 128, 64)
    assert not packed_eligible(3, 32, 64)    # 96 lanes: not a group multiple
    assert not packed_eligible(4, 48, 64)    # 48 doesn't divide 128
    assert not packed_eligible(4, 32, 100_000)  # K/V too big for VMEM
    with pytest.raises(ValueError):
        packed_attention(jnp.zeros((1, 8, 96)), jnp.zeros((1, 8, 96)),
                         jnp.zeros((1, 8, 96)), heads=3, interpret=True)
