"""Fused conv+PReLU Pallas kernel vs XLA twin (SURVEY.md §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sc_tpu.kernels.conv_block import (
    FusedConvPReLU,
    conv_prelu,
    conv_prelu_reference,
)


@pytest.mark.parametrize("case", [
    # (h, w, cin, cout, K, stride)
    (8, 8, 3, 8, 5, 1),
    (8, 8, 4, 8, 3, 1),
    (8, 8, 3, 8, 5, 2),      # even size, stride 2 (SAME pad front=1)
    (7, 9, 3, 8, 5, 2),      # odd sizes, stride 2 (SAME pad front=2)
    (16, 16, 4, 8, 3, 2),
])
def test_pallas_matches_reference(key, case):
    h, w_, cin, cout, K, stride = case
    kx, kw, kb, ka = jax.random.split(key, 4)
    x = jax.random.normal(kx, (2, h, w_, cin))
    w = jax.random.normal(kw, (K, K, cin, cout)) * 0.1
    b = jax.random.normal(kb, (cout,))
    a = jax.random.uniform(ka, (cout,))
    ref = conv_prelu_reference(x, w, b, a, stride)
    pal = conv_prelu(x, w, b, a, stride, use_pallas=True, interpret=True)
    assert pal.shape == ref.shape
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_no_prelu_path(key):
    kx, kw, kb = jax.random.split(key, 3)
    x = jax.random.normal(kx, (1, 8, 8, 4))
    w = jax.random.normal(kw, (5, 5, 4, 8)) * 0.1
    b = jax.random.normal(kb, (8,))
    ref = conv_prelu_reference(x, w, b, None, 1)
    pal = conv_prelu(x, w, b, None, 1, use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_flax_module_parity(key):
    """The flax wrapper gives identical outputs in both modes."""
    x = jax.random.normal(key, (2, 8, 8, 4))
    m_ref = FusedConvPReLU(8, 5, stride=2, use_pallas=False)
    params = m_ref.init(key, x)["params"]
    y_ref = m_ref.apply({"params": params}, x)
    m_pal = FusedConvPReLU(8, 5, stride=2, use_pallas=True)
    y_pal = m_pal.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


def test_gradients_flow(key):
    x = jax.random.normal(key, (1, 8, 8, 3))
    m = FusedConvPReLU(8, 5, stride=1, use_pallas=True)
    params = m.init(key, x)["params"]

    def loss(p):
        return jnp.sum(m.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(l)))
                for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
