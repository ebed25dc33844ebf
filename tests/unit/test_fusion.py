"""Fusion transformer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sc_tpu.fusion.transformer import FusionTransformer


@pytest.mark.parametrize("mode", ["cross_attention", "late_concat"])
def test_fusion_shapes(key, mode):
    model = FusionTransformer(dim=32, depth=1, heads=2, state_dim=16,
                              mode=mode)
    cam = jax.random.normal(key, (2, 10, 24))
    lid = jax.random.normal(jax.random.fold_in(key, 1), (2, 7, 40))
    params = model.init(key, cam, lid)["params"]
    out = model.apply({"params": params}, cam, lid)
    assert out.shape == (2, 16)
    assert np.all(np.isfinite(np.asarray(out)))


def test_cross_attention_uses_both_modalities(key):
    """Zeroing one modality changes the fused state."""
    model = FusionTransformer(dim=32, depth=1, heads=2, state_dim=16)
    cam = jax.random.normal(key, (2, 10, 24))
    lid = jax.random.normal(jax.random.fold_in(key, 1), (2, 7, 40))
    params = model.init(key, cam, lid)["params"]
    s1 = model.apply({"params": params}, cam, lid)
    s2 = model.apply({"params": params}, cam, jnp.zeros_like(lid))
    s3 = model.apply({"params": params}, jnp.zeros_like(cam), lid)
    assert float(jnp.max(jnp.abs(s1 - s2))) > 1e-6
    assert float(jnp.max(jnp.abs(s1 - s3))) > 1e-6


@pytest.mark.slow
def test_fusion_gradients(key):
    model = FusionTransformer(dim=32, depth=1, heads=2, state_dim=16)
    cam = jax.random.normal(key, (2, 10, 24))
    lid = jax.random.normal(jax.random.fold_in(key, 1), (2, 7, 40))
    params = model.init(key, cam, lid)["params"]

    def loss(p):
        return jnp.sum(model.apply({"params": p}, cam, lid) ** 2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(l)))
                for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
