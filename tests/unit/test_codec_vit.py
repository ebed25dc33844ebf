"""ViT-JSCC codec tests."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from multimodal_sc_tpu.channel import channel
from multimodal_sc_tpu.codec.camera_vit import ViTJSCC


def _init(key, hw=(16, 16)):
    # Small dims: the assertions are shape/semantic, and compile time on
    # the 1-core CI box is the suite's budget.
    model = ViTJSCC(image_hw=hw, dim=32, depth=1, heads=2, c_sym=4)
    img = jnp.zeros((2, hw[0], hw[1], 3))
    snr = jnp.full((2,), 10.0)
    params = model.init(key, img, snr)["params"]
    return model, params


def test_roundtrip_shapes(key):
    model, params = _init(key)
    img = jax.random.uniform(key, (3, 16, 16, 3))
    snr = jnp.full((3,), 10.0)
    z = model.apply({"params": params}, img, snr, method="encode")
    assert z.shape == (3, model.k, 2)
    z_hat = channel(z, snr, "awgn", key)
    rec = model.apply({"params": params}, z_hat, snr, method="decode")
    assert rec.shape == img.shape


def test_snr_token_conditions_encoding(key):
    model, params = _init(key)
    img = jax.random.uniform(key, (2, 16, 16, 3))
    z0 = model.apply({"params": params}, img, jnp.zeros((2,)), method="encode")
    z1 = model.apply({"params": params}, img, jnp.full((2,), 20.0),
                     method="encode")
    assert float(jnp.max(jnp.abs(z0 - z1))) > 1e-6


@pytest.mark.slow
def test_gradients_flow_through_channel(key):
    model, params = _init(key)
    img = jax.random.uniform(key, (2, 16, 16, 3))
    snr = jnp.full((2,), 10.0)

    def loss(params):
        z = model.apply({"params": params}, img, snr, method="encode")
        z_hat = channel(z, snr, "awgn", jax.random.key(0))
        rec = model.apply({"params": params}, z_hat, snr, method="decode")
        return jnp.mean((rec - img) ** 2)

    g = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(l)))
                for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
