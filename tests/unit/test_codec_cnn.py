"""Camera CNN-JSCC codec shape/jit/grad tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sc_tpu.channel import channel
from multimodal_sc_tpu.codec.camera_cnn import CameraJSCC


def _init(key, snr_cond=False, hw=(32, 32)):
    # Narrow features: k/shape semantics don't depend on widths, and the
    # suite runs on one CPU core where compile time is the budget.
    model = CameraJSCC(features=(8, 16, 16, 16), image_hw=hw,
                       snr_conditioning=snr_cond)
    img = jnp.zeros((2, hw[0], hw[1], 3))
    snr = jnp.full((2,), 10.0)
    params = model.init(key, img, snr)["params"]
    return model, params


def test_encode_shape_and_k(key):
    model, params = _init(key)
    img = jax.random.uniform(key, (4, 32, 32, 3))
    z = model.apply({"params": params}, img, None, method="encode")
    assert z.shape == (4, model.k, 2)
    assert model.k == 8 * 8 * 8


def test_roundtrip_shape(key):
    model, params = _init(key)
    img = jax.random.uniform(key, (4, 32, 32, 3))
    z = model.apply({"params": params}, img, None, method="encode")
    z_hat = channel(z, 10.0, "awgn", key)
    rec = model.apply({"params": params}, z_hat, None, method="decode")
    assert rec.shape == img.shape
    assert float(rec.min()) >= 0.0 and float(rec.max()) <= 1.0


@pytest.mark.slow  # covered fast by test_perception's end-to-end grad test
def test_end_to_end_gradients_flow(key):
    model, params = _init(key)
    img = jax.random.uniform(key, (2, 32, 32, 3))

    def loss(params):
        z = model.apply({"params": params}, img, None, method="encode")
        z_hat = channel(z, 10.0, "awgn", jax.random.key(0))
        rec = model.apply({"params": params}, z_hat, None, method="decode")
        return jnp.mean((rec - img) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert total > 0  # encoder receives gradient through the channel


def test_snr_conditioning_changes_output(key):
    model, params = _init(key, snr_cond=True)
    img = jax.random.uniform(key, (2, 32, 32, 3))
    z_lo = model.apply({"params": params}, img, jnp.full((2,), 0.0),
                       method="encode")
    z_hi = model.apply({"params": params}, img, jnp.full((2,), 20.0),
                       method="encode")
    assert float(jnp.max(jnp.abs(z_lo - z_hi))) > 1e-6


def test_jit_whole_graph(key):
    model, params = _init(key)
    img = jax.random.uniform(key, (2, 32, 32, 3))

    @jax.jit
    def f(params, img, key):
        z = model.apply({"params": params}, img, None, method="encode")
        z_hat = channel(z, 10.0, "awgn", key)
        return model.apply({"params": params}, z_hat, None, method="decode")

    rec = f(params, img, key)
    assert rec.shape == img.shape
