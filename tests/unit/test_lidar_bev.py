"""LiDAR BEV pillar codec tests."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from multimodal_sc_tpu.channel import channel
from multimodal_sc_tpu.codec.lidar_bev import (
    LidarBEVCodec,
    occupancy_target,
    voxelize,
)
from multimodal_sc_tpu.envs.datasets import synthetic_pointcloud_batch

BEV = (16, 16)
XR = (0.0, 48.0)
YR = (-12.0, 12.0)


def test_voxelize_hand_case():
    pts = jnp.array([[[1.0, -11.9, 0.0, 1.0],    # cell (0, 0)
                      [47.9, 11.9, 0.0, 1.0],    # cell (15, 15)
                      [100.0, 0.0, 0.0, 1.0],    # out of range -> trash
                      [24.0, 0.0, 0.0, 1.0]]])   # center-ish
    mask = jnp.array([[True, True, True, False]])  # last masked -> trash
    aug, cell = voxelize(pts, mask, BEV, XR, YR)
    assert cell.shape == (1, 4)
    assert int(cell[0, 0]) == 0
    assert int(cell[0, 1]) == 15 * 16 + 15
    assert int(cell[0, 2]) == 16 * 16   # trash
    assert int(cell[0, 3]) == 16 * 16   # masked -> trash
    # augmented feature last column = validity
    np.testing.assert_allclose(np.asarray(aug[0, :, -1]), [1, 1, 0, 0])


def test_occupancy_target(key):
    pts, mask = synthetic_pointcloud_batch(key, 2, 256, XR, YR)
    occ = occupancy_target(pts, mask, BEV, XR, YR)
    assert occ.shape == (2, 16, 16)
    total = float(occ.sum())
    assert 0 < total < 2 * 16 * 16  # some occupied, not all


@pytest.mark.slow
def test_codec_roundtrip_and_grads(key):
    model = LidarBEVCodec(bev_hw=BEV, x_range=XR, y_range=YR)
    pts, mask = synthetic_pointcloud_batch(key, 2, 256, XR, YR)
    params = model.init(key, (pts, mask))["params"]
    z = model.apply({"params": params}, (pts, mask), method="encode")
    assert z.shape == (2, model.k, 2)
    z_hat = channel(z, 10.0, "awgn", key)
    logits = model.apply({"params": params}, z_hat, method="decode")
    assert logits.shape == (2, 16, 16, 1)

    occ = occupancy_target(pts, mask, BEV, XR, YR)

    def loss(params):
        z = model.apply({"params": params}, (pts, mask), method="encode")
        z_hat = channel(z, 10.0, "awgn", jax.random.key(0))
        logits = model.apply({"params": params}, z_hat, method="decode")[..., 0]
        return jnp.mean(
            jnp.maximum(logits, 0) - logits * occ
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )

    g = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(l)))
                for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_semantic_bev_target(key):
    from multimodal_sc_tpu.codec.lidar_bev import semantic_bev_target
    from multimodal_sc_tpu.envs.datasets import BEV_CLASSES

    pts, mask, cls = synthetic_pointcloud_batch(key, 2, 1024, XR, YR,
                                                with_classes=True)
    tgt = semantic_bev_target(pts, mask, cls, (32, 32), XR, YR,
                              num_classes=BEV_CLASSES)
    assert tgt.shape == (2, 32, 32)
    present = set(np.unique(np.asarray(tgt)))
    assert present <= set(range(BEV_CLASSES))
    # All three semantic classes (+ possibly empty) appear somewhere.
    assert {1, 2}.issubset(present)
    # Deterministic under the same key.
    tgt2 = semantic_bev_target(*synthetic_pointcloud_batch(
        key, 2, 1024, XR, YR, with_classes=True), (32, 32), XR, YR,
        num_classes=BEV_CLASSES)
    np.testing.assert_array_equal(np.asarray(tgt), np.asarray(tgt2))


def test_semantic_codec_decode_shape(key):
    model = LidarBEVCodec(bev_hw=(32, 32), seg_classes=4, x_range=XR,
                          y_range=YR)
    pts, mask = synthetic_pointcloud_batch(key, 2, 256, XR, YR)
    params = model.init(key, (pts, mask))["params"]
    z = model.apply({"params": params}, (pts, mask), method="encode")
    logits = model.apply({"params": params}, z, method="decode")
    assert logits.shape == (2, 32, 32, 4)


def test_tokens_shape(key):
    model = LidarBEVCodec(bev_hw=BEV, x_range=XR, y_range=YR)
    pts, mask = synthetic_pointcloud_batch(key, 2, 128, XR, YR)
    params = model.init(key, (pts, mask))["params"]
    z = model.apply({"params": params}, (pts, mask), method="encode")
    toks = model.apply({"params": params}, z, method="tokens")
    assert toks.shape == (2, 256, 64)
