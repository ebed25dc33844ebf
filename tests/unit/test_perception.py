"""Semantic perception trunk: both camera arches, grads through channel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import multimodal_sc_tpu as msc
from multimodal_sc_tpu.rl.perception import ActorCritic, SemanticPerception


def _tiny(arch):
    return msc.get_preset("c4").override_str([
        f"camera.arch={arch}",
        "camera.features=8,16,16,16", "camera.c_sym=2",
        "camera.dim=32", "camera.depth=2", "camera.heads=2",
        "camera.image_hw=16,16",
        "camera.patch=4",
        "lidar.pillar_dim=16", "lidar.c_sym=2", "lidar.bev_hw=8,8",
        "fusion.dim=32", "fusion.depth=1", "fusion.heads=2",
        "fusion.state_dim=32",
    ])


@pytest.mark.parametrize("arch", ["vit"])  # cnn forward is subsumed by
# test_gradients_reach_both_encoders below (same trunk, plus the backward)
@pytest.mark.slow
def test_perception_both_arches(key, arch):
    cfg = _tiny(arch)
    model = SemanticPerception(cfg)
    img = jax.random.uniform(key, (2, 16, 16, 3))
    pts = jax.random.normal(jax.random.fold_in(key, 1), (2, 32, 4)) * 5 + 10
    mask = jnp.ones((2, 32), bool)
    params = model.init(key, img, pts, mask, jax.random.key(0))["params"]
    s = model.apply({"params": params}, img, pts, mask, jax.random.key(1))
    assert s.shape == (2, 32)
    assert np.all(np.isfinite(np.asarray(s)))


@pytest.mark.slow
def test_gradients_reach_both_encoders(key):
    """End-to-end grads flow through the channel into BOTH modality
    encoders — the end-to-end semantic-comm property (BASELINE.json:11)."""
    cfg = _tiny("cnn")
    model = ActorCritic(cfg)
    img = jax.random.uniform(key, (2, 16, 16, 3))
    pts = jax.random.normal(jax.random.fold_in(key, 1), (2, 32, 4)) * 5 + 10
    mask = jnp.ones((2, 32), bool)
    params = model.init(key, img, pts, mask, jax.random.key(0))["params"]

    def loss(p):
        logits, v = model.apply({"params": p}, img, pts, mask,
                                jax.random.key(1))
        return jnp.sum(logits ** 2) + jnp.sum(v ** 2)

    g = jax.grad(loss)(params)
    cam_g = sum(float(jnp.sum(jnp.abs(l))) for l in
                jax.tree_util.tree_leaves(g["perception"]["cam_enc"]))
    lid_g = sum(float(jnp.sum(jnp.abs(l))) for l in
                jax.tree_util.tree_leaves(g["perception"]["pfn"]))
    assert cam_g > 0, "no gradient reached the camera encoder"
    assert lid_g > 0, "no gradient reached the lidar pillar net"


def test_ablate_lidar_ignores_points(key):
    """rl.ablate_lidar zeroes the LiDAR branch input: the fused state is
    invariant to the point cloud (the camera-only ablation arm, VERDICT r2
    item 5), while the full model is NOT invariant."""
    cfg = _tiny("cnn")
    img = jax.random.uniform(key, (2, 16, 16, 3))
    pts1 = jax.random.normal(jax.random.fold_in(key, 1), (2, 32, 4)) * 5 + 10
    pts2 = jax.random.normal(jax.random.fold_in(key, 2), (2, 32, 4)) * 5 + 10
    mask = jnp.ones((2, 32), bool)

    abl = SemanticPerception(cfg.override_str(["rl.ablate_lidar=true"]))
    params = abl.init(key, img, pts1, mask, jax.random.key(0))["params"]
    s1 = abl.apply({"params": params}, img, pts1, mask, jax.random.key(1))
    s2 = abl.apply({"params": params}, img, pts2, mask, jax.random.key(1))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))

    full = SemanticPerception(cfg)
    f1 = full.apply({"params": params}, img, pts1, mask, jax.random.key(1))
    f2 = full.apply({"params": params}, img, pts2, mask, jax.random.key(1))
    assert np.abs(np.asarray(f1) - np.asarray(f2)).max() > 1e-6
