"""PSNR / mIoU vs hand-computed cases; SSIM/MS-SSIM vs the tf.image
oracle (SURVEY.md §4.2 oracle layer)."""

import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sc_tpu.evaluation.metrics import (MS_SSIM_WEIGHTS,
                                                  confusion_matrix, miou,
                                                  ms_ssim, psnr, ssim)


def test_psnr_hand_computed():
    x = jnp.zeros((1, 2, 2, 1))
    y = jnp.full((1, 2, 2, 1), 0.5)
    # MSE = 0.25 -> PSNR = 10 log10(1/0.25) = 6.0206 dB
    np.testing.assert_allclose(float(psnr(x, y)), 6.0206, atol=1e-3)


def test_psnr_identical_is_capped_high():
    x = jnp.ones((1, 4, 4, 3)) * 0.3
    assert float(psnr(x, x)) >= 100.0


def test_psnr_per_example():
    x = jnp.zeros((2, 2, 2, 1))
    y = jnp.stack([jnp.full((2, 2, 1), 0.5), jnp.full((2, 2, 1), 0.25)])
    p = psnr(x, y, per_example=True)
    np.testing.assert_allclose(np.asarray(p), [6.0206, 12.0412], atol=1e-3)


def test_confusion_matrix_hand_computed():
    pred = jnp.array([0, 1, 1, 2])
    label = jnp.array([0, 1, 2, 2])
    cm = np.asarray(confusion_matrix(pred, label, 3))
    expected = np.array([[1, 0, 0], [0, 1, 0], [0, 1, 1]])
    np.testing.assert_array_equal(cm, expected)


def test_miou_hand_computed():
    pred = jnp.array([0, 1, 1, 2])
    label = jnp.array([0, 1, 2, 2])
    # class0: I=1,U=1 -> 1; class1: I=1,U=2 -> .5; class2: I=1,U=2 -> .5
    np.testing.assert_allclose(float(miou(pred, label, 3)), (1 + 0.5 + 0.5) / 3,
                               atol=1e-6)


def test_miou_perfect():
    lab = jnp.array([0, 1, 2, 1])
    assert float(miou(lab, lab, 3)) == 1.0


def _tf_image():
    tf = pytest.importorskip("tensorflow")
    tf.config.set_visible_devices([], "GPU")
    return tf


def _pair(shape, seed=0, noise=0.1):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.0, 1.0, size=shape).astype(np.float32)
    y = np.clip(x + rng.normal(0, noise, size=shape), 0, 1).astype(np.float32)
    return x, y


def test_ssim_matches_tf_oracle():
    tf = _tf_image()
    for shape, noise in (((4, 64, 64, 3), 0.1), ((2, 32, 32, 3), 0.05),
                         ((3, 33, 47, 1), 0.2)):
        x, y = _pair(shape, seed=shape[1], noise=noise)
        want = tf.image.ssim(tf.constant(x), tf.constant(y),
                             max_val=1.0).numpy()
        got = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y),
                              per_example=True))
        np.testing.assert_allclose(got, want, atol=1e-5)
        np.testing.assert_allclose(float(ssim(jnp.asarray(x), jnp.asarray(y))),
                                   want.mean(), atol=1e-5)


def test_ssim_identical_and_bounds():
    x, y = _pair((2, 32, 32, 3), noise=0.3)
    xx = jnp.asarray(x)
    np.testing.assert_allclose(float(ssim(xx, xx)), 1.0, atol=1e-6)
    v = float(ssim(xx, jnp.asarray(y)))
    assert -1.0 <= v < 1.0
    # More noise, lower SSIM.
    _, y2 = _pair((2, 32, 32, 3), noise=0.6)
    assert float(ssim(xx, jnp.asarray(y2))) < v


def test_ms_ssim_matches_tf_oracle_full_scale():
    tf = _tf_image()
    x, y = _pair((2, 176, 176, 3), seed=7, noise=0.1)
    want = tf.image.ssim_multiscale(tf.constant(x), tf.constant(y),
                                    max_val=1.0).numpy()
    got = np.asarray(ms_ssim(jnp.asarray(x), jnp.asarray(y),
                             per_example=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ms_ssim_matches_tf_oracle_small_crops():
    """The JSCC crop sizes: 3 scales / filter 7 on 32x32 (c1/c2) and
    64x64 (c3)."""
    tf = _tf_image()
    for hw in (32, 64):
        x, y = _pair((2, hw, hw, 3), seed=hw, noise=0.15)
        want = tf.image.ssim_multiscale(
            tf.constant(x), tf.constant(y), max_val=1.0,
            power_factors=MS_SSIM_WEIGHTS[:3], filter_size=7).numpy()
        got = np.asarray(ms_ssim(jnp.asarray(x), jnp.asarray(y),
                                 weights=MS_SSIM_WEIGHTS[:3], filter_size=7,
                                 per_example=True))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_ms_ssim_too_small_raises():
    x = jnp.zeros((1, 32, 32, 3))
    with pytest.raises(ValueError, match="too small"):
        ms_ssim(x, x)  # 5 scales x filter 11 needs >= 176px
