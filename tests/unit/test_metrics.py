"""PSNR / mIoU vs hand-computed cases (SURVEY.md §4.2)."""

import jax.numpy as jnp
import numpy as np

from multimodal_sc_tpu.evaluation.metrics import confusion_matrix, miou, psnr


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
