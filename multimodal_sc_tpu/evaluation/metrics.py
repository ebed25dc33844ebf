"""Reconstruction / segmentation metrics, all on-device.

Spec: BASELINE.json:2,8 — PSNR and mIoU across SNR sweeps. Reference repo
has no code (``/root/reference/README.md:1-2``); formulas are the standard
definitions, unit-tested against hand-computed cases (SURVEY.md §4.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def mse(x: Array, y: Array, per_example: bool = False) -> Array:
    d = jnp.square(x.astype(jnp.float32) - y.astype(jnp.float32))
    if per_example:
        return jnp.mean(d.reshape(d.shape[0], -1), axis=-1)
    return jnp.mean(d)


def psnr(
    x: Array, y: Array, max_val: float = 1.0, per_example: bool = False
) -> Array:
    """PSNR = 10 log10(MAX^2 / MSE), in dB."""
    m = mse(x, y, per_example=per_example)
    return 10.0 * jnp.log10((max_val * max_val) / jnp.maximum(m, 1e-12))


def _gaussian_window(size: int, sigma: float) -> Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * jnp.square(x / sigma))
    return g / jnp.sum(g)


def _blur(x: Array, win: Array) -> Array:
    """Separable depthwise gaussian blur, VALID padding (NHWC)."""
    c = x.shape[-1]
    row = jnp.tile(win.reshape(-1, 1, 1, 1), (1, 1, 1, c))
    col = jnp.tile(win.reshape(1, -1, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, row.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, row, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    return jax.lax.conv_general_dilated(x, col, (1, 1), "VALID",
                                        dimension_numbers=dn,
                                        feature_group_count=c)


def _ssim_maps(x: Array, y: Array, max_val: float, filter_size: int,
               filter_sigma: float, k1: float, k2: float):
    """Per-pixel luminance and contrast-structure maps (Wang et al. 2004),
    matching tf.image.ssim's VALID-padded gaussian-window formulation."""
    win = _gaussian_window(filter_size, filter_sigma)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    mx, my = _blur(x, win), _blur(y, win)
    mxx, myy, mxy = mx * mx, my * my, mx * my
    # E[x^2]-E[x]^2 form, like the TF implementation (biased covariances).
    vx = _blur(x * x, win) - mxx
    vy = _blur(y * y, win) - myy
    cov = _blur(x * y, win) - mxy
    lum = (2.0 * mxy + c1) / (mxx + myy + c1)
    cs = (2.0 * cov + c2) / (vx + vy + c2)
    return lum, cs


def ssim(x: Array, y: Array, max_val: float = 1.0, filter_size: int = 11,
         filter_sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03,
         per_example: bool = False) -> Array:
    """Structural similarity (SSIM) for NHWC image batches in [0, max_val].

    Gaussian 11x1.5 window, VALID padding — verified against the
    ``tf.image.ssim`` oracle (tests/unit/test_metrics.py). Perceptual
    companion to :func:`psnr` for the JSCC sweeps: PSNR is the spec metric
    (BASELINE.json:8), SSIM tracks structure the MSE loss can trade away."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    lum, cs = _ssim_maps(x, y, max_val, filter_size, filter_sigma, k1, k2)
    v = jnp.mean(lum * cs, axis=(1, 2, 3))
    return v if per_example else jnp.mean(v)


def _downsample2(x: Array) -> Array:
    """2x2 mean pool, stride 2; odd dims get symmetric-padded to even
    (the tf.image.ssim_multiscale convention)."""
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)),
                    mode="symmetric")
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def ms_ssim(x: Array, y: Array, max_val: float = 1.0,
            weights=MS_SSIM_WEIGHTS, filter_size: int = 11,
            filter_sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03,
            per_example: bool = False) -> Array:
    """Multi-scale SSIM (Wang et al. 2003), tf.image.ssim_multiscale
    semantics: contrast-structure at every scale, luminance only at the
    coarsest, negatives clipped before the power weighting.

    Needs ``min(H, W) >= filter_size * 2**(len(weights)-1)``; for the
    32x32 / 64x64 JSCC crops pass fewer scales and/or a smaller filter
    (e.g. ``weights=MS_SSIM_WEIGHTS[:3], filter_size=7`` for 32x32)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    if min(x.shape[1], x.shape[2]) < filter_size * 2 ** (len(weights) - 1):
        raise ValueError(
            f"image {x.shape[1]}x{x.shape[2]} too small for "
            f"{len(weights)}-scale MS-SSIM with filter {filter_size}; "
            "pass fewer `weights` or a smaller `filter_size`")
    w = jnp.asarray(weights, jnp.float32)
    vals = []  # per-scale (B, C): channels stay separate through the
    # nonlinear power-product and average only at the end (the
    # tf.image.ssim_multiscale convention — means don't commute with
    # the product).
    for i in range(len(weights)):
        lum, cs = _ssim_maps(x, y, max_val, filter_size, filter_sigma,
                             k1, k2)
        m = lum * cs if i == len(weights) - 1 else cs
        vals.append(jnp.maximum(jnp.mean(m, axis=(1, 2)), 0.0))
        if i < len(weights) - 1:
            x, y = _downsample2(x), _downsample2(y)
    v = jnp.mean(jnp.prod(jnp.power(jnp.stack(vals, -1), w), axis=-1), -1)
    return v if per_example else jnp.mean(v)


def confusion_matrix(pred: Array, label: Array, num_classes: int) -> Array:
    """(num_classes, num_classes) confusion matrix from int arrays."""
    pred = pred.reshape(-1).astype(jnp.int32)
    label = label.reshape(-1).astype(jnp.int32)
    idx = label * num_classes + pred
    cm = jnp.zeros((num_classes * num_classes,), jnp.int32).at[idx].add(1)
    return cm.reshape(num_classes, num_classes)


def miou(pred: Array, label: Array, num_classes: int) -> Array:
    """Mean IoU over classes present in either pred or label."""
    cm = confusion_matrix(pred, label, num_classes).astype(jnp.float32)
    inter = jnp.diag(cm)
    union = cm.sum(0) + cm.sum(1) - inter
    present = union > 0
    iou = jnp.where(present, inter / jnp.maximum(union, 1.0), 0.0)
    return jnp.sum(iou) / jnp.maximum(jnp.sum(present), 1)
