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
