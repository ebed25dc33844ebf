"""SNR-sweep JSCC evaluator: PSNR / mIoU curves over AWGN + Rayleigh.

Spec: BASELINE.json:8 — "SNR-sweep JSCC eval (AWGN + Rayleigh fading,
power-normalized) with PSNR/mIoU curves" (config 2). Reference repo has no
eval code (``/root/reference/README.md:1-2``).

One jitted eval step per (kind) channel; the SNR axis is fed as data (a
per-example SNR vector), so the whole sweep is a handful of compiles, not
one per SNR point.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_sc_tpu.channel import channel as channel_op
from multimodal_sc_tpu.evaluation.metrics import miou, psnr, ssim

Array = jax.Array

DEFAULT_SNRS = tuple(range(-5, 26, 5))  # -5 .. 25 dB


def sweep_camera(
    model, params, images: Array, key: Array,
    snrs_db: Sequence[float] = DEFAULT_SNRS,
    kinds: Sequence[str] = ("awgn", "rayleigh"),
    batches_per_point: int = 4,
    seg: Array = None,
    normalize: bool = True,
    modulation: int = 0,
) -> Dict[str, List[dict]]:
    """PSNR + SSIM (+ mIoU when the codec has a seg head and `seg` labels
    are given) curves for an image codec:
    {kind: [{snr_db, psnr, ssim[, miou]}]}. PSNR is the spec metric
    (BASELINE.json:8); SSIM (tf.image-oracle-tested) adds the perceptual
    axis the MSE loss can trade away.

    `normalize`/`modulation` must mirror the training ChannelConfig so a
    model trained in M-QAM mode is evaluated over the same digital channel
    (ADVICE r1)."""

    import functools

    with_seg = seg is not None and getattr(model, "seg_classes", 0) > 0

    @functools.partial(jax.jit, static_argnames=("kind",))
    def eval_point(params, img, seg, snr_db, key, kind):
        snr_vec = jnp.full((img.shape[0],), snr_db, jnp.float32)
        z = model.apply({"params": params}, img, snr_vec, method="encode")
        z_hat = channel_op(z, snr_vec, kind, key, normalize=normalize,
                           modulation=modulation)
        if with_seg:
            rec, seg_logits = model.apply({"params": params}, z_hat, snr_vec,
                                          method="decode_seg")
            pred = jnp.argmax(seg_logits, axis=-1)
            return (psnr(rec, img), ssim(rec, img),
                    miou(pred, seg, model.seg_classes))
        rec = model.apply({"params": params}, z_hat, snr_vec, method="decode")
        return psnr(rec, img), ssim(rec, img), jnp.float32(0)

    results: Dict[str, List[dict]] = {}
    for ki, kind in enumerate(kinds):
        curve = []
        for si, snr_db in enumerate(snrs_db):
            pv, sv, mv = [], [], []
            for b in range(batches_per_point):
                # Deterministic stream id (hash() is salted per process).
                k = jax.random.fold_in(key, ki * 100000 + si * 100 + b)
                p, s, m = eval_point(params, images, seg, float(snr_db), k,
                                     kind)
                pv.append(float(p))
                sv.append(float(s))
                mv.append(float(m))
            point = {"snr_db": float(snr_db), "psnr": float(np.mean(pv)),
                     "ssim": float(np.mean(sv))}
            if with_seg:
                point["miou"] = float(np.mean(mv))
            curve.append(point)
        results[kind] = curve
    return results


def sweep_lidar(
    model, params, points: Array, mask: Array, occ_target: Array, key: Array,
    snrs_db: Sequence[float] = DEFAULT_SNRS,
    kinds: Sequence[str] = ("awgn", "rayleigh"),
    normalize: bool = True,
    modulation: int = 0,
) -> Dict[str, List[dict]]:
    """mIoU curve for the LiDAR BEV codec.

    Handles both modes of LidarBEVCodec: binary occupancy (single logit,
    `occ_target` a 0/1 grid) and semantic BEV (`model.seg_classes` > 1,
    `occ_target` an int class grid)."""

    import functools

    n_classes = getattr(model, "seg_classes", 1)

    @functools.partial(jax.jit, static_argnames=("kind",))
    def eval_point(params, points, mask, occ, snr_db, key, kind):
        z = model.apply({"params": params}, (points, mask), method="encode")
        snr_vec = jnp.full((points.shape[0],), snr_db, jnp.float32)
        z_hat = channel_op(z, snr_vec, kind, key, normalize=normalize,
                           modulation=modulation)
        logits = model.apply({"params": params}, z_hat, method="decode")
        if n_classes > 1:
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return miou(pred, occ.astype(jnp.int32), n_classes)
        pred = (logits[..., 0] > 0).astype(jnp.int32)
        return miou(pred, occ.astype(jnp.int32), 2)

    results: Dict[str, List[dict]] = {}
    for ki, kind in enumerate(kinds):
        curve = []
        for si, snr_db in enumerate(snrs_db):
            k = jax.random.fold_in(key, ki * 100000 + si * 100)
            v = float(eval_point(params, points, mask, occ_target,
                                 float(snr_db), k, kind))
            curve.append({"snr_db": float(snr_db), "miou": v})
        results[kind] = curve
    return results


def save_curves(curves: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(curves, f, indent=2)


def format_table(curves: Dict[str, List[dict]], metric: str = "psnr") -> str:
    lines = [f"{'snr_db':>8} " + " ".join(f"{k:>10}" for k in curves)]
    snrs = [p["snr_db"] for p in next(iter(curves.values()))]
    for i, s in enumerate(snrs):
        row = f"{s:>8.1f} " + " ".join(
            f"{curves[k][i][metric]:>10.3f}" for k in curves)
        lines.append(row)
    return "\n".join(lines)
