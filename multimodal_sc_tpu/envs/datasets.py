"""Dataset loaders: CIFAR-10 / KITTI-crop pipelines with synthetic fallback.

Spec: BASELINE.json:7 ("CIFAR/KITTI crops"). This offline environment ships
no datasets, so loaders degrade to seeded synthetic generators with the same
shapes/dtypes (SURVEY.md §2.2 "Dataset loaders"); real-file paths are used
when present on disk. Reference repo has no loaders (``README.md:1-2``).

Synthetic images are structured (smooth gradients + random boxes + noise)
rather than pure noise so JSCC reconstruction quality is a meaningful,
improvable signal.
"""

from __future__ import annotations

import os
import pickle
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _synthetic_image_seg_batch(
    key: Array, batch: int, hw: Tuple[int, int], channels: int = 3
) -> Tuple[Array, Array]:
    """Structured synthetic images in [0,1] + segmentation masks.

    Returns (img (B,H,W,C), seg (B,H,W) int32 with 0=background, 1=box).
    """
    h, w = hw
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    yy = jnp.linspace(0.0, 1.0, h).reshape(1, h, 1, 1)
    xx = jnp.linspace(0.0, 1.0, w).reshape(1, 1, w, 1)
    gcoef = jax.random.uniform(k1, (batch, 1, 1, channels), minval=-1, maxval=1)
    hcoef = jax.random.uniform(k2, (batch, 1, 1, channels), minval=-1, maxval=1)
    base = 0.5 + 0.25 * (gcoef * (yy * 2 - 1) + hcoef * (xx * 2 - 1))

    # Random box per example (vectorized): brighten a rectangle.
    cy = jax.random.uniform(k3, (batch, 1, 1, 1), minval=0.2, maxval=0.8)
    cx = jax.random.uniform(k4, (batch, 1, 1, 1), minval=0.2, maxval=0.8)
    half = 0.15
    ygrid = yy.reshape(1, h, 1, 1)
    xgrid = xx.reshape(1, 1, w, 1)
    box = ((jnp.abs(ygrid - cy) < half) & (jnp.abs(xgrid - cx) < half))
    color = jax.random.uniform(k5, (batch, 1, 1, channels))
    img = jnp.where(box, 0.5 * base + 0.5 * color, base)
    noise = 0.02 * jax.random.normal(jax.random.fold_in(key, 7),
                                     (batch, h, w, channels))
    img = jnp.clip(img + noise, 0.0, 1.0).astype(jnp.float32)
    seg = box[..., 0].astype(jnp.int32)
    return img, seg


def _synthetic_image_batch(
    key: Array, batch: int, hw: Tuple[int, int], channels: int = 3
) -> Array:
    return _synthetic_image_seg_batch(key, batch, hw, channels)[0]


def _try_load_kitti_crops(
    root: str, hw: Tuple[int, int], max_images: int = 2000
) -> Optional[np.ndarray]:
    """Load KITTI-style images from data/kitti/**.png|jpg as random crops.

    Degrades to None (-> synthetic fallback) when the directory or PIL is
    absent. Crops are taken center-biased at load time so the array is a
    fixed (N, h, w, 3) float32 bank the iterator samples from.
    """
    d = os.path.join(root, "kitti")
    if not os.path.isdir(d):
        return None
    try:
        from PIL import Image
    except ImportError:
        return None
    paths = []
    for base, _, files in os.walk(d):
        paths += [os.path.join(base, f) for f in files
                  if f.lower().endswith((".png", ".jpg", ".jpeg"))]
    if not paths:
        return None
    h, w = hw
    rng = np.random.default_rng(0)
    crops = []
    for p in sorted(paths)[:max_images]:
        try:
            img = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
        except OSError:
            continue
        if img.shape[0] < h or img.shape[1] < w:
            continue
        for _ in range(4):  # 4 crops per frame
            y0 = rng.integers(0, img.shape[0] - h + 1)
            x0 = rng.integers(0, img.shape[1] - w + 1)
            crops.append(img[y0:y0 + h, x0:x0 + w])
    if not crops:
        return None
    return np.stack(crops)


def _try_load_cifar(root: str) -> Optional[np.ndarray]:
    """Load CIFAR-10 python-format batches if present on disk."""
    d = os.path.join(root, "cifar-10-batches-py")
    if not os.path.isdir(d):
        return None
    arrays = []
    for i in range(1, 6):
        p = os.path.join(d, f"data_batch_{i}")
        if not os.path.exists(p):
            continue
        with open(p, "rb") as f:
            batch = pickle.load(f, encoding="bytes")
        arrays.append(batch[b"data"])
    if not arrays:
        return None
    x = np.concatenate(arrays).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return (x.astype(np.float32) / 255.0)


class ImageDataset:
    """Infinite seeded iterator of (B, H, W, C) float32 batches in [0,1].

    name: synthetic_cifar | synthetic_kitti | cifar | kitti.
    Real datasets fall back to the synthetic twin when files are absent.
    """

    SHAPES = {
        "synthetic_cifar": (32, 32),
        "cifar": (32, 32),
        "synthetic_kitti": (64, 64),   # KITTI crops
        "kitti": (64, 64),
    }

    def __init__(self, name: str, batch_size: int, seed: int = 0,
                 data_root: str = "data", with_seg: bool = False):
        if name not in self.SHAPES:
            raise KeyError(f"unknown dataset {name!r}")
        self.name = name
        self.hw = self.SHAPES[name]
        self.batch_size = batch_size
        self.seed = seed
        self.with_seg = with_seg
        self._real: Optional[np.ndarray] = None
        if name == "cifar":
            self._real = _try_load_cifar(data_root)
        elif name == "kitti":
            self._real = _try_load_kitti_crops(data_root, self.hw)
        self._rng = np.random.default_rng(seed)
        self._step = 0

    def __iter__(self) -> Iterator[np.ndarray]:
        return self

    def __next__(self):
        if self._real is not None and not self.with_seg:
            # rng derived from (seed, step) so kill-and-resume replays the
            # exact stream (jscc.run sets _step = restored step).
            rng = np.random.default_rng((self.seed, self._step))
            self._step += 1
            idx = rng.integers(0, len(self._real), self.batch_size)
            return self._real[idx]
        key = jax.random.fold_in(jax.random.key(self.seed), self._step)
        self._step += 1
        if self.with_seg:
            img, seg = _synthetic_image_seg_batch(key, self.batch_size,
                                                  self.hw)
            return np.asarray(img), np.asarray(seg)
        return np.asarray(
            _synthetic_image_batch(key, self.batch_size, self.hw)
        )


def synthetic_pointcloud_batch(
    key: Array,
    batch: int,
    max_points: int,
    x_range=(0.0, 48.0),
    y_range=(-12.0, 12.0),
) -> Tuple[Array, Array]:
    """Synthetic LiDAR-like clouds: ground plane + a few box clusters.

    Returns (points (B,N,4): x,y,z,intensity; mask (B,N) of valid points).
    """
    kp, kc, km, kz = jax.random.split(key, 4)
    # Cluster centers (cars): 4 clusters per scene.
    n_clusters = 4
    centers = jnp.stack([
        jax.random.uniform(kc, (batch, n_clusters), minval=x_range[0] + 5,
                           maxval=x_range[1] - 5),
        jax.random.uniform(jax.random.fold_in(kc, 1), (batch, n_clusters),
                           minval=y_range[0] + 2, maxval=y_range[1] - 2),
    ], axis=-1)  # (B, C, 2)
    assign = jax.random.randint(km, (batch, max_points), 0, n_clusters)
    ctr = jnp.take_along_axis(
        centers, assign[..., None].repeat(2, -1), axis=1
    )  # (B, N, 2)
    offs = jax.random.normal(kp, (batch, max_points, 2)) * jnp.array([2.0, 0.8])
    xy = ctr + offs
    z = jax.random.uniform(kz, (batch, max_points, 1), minval=0.0, maxval=1.8)
    intensity = jax.random.uniform(jax.random.fold_in(kz, 1),
                                   (batch, max_points, 1))
    pts = jnp.concatenate([xy, z, intensity], axis=-1).astype(jnp.float32)
    mask = (
        (pts[..., 0] >= x_range[0]) & (pts[..., 0] < x_range[1])
        & (pts[..., 1] >= y_range[0]) & (pts[..., 1] < y_range[1])
    )
    return pts, mask
