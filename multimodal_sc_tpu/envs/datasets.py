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


SEG_CLASSES = 4        # 0=background, 1=box, 2=disk, 3=stripe
SEG_OBJECTS = 3        # shapes drawn per image (can overlap; later wins)


def _synthetic_image_seg_batch(
    key: Array, batch: int, hw: Tuple[int, int], channels: int = 3
) -> Tuple[Array, Array]:
    """Structured synthetic images in [0,1] + multi-class segmentation.

    Returns (img (B,H,W,C), seg (B,H,W) int32 in [0, SEG_CLASSES)).
    VERDICT r1 item 3: the r1 single-bright-box task saturated mIoU at
    ~1.0; this draws SEG_OBJECTS overlapping shapes per image — an
    axis-aligned box, a disk, and a diagonal stripe, each with random
    position/size/color blended at 65% over the gradient background — so
    receiver segmentation lands in a regressable band and degrades with
    SNR. Later-drawn shapes occlude earlier ones (pixel class = topmost).
    """
    h, w = hw
    k1, k2 = jax.random.split(key, 2)
    yy = jnp.linspace(0.0, 1.0, h).reshape(1, h, 1)
    xx = jnp.linspace(0.0, 1.0, w).reshape(1, 1, w)
    gcoef = jax.random.uniform(k1, (batch, 1, 1, channels), minval=-1, maxval=1)
    hcoef = jax.random.uniform(k2, (batch, 1, 1, channels), minval=-1, maxval=1)
    base = 0.5 + 0.25 * (gcoef * (yy[..., None] * 2 - 1)
                         + hcoef * (xx[..., None] * 2 - 1))

    img = base
    seg = jnp.zeros((batch, h, w), jnp.int32)
    for j in range(SEG_OBJECTS):
        kj = jax.random.fold_in(key, 10 + j)
        kc, kp, ks, kcol, ka = jax.random.split(kj, 5)
        cls = jax.random.randint(kc, (batch, 1, 1), 1, SEG_CLASSES)
        cy = jax.random.uniform(kp, (batch, 1, 1), minval=0.15, maxval=0.85)
        cx = jax.random.uniform(jax.random.fold_in(kp, 1), (batch, 1, 1),
                                minval=0.15, maxval=0.85)
        half = jax.random.uniform(ks, (batch, 1, 1), minval=0.08, maxval=0.22)
        slope = jax.random.uniform(ka, (batch, 1, 1), minval=-1.0, maxval=1.0)
        dy, dx = yy - cy, xx - cx
        box = (jnp.abs(dy) < half) & (jnp.abs(dx) < half * 1.3)
        disk = (dy * dy + dx * dx) < half * half
        stripe = (jnp.abs(dx + slope * dy) < 0.35 * half) & (jnp.abs(dy) < 0.45)
        mask = jnp.where(cls == 1, box, jnp.where(cls == 2, disk, stripe))
        color = jax.random.uniform(kcol, (batch, 1, 1, channels))
        img = jnp.where(mask[..., None], 0.35 * img + 0.65 * color, img)
        seg = jnp.where(mask, cls, seg)

    noise = 0.02 * jax.random.normal(jax.random.fold_in(key, 7),
                                     (batch, h, w, channels))
    img = jnp.clip(img + noise, 0.0, 1.0).astype(jnp.float32)
    return img, seg.astype(jnp.int32)


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
                 data_root: str = "data", with_seg: bool = False,
                 real_bank: Optional[np.ndarray] = None):
        """`real_bank` reuses an already-loaded image bank (e.g. the train
        dataset's) instead of re-reading/decoding the files from disk —
        the real CIFAR/KITTI banks are hundreds of MB."""
        if name not in self.SHAPES:
            raise KeyError(f"unknown dataset {name!r}")
        self.name = name
        self.hw = self.SHAPES[name]
        self.batch_size = batch_size
        self.seed = seed
        self.with_seg = with_seg
        self._real: Optional[np.ndarray] = real_bank
        if real_bank is None and name == "cifar":
            self._real = _try_load_cifar(data_root)
        elif real_bank is None and name == "kitti":
            self._real = _try_load_kitti_crops(data_root, self.hw)
        if self._real is not None and with_seg:
            # Seg labels only exist for the synthetic generator; a seg-head
            # config on a real dataset silently training on synthetic images
            # was ADVICE r1 — make the fallback loud.
            import warnings

            warnings.warn(
                f"dataset {name!r} loaded {len(self._real)} real images but "
                "with_seg=True has no real labels; falling back to the "
                "SYNTHETIC image+seg generator", stacklevel=2)
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


BEV_CLASSES = 4        # 0=empty, 1=ground, 2=car, 3=clutter


def synthetic_pointcloud_batch(
    key: Array,
    batch: int,
    max_points: int,
    x_range=(0.0, 48.0),
    y_range=(-12.0, 12.0),
    with_classes: bool = False,
):
    """Synthetic semantic LiDAR clouds with sensor noise.

    VERDICT r1 item 3: the r1 clouds (4 clean Gaussian car clusters, no
    other returns) made BEV occupancy trivially separable (mIoU 1.0). This
    version mixes three point populations so the semantic BEV task has a
    regressable ceiling:
      * ~50% GROUND returns: uniform over the range, z ~ U(0, 0.15);
      * ~35% CAR returns: 4 Gaussian clusters, z ~ U(0.2, 1.6);
      * ~15% CLUTTER: sparse uniform sprinkle at any height.
    Sensor noise: 0.15 m xy jitter on every return and 5% random dropout.

    Returns (points (B,N,4): x,y,z,intensity; mask (B,N)); with
    ``with_classes=True`` also the per-point class (B,N) int32 (1=ground,
    2=car, 3=clutter — BEV_CLASSES semantics, 0 reserved for empty cells).
    """
    kp, kc, km, kz, kg, kn, kd = jax.random.split(key, 7)
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
    car_xy = ctr + offs
    car_z = jax.random.uniform(kz, (batch, max_points, 1), minval=0.2,
                               maxval=1.6)

    uni_xy = jnp.stack([
        jax.random.uniform(kg, (batch, max_points), minval=x_range[0],
                           maxval=x_range[1]),
        jax.random.uniform(jax.random.fold_in(kg, 1), (batch, max_points),
                           minval=y_range[0], maxval=y_range[1]),
    ], axis=-1)
    ground_z = jax.random.uniform(jax.random.fold_in(kz, 2),
                                  (batch, max_points, 1), maxval=0.15)
    clutter_z = jax.random.uniform(jax.random.fold_in(kz, 3),
                                   (batch, max_points, 1), maxval=1.8)

    # Population assignment: 1=ground (50%), 2=car (35%), 3=clutter (15%).
    u = jax.random.uniform(jax.random.fold_in(km, 1), (batch, max_points))
    cls = jnp.where(u < 0.50, 1, jnp.where(u < 0.85, 2, 3)).astype(jnp.int32)
    is_car = (cls == 2)[..., None]
    is_ground = (cls == 1)[..., None]
    xy = jnp.where(is_car, car_xy, uni_xy)
    z = jnp.where(is_car, car_z, jnp.where(is_ground, ground_z, clutter_z))

    # Sensor noise: xy jitter + dropout.
    xy = xy + 0.15 * jax.random.normal(kn, xy.shape)
    intensity = jax.random.uniform(jax.random.fold_in(kz, 1),
                                   (batch, max_points, 1))
    pts = jnp.concatenate([xy, z, intensity], axis=-1).astype(jnp.float32)
    keep = jax.random.uniform(kd, (batch, max_points)) > 0.05
    mask = (
        (pts[..., 0] >= x_range[0]) & (pts[..., 0] < x_range[1])
        & (pts[..., 1] >= y_range[0]) & (pts[..., 1] < y_range[1])
        & keep
    )
    if with_classes:
        return pts, mask, cls
    return pts, mask
