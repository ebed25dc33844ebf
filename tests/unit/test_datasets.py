"""Dataset loader tests: synthetic fallback + real-file paths."""

import os

import numpy as np
import pytest

from multimodal_sc_tpu.envs.datasets import ImageDataset, _try_load_kitti_crops


def test_synthetic_shapes_and_range():
    for name, hw in [("synthetic_cifar", 32), ("synthetic_kitti", 64)]:
        b = next(ImageDataset(name, 4, seed=1))
        assert b.shape == (4, hw, hw, 3)
        assert b.min() >= 0 and b.max() <= 1


def test_deterministic_stream():
    a = list(next(ImageDataset("synthetic_cifar", 2, seed=7)) for _ in [0])
    b = list(next(ImageDataset("synthetic_cifar", 2, seed=7)) for _ in [0])
    np.testing.assert_array_equal(a[0], b[0])


def test_real_kitti_fallback_to_synthetic(tmp_path):
    # No kitti dir -> loader returns None -> dataset uses synthetic.
    assert _try_load_kitti_crops(str(tmp_path), (64, 64)) is None
    d = ImageDataset("kitti", 2, seed=0, data_root=str(tmp_path))
    assert next(d).shape == (2, 64, 64, 3)


def test_real_kitti_dir_loads(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    kdir = tmp_path / "kitti"
    kdir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        arr = (rng.random((128, 256, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(kdir / f"frame{i}.png")
    bank = _try_load_kitti_crops(str(tmp_path), (64, 64))
    assert bank is not None and bank.shape[1:] == (64, 64, 3)
    d = ImageDataset("kitti", 3, seed=0, data_root=str(tmp_path))
    b = next(d)
    assert b.shape == (3, 64, 64, 3)
    assert b.min() >= 0 and b.max() <= 1
