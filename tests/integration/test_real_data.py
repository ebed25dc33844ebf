"""Real-dataset path coverage (VERDICT r1 item 7).

Builds a tiny on-disk CIFAR-python-format batch and a KITTI-style PNG tree
in tmpdirs, asserts both loaders produce correctly-shaped banks, and runs
the jscc driver end-to-end from them (the host loop feeds real files
through prefetch_to_device — runtime/prefetch.py)."""

import pickle

import numpy as np
import pytest

import multimodal_sc_tpu as msc
from multimodal_sc_tpu.envs.datasets import (
    ImageDataset,
    _try_load_cifar,
    _try_load_kitti_crops,
)

# batch_size must divide over the 8-virtual-device test mesh (conftest).
TINY = ["camera.features=8,16,16,16", "camera.c_sym=2",
        "train.steps=2", "train.batch_size=8", "train.log_every=1"]


def _write_cifar(root, n_per_batch=8, batches=2):
    d = root / "cifar-10-batches-py"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(1, batches + 1):
        data = rng.integers(0, 256, (n_per_batch, 3 * 32 * 32), np.uint8)
        with open(d / f"data_batch_{i}", "wb") as f:
            pickle.dump({b"data": data,
                         b"labels": [0] * n_per_batch}, f)
    return str(root)


def _write_kitti(root, frames=2):
    PIL = pytest.importorskip("PIL")  # noqa: F841
    from PIL import Image

    d = root / "kitti"
    d.mkdir()
    rng = np.random.default_rng(1)
    for i in range(frames):
        arr = (rng.random((96, 320, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"frame{i:03d}.png")
    return str(root)


def test_cifar_loader_reads_python_format(tmp_path):
    root = _write_cifar(tmp_path)
    bank = _try_load_cifar(root)
    assert bank is not None
    assert bank.shape == (16, 32, 32, 3)
    assert bank.dtype == np.float32
    assert 0.0 <= bank.min() and bank.max() <= 1.0


def test_cifar_dataset_serves_real_batches(tmp_path):
    root = _write_cifar(tmp_path)
    d = ImageDataset("cifar", 4, seed=0, data_root=root)
    assert d._real is not None
    b = next(d)
    assert b.shape == (4, 32, 32, 3)
    # Batches come from the bank (match some bank row exactly).
    assert any(np.allclose(b[0], row) for row in d._real)


def test_jscc_trains_from_real_cifar(tmp_path):
    root = _write_cifar(tmp_path)
    from multimodal_sc_tpu.train import jscc

    cfg = msc.get_preset("c1").override_str(
        TINY + ["train.dataset=cifar", f"train.data_root={root}"])
    state, last = jscc.run(cfg)
    assert np.isfinite(last["loss"])


def test_jscc_trains_from_real_kitti(tmp_path):
    root = _write_kitti(tmp_path)
    bank = _try_load_kitti_crops(root, (64, 64))
    assert bank is not None and bank.shape[1:] == (64, 64, 3)
    from multimodal_sc_tpu.train import jscc

    cfg = msc.get_preset("c1").override_str(
        TINY + ["camera.image_hw=64,64", "train.dataset=kitti",
                f"train.data_root={root}"])
    state, last = jscc.run(cfg)
    assert np.isfinite(last["loss"])


def test_resume_replays_real_data_stream(tmp_path):
    """(seed, step)-derived draws over the real bank are resume-exact."""
    root = _write_cifar(tmp_path)
    d1 = ImageDataset("cifar", 4, seed=3, data_root=root)
    batches = [next(d1) for _ in range(5)]
    d2 = ImageDataset("cifar", 4, seed=3, data_root=root)
    d2._step = 3
    np.testing.assert_array_equal(next(d2), batches[3])
    np.testing.assert_array_equal(next(d2), batches[4])
