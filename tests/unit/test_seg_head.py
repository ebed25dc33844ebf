"""Camera segmentation head (receiver-side semantics, mIoU metric)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_sc_tpu.channel import channel
from multimodal_sc_tpu.codec.camera_cnn import CameraJSCC
from multimodal_sc_tpu.envs.datasets import ImageDataset


def test_decode_seg_shapes(key):
    model = CameraJSCC(features=(8, 16, 16, 16), c_sym=2, seg_classes=2,
                       snr_conditioning=True)
    img = jax.random.uniform(key, (2, 32, 32, 3))
    snr = jnp.full((2,), 10.0)
    params = model.init(key, img, snr)["params"]
    z = model.apply({"params": params}, img, snr, method="encode")
    z_hat = channel(z, snr, "awgn", key)
    recon, seg = model.apply({"params": params}, z_hat, snr,
                             method="decode_seg")
    assert recon.shape == (2, 32, 32, 3)
    assert seg.shape == (2, 32, 32, 2)
    # decode still returns recon alone
    recon2 = model.apply({"params": params}, z_hat, snr, method="decode")
    np.testing.assert_array_equal(np.asarray(recon), np.asarray(recon2))


def test_dataset_with_seg(key):
    from multimodal_sc_tpu.envs.datasets import SEG_CLASSES

    data = ImageDataset("synthetic_cifar", 8, seed=0, with_seg=True)
    img, seg = next(data)
    assert img.shape == (8, 32, 32, 3)
    assert seg.shape == (8, 32, 32)
    assert set(np.unique(seg)) <= set(range(SEG_CLASSES))
    # Multi-class task (VERDICT r1 item 3): several foreground classes
    # appear across a batch, and foreground covers a plausible fraction.
    assert len(set(np.unique(seg))) >= 3
    frac = (seg > 0).mean()
    assert 0.05 < frac < 0.7


def test_seg_trains_with_jscc_driver(key):
    """Two steps of the c2-style driver with seg head: finite miou metric."""
    import multimodal_sc_tpu as msc
    from multimodal_sc_tpu.train import jscc

    cfg = msc.get_preset("c2").override_str([
        "camera.features=8,16,16,16", "camera.c_sym=2",
        "train.steps=2", "train.batch_size=8", "train.log_every=1",
    ])
    state, last = jscc.run(cfg)
    assert np.isfinite(last["loss"])
    assert 0.0 <= float(last["miou"]) <= 1.0
