"""End-to-end training over the OFDM multipath channel with estimated CSI.

The r3 channel-realism extension (channel/layer.py: kind="ofdm", pilots):
a codec must remain trainable when the channel is frequency-selective and
the equalizer only sees a pilot-based LS channel estimate — the realistic
deployment condition (no genie CSI).
"""

import jax
import numpy as np
import pytest

import multimodal_sc_tpu as msc
from multimodal_sc_tpu.train import jscc


@pytest.mark.slow
def test_jscc_trains_over_ofdm_with_estimated_csi():
    cfg = msc.get_preset("c1").override_str([
        "channel.kind=ofdm", "channel.pilots=4",
        "channel.ofdm_subcarriers=32", "channel.ofdm_taps=4",
        "camera.features=8,16,16,16", "camera.c_sym=2",
        "train.steps=200", "train.batch_size=16", "train.log_every=100",
    ])
    state, last = jscc.run(cfg)
    # PSNR over a fading channel with estimated CSI is noisy; the gate is
    # "clearly better than an untrained decode" (untrained sits ~8-10 dB).
    assert float(last["psnr"]) > 14.0, dict(last)
    assert np.isfinite(float(last["loss"]))


def test_sweep_camera_over_ofdm(key):
    """The SNR-sweep evaluator accepts kind="ofdm" + pilot threading and
    produces a finite, SNR-monotone-ish curve on an untrained model."""
    from multimodal_sc_tpu.evaluation import snr_sweep

    cfg = msc.get_preset("c1").override_str([
        "camera.features=8,16,16,16", "camera.c_sym=2",
        "train.batch_size=8",
    ])
    state = jscc.create_train_state(cfg, key)
    model = jscc.build_model(cfg)
    img = jax.random.uniform(jax.random.key(1), (8, 32, 32, 3))
    curves = snr_sweep.sweep_camera(
        model, state.params, img, key, snrs_db=(0.0, 20.0),
        kinds=("ofdm",), batches_per_point=1, pilots=2,
        subcarriers=32, taps=4)
    pts = curves["ofdm"]
    assert len(pts) == 2
    assert all(np.isfinite(p["psnr"]) for p in pts)
