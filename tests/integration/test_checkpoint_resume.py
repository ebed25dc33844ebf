"""Kill-and-resume checkpoint test (SURVEY.md §5.3/5.4)."""

import numpy as np
import pytest

import multimodal_sc_tpu as msc
from multimodal_sc_tpu.train import jscc


@pytest.mark.slow
def test_jscc_resume_reproduces(tmp_path):
    base = msc.get_preset("c1").override_str([
        "camera.features=8,16,16,16", "camera.c_sym=2",
        "train.batch_size=8", "train.log_every=1000",
        "train.checkpoint_every=10",
    ])

    # Uninterrupted run of 20 steps.
    cfg_a = base.override_str(
        ["train.steps=20", f"train.checkpoint_dir={tmp_path}/a"])
    state_a, _ = jscc.run(cfg_a)

    # Interrupted: run 10 (checkpoint), then "restart" and run to 20.
    cfg_b10 = base.override_str(
        ["train.steps=10", f"train.checkpoint_dir={tmp_path}/b"])
    jscc.run(cfg_b10)
    cfg_b20 = base.override_str(
        ["train.steps=20", f"train.checkpoint_dir={tmp_path}/b"])
    state_b, _ = jscc.run(cfg_b20)

    import jax

    assert int(jax.device_get(state_b.step)) == 20
    la = jax.tree_util.tree_leaves(state_a.params)
    lb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
