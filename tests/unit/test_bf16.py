"""bf16 activation path: runs, finite, params stay fp32."""

import jax
import jax.numpy as jnp
import numpy as np

import multimodal_sc_tpu as msc
from multimodal_sc_tpu.train import jscc


def test_bf16_jscc_step_runs(key):
    cfg = msc.get_preset("c1").override_str([
        "camera.features=8,16,16,16", "camera.c_sym=2",
        "train.batch_size=8", "train.bf16=true",
    ])
    state = jscc.create_train_state(cfg, key)
    # Params must remain fp32 (master weights); activations are bf16.
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
    model = jscc.build_model(cfg)
    step = jscc.make_train_step(cfg, model)
    img = jax.random.uniform(key, (8, 32, 32, 3))
    state, m = step(state, img, None, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["psnr"]))
