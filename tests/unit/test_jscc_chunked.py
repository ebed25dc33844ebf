"""Chunked JSCC dispatch (train/jscc.py make_train_step_chunked): a scan
of K steps per dispatch must replay the EXACT per-step stream — same
fold_in(root_key, global_step) keys, same batches — as K single
dispatches. Mirrors the DQN chunk-equivalence gate (test_obs_carry.py):
state equality at float-noise scale, metric trajectory at rtol 1e-6."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_sc_tpu.config.presets import get_preset
from multimodal_sc_tpu.train import jscc


def _run_pair(cfg, key, steps, chunk):
    state_c = jscc.create_train_state(cfg, key)
    state_s = jax.tree_util.tree_map(jnp.copy, state_c)
    model = jscc.build_model(cfg)
    single = jscc.make_train_step(cfg, model)
    chunked = jscc.make_train_step_chunked(cfg, model, chunk)

    root_key = jax.random.fold_in(jax.random.key(cfg.train.seed), 0x5EED)
    with_seg = cfg.camera.seg_classes > 0 and cfg.camera.arch == "cnn"
    kb = jax.random.fold_in(key, 0xDA7A)
    imgs = jax.random.uniform(kb, (steps, cfg.train.batch_size,
                                   *cfg.camera.image_hw, 3))
    segs = (jax.random.randint(jax.random.fold_in(kb, 1),
                               (steps, cfg.train.batch_size,
                                *cfg.camera.image_hw), 0,
                               cfg.camera.seg_classes)
            if with_seg else None)

    singles = []
    for i in range(steps):
        state_s, m = single(state_s, imgs[i],
                            segs[i] if with_seg else None,
                            jax.random.fold_in(root_key, i))
        singles.append(m)

    stacked_all = []
    for c0 in range(0, steps, chunk):
        state_c, stacked = chunked(
            state_c, imgs[c0:c0 + chunk],
            segs[c0:c0 + chunk] if with_seg else None,
            root_key, jnp.int32(c0))
        stacked_all.append(stacked)

    return state_s, state_c, singles, stacked_all


def test_chunked_matches_singles(key):
    cfg = get_preset("c1").override_str([
        "camera.features=8,16,16,16", "camera.c_sym=2",
        "camera.image_hw=16,16", "train.batch_size=8", "train.steps=8",
    ])
    state_s, state_c, singles, stacked_all = _run_pair(cfg, key, 8, 4)

    flat = [m for st in stacked_all
            for m in ({k: v[j] for k, v in st.items()}
                      for j in range(4))]
    for i, (ms, mc) in enumerate(zip(singles, flat)):
        for k in ms:
            np.testing.assert_allclose(np.asarray(ms[k]), np.asarray(mc[k]),
                                       rtol=1e-6, atol=1e-7,
                                       err_msg=f"step {i} metric {k}")
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(state_s.params),
            jax.tree_util.tree_leaves_with_path(state_c.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"param {p1}")
    assert int(state_c.step) == int(state_s.step) == 8


def test_chunked_matches_singles_seg_branch(key):
    """The c2-style seg-head loss (image MSE + seg CE) through the chunk."""
    cfg = get_preset("c2").override_str([
        "camera.features=8,16,16,16", "camera.c_sym=2",
        "camera.image_hw=16,16", "train.batch_size=8", "train.steps=4",
    ])
    state_s, state_c, singles, stacked_all = _run_pair(cfg, key, 4, 2)
    assert "miou" in singles[0]
    for i, st_idx in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        ci, j = st_idx
        for k in singles[i]:
            np.testing.assert_allclose(
                np.asarray(singles[i][k]),
                np.asarray(stacked_all[ci][k][j]), rtol=1e-6, atol=1e-7,
                err_msg=f"step {i} metric {k}")
