"""Whole-MHA-span fused kernel vs XLA twin (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sc_tpu.fusion.transformer import (FusedMHABlock,
                                                  FusionTransformer)
from multimodal_sc_tpu.kernels.mha_block import (PARAM_KEYS, block_eligible,
                                                 mha_block,
                                                 mha_block_reference)


def _params(key, dim):
    ks = jax.random.split(key, len(PARAM_KEYS))
    p = {}
    for k, kk in zip(PARAM_KEYS, ks):
        if k.startswith("w"):
            p[k] = jax.random.normal(kk, (dim, dim)) * dim ** -0.5
        elif "scale" in k:
            p[k] = 1.0 + 0.1 * jax.random.normal(kk, (dim,))
        else:
            p[k] = 0.1 * jax.random.normal(kk, (dim,))
    return p


@pytest.mark.parametrize("lq,lk,heads", [
    (65, 256, 4),     # flagship c4 fusion shapes (cam+CLS x lid)
    (256, 65, 4),     # the reverse cross-attention
    (7, 100, 8),      # ragged padding both dims
    (128, 128, 2),    # aligned, d=64
])
def test_mha_block_matches_reference(key, lq, lk, heads):
    dim = 128
    assert block_eligible(heads, dim, lk)
    p = _params(key, dim)
    x_q = jax.random.normal(jax.random.fold_in(key, 1), (3, lq, dim))
    x_kv = jax.random.normal(jax.random.fold_in(key, 2), (3, lk, dim))
    out = mha_block(x_q, x_kv, p, heads, interpret=True)
    ref = mha_block_reference(x_q, x_kv, p, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_mha_block_grads_match_twin(key):
    """The custom VJP recomputes through the twin, so grads must equal the
    twin's autodiff exactly (same graph)."""
    dim, heads = 128, 4
    p = _params(key, dim)
    x_q = jax.random.normal(jax.random.fold_in(key, 1), (2, 9, dim))
    x_kv = jax.random.normal(jax.random.fold_in(key, 2), (2, 130, dim))

    def loss_k(x_q, x_kv, p):
        return jnp.sum(mha_block(x_q, x_kv, p, heads, interpret=True) ** 2)

    def loss_r(x_q, x_kv, p):
        return jnp.sum(mha_block_reference(x_q, x_kv, p, heads) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x_q, x_kv, p)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x_q, x_kv, p)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gr)):
        # bwd cotangent g comes from the kernel forward (allclose to the
        # twin's), so grads agree to forward tolerance, not bitwise.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)


def test_fused_module_kernel_vs_twin(key):
    """FusedMHABlock(use_kernel) == FusedMHABlock(twin) on the same params."""
    m_k = FusedMHABlock(dim=128, heads=4, use_kernel=True)
    m_t = FusedMHABlock(dim=128, heads=4, use_kernel=False)
    x_q = jax.random.normal(jax.random.fold_in(key, 1), (2, 65, 128))
    x_kv = jax.random.normal(jax.random.fold_in(key, 2), (2, 256, 128))
    params = m_t.init(key, x_q, x_kv)["params"]
    y_t = m_t.apply({"params": params}, x_q, x_kv)
    y_k = m_k.apply({"params": params}, x_q, x_kv)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_t),
                               atol=2e-5, rtol=2e-5)


def test_fused_module_self_attn_shares_ln(key):
    m = FusedMHABlock(dim=128, heads=4, self_attn=True, use_kernel=False)
    x = jax.random.normal(key, (2, 16, 128))
    params = m.init(key, x)["params"]
    assert "ln_kv_scale" not in params          # shared with ln_q
    y = m.apply({"params": params}, x)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))


@pytest.mark.slow
def test_mixed_execution_shares_param_tree(key):
    """The learner runs the XLA twin and the act path the Pallas kernel on
    ONE checkpoint: `mha_block_kernel` must change execution only, never
    the param tree, and outputs must agree (rl/dqn.py:_td_loss relies on
    this)."""
    from multimodal_sc_tpu.config.presets import get_preset
    from multimodal_sc_tpu.envs import driving
    from multimodal_sc_tpu.rl.perception import QNetwork

    cfg_k = get_preset("c4").override(
        **{"pallas_mha_block": True, "mha_block_kernel": True})
    cfg_t = cfg_k.override(mha_block_kernel=False)
    es = driving.reset_batch(cfg_k.env, key, 2)
    img, pts, mask = driving.observe_batch(cfg_k.env, es)
    params = QNetwork(cfg_t).init(key, img, pts, mask,
                                  jax.random.key(0))["params"]
    params_k = QNetwork(cfg_k).init(key, img, pts, mask,
                                    jax.random.key(0))["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_k))
    q_t = QNetwork(cfg_t).apply({"params": params}, img, pts, mask,
                                jax.random.key(7))
    q_k = QNetwork(cfg_k).apply({"params": params}, img, pts, mask,
                                jax.random.key(7))
    np.testing.assert_allclose(np.asarray(q_k), np.asarray(q_t),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_fusion_transformer_fused_block_end_to_end(key):
    """Full fusion transformer with fused blocks: runs, differentiates, and
    produces finite outputs at flagship dims."""
    model = FusionTransformer(dim=128, depth=2, heads=4, state_dim=128,
                              fused_block=True)
    cam = jax.random.normal(jax.random.fold_in(key, 1), (2, 64, 128))
    lid = jax.random.normal(jax.random.fold_in(key, 2), (2, 256, 64))
    params = model.init(key, cam, lid)["params"]
    # Packed fused params present instead of the unfused MHA tree.
    assert "cam2lid_f" in params["layer0"]
    y, grads = jax.value_and_grad(
        lambda p: jnp.sum(model.apply({"params": p}, cam, lid) ** 2))(params)
    assert np.isfinite(float(y))
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))
