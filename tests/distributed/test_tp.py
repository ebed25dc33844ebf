"""Tensor-parallel sharding tests: TP numerics == replicated numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_sc_tpu.fusion.transformer import FusionTransformer
from multimodal_sc_tpu.runtime import mesh as mesh_lib
from multimodal_sc_tpu.runtime.tp import tp_param_shardings


def test_tp_shards_expected_params(key):
    mesh = mesh_lib.make_mesh(data=4, model=2)
    model = FusionTransformer(dim=32, depth=1, heads=2, state_dim=16)
    cam = jax.random.normal(key, (2, 8, 24))
    lid = jax.random.normal(jax.random.fold_in(key, 1), (2, 6, 40))
    params = model.init(key, cam, lid)["params"]
    sh = tp_param_shardings(params, mesh)
    flat = {"/".join(str(k.key) for k in p): s
            for p, s in jax.tree_util.tree_leaves_with_path(sh)}
    # MLP up/down must be model-sharded; projections replicated biases.
    mlp1 = [s for n, s in flat.items() if "mlp1/kernel" in n]
    assert mlp1 and all(s.spec == P(None, "model") for s in mlp1)
    mlp2 = [s for n, s in flat.items() if "mlp2/kernel" in n]
    assert mlp2 and all(s.spec == P("model", None) for s in mlp2)
    q = [s for n, s in flat.items() if n.endswith("q/kernel")]
    assert q and all(s.spec == P(None, "model", None) for s in q)


def test_tp_forward_matches_replicated(key):
    mesh = mesh_lib.make_mesh(data=4, model=2)
    model = FusionTransformer(dim=32, depth=2, heads=2, state_dim=16)
    cam = jax.random.normal(key, (4, 8, 24))
    lid = jax.random.normal(jax.random.fold_in(key, 1), (4, 6, 40))
    params = model.init(key, cam, lid)["params"]

    @jax.jit
    def fwd(p, cam, lid):
        return model.apply({"params": p}, cam, lid)

    y_ref = fwd(params, cam, lid)

    p_tp = jax.device_put(params, tp_param_shardings(params, mesh))
    cam_s = jax.device_put(cam, NamedSharding(mesh, P("data", None, None)))
    lid_s = jax.device_put(lid, NamedSharding(mesh, P("data", None, None)))
    y_tp = fwd(p_tp, cam_s, lid_s)

    np.testing.assert_allclose(np.asarray(y_tp), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)


def test_tp_grad_step_matches_replicated(key):
    """TP-sharded grads == replicated grads (VERDICT r2 item 6): a wrong
    spec that silently replicates-or-mangles would diverge here, where the
    forward-only test could still pass."""
    import optax

    mesh = mesh_lib.make_mesh(data=4, model=2)
    model = FusionTransformer(dim=32, depth=2, heads=2, state_dim=16)
    cam = jax.random.normal(key, (4, 8, 24))
    lid = jax.random.normal(jax.random.fold_in(key, 1), (4, 6, 40))
    tgt = jax.random.normal(jax.random.fold_in(key, 2), (4, 16))
    params = model.init(key, cam, lid)["params"]
    # SGD, not Adam: Adam's first step is g/(|g|+eps) — sign-like, so it
    # amplifies sub-tolerance grad noise around 0 into ±2*lr param flips.
    # SGD is linear in the grad, making the updated-params check meaningful.
    tx = optax.sgd(1e-2)

    @jax.jit
    def grad_step(p, opt, cam, lid):
        def loss(p):
            return jnp.mean((model.apply({"params": p}, cam, lid) - tgt) ** 2)

        l, g = jax.value_and_grad(loss)(p)
        updates, opt = tx.update(g, opt, p)
        return l, g, optax.apply_updates(p, updates)

    opt = tx.init(params)
    l_ref, g_ref, p_ref = grad_step(params, opt, cam, lid)

    p_tp = jax.device_put(params, tp_param_shardings(params, mesh))
    opt_tp = tx.init(p_tp)
    cam_s = jax.device_put(cam, NamedSharding(mesh, P("data", None, None)))
    lid_s = jax.device_put(lid, NamedSharding(mesh, P("data", None, None)))
    l_tp, g_tp, p_new = grad_step(p_tp, opt_tp, cam_s, lid_s)

    np.testing.assert_allclose(float(l_tp), float(l_ref), rtol=1e-6)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_tp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg=f"grad {path}")
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(p_ref),
            jax.tree_util.tree_leaves_with_path(p_new)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg=f"param {path}")


def test_tp_actually_shrinks_per_device_bytes(key):
    """TP must SHARD, not replicate: per-device addressable bytes of each
    model-sharded kernel are 1/tp of the logical array, and the whole
    param tree occupies less per device than a replicated copy."""
    tp = 2
    mesh = mesh_lib.make_mesh(data=4, model=tp)
    model = FusionTransformer(dim=32, depth=1, heads=2, state_dim=16)
    cam = jax.random.normal(key, (2, 8, 24))
    lid = jax.random.normal(jax.random.fold_in(key, 1), (2, 6, 40))
    params = model.init(key, cam, lid)["params"]
    p_tp = jax.device_put(params, tp_param_shardings(params, mesh))

    dev0 = jax.devices()[0]

    def dev0_bytes(arr):
        return sum(s.data.nbytes for s in arr.addressable_shards
                   if s.device == dev0)

    total = sharded_total = dev0_total = 0
    n_sharded = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(p_tp):
        b0 = dev0_bytes(leaf)
        dev0_total += b0
        total += leaf.nbytes
        if "model" in str(leaf.sharding.spec):
            n_sharded += 1
            sharded_total += leaf.nbytes
            assert b0 * tp == leaf.nbytes, (
                f"{path}: device0 holds {b0} B of {leaf.nbytes} B "
                f"(expected 1/{tp})")
    assert n_sharded >= 8  # q/k/v/o x 4 MHA + 2 MLP pairs per layer
    # Per-device footprint strictly below a replicated copy by the sharded
    # fraction.
    assert dev0_total == total - sharded_total + sharded_total // tp


@pytest.mark.slow
def test_dqn_iteration_under_tp_mesh(key):
    """The full DQN iteration runs under GSPMD with TP-sharded params on a
    4x2 DPxTP mesh and matches the unsharded iteration (rl/dqn.py
    shard_state — VERDICT r2 item 6 'TP on the DQN path')."""
    import multimodal_sc_tpu as msc
    from multimodal_sc_tpu.rl import dqn as dqn_lib

    cfg = msc.get_preset("c4").override_str([
        "camera.features=8,16,16,16", "camera.c_sym=2",
        "camera.image_hw=16,16", "env.image_hw=16,16",
        "lidar.pillar_dim=16", "lidar.c_sym=2", "lidar.bev_hw=8,8",
        "fusion.dim=32", "fusion.depth=1", "fusion.heads=2",
        "fusion.state_dim=32",
        "env.num_npcs=2", "env.lidar_rays=16",
        "rl.replay_capacity=32", "rl.batch_size=8",
    ])
    mesh = mesh_lib.make_mesh(data=4, model=2)
    base = dqn_lib.init(cfg, key, num_envs=8)
    ref = jax.tree_util.tree_map(jnp.copy, base)
    tp_state = dqn_lib.shard_state(base, mesh, tp=True)

    # Params really are model-sharded on the mesh.
    assert any("model" in str(leaf.sharding.spec) for leaf in
               jax.tree_util.tree_leaves(tp_state.params))

    it = dqn_lib.make_iteration(cfg)
    for i in range(6):
        tp_state, m_tp = it(tp_state)
        ref, m_ref = it(ref)
        for k in m_ref:
            np.testing.assert_allclose(
                np.asarray(m_tp[k]), np.asarray(m_ref[k]),
                rtol=1e-5, atol=1e-6, err_msg=f"iter {i} metric {k}")
