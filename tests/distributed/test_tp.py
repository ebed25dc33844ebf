"""Tensor-parallel sharding tests: TP numerics == replicated numerics."""

import jax
import jax.numpy as jnp
import numpy as np
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
