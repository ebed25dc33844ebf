"""Distributed tests on the 8-virtual-device CPU mesh (SURVEY.md §4.2).

(i) sharded train_step numerics == single-device numerics,
(ii) replay buffers shard round-trip, (iii) psum reductions match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_sc_tpu.runtime import mesh as mesh_lib


def test_mesh_has_8_devices(mesh8):
    assert mesh8.shape["data"] == 8
    assert mesh8.shape["model"] == 1


def test_make_mesh_degrades_to_one_device():
    m = mesh_lib.make_mesh(devices=jax.devices()[:1])
    assert m.shape["data"] == 1


def test_shard_batch_roundtrip(mesh8, key):
    x = np.arange(8 * 4 * 3, dtype=np.float32).reshape(8, 4, 3)
    xs = mesh_lib.shard_batch(mesh8, {"x": x})["x"]
    assert xs.sharding.spec == P("data", None, None)
    np.testing.assert_array_equal(np.asarray(xs), x)


def test_psum_matches_sum(mesh8, key):
    from jax import shard_map

    x = jax.random.normal(key, (8, 16))

    @jax.jit
    def reduced(x):
        def f(xb):
            return jax.lax.psum(jnp.sum(xb), "data")

        return shard_map(
            f, mesh=mesh8, in_specs=P("data", None), out_specs=P()
        )(x)

    np.testing.assert_allclose(float(reduced(x)), float(jnp.sum(x)),
                               rtol=1e-5)


def test_sharded_jscc_train_step_matches_single_device(mesh8, key):
    """Same batch, same seed: data-sharded step == single-device step."""
    import multimodal_sc_tpu as msc
    from multimodal_sc_tpu.train import jscc

    cfg = msc.get_preset("c1").override_str([
        "camera.features=8,16,16,16", "camera.c_sym=2",
        "train.batch_size=16", "train.lr=1e-3",
    ])
    state = jscc.create_train_state(cfg, key)
    model = jscc.build_model(cfg)
    step = jscc.make_train_step(cfg, model)
    img = jax.random.uniform(jax.random.fold_in(key, 1), (16, 32, 32, 3))
    k = jax.random.key(7)

    # Single device.
    s1, m1 = step(state, img, None, k)

    # Sharded over the 8-device mesh.
    state_r = mesh_lib.replicate(mesh8, state)
    img_s = jax.device_put(img, NamedSharding(mesh8, P("data", None, None, None)))
    s2, m2 = step(state_r, img_s, None, k)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_replay_sharded_add_sample(mesh8, key):
    """Per-shard replay: shard_map add+sample runs independently per shard."""
    from jax import shard_map

    from multimodal_sc_tpu.rl import replay

    capacity = 16
    example = {"x": jnp.zeros((4,), jnp.float32)}

    def make_buf():
        return replay.create(example, capacity)

    # 8 independent per-shard buffers: leading axis = data shards.
    bufs = jax.vmap(lambda _: make_buf())(jnp.arange(8))
    items = jax.random.normal(key, (8, 4))

    @jax.jit
    def add_and_sample(bufs, items, key):
        def f(buf, item, k):
            buf = jax.tree_util.tree_map(lambda x: x[0], buf)
            b2 = replay.add(buf, {"x": item[0]})
            out = replay.sample(b2, k[0], 4)
            b2 = jax.tree_util.tree_map(lambda x: x[None], b2)
            return b2, jax.tree_util.tree_map(lambda x: x[None], out)

        keys = jax.random.split(key, 8)
        return shard_map(
            f, mesh=mesh8,
            in_specs=(P("data"), P("data"), P("data")),
            out_specs=(P("data"), P("data")),
        )(bufs, items, keys)

    bufs2, out = add_and_sample(bufs, items, jax.random.key(3))
    assert int(bufs2.size[0]) == 1
    # Every shard's samples must equal its own (only) item.
    for i in range(8):
        np.testing.assert_allclose(np.asarray(out["x"][i]),
                                   np.tile(np.asarray(items[i]), (4, 1)))
