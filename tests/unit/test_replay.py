"""Replay buffer: wraparound, sampling stats, determinism (SURVEY §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_sc_tpu.rl import replay


def _example():
    return {"x": jnp.zeros((3,)), "a": jnp.int32(0)}


def test_add_and_size():
    buf = replay.create(_example(), capacity=4)
    for i in range(3):
        buf = replay.add(buf, {"x": jnp.full((3,), float(i)),
                               "a": jnp.int32(i)})
    assert int(buf.size) == 3
    assert int(buf.cursor) == 3
    np.testing.assert_allclose(np.asarray(buf.data["x"][1]), 1.0)


def test_wraparound():
    buf = replay.create(_example(), capacity=4)
    for i in range(6):
        buf = replay.add(buf, {"x": jnp.full((3,), float(i)),
                               "a": jnp.int32(i)})
    assert int(buf.size) == 4
    assert int(buf.cursor) == 2
    # slots now hold 4,5,2,3
    got = sorted(int(v) for v in np.asarray(buf.data["a"]))
    assert got == [2, 3, 4, 5]


def test_add_batch_larger_than_capacity_is_an_error():
    """b > capacity would scatter duplicate indices (order-undefined in
    XLA) and over-count size; add_batch rejects it at trace time
    (ADVICE r1)."""
    import pytest

    buf = replay.create(_example(), capacity=4)
    batch = {"x": jnp.arange(18, dtype=jnp.float32).reshape(6, 3),
             "a": jnp.arange(6, dtype=jnp.int32)}
    with pytest.raises(ValueError, match="exceeds capacity"):
        replay.add_batch(buf, batch)


def test_add_batch_wraparound_within_capacity():
    buf = replay.create(_example(), capacity=4)
    first = {"x": jnp.zeros((3, 3), jnp.float32),
             "a": jnp.arange(3, dtype=jnp.int32)}
    buf = replay.add_batch(buf, first)           # cursor 3, holds 0,1,2
    second = {"x": jnp.ones((3, 3), jnp.float32),
              "a": jnp.arange(3, 6, dtype=jnp.int32)}
    buf = replay.add_batch(buf, second)          # wraps: slots 3,0,1
    assert int(buf.size) == 4
    assert int(buf.cursor) == 2
    got = sorted(int(v) for v in np.asarray(buf.data["a"]))
    assert got == [2, 3, 4, 5]


def test_sample_uniform_statistics(key):
    buf = replay.create(_example(), capacity=8)
    for i in range(8):
        buf = replay.add(buf, {"x": jnp.zeros((3,)), "a": jnp.int32(i)})
    out = replay.sample(buf, key, 8000)
    counts = np.bincount(np.asarray(out["a"]), minlength=8)
    # Uniform: each ~1000; loose 5-sigma band.
    assert counts.min() > 800 and counts.max() < 1200


def test_sample_only_valid_prefix(key):
    buf = replay.create(_example(), capacity=16)
    for i in range(4):
        buf = replay.add(buf, {"x": jnp.zeros((3,)), "a": jnp.int32(i + 10)})
    out = replay.sample(buf, key, 256)
    vals = set(int(v) for v in np.asarray(out["a"]))
    assert vals <= {10, 11, 12, 13}


def test_deterministic_under_key(key):
    buf = replay.create(_example(), capacity=8)
    for i in range(8):
        buf = replay.add(buf, {"x": jnp.zeros((3,)), "a": jnp.int32(i)})
    a1 = replay.sample(buf, key, 32)["a"]
    a2 = replay.sample(buf, key, 32)["a"]
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_jit_compatible(key):
    buf = replay.create(_example(), capacity=8)

    @jax.jit
    def push_and_sample(buf, key):
        buf = replay.add(buf, {"x": jnp.ones((3,)), "a": jnp.int32(7)})
        return buf, replay.sample(buf, key, 4)

    buf, out = push_and_sample(buf, key)
    assert int(buf.size) == 1
    assert np.asarray(out["a"]).shape == (4,)
