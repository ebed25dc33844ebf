"""Prefetcher: order, completeness, sharding."""

import numpy as np

from multimodal_sc_tpu.runtime.mesh import make_mesh
from multimodal_sc_tpu.runtime.prefetch import prefetch_to_device


def test_prefetch_preserves_order_and_count():
    batches = [{"x": np.full((8, 2), float(i))} for i in range(5)]
    out = list(prefetch_to_device(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_allclose(np.asarray(b["x"]), float(i))


def test_prefetch_with_mesh_shards_leading_axis(mesh8):
    batches = [{"x": np.arange(16, dtype=np.float32).reshape(8, 2)}]
    (b,) = list(prefetch_to_device(iter(batches), size=2, mesh=mesh8))
    assert "data" in str(b["x"].sharding.spec)


def test_prefetch_short_iterator():
    out = list(prefetch_to_device(iter([{"x": np.ones(8)}]), size=4))
    assert len(out) == 1


def test_prefetch_empty_iterator():
    assert list(prefetch_to_device(iter([]), size=2)) == []
