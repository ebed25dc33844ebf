"""Pallas pillar-scatter vs XLA segment_max twin + hand cases."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_sc_tpu.kernels.pillar_scatter import (
    scatter_max_pallas,
    scatter_max_reference,
)


def test_reference_hand_case():
    feats = jnp.array([[1.0, 2.0], [3.0, 1.0], [0.5, 9.0], [7.0, 7.0]])
    idx = jnp.array([0, 0, 2, 3])  # cell 1 empty; 3 == trash for num_cells=3
    out = scatter_max_reference(feats, idx, 3)
    expected = np.array([[3.0, 2.0], [0.0, 0.0], [0.5, 9.0]])
    np.testing.assert_allclose(np.asarray(out), expected)


def test_pallas_matches_reference(key):
    # Small sizes: interpret-mode per-point dynamic stores are slow on CPU.
    n, d, cells = 128, 8, 32
    feats = jax.random.normal(key, (n, d))
    idx = jax.random.randint(jax.random.fold_in(key, 1), (n,), 0, cells + 1)
    ref = scatter_max_reference(feats, idx, cells)
    pal = scatter_max_pallas(feats, idx, cells, block_n=64, interpret=True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=1e-6)


def test_pallas_all_trash(key):
    feats = jax.random.normal(key, (64, 8))
    idx = jnp.full((64,), 16, jnp.int32)
    out = scatter_max_pallas(feats, idx, 16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), 0.0)
