"""Tensor-parallel (model-axis) param shardings (SURVEY.md §2.3 "TP").

The fusion transformer and ViT blocks are the only components large enough
to benefit from TP; their head and MLP-hidden dimensions shard over mesh
axis ``model`` while everything else replicates. GSPMD then inserts the
all-gather/reduce-scatter pattern over ICI — no manual collectives needed
(SURVEY.md §5.8).

Usage: ``params = jax.device_put(params, tp_param_shardings(params, mesh))``
before jitting; jit propagates the shardings through the whole step.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_sc_tpu.runtime.mesh import MODEL_AXIS


def _spec_for(path: str, leaf) -> P:
    """PartitionSpec for one param, keyed by its flax path.

    Megatron-style pairing: column-parallel into the block (QKV / MLP up),
    row-parallel out of it (attention output / MLP down), so each
    transformer block needs exactly one reduction.
    """
    ndim = getattr(leaf, "ndim", 0)
    if path.endswith("/bias") or ndim < 2:
        return P()
    # Attention projections (DenseGeneral): q/k/v kernels (in, heads, hd)
    # shard heads; output kernel (heads, hd, out) shards heads (row-par).
    if any(f"/{n}/kernel" in path for n in ("q", "k", "v")) and ndim == 3:
        return P(None, MODEL_AXIS, None)
    if "/o/kernel" in path and ndim == 3:
        return P(MODEL_AXIS, None, None)
    # Transformer MLP: up column-parallel, down row-parallel.
    if any(s in path for s in ("mlp1/kernel", "cam_mlp1/kernel",
                               "lid_mlp1/kernel", "fc1/kernel")):
        return P(None, MODEL_AXIS)
    if any(s in path for s in ("mlp2/kernel", "cam_mlp2/kernel",
                               "lid_mlp2/kernel", "fc2/kernel")):
        return P(MODEL_AXIS, None)
    return P()


def tp_param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for TP over the fusion/ViT transformer blocks."""

    def to_sharding(path, leaf):
        pstr = "/".join(str(getattr(k, "key", k)) for k in path)
        return NamedSharding(mesh, _spec_for(pstr, leaf))

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def apply_tp(params: Any, mesh: Mesh) -> Any:
    """device_put params with TP shardings."""
    return jax.device_put(params, tp_param_shardings(params, mesh))
