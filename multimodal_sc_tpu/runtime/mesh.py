"""Mesh & sharding runtime (SURVEY.md §1.2 L1, §5.8).

Spec: BASELINE.json:5 — "sharded over a TPU mesh". The reference has no
distributed code at all (``/root/reference/README.md:1-2``); on TPU the
XLA runtime over ICI *is* the communication backend, so this layer only
(1) builds a ``jax.sharding.Mesh`` that degrades gracefully to one chip,
(2) names the canonical shardings, and (3) wraps host->device transfer.

Axes: ``data`` (batch / envs / replay shards — primary, rides ICI all-reduce
for grads) and ``model`` (optional tensor parallelism for the fusion
transformer / ViT). GSPMD inserts collectives from NamedShardings; explicit
psum lives inside shard_map call sites where the schedule matters.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int = -1,
    model: int = 1,
    axis_names: Sequence[str] = (DATA_AXIS, MODEL_AXIS),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh; data=-1 means 'all remaining devices'."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model < 1:
        model = 1
    if data == -1:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, have {n}")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over `data`, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """device_put a pytree of host arrays with leading-axis data sharding."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), tree
    )


def replicate(mesh: Mesh, tree):
    """device_put a pytree fully replicated over the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def local_batch_size(mesh: Mesh, global_batch: int) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by data={n}")
    return global_batch // n
