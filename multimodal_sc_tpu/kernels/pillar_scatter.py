"""Pillar scatter: per-point features -> BEV grid by max/sum pooling.

Spec: BASELINE.json:9 ("LiDAR point-cloud -> BEV pillar encoder");
SURVEY.md §2.2 names the pillar-scatter as one of the three Pallas kernels.
Reference repo has no kernels (``/root/reference/README.md:1-2``).

Two interchangeable implementations (SURVEY.md §4.2 kernel-test rule):
  * ``scatter_max_reference`` — XLA ``segment_max``; what jit uses by
    default (XLA lowers this well on TPU).
  * ``scatter_max_pallas`` — a Mosaic kernel that streams point blocks and
    max-accumulates rows into the output grid held in VMEM. Demonstrates
    the dynamic-store pattern; used when cfg.use_pallas is set.

Points with invalid/out-of-range cells are routed to a trash cell
(num_cells) that is sliced off, keeping shapes static under jit/vmap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG = -1e30


def scatter_max_reference(feats: Array, cell_idx: Array, num_cells: int) -> Array:
    """feats (N, D), cell_idx (N,) int32 in [0, num_cells] (num_cells=trash).

    Returns (num_cells, D) max-pooled features; empty cells are 0.
    """
    out = jax.ops.segment_max(
        feats, cell_idx, num_segments=num_cells + 1,
        indices_are_sorted=False, unique_indices=False,
    )
    out = out[:num_cells]
    return jnp.where(jnp.isfinite(out) & (out > _NEG / 2), out, 0.0)


def _scatter_kernel(idx_ref, feats_ref, out_ref, *, block_n, num_cells):
    """Grid: one program per point-block; out grid is revisited (accumulate).

    TPU grids execute sequentially, so read-modify-write on out_ref across
    programs is safe (no inter-program races on a single core).
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        # Identity for max; untouched cells are zeroed in the epilogue so
        # empty cells match the reference (0), while all-negative cells
        # keep their true (negative) max.
        out_ref[:] = jnp.full_like(out_ref, _NEG)

    n = feats_ref.shape[0]

    def body(j, _):
        cell = idx_ref[j]

        @pl.when(cell < num_cells)
        def _():
            row = out_ref[pl.ds(cell, 1), :]
            out_ref[pl.ds(cell, 1), :] = jnp.maximum(row, feats_ref[pl.ds(j, 1), :])

        return 0

    jax.lax.fori_loop(0, n, body, 0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _epilogue():
        out_ref[:] = jnp.where(out_ref[:] > _NEG / 2, out_ref[:], 0.0)


def scatter_max_pallas(
    feats: Array, cell_idx: Array, num_cells: int,
    block_n: int = 256, interpret: bool | None = None,
) -> Array:
    """Pallas twin of scatter_max_reference (same signature + semantics)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, d = feats.shape
    d_pad = ((d + 127) // 128) * 128
    n_pad = ((n + block_n - 1) // block_n) * block_n
    feats_p = jnp.pad(feats, ((0, n_pad - n), (0, d_pad - d)))
    idx_p = jnp.pad(cell_idx.astype(jnp.int32), (0, n_pad - n),
                    constant_values=num_cells)
    cells_pad = ((num_cells + 7) // 8) * 8

    out = pl.pallas_call(
        functools.partial(_scatter_kernel, block_n=block_n,
                          num_cells=num_cells),
        out_shape=jax.ShapeDtypeStruct((cells_pad, d_pad), feats.dtype),
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((block_n,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_n, d_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cells_pad, d_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(idx_p, feats_p)
    return out[:num_cells, :d]


def scatter_max(feats, cell_idx, num_cells, use_pallas: bool = False):
    if use_pallas:
        return scatter_max_pallas(feats, cell_idx, num_cells)
    return scatter_max_reference(feats, cell_idx, num_cells)
