"""Fused flash-style multi-head attention (self & cross) Pallas TPU kernel.

Spec: BASELINE.json:5 — "fused Pallas conv/attention kernels". The reference
has no kernels (``/root/reference/README.md:1-2``); this design follows the
standard blockwise-softmax (flash) recipe mapped to TPU per the Pallas guide:
Q blocks stream over the grid's innermost KV loop, running max/denominator
accumulators live in VMEM scratch, matmuls hit the MXU with
``preferred_element_type=float32``.

Every kernel here has an XLA reference twin (``*_reference``) with the same
signature; tests assert allclose in interpret mode on CPU and compiled mode
on TPU (SURVEY.md §4.2 "Kernel tests"). A custom VJP recomputes attention
flash-style in the backward pass so training can use the kernel too.

Shapes: q (B, H, Lq, D), k/v (B, H, Lk, D). D and block sizes are padded to
MXU/VPU-friendly multiples internally; sequence lengths may be arbitrary
(masked tail).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG_INF = -1e30


def attention_reference(
    q: Array, k: Array, v: Array, scale: Optional[float] = None
) -> Array:
    """Plain-XLA reference attention. q:(B,H,Lq,D) k,v:(B,H,Lk,D)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, lk_valid,
                  block_k):
    """One (batch*head, q-block) program: loop KV blocks with running
    max/denominator in fp32."""
    q = q_ref[0].astype(jnp.float32) * scale            # (Bq, D)
    lk_padded = k_ref.shape[1]
    num_kb = lk_padded // block_k

    bq, d = q.shape
    m = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        kb = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        vb = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, kb.T, preferred_element_type=jnp.float32)  # (Bq, Bk)
        # Mask padded tail keys.
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_k
        s = jnp.where(col < lk_valid, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, vb,
                                        preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m, l, acc))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    # Logsumexp per row for the backward pass (flash recipe). Layout
    # (bh, 1, lq): Mosaic requires the last two block dims to divide
    # (8, 128) or equal the array dims — a (1, block_q) 2D block does not.
    lse_ref[0, 0, :] = (m + jnp.log(jnp.maximum(l, 1e-30))).reshape(-1)


def _pad_qkv(q, k, v, block_q, block_k):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    d_pad = _round_up(d, 128)
    lq_pad = _round_up(lq, block_q)
    lk_pad = _round_up(lk, block_k)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad - lq), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, lk_pad - lk), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, lk_pad - lk), (0, d_pad - d)))
    bh = b * h
    return (qp.reshape(bh, lq_pad, d_pad), kp.reshape(bh, lk_pad, d_pad),
            vp.reshape(bh, lk_pad, d_pad), lq_pad, lk_pad, d_pad)


def _flash_attention_fwd_impl(
    q: Array, k: Array, v: Array, scale: float,
    block_q: int, block_k: int, interpret: bool,
):
    """Returns (out (B,H,Lq,D), lse (bh, lq_pad) fp32 residual)."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    qp, kp, vp, lq_pad, lk_pad, d_pad = _pad_qkv(q, k, v, block_q, block_k)
    bh = b * h

    grid = (bh, lq_pad // block_q)
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, lk_valid=lk,
                          block_k=block_k),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lq_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, lq_pad), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, lq_pad, d_pad)[:, :, :lq, :d], lse


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   *, scale, lk_valid, block_k):
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0, :].reshape(-1, 1)
    delta = delta_ref[0, 0, :].reshape(-1, 1)
    lk_pad = k_ref.shape[1]
    bq, d = q.shape
    dq = jnp.zeros((bq, d), jnp.float32)

    def body(i, dq):
        kb = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        vb = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, kb.T, preferred_element_type=jnp.float32) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_k
        s = jnp.where(col < lk_valid, s, _NEG_INF)
        p = jnp.exp(s - lse)
        dp = jnp.dot(do, vb.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jnp.dot(ds, kb, preferred_element_type=jnp.float32) * scale

    dq = jax.lax.fori_loop(0, lk_pad // block_k, body, dq)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, *, scale, lk_valid, block_q, kv_block):
    kb = k_ref[0].astype(jnp.float32)           # (Bk, D) current kv block
    vb = v_ref[0].astype(jnp.float32)
    j = pl.program_id(1)
    lq_pad = q_ref.shape[1]
    bk, d = kb.shape
    dk = jnp.zeros((bk, d), jnp.float32)
    dv = jnp.zeros((bk, d), jnp.float32)
    # Mask for padded keys inside this block (their grads are sliced off,
    # but keep p finite).
    col = (jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
           + j * kv_block)
    key_valid = col < lk_valid

    def body(i, carry):
        dk, dv = carry
        qb = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        dob = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lseb = lse_ref[0, 0, pl.ds(i * block_q, block_q)].reshape(-1, 1)
        deltab = delta_ref[0, 0, pl.ds(i * block_q, block_q)].reshape(-1, 1)
        s = jnp.dot(qb, kb.T, preferred_element_type=jnp.float32) * scale
        s = jnp.where(key_valid, s, _NEG_INF)
        p = jnp.exp(s - lseb)                    # (Bq, Bk)
        dv = dv + jnp.dot(p.T, dob, preferred_element_type=jnp.float32)
        dp = jnp.dot(dob, vb.T, preferred_element_type=jnp.float32)
        ds = p * (dp - deltab)
        dk = dk + jnp.dot(ds.T, qb, preferred_element_type=jnp.float32) * scale
        return dk, dv

    dk, dv = jax.lax.fori_loop(0, lq_pad // block_q, body, (dk, dv))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_attention_bwd_impl(
    q, k, v, out, lse, g, scale, block_q, block_k, interpret,
):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    qp, kp, vp, lq_pad, lk_pad, d_pad = _pad_qkv(q, k, v, block_q, block_k)
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, lq_pad - lq), (0, d_pad - d)))
    bh = b * h
    gp = gp.reshape(bh, lq_pad, d_pad)
    # delta = rowsum(dO * O); padded rows give 0 (dO padding is zero).
    op = jnp.pad(out, ((0, 0), (0, 0), (0, lq_pad - lq), (0, d_pad - d)))
    delta = jnp.sum(gp * op.reshape(bh, lq_pad, d_pad).astype(jnp.float32),
                    axis=-1).reshape(bh, 1, lq_pad)

    common = [
        pl.BlockSpec((1, lk_pad, d_pad), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lk_pad, d_pad), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, lk_valid=lk,
                          block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((bh, lq_pad, d_pad), q.dtype),
        grid=(bh, lq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            *common,
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, kp, vp, gp, lse, delta)

    q_full = [
        pl.BlockSpec((1, lq_pad, d_pad), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lq_pad, d_pad), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, lq_pad), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, lq_pad), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, lk_valid=lk,
                          block_q=block_q, kv_block=block_k),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lk_pad, d_pad), k.dtype),
            jax.ShapeDtypeStruct((bh, lk_pad, d_pad), v.dtype),
        ),
        grid=(bh, lk_pad // block_k),
        in_specs=[
            q_full[0],
            pl.BlockSpec((1, block_k, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            q_full[1], q_full[2], q_full[3],
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(qp, kp, vp, gp, lse, delta)

    dq = dq.reshape(b, h, lq_pad, d_pad)[:, :, :lq, :d]
    dk = dk.reshape(b, h, lk_pad, d_pad)[:, :, :lk, :d]
    dv = dv.reshape(b, h, lk_pad, d_pad)[:, :, :lk, :d]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention(q, k, v, scale, block_q, block_k, interpret):
    out, _ = _flash_attention_fwd_impl(q, k, v, scale, block_q, block_k,
                                       interpret)
    return out


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret):
    out, lse = _flash_attention_fwd_impl(q, k, v, scale, block_q, block_k,
                                         interpret)
    return out, (q, k, v, out, lse)


def _flash_bwd(scale, block_q, block_k, interpret, res, g):
    # Dedicated Pallas backward kernels (flash recipe): dV = P^T dO,
    # dS = P (dO V^T - rowsum(dO*O)), dQ = dS K, dK = dS^T Q, with P
    # recomputed from the saved logsumexp — O(L) memory, all MXU matmuls.
    q, k, v, out, lse = res
    return _flash_attention_bwd_impl(q, k, v, out, lse, g, scale, block_q,
                                     block_k, interpret)


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: Array,
    k: Array,
    v: Array,
    scale: Optional[float] = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: Optional[bool] = None,
) -> Array:
    """Fused flash attention; drop-in for attention_reference."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lq, lk = q.shape[2], k.shape[2]
    block_q = min(block_q, _round_up(lq, 128))
    block_k = min(block_k, _round_up(lk, 128))
    return _flash_attention(q, k, v, float(scale), block_q, block_k,
                            bool(interpret))


def attention(q, k, v, scale=None, use_pallas: bool = False):
    """Dispatch: Pallas kernel when enabled, XLA reference otherwise."""
    if use_pallas:
        return flash_attention(q, k, v, scale)
    return attention_reference(q, k, v, scale)
