"""Whole-MHA-span fused Pallas kernel: LN -> QKV -> attention -> out-proj.

Spec: BASELINE.json:5 ("codecs become fused Pallas conv/attention
kernels"). Round 2 isolated WHY the packed-head attention kernel loses
in-graph despite winning isolated: the ``pallas_call`` boundary stops XLA
from fusing attention with its LayerNorm / projection / residual
neighbors (BASELINE.md "Negative result"). This kernel is the r2-verdict
counter-move (VERDICT r2 item 1): widen the kernel to swallow that whole
neighborhood —

    out = x_q + (attention(LN_q(x_q) Wq, LN_kv(x_kv) Wk, LN_kv(x_kv) Wv)) Wo

— one Pallas program per batch element, so there is nothing left at the
boundary for XLA to fuse across. Layout rules carried over from
``attention_packed.py``: heads stay packed in the 128-lane dim (model dim
must be exactly one lane group), per-head logits are lane-masked
full-width matmuls (one MXU pass regardless of head dim <= 128), whole
K/V resident in VMEM (short-sequence x huge-batch regime), weights pinned
in VMEM across the batch grid via constant index maps.

Backward: ``jax.custom_vjp`` whose bwd recomputes through the XLA twin
(``mha_block_reference``) — the r2 A/Bs showed XLA autodiff IS the
production-best backward at these sizes, so the fused kernel accelerates
the forward/act hot path while training keeps exact XLA-twin gradients.

Twin + interpret-mode allclose tests: ``tests/kernels/test_mha_block.py``
(repo kernel convention). Reference repo has no kernels
(``/root/reference/README.md:1-2``).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_NEG_INF = -1e30
_LANES = 128
_MAX_LK_PAD = 2048
_EPS = 1e-6

PARAM_KEYS = ("ln_q_scale", "ln_q_bias", "ln_kv_scale", "ln_kv_bias",
              "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo")


def block_eligible(heads: int, dim: int, lk: int) -> bool:
    """Model dim exactly one lane group; heads pack evenly; K/V fit VMEM."""
    if dim != _LANES or dim % heads:
        return False
    d = dim // heads
    lk_pad = _round_up(lk, _LANES)
    return _LANES % d == 0 and lk_pad <= _MAX_LK_PAD


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _layer_norm(x: Array, scale: Array, bias: Array) -> Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + _EPS) * scale + bias


def mha_block_reference(x_q: Array, x_kv: Array, p: Dict[str, Array],
                        heads: int, scale: Optional[float] = None) -> Array:
    """XLA twin with identical semantics (and the backward's recompute
    path). Params are in the packed layout: wq/wk/wv (dim, heads*d)
    head-major in the output lanes, wo (heads*d, dim)."""
    dm = x_q.shape[-1]
    d = dm // heads
    if scale is None:
        scale = d ** -0.5
    xq = _layer_norm(x_q.astype(jnp.float32), p["ln_q_scale"], p["ln_q_bias"])
    xkv = _layer_norm(x_kv.astype(jnp.float32), p["ln_kv_scale"],
                      p["ln_kv_bias"])
    q = xq @ p["wq"] + p["bq"]
    k = xkv @ p["wk"] + p["bk"]
    v = xkv @ p["wv"] + p["bv"]
    b, lq, _ = q.shape
    lk = k.shape[1]

    def split(x, l):
        return x.reshape(b, l, heads, d).transpose(0, 2, 1, 3)

    logits = jnp.einsum("bhqd,bhkd->bhqk", split(q, lq), split(k, lk),
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs, split(v, lk),
                   preferred_element_type=jnp.float32)
    o = o.transpose(0, 2, 1, 3).reshape(b, lq, dm)
    return (x_q.astype(jnp.float32) + o @ p["wo"] + p["bo"]).astype(
        x_q.dtype)


def _head_mask(h: int, d: int) -> Array:
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    return (lane // d == h).astype(jnp.float32)


def _mm(a: Array, b: Array, dims, bf16: bool) -> Array:
    if bf16:
        a, b = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _block_kernel(xq_ref, xkv_ref, lnqs_ref, lnqb_ref, lnks_ref, lnkb_ref,
                  wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
                  wo_ref, bo_ref, o_ref, *, d, scale, lk_valid, bf16):
    xq_res = xq_ref[0].astype(jnp.float32)            # (lq_pad, 128)
    xkv = xkv_ref[0].astype(jnp.float32)              # (lk_pad, 128)
    lq_pad = xq_res.shape[0]
    lk_pad = xkv.shape[0]

    xq = _layer_norm(xq_res, lnqs_ref[0], lnqb_ref[0])
    xkv = _layer_norm(xkv, lnks_ref[0], lnkb_ref[0])

    q = _mm(xq, wq_ref[...], ((1,), (0,)), bf16) + bq_ref[0]
    k = _mm(xkv, wk_ref[...], ((1,), (0,)), bf16) + bk_ref[0]
    v = _mm(xkv, wv_ref[...], ((1,), (0,)), bf16) + bv_ref[0]

    col_ok = jax.lax.broadcasted_iota(jnp.int32, (lq_pad, lk_pad), 1) \
        < lk_valid
    acc = jnp.zeros((lq_pad, _LANES), jnp.float32)
    for h in range(_LANES // d):
        m_h = _head_mask(h, d)
        s = _mm(q * m_h, k, ((1,), (1,)), bf16) * scale
        s = jnp.where(col_ok, s, _NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        acc = acc + _mm(p, v * m_h, ((1,), (0,)), bf16)

    out = xq_res + _mm(acc, wo_ref[...], ((1,), (0,)), bf16) + bo_ref[0]
    o_ref[0] = out.astype(o_ref.dtype)


def _pad_l(x: Array, l_pad: int) -> Array:
    return jnp.pad(x, ((0, 0), (0, l_pad - x.shape[1]), (0, 0)))


def _fwd_impl(x_q, x_kv, flat_params, d, scale, interpret, bf16):
    b, lq, dm = x_q.shape
    lk = x_kv.shape[1]
    lq_pad = _round_up(lq, 8)
    lk_pad = _round_up(lk, _LANES)
    xq = _pad_l(x_q, lq_pad)
    xkv = _pad_l(x_kv, lk_pad)

    def vec2d(x):
        return x.reshape(1, _LANES)

    lnqs, lnqb, lnks, lnkb, wq, bq, wk, bk, wv, bv, wo, bo = flat_params
    vecs = [vec2d(v) for v in (lnqs, lnqb, lnks, lnkb)]
    biases = [vec2d(v) for v in (bq, bk, bv, bo)]

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    vec_spec = const_spec((1, _LANES))
    w_spec = const_spec((_LANES, _LANES))

    out = pl.pallas_call(
        functools.partial(_block_kernel, d=d, scale=scale, lk_valid=lk,
                          bf16=bf16),
        out_shape=jax.ShapeDtypeStruct((b, lq_pad, dm), x_q.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, lq_pad, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_pad, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vec_spec, vec_spec, vec_spec, vec_spec,        # LN scale/bias
            w_spec, vec_spec,                              # wq, bq
            w_spec, vec_spec,                              # wk, bk
            w_spec, vec_spec,                              # wv, bv
            w_spec, vec_spec,                              # wo, bo
        ],
        out_specs=pl.BlockSpec((1, lq_pad, _LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xq, xkv, vecs[0], vecs[1], vecs[2], vecs[3],
      wq, biases[0], wk, biases[1], wv, biases[2], wo, biases[3])
    return out[:, :lq, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _mha_block(x_q, x_kv, flat_params, heads, scale, interpret, bf16):
    d = x_q.shape[-1] // heads
    return _fwd_impl(x_q, x_kv, flat_params, d, scale, interpret, bf16)


def _mha_block_fwd(x_q, x_kv, flat_params, heads, scale, interpret, bf16):
    out = _mha_block(x_q, x_kv, flat_params, heads, scale, interpret, bf16)
    return out, (x_q, x_kv, flat_params)


def _mha_block_bwd(heads, scale, interpret, bf16, res, g):
    # Recompute-through-the-twin backward: XLA autodiff of the reference
    # is the measured-best backward at production sizes (r2 A/Bs); the
    # Pallas win is the forward/act path.
    x_q, x_kv, flat_params = res

    def f(x_q, x_kv, flat_params):
        p = dict(zip(PARAM_KEYS, flat_params))
        return mha_block_reference(x_q, x_kv, p, heads, scale)

    _, vjp = jax.vjp(f, x_q, x_kv, flat_params)
    return vjp(g)


_mha_block.defvjp(_mha_block_fwd, _mha_block_bwd)


def mha_block(
    x_q: Array,
    x_kv: Array,
    params: Dict[str, Any],
    heads: int,
    scale: Optional[float] = None,
    interpret: Optional[bool] = None,
    mxu_bf16: Optional[bool] = None,
) -> Array:
    """Fused LN+QKV+attention+out-proj+residual block.

    Numerically matches ``mha_block_reference`` (same packed param
    layout); differentiable via twin-recompute VJP. Callers must check
    ``block_eligible`` first. ``mxu_bf16`` mirrors the packed kernel's
    default: bf16-operand MXU matmuls on compiled TPU (XLA 'default'
    precision semantics), exact f32 in interpret mode for tight tests.
    """
    dm = x_q.shape[-1]
    if not block_eligible(heads, dm, x_kv.shape[1]):
        raise ValueError(
            f"mha_block ineligible for dim={dm} heads={heads} "
            f"lk={x_kv.shape[1]}")
    if scale is None:
        scale = (dm // heads) ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if mxu_bf16 is None:
        mxu_bf16 = not interpret
    flat = tuple(params[k] for k in PARAM_KEYS)
    return _mha_block(x_q, x_kv, flat, heads, float(scale),
                      bool(interpret), bool(mxu_bf16))
