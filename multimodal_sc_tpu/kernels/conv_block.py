"""Fused conv + bias + PReLU Pallas TPU kernel for the CNN-JSCC blocks.

Spec: BASELINE.json:5 — "fused Pallas conv/attention kernels"; SURVEY.md
§2.2 row "Pallas kernel set" (a). Reference repo has no kernels
(``/root/reference/README.md:1-2``).

Design (per the Pallas guide + SURVEY §7 hard-part 5 fallback):
  * The conv is expressed as K*K shifted (H*W, Cin) x (Cin, Cout) matmuls
    accumulated in fp32 — every FLOP lands on the MXU, and bias + PReLU are
    fused into the same VMEM-resident kernel (no extra HBM round-trip).
  * One grid program per image: JSCC feature maps are small (<=64x64), so a
    whole padded image fits comfortably in VMEM.
  * Stride-2 convs are rewritten as stride-1 convs over a space-to-depth
    transform of the input (kernel pad 5->6, reshape (3,2,3,2,Ci,Co) ->
    (3,3,4Ci,Co)) — a static XLA rearrangement instead of strided VMEM
    reads, which Mosaic dislikes.

``conv_prelu_reference`` is the XLA twin with identical semantics; tests
assert allclose in interpret mode (SURVEY §4.2 kernel-test rule).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def conv_prelu_reference(
    x: Array, w: Array, b: Array, alpha: Optional[Array],
    stride: int = 1,
) -> Array:
    """XLA twin: SAME conv (NHWC, HWIO) + bias + optional PReLU."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + b
    if alpha is not None:
        y = jnp.where(y >= 0, y, y * alpha)
    return y


def _conv_kernel(x_ref, w_ref, b_ref, a_ref, o_ref, *, K, H, W, with_prelu):
    cin = x_ref.shape[-1]
    cout = o_ref.shape[-1]
    acc = jnp.zeros((H * W, cout), jnp.float32)
    for ky in range(K):
        for kx in range(K):
            xs = x_ref[0, ky:ky + H, kx:kx + W, :].reshape(H * W, cin)
            acc = acc + jnp.dot(
                xs.astype(jnp.float32),
                w_ref[ky, kx].astype(jnp.float32),
                preferred_element_type=jnp.float32)
    y = acc + b_ref[0].astype(jnp.float32)
    if with_prelu:
        alpha = a_ref[0].astype(jnp.float32)
        y = jnp.where(y >= 0, y, y * alpha)
    o_ref[0] = y.reshape(H, W, cout).astype(o_ref.dtype)


def _conv_prelu_pallas_s1(
    x: Array, w: Array, b: Array, alpha: Optional[Array],
    interpret: bool,
) -> Array:
    """Stride-1 SAME conv + bias (+ PReLU), one program per image."""
    n, h, wd, cin = x.shape
    K = w.shape[0]
    # XLA SAME stride-1 pads lo=(K-1)//2, hi=K-1-lo (back-heavy for even K).
    pad = (K - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, K - 1 - pad), (pad, K - 1 - pad), (0, 0)))
    cout = w.shape[-1]
    with_prelu = alpha is not None
    a = alpha if with_prelu else jnp.zeros((cout,), x.dtype)

    return pl.pallas_call(
        functools.partial(_conv_kernel, K=K, H=h, W=wd,
                          with_prelu=with_prelu),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, cout), x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h + K - 1, wd + K - 1, cin),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K, cin, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wd, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, w, b.reshape(1, cout), a.reshape(1, cout))


def _space_to_depth(x: Array) -> Array:
    """(N, H, W, C) -> (N, H/2, W/2, 4C); pads odd H/W first."""
    n, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def _weights_to_s2d(w: Array) -> Array:
    """Regroup (K,K,Ci,Co) weights for the space-to-depth input.

    With tap index k = 2u + a (a in {0,1}), x[2o + k] = s2d(x)[o + u, ch a],
    so the stride-2 conv becomes a stride-1 conv with kernel Ku = ceil(K/2)
    over 4*Ci channels. Pad K to even at the END (k keeps its offset).
    """
    K = w.shape[0]
    Kp = K + (K % 2)
    w = jnp.pad(w, ((0, Kp - K), (0, Kp - K), (0, 0), (0, 0)))
    ci, co = w.shape[2], w.shape[3]
    Ku = Kp // 2
    w = w.reshape(Ku, 2, Ku, 2, ci, co)
    w = w.transpose(0, 2, 1, 3, 4, 5).reshape(Ku, Ku, 4 * ci, co)
    return w


def _conv_prelu_pallas(x, w, b, alpha, stride: int, interpret: bool) -> Array:
    if stride == 1:
        return _conv_prelu_pallas_s1(x, w, b, alpha, interpret)
    if stride == 2:
        n, h, wd, _ = x.shape
        K = w.shape[0]
        oh, ow = -(-h // 2), -(-wd // 2)
        # XLA SAME stride-2 front pad per dim: total = (out-1)*2 + K - size.
        fh = max((oh - 1) * 2 + K - h, 0) // 2
        fw = max((ow - 1) * 2 + K - wd, 0) // 2
        # After front-padding, y[o] = sum_k w[k] xpad[2o + k]; with
        # k = 2u + a this is a VALID stride-1 conv of s2d(xpad) with the
        # regrouped kernel: y[o] = sum_{u,a} w[2u+a] s2d(xpad)[o+u, ch a].
        xs = jnp.pad(x, ((0, 0), (fh, K), (fw, K), (0, 0)))
        xs = _space_to_depth(xs)
        ws = _weights_to_s2d(w)
        Ku = ws.shape[0]
        y = _conv_prelu_pallas_s1(xs, ws, b, alpha, interpret)
        # _s1 computes SAME (front pad (Ku-1)//2); VALID output o equals
        # SAME output at o + (Ku-1)//2 — crop accordingly.
        off = (Ku - 1) // 2
        return y[:, off:off + oh, off:off + ow]
    raise NotImplementedError(f"stride {stride} unsupported")


def _split_prelu(args):
    """(x, w, b) or (x, w, b, alpha) -> (x, w, b, alpha_or_None)."""
    if len(args) == 4:
        return args
    x, w, b = args
    return x, w, b, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _conv_prelu_fused(stride, interpret, *args):
    x, w, b, alpha = _split_prelu(args)
    return _conv_prelu_pallas(x, w, b, alpha, stride, interpret)


def _conv_fused_fwd(stride, interpret, *args):
    return _conv_prelu_fused(stride, interpret, *args), args


def _conv_fused_bwd(stride, interpret, args, g):
    # Backward via the XLA twin (pallas_call has no autodiff rule); the
    # forward activations are cheap to recompute at JSCC sizes.
    x, w, b, alpha = _split_prelu(args)

    if alpha is None:
        def ref(x, w, b):
            return conv_prelu_reference(x, w, b, None, stride)

        _, vjp = jax.vjp(ref, x, w, b)
    else:
        def ref(x, w, b, alpha):
            return conv_prelu_reference(x, w, b, alpha, stride)

        _, vjp = jax.vjp(ref, x, w, b, alpha)
    return vjp(g)


_conv_prelu_fused.defvjp(_conv_fused_fwd, _conv_fused_bwd)


def conv_prelu(
    x: Array, w: Array, b: Array, alpha: Optional[Array] = None,
    stride: int = 1, use_pallas: bool = False,
    interpret: Optional[bool] = None,
) -> Array:
    """Fused SAME conv + bias + optional PReLU; Pallas or XLA twin."""
    if not use_pallas:
        return conv_prelu_reference(x, w, b, alpha, stride)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    args = (x, w, b) if alpha is None else (x, w, b, alpha)
    return _conv_prelu_fused(stride, bool(interpret), *args)


class FusedConvPReLU(nn.Module):
    """Flax wrapper owning conv+bias+PReLU params; kernel or XLA twin."""

    features: int
    kernel_size: int = 5
    stride: int = 1
    with_prelu: bool = True
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cin = x.shape[-1]
        k = self.kernel_size
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, cin, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        alpha = None
        if self.with_prelu:
            alpha = self.param("alpha", nn.initializers.constant(0.25),
                               (self.features,), jnp.float32)
            alpha = alpha.astype(self.dtype)
        return conv_prelu(
            x.astype(self.dtype), w.astype(self.dtype), b.astype(self.dtype),
            alpha, stride=self.stride, use_pallas=self.use_pallas)
