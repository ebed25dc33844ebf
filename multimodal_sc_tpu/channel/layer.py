"""Differentiable power-normalized AWGN / Rayleigh channel layer.

Spec: the reference (SongTao-110/Multimodal_SC @ 2025-08-08) contains no code
(``/root/reference/README.md:1-2`` is the whole repo); the binding contract is
``BASELINE.json:5`` — "differentiable AWGN/Rayleigh channel layer with power
normalization ... an XLA-traced op so the full encode→channel→decode path is
one jitted graph".

Design notes (TPU-first):
  * Complex channel symbols are represented as a trailing real/imag pair
    (``[..., 2]``) rather than ``complex64`` — TPU vector units and Pallas
    operate on real dtypes, and this keeps every op MXU/VPU friendly.
  * Everything is pure ``jax.numpy`` + explicit PRNG keys: elementwise and
    memory-bound, so XLA fusion is already optimal; no Pallas needed here.
  * ``kind`` is a static Python string so ``jit`` specializes per channel
    type with no runtime branching.
  * ``snr_db`` may be a scalar or a per-example ``(batch,)`` vector
    (per-example SNR conditioning for sweep training, BASELINE.json:8).

Math (standard deep-JSCC conventions, Bourtsoulatze et al. 2019):
  * power normalization:  z_norm = z * sqrt(k) / ||z||  per example, where k
    is the number of complex symbols, so average complex-symbol power is 1.
  * AWGN: y = z + n,  n ~ CN(0, sigma^2),  sigma^2 = 10^(-SNR_dB/10); each
    real component has variance sigma^2 / 2.
  * Rayleigh (block fading, perfect CSI): h ~ CN(0, 1) per example,
    y = h*z + n, receiver equalizes  z_hat = conj(h) * y / |h|^2.
"""

from __future__ import annotations

import functools
from typing import Union

import jax
import jax.numpy as jnp

Array = jax.Array

CHANNEL_KINDS = ("ideal", "awgn", "rayleigh", "rician")

RICIAN_K = 4.0  # LOS-to-scatter power ratio; typical V2V/V2I values 3-7


def _num_complex_symbols(z: Array) -> int:
    """Number of complex symbols per example for z of shape (B, ..., 2)."""
    if z.shape[-1] != 2:
        raise ValueError(
            f"channel symbols must have trailing real/imag dim 2, got {z.shape}"
        )
    k = 1
    for d in z.shape[1:-1]:
        k *= d
    return k


def power_normalize(z: Array, eps: float = 1e-12) -> Array:
    """Normalize each example to unit average complex-symbol power.

    z: (B, ..., 2) real/imag pairs. Returns same shape with
    sum(|z_i|^2) == k (the number of complex symbols) per example.
    Differentiable everywhere except z == 0 (guarded by eps).
    """
    k = _num_complex_symbols(z)
    reduce_axes = tuple(range(1, z.ndim))
    sq = jnp.sum(jnp.square(z), axis=reduce_axes, keepdims=True)
    scale = jnp.sqrt(jnp.asarray(k, z.dtype)) * jax.lax.rsqrt(sq + eps)
    return z * scale


def _broadcast_snr(snr_db: Union[float, Array], z: Array) -> Array:
    """Broadcast scalar or per-example (B,) snr to z's shape (minus last dim)."""
    snr = jnp.asarray(snr_db, dtype=z.dtype)
    if snr.ndim == 0:
        return snr
    if snr.ndim == 1 and snr.shape[0] == z.shape[0]:
        return snr.reshape((z.shape[0],) + (1,) * (z.ndim - 1))
    raise ValueError(
        f"snr_db must be scalar or shape ({z.shape[0]},), got {snr.shape}"
    )


def _noise_sigma(snr_db: Array, dtype) -> Array:
    """Per-real-component std dev for unit-power symbols at snr_db."""
    noise_power = jnp.power(jnp.asarray(10.0, dtype), -snr_db / 10.0)
    return jnp.sqrt(noise_power / 2.0)


def awgn(z: Array, snr_db: Union[float, Array], key: Array) -> Array:
    """y = z + n with n ~ CN(0, 10^(-snr/10)) per complex symbol."""
    snr = _broadcast_snr(snr_db, z)
    sigma = _noise_sigma(snr, z.dtype)
    noise = jax.random.normal(key, z.shape, dtype=z.dtype)
    return z + sigma * noise


def _cplx_mul(a: Array, b: Array) -> Array:
    """Complex multiply on trailing real/imag pairs."""
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    return jnp.stack([ar * br - ai * bi, ar * bi + ai * br], axis=-1)


def rayleigh(
    z: Array,
    snr_db: Union[float, Array],
    key: Array,
    eps: float = 1e-12,
) -> Array:
    """Block-fading Rayleigh channel with perfect-CSI MRC equalization.

    One h ~ CN(0,1) per example (block fading over the whole codeword):
    y = h*z + n;  z_hat = conj(h) * y / |h|^2 = z + conj(h) n / |h|^2.
    """
    key_h, key_n = jax.random.split(key)
    batch = z.shape[0]
    # h ~ CN(0,1): each real part N(0, 1/2).
    h = jax.random.normal(key_h, (batch, 2), dtype=z.dtype) * jnp.sqrt(
        jnp.asarray(0.5, z.dtype)
    )
    h = h.reshape((batch,) + (1,) * (z.ndim - 2) + (2,))

    snr = _broadcast_snr(snr_db, z)
    sigma = _noise_sigma(snr, z.dtype)
    noise = sigma * jax.random.normal(key_n, z.shape, dtype=z.dtype)

    y = _cplx_mul(h, z) + noise
    h_conj = jnp.stack([h[..., 0], -h[..., 1]], axis=-1)
    h_pow = jnp.sum(jnp.square(h), axis=-1, keepdims=True)
    return _cplx_mul(h_conj, y) / (h_pow + eps)


def rician(
    z: Array,
    snr_db: Union[float, Array],
    key: Array,
    k_factor: float = RICIAN_K,
    eps: float = 1e-12,
) -> Array:
    """Rician block fading (LOS + scatter), perfect-CSI equalization.

    h = sqrt(K/(K+1)) + sqrt(1/(K+1)) * h_scatter, h_scatter ~ CN(0,1), so
    E[|h|^2] = 1; K -> inf recovers AWGN, K = 0 recovers Rayleigh.
    """
    key_h, key_n = jax.random.split(key)
    batch = z.shape[0]
    scatter = jax.random.normal(key_h, (batch, 2), dtype=z.dtype) * jnp.sqrt(
        jnp.asarray(0.5 / (k_factor + 1.0), z.dtype))
    los = jnp.sqrt(jnp.asarray(k_factor / (k_factor + 1.0), z.dtype))
    h = scatter.at[:, 0].add(los)
    h = h.reshape((batch,) + (1,) * (z.ndim - 2) + (2,))

    snr = _broadcast_snr(snr_db, z)
    sigma = _noise_sigma(snr, z.dtype)
    noise = sigma * jax.random.normal(key_n, z.shape, dtype=z.dtype)

    y = _cplx_mul(h, z) + noise
    h_conj = jnp.stack([h[..., 0], -h[..., 1]], axis=-1)
    h_pow = jnp.sum(jnp.square(h), axis=-1, keepdims=True)
    return _cplx_mul(h_conj, y) / (h_pow + eps)


@functools.partial(jax.jit,
                   static_argnames=("kind", "normalize", "modulation"))
def channel(
    z: Array,
    snr_db: Union[float, Array],
    kind: str,
    key: Array,
    normalize: bool = True,
    modulation: int = 0,
) -> Array:
    """Public channel op: power-normalize then apply the selected channel.

    Args:
      z: (B, ..., 2) channel symbols as real/imag pairs.
      snr_db: scalar or per-example (B,) SNR in dB.
      kind: one of {"ideal", "awgn", "rayleigh", "rician"} (static).
      key: PRNG key (unused for "ideal" but required for API stability).
      normalize: apply per-example unit-power normalization first (static).
      modulation: 0 = analog deep-JSCC (continuous amplitudes); M >= 4 =
        square M-QAM constellation with straight-through gradients
        (digital transmission mode; static).

    Fully differentiable w.r.t. z; traced into the caller's jitted graph.
    """
    if kind not in CHANNEL_KINDS:
        raise ValueError(f"kind must be one of {CHANNEL_KINDS}, got {kind!r}")
    if normalize:
        z = power_normalize(z)
    if modulation:
        from multimodal_sc_tpu.channel.modulation import qam_modulate

        z = qam_modulate(z, modulation)
    if kind == "ideal":
        return z
    if kind == "awgn":
        return awgn(z, snr_db, key)
    if kind == "rician":
        return rician(z, snr_db, key)
    return rayleigh(z, snr_db, key)
