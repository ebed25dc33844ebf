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
  * Pilot-estimated CSI (``pilots`` > 0): the receiver equalizes with the
    least-squares estimate from P unit-power pilot symbols,
    h_hat = (1/P) sum_p conj(s_p) y_p = h + e with e ~ CN(0, sigma^2 / P)
    exactly — so instead of materializing pilot symbols we draw e from
    that closed-form distribution (identical in law, fewer bytes).
    pilots = 0 keeps the perfect-CSI genie.
  * OFDM (``kind="ofdm"``): frequency-selective Rayleigh multipath with
    L taps h_l ~ CN(0, p_l), exponential power-delay profile normalized
    to sum p_l = 1 (so E|H_k|^2 = 1 and the average SNR is unchanged).
    Per-subcarrier response H_k = sum_l h_l e^{-2pi i k l / N}; symbol i
    rides subcarrier (i mod N); receiver applies per-subcarrier MRC-style
    equalization with perfect or pilot-estimated H (one pilot OFDM symbol
    per ``pilots`` count → estimate error CN(0, sigma^2 / pilots) per
    subcarrier). Standard OFDM-guided deep-JSCC setup.
"""

from __future__ import annotations

import functools
from typing import Union

import jax
import jax.numpy as jnp

Array = jax.Array

CHANNEL_KINDS = ("ideal", "awgn", "rayleigh", "rician", "ofdm")

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


def power_normalize_masked(z: Array, mask: Array, eps: float = 1e-12) -> Array:
    """Unit average power over TRANSMITTED symbols only (adaptive rate).

    z: (B, ..., 2); mask: broadcastable 0/1 with a trailing singleton
    (e.g. (B, k, 1)). Only the masked-in symbols carry power, and each
    carries average power 1 — matching what a real transmitter radiating
    m < k symbols would do. With a full mask this equals power_normalize.
    """
    zm = z * mask
    reduce_axes = tuple(range(1, z.ndim))
    sq = jnp.sum(jnp.square(zm), axis=reduce_axes, keepdims=True)
    k_eff = jnp.sum(
        jnp.broadcast_to(mask, z.shape[:-1] + (1,)),
        axis=reduce_axes, keepdims=True)
    scale = jnp.sqrt(k_eff.astype(z.dtype)) * jax.lax.rsqrt(sq + eps)
    return zm * scale


def rate_mask(batch: int, k: int, c_sym: int, m: Array) -> Array:
    """Per-example symbol mask selecting the first m of c_sym channels.

    The CNN/ViT codecs flatten (h, w, 2*c_sym) -> (h*w*c_sym, 2), so flat
    symbol i carries feature channel i % c_sym; masking channels >= m
    transmits the fraction m/c_sym of the bandwidth. m: (B,) int32 in
    [1, c_sym]. Returns (B, k, 1) float32 0/1.
    """
    ch = jnp.arange(k, dtype=jnp.int32) % c_sym
    return (ch[None, :] < m[:, None]).astype(jnp.float32)[..., None]


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


def _equalize(h_hat: Array, y: Array, eps: float) -> Array:
    """MRC/ZF equalization with (possibly estimated) CSI h_hat."""
    h_conj = jnp.stack([h_hat[..., 0], -h_hat[..., 1]], axis=-1)
    h_pow = jnp.sum(jnp.square(h_hat), axis=-1, keepdims=True)
    return _cplx_mul(h_conj, y) / (h_pow + eps)


def _estimate_csi(h: Array, snr: Array, key: Array, pilots: int) -> Array:
    """LS pilot estimate h_hat = h + e, e ~ CN(0, noise_power / pilots).

    Exactly the law of the P-pilot least-squares estimator with unit-power
    pilots (module docstring) — drawn directly instead of materializing
    pilot symbols.
    """
    noise_power = jnp.power(jnp.asarray(10.0, h.dtype), -snr / 10.0)
    sig_e = jnp.sqrt(noise_power / (2.0 * pilots))
    return h + sig_e * jax.random.normal(key, h.shape, dtype=h.dtype)


def rayleigh(
    z: Array,
    snr_db: Union[float, Array],
    key: Array,
    eps: float = 1e-12,
    pilots: int = 0,
) -> Array:
    """Block-fading Rayleigh channel with MRC equalization.

    One h ~ CN(0,1) per example (block fading over the whole codeword):
    y = h*z + n;  z_hat = conj(h_hat) * y / |h_hat|^2. CSI is the perfect-
    genie h when pilots == 0, else the LS pilot estimate (see module
    docstring). pilots == 0 keeps the exact pre-r3 random stream.
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
    h_hat = h
    if pilots:
        h_hat = _estimate_csi(h, snr, jax.random.fold_in(key, 2), pilots)
    return _equalize(h_hat, y, eps)


def rician(
    z: Array,
    snr_db: Union[float, Array],
    key: Array,
    k_factor: float = RICIAN_K,
    eps: float = 1e-12,
    pilots: int = 0,
) -> Array:
    """Rician block fading (LOS + scatter), MRC equalization.

    h = sqrt(K/(K+1)) + sqrt(1/(K+1)) * h_scatter, h_scatter ~ CN(0,1), so
    E[|h|^2] = 1; K -> inf recovers AWGN, K = 0 recovers Rayleigh.
    CSI: perfect genie when pilots == 0, else LS pilot estimate.
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
    h_hat = h
    if pilots:
        h_hat = _estimate_csi(h, snr, jax.random.fold_in(key, 2), pilots)
    return _equalize(h_hat, y, eps)


def exp_power_delay_profile(taps: int, dtype=jnp.float32) -> Array:
    """Exponential power-delay profile p_l, normalized to sum 1."""
    decay = jnp.exp(-jnp.arange(taps, dtype=dtype) / max(taps / 3.0, 1.0))
    return decay / jnp.sum(decay)


def ofdm_freq_response(h_taps: Array, subcarriers: int) -> Array:
    """Per-subcarrier response H_k = sum_l h_l e^{-2pi i k l / N}.

    h_taps: (B, L, 2) complex taps as real/imag pairs -> (B, N, 2).
    Real-arithmetic DFT (two small matmuls) — keeps the trailing-pair
    convention and the MXU happy; L and N are static.
    """
    n_taps = h_taps.shape[1]
    k = jnp.arange(subcarriers, dtype=h_taps.dtype)
    lags = jnp.arange(n_taps, dtype=h_taps.dtype)
    theta = 2.0 * jnp.pi * jnp.outer(lags, k) / subcarriers   # (L, N)
    c, s = jnp.cos(theta), jnp.sin(theta)
    hr, hi = h_taps[..., 0], h_taps[..., 1]                   # (B, L)
    return jnp.stack([hr @ c + hi @ s, hi @ c - hr @ s], axis=-1)


def ofdm(
    z: Array,
    snr_db: Union[float, Array],
    key: Array,
    pilots: int = 0,
    subcarriers: int = 64,
    taps: int = 8,
    eps: float = 1e-12,
) -> Array:
    """Frequency-selective Rayleigh multipath over OFDM subcarriers.

    L taps h_l ~ CN(0, p_l) with exponential PDP (sum p_l = 1, so
    E|H_k|^2 = 1 and average SNR is preserved); symbol i rides subcarrier
    (i mod N); per-subcarrier MRC equalization with perfect CSI
    (pilots == 0) or a per-subcarrier LS pilot estimate.
    """
    key_h, key_n = jax.random.split(key)
    batch = z.shape[0]
    pdp = exp_power_delay_profile(taps, z.dtype)
    h_taps = jax.random.normal(key_h, (batch, taps, 2), dtype=z.dtype)
    h_taps = h_taps * jnp.sqrt(pdp / 2.0)[None, :, None]
    h_freq = ofdm_freq_response(h_taps, subcarriers)          # (B, N, 2)

    flat = z.reshape(batch, -1, 2)                            # (B, S, 2)
    snr = jnp.asarray(snr_db, z.dtype)
    if snr.ndim == 1:
        if snr.shape[0] != batch:
            raise ValueError(
                f"snr_db must be scalar or shape ({batch},), got {snr.shape}")
        snr = snr.reshape(batch, 1, 1)
    elif snr.ndim != 0:
        raise ValueError(
            f"snr_db must be scalar or shape ({batch},), got {snr.shape}")

    if pilots:
        # One LS estimate per subcarrier (one pilot OFDM symbol = one
        # pilot per subcarrier), shared by every symbol on it.
        h_freq_hat = _estimate_csi(
            h_freq, snr, jax.random.fold_in(key, 2), pilots)
    else:
        h_freq_hat = h_freq

    idx = jnp.arange(flat.shape[1]) % subcarriers             # static
    h_sym = jnp.take(h_freq, idx, axis=1)                     # (B, S, 2)
    h_sym_hat = jnp.take(h_freq_hat, idx, axis=1)

    sigma = _noise_sigma(snr, z.dtype)
    noise = sigma * jax.random.normal(key_n, flat.shape, dtype=z.dtype)
    y = _cplx_mul(h_sym, flat) + noise
    return _equalize(h_sym_hat, y, eps).reshape(z.shape)


def channel_kwargs(ch) -> dict:
    """Static ``channel()`` kwargs from a ChannelConfig.

    All Python statics — closing over them (rather than passing the config
    through a transform) keeps ExperimentConfig out of jitted graphs.
    """
    return dict(normalize=ch.normalize, modulation=ch.modulation,
                pilots=ch.pilots, subcarriers=ch.ofdm_subcarriers,
                taps=ch.ofdm_taps)


@functools.partial(jax.jit,
                   static_argnames=("kind", "normalize", "modulation",
                                    "pilots", "subcarriers", "taps"))
def channel(
    z: Array,
    snr_db: Union[float, Array],
    kind: str,
    key: Array,
    normalize: bool = True,
    modulation: int = 0,
    pilots: int = 0,
    subcarriers: int = 64,
    taps: int = 8,
    mask: "Array | None" = None,
) -> Array:
    """Public channel op: power-normalize then apply the selected channel.

    Args:
      z: (B, ..., 2) channel symbols as real/imag pairs.
      snr_db: scalar or per-example (B,) SNR in dB.
      kind: one of {"ideal", "awgn", "rayleigh", "rician", "ofdm"} (static).
      key: PRNG key (unused for "ideal" but required for API stability).
      normalize: apply per-example unit-power normalization first (static).
      modulation: 0 = analog deep-JSCC (continuous amplitudes); M >= 4 =
        square M-QAM constellation with straight-through gradients
        (digital transmission mode; static).
      pilots: 0 = perfect-CSI genie at the equalizer; P > 0 = LS channel
        estimate from P unit-power pilots (fading kinds only; static).
      subcarriers, taps: OFDM geometry, kind="ofdm" only (static).
      mask: optional (B, ..., 1) 0/1 adaptive-rate symbol mask (traced).
        Masked-out symbols are not transmitted: normalization spreads
        power over the masked-in symbols only (power_normalize_masked)
        and the receiver zeros the untransmitted slots (it knows the
        rate — side-channel metadata in a real system).

    Fully differentiable w.r.t. z; traced into the caller's jitted graph.
    """
    if kind not in CHANNEL_KINDS:
        raise ValueError(f"kind must be one of {CHANNEL_KINDS}, got {kind!r}")
    if normalize:
        z = power_normalize_masked(z, mask) if mask is not None else (
            power_normalize(z))
    elif mask is not None:
        z = z * mask
    if modulation:
        from multimodal_sc_tpu.channel.modulation import qam_modulate

        z = qam_modulate(z, modulation)
    if kind == "ideal":
        y = z
    elif kind == "awgn":
        y = awgn(z, snr_db, key)
    elif kind == "rician":
        y = rician(z, snr_db, key, pilots=pilots)
    elif kind == "ofdm":
        y = ofdm(z, snr_db, key, pilots=pilots,
                 subcarriers=subcarriers, taps=taps)
    else:
        y = rayleigh(z, snr_db, key, pilots=pilots)
    return y * mask if mask is not None else y
