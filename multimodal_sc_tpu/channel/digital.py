"""Digital index transmission: semantic tokens -> bits -> QPSK symbols.

The discrete-codebook codec (codec/semantic_vq.py) transmits INTEGER
codebook indices, not continuous amplitudes. Each index carries
log2(codes) bits; bits ride unit-power QPSK symbols (one bit per I/Q
component, levels +-1/sqrt(2) — the M=4 case of channel/modulation.py's
square-QAM constellation, trivially Gray-coded at one bit per
component); the receiver hard-decides each component's sign.

Analytic oracle: per-bit error over AWGN at symbol SNR s (linear) is
Q(sqrt(s)) — each component carries amplitude 1/sqrt(2) against noise of
per-component variance 10^(-snr/10)/2 (tests/unit/test_semantic_vq.py).

Everything is elementwise/static-shape XLA; no Pallas needed.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array

_QPSK_AMP = math.sqrt(0.5)   # per-component amplitude; |symbol|^2 == 1


def index_bits(codes: int) -> int:
    """Bits per index; codes must be a power of 4 so indices fill whole
    QPSK symbols (2 bits each)."""
    n = int(round(math.log2(codes)))
    if 2 ** n != codes or n % 2 != 0:
        raise ValueError(
            f"codes must be a power of 4 (whole QPSK symbols), got {codes}")
    return n


def bits_from_indices(idx: Array, codes: int) -> Array:
    """(B, N) int32 indices -> (B, N * bits) 0/1 bit tensor,
    little-endian bit order within each index."""
    n_bits = index_bits(codes)
    shifts = jnp.arange(n_bits, dtype=jnp.int32)
    bits = (idx[..., None] >> shifts) & 1                  # (B, N, n_bits)
    return bits.reshape(idx.shape[0], -1).astype(jnp.int32)


def indices_from_bits(bits: Array, codes: int) -> Array:
    """Inverse of :func:`bits_from_indices`: (B, N * bits) -> (B, N)."""
    n_bits = index_bits(codes)
    shifts = jnp.arange(n_bits, dtype=jnp.int32)
    grouped = bits.reshape(bits.shape[0], -1, n_bits)
    return jnp.sum(grouped << shifts, axis=-1).astype(jnp.int32)


def bits_to_qpsk(bits: Array) -> Array:
    """(B, M) 0/1 bits (M even) -> (B, M/2, 2) unit-power QPSK symbols.
    Bit 0 maps to -1/sqrt(2), 1 to +1/sqrt(2); consecutive pairs (I, Q).
    """
    comps = bits.reshape(bits.shape[0], -1, 2)
    return (comps.astype(jnp.float32) * 2.0 - 1.0) * _QPSK_AMP


def qpsk_to_bits(y: Array) -> Array:
    """Hard-decision inverse of :func:`bits_to_qpsk`:
    (B, M/2, 2) received symbols -> (B, M) 0/1 bits."""
    return (y > 0).astype(jnp.int32).reshape(y.shape[0], -1)


def qpsk_soft_bits(y: Array) -> Array:
    """(B, M/2, 2) received symbols -> (B, M) SOFT bit values (sign =
    hard decision, magnitude = reliability) for soft-decision FEC
    (channel/fec.py hamming74_decode_soft). For AWGN the raw component
    IS the max-likelihood bit metric up to a positive scale."""
    return y.reshape(y.shape[0], -1).astype(jnp.float32)


def indices_to_qpsk(idx: Array, codes: int) -> Array:
    """(B, N) int32 indices -> (B, N * bits/2, 2) unit-power QPSK symbols
    (uncoded path: :func:`bits_from_indices` then :func:`bits_to_qpsk`)."""
    return bits_to_qpsk(bits_from_indices(idx, codes))


def qpsk_to_indices(y: Array, codes: int, n_tokens: int) -> Array:
    """Hard-decision inverse of :func:`indices_to_qpsk`.

    y: (B, n_tokens * bits/2, 2) received symbols -> (B, n_tokens) int32.
    """
    del n_tokens  # shape is implied by y; kept for call-site clarity
    return indices_from_bits(qpsk_to_bits(y), codes)


def qpsk_ber_awgn_theory(snr_db: float) -> float:
    """Closed-form per-bit error rate of unit-power QPSK over AWGN."""
    snr = 10.0 ** (snr_db / 10.0)
    return 0.5 * math.erfc(math.sqrt(snr) / math.sqrt(2.0))
