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


def indices_to_qpsk(idx: Array, codes: int) -> Array:
    """(B, N) int32 indices -> (B, N * bits/2, 2) unit-power QPSK symbols.

    Bit b=0 maps to -1/sqrt(2), b=1 to +1/sqrt(2), little-endian bit
    order within an index; consecutive bit pairs form (I, Q).
    """
    n_bits = index_bits(codes)
    shifts = jnp.arange(n_bits, dtype=jnp.int32)
    bits = (idx[..., None] >> shifts) & 1                  # (B, N, n_bits)
    b, n = idx.shape
    comps = bits.reshape(b, n * n_bits // 2, 2)
    return (comps.astype(jnp.float32) * 2.0 - 1.0) * _QPSK_AMP


def qpsk_to_indices(y: Array, codes: int, n_tokens: int) -> Array:
    """Hard-decision inverse of :func:`indices_to_qpsk`.

    y: (B, n_tokens * bits/2, 2) received symbols -> (B, n_tokens) int32.
    """
    n_bits = index_bits(codes)
    b = y.shape[0]
    bits = (y > 0).astype(jnp.int32).reshape(b, n_tokens, n_bits)
    shifts = jnp.arange(n_bits, dtype=jnp.int32)
    return jnp.sum(bits << shifts, axis=-1).astype(jnp.int32)


def qpsk_ber_awgn_theory(snr_db: float) -> float:
    """Closed-form per-bit error rate of unit-power QPSK over AWGN."""
    snr = 10.0 ** (snr_db / 10.0)
    return 0.5 * math.erfc(math.sqrt(snr) / math.sqrt(2.0))
