"""Digital modulation: square-QAM constellation mapping for channel symbols.

Semantic-communication systems are deployed over digital radios, so besides
the analog (continuous-amplitude) deep-JSCC path (BASELINE.json:5) the
framework offers an M-QAM constrained mode: each I/Q component is quantized
to sqrt(M) uniform levels with unit average symbol power, trained with a
straight-through estimator (hard constellation forward, identity gradient
backward) so the codecs learn constellation-aware representations.

Pure elementwise XLA (memory-bound; no Pallas needed). Analytic tests pin
the constellation power and the STE gradient.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def qam_levels(m: int, dtype=jnp.float32) -> Array:
    """Per-component levels of unit-average-power square M-QAM.

    sqrt(M) equispaced points +-{1, 3, ..}*d with total complex-symbol
    power E[I^2+Q^2] = 1: d = sqrt(3 / (2 (M - 1))).
    """
    side = int(math.isqrt(m))
    if side * side != m or side < 2:
        raise ValueError(f"M must be a square >= 4, got {m}")
    d = math.sqrt(3.0 / (2.0 * (m - 1)))
    i = jnp.arange(side, dtype=dtype)
    return (2 * i - (side - 1)) * d


def _nearest_level(x: Array, levels: Array) -> Array:
    idx = jnp.argmin(
        jnp.abs(x[..., None] - levels.reshape((1,) * x.ndim + (-1,))),
        axis=-1)
    return levels[idx]


def qam_modulate(z: Array, m: int = 16) -> Array:
    """Map (..., 2) symbols to the nearest M-QAM point, straight-through.

    Forward: hard nearest-constellation-point per I/Q component.
    Backward: identity (STE), so encoder gradients flow unchanged.
    Input should be roughly unit-power (apply after power_normalize).
    """
    levels = qam_levels(m, z.dtype)
    hard = _nearest_level(z, levels)
    return z + jax.lax.stop_gradient(hard - z)


def qam_demodulate_indices(z_hat: Array, m: int = 16) -> Array:
    """Hard-decision per-component level indices (..., 2) int32."""
    levels = qam_levels(m, z_hat.dtype)
    return jnp.argmin(
        jnp.abs(z_hat[..., None]
                - levels.reshape((1,) * z_hat.ndim + (-1,))),
        axis=-1).astype(jnp.int32)


def symbol_error_rate(z_tx: Array, z_rx: Array, m: int = 16) -> Array:
    """Fraction of complex symbols whose hard decision changed in transit."""
    ti = qam_demodulate_indices(z_tx, m)
    ri = qam_demodulate_indices(z_rx, m)
    wrong = jnp.any(ti != ri, axis=-1)
    return jnp.mean(wrong.astype(jnp.float32))


def qam_ser_awgn_theory(m: int, snr_db: float) -> float:
    """Closed-form square-M-QAM SER over AWGN (union-bound exact form).

    P = 1 - (1 - p)^2 with p = 2 (1 - 1/sqrt(M)) Q( sqrt(3 snr / (M-1)) ),
    Q(x) = erfc(x / sqrt 2) / 2. The analytic oracle for channel +
    modulation tests.
    """
    snr = 10.0 ** (snr_db / 10.0)
    x = math.sqrt(3.0 * snr / (m - 1))
    q = 0.5 * math.erfc(x / math.sqrt(2.0))
    p = 2.0 * (1.0 - 1.0 / math.sqrt(m)) * q
    return 1.0 - (1.0 - p) ** 2
