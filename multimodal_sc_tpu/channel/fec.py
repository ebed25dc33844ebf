"""Forward error correction for the digital semantic-token path.

Hamming(7,4) hard-decision FEC between the VQ codec's index bits and the
QPSK mapper (channel/digital.py): every 4 payload bits become a 7-bit
codeword that corrects any single bit error, moving the digital
waterfall ~3 dB left at a fixed 7/4 bandwidth cost. Because FEC sits
between the indices and the modulator it is parameter-transparent — one
trained VQ checkpoint can be deployed and swept coded or uncoded
(`channel.fec`), which is the ablation recorded in BASELINE.md.

Encoding uses the classic positional construction (parity bits at
positions 1, 2, 4; data at 3, 5, 6, 7, 1-indexed), so the 3-bit syndrome
IS the binary error position — decode is one (..., 7) x (7, 3) matmul
mod 2 plus a one-hot flip. Everything is elementwise/static-shape XLA on
int32 0/1 bit tensors; no Pallas needed (the payloads are tiny next to
the conv trunks).

Analytic oracle (tests/unit/test_fec.py): with per-bit channel BER p,
a block decodes wrong iff >= 2 of its 7 bits flip:
P_block = 1 - (1-p)^7 - 7 p (1-p)^6.

Reference repo has no code (/root/reference/README.md:1-2); this is the
standard textbook code, chosen for its closed-form testability.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray

# Codeword layout c[0..6] = positions 1..7: parity p1 p2 at c[0] c[1],
# data d0 at c[2], parity p4 at c[3], data d1 d2 d3 at c[4] c[5] c[6].
# p1 covers positions {3,5,7}, p2 {3,6,7}, p4 {5,6,7}.
_DATA_POS = (2, 4, 5, 6)

# (4 data bits) -> (7 code bits), mod 2. Row i = codeword bit i's
# dependence on (d0, d1, d2, d3).
_G = jnp.array(
    [
        [1, 1, 0, 1],   # p1 = d0 + d1 + d3
        [1, 0, 1, 1],   # p2 = d0 + d2 + d3
        [1, 0, 0, 0],   # d0
        [0, 1, 1, 1],   # p4 = d1 + d2 + d3
        [0, 1, 0, 0],   # d1
        [0, 0, 1, 0],   # d2
        [0, 0, 0, 1],   # d3
    ],
    jnp.int32,
)

# Syndrome rows: bit k of the (1-indexed) error position. s = H @ r mod 2.
_H = jnp.array(
    [
        [1, 0, 1, 0, 1, 0, 1],
        [0, 1, 1, 0, 0, 1, 1],
        [0, 0, 0, 1, 1, 1, 1],
    ],
    jnp.int32,
)


def hamming74_encode(bits: Array) -> Array:
    """(..., 4k) payload bits -> (..., 7k) coded bits (int32 0/1)."""
    if bits.shape[-1] % 4 != 0:
        raise ValueError(
            f"payload bit count must be a multiple of 4, got {bits.shape}")
    nibbles = bits.reshape(*bits.shape[:-1], -1, 4)
    coded = (nibbles @ _G.T) % 2
    return coded.reshape(*bits.shape[:-1], -1).astype(jnp.int32)


def hamming74_decode(bits: Array) -> Array:
    """(..., 7k) received hard bits -> (..., 4k) corrected payload bits.

    Corrects any single flipped bit per 7-bit block (the syndrome is the
    binary error position); >= 2 flips decode to a wrong-but-valid word.
    """
    if bits.shape[-1] % 7 != 0:
        raise ValueError(
            f"coded bit count must be a multiple of 7, got {bits.shape}")
    words = bits.reshape(*bits.shape[:-1], -1, 7)
    syndrome = (words @ _H.T) % 2                         # (..., k, 3)
    pos = (syndrome[..., 0] + 2 * syndrome[..., 1]
           + 4 * syndrome[..., 2])                        # 0 = no error
    flip = (pos[..., None] == jnp.arange(1, 8)).astype(jnp.int32)
    corrected = (words + flip) % 2
    data = corrected[..., list(_DATA_POS)]
    return data.reshape(*bits.shape[:-1], -1).astype(jnp.int32)


def _all_codewords():
    """(codewords (16, 7), data (16, 4)) int32 — all Hamming(7,4) words;
    row ordering is arbitrary but shared, which is all decode needs."""
    data = jnp.stack(jnp.meshgrid(*([jnp.arange(2)] * 4),
                                  indexing="ij"), -1).reshape(16, 4)
    return (data @ _G.T) % 2, data


def hamming74_decode_soft(soft: Array) -> Array:
    """Maximum-likelihood SOFT-decision decode: (..., 7k) soft bit values
    (sign = hard decision, magnitude = reliability — e.g. the received
    QPSK components) -> (..., 4k) data bits.

    Correlates each received 7-block against all 16 codewords in one
    (…, 7) x (7, 16) matmul and takes the argmax — exact ML over the
    code, worth ~1.5-2 dB over hard-decision syndrome decoding at the
    same bandwidth (measured in tests/unit/test_fec.py and the c1_vq
    sweep table in BASELINE.md).
    """
    if soft.shape[-1] % 7 != 0:
        raise ValueError(
            f"coded bit count must be a multiple of 7, got {soft.shape}")
    codes, data = _all_codewords()
    signs = (2.0 * codes - 1.0).astype(jnp.float32)       # (16, 7)
    words = soft.reshape(*soft.shape[:-1], -1, 7)
    scores = words.astype(jnp.float32) @ signs.T          # (..., k, 16)
    best = jnp.argmax(scores, axis=-1)
    out = data[best]                                      # (..., k, 4)
    return out.reshape(*soft.shape[:-1], -1).astype(jnp.int32)


def hamming74_block_error_theory(ber: float) -> float:
    """Closed-form block (4-bit nibble) error probability at channel
    bit-error rate ``ber``: wrong iff >= 2 of the 7 coded bits flip."""
    q = 1.0 - ber
    return 1.0 - q ** 7 - 7.0 * ber * q ** 6
