"""Entropy-aware index transport for the digital semantic-token links
(r5, VERDICT r4 item 6).

The fixed-length digital path (channel/digital.py) spends
``log2(codes)`` bits on every token regardless of the trained code
distribution; the r4 artifact measured the BEV codebook using ~6.8
effective codes of 256 (~2.7 bits of actual entropy against 8 bits
spent). This module adds two entropy-aware deployment modes, both
parameter-transparent (same checkpoint, different link):

* **Variable-length (Huffman) mode** — a canonical Huffman code built on
  the HOST from the trained code distribution (one calibration pass over
  the encoder); in-graph static-shape encode (scatter into a padded bit
  buffer), zero-power padding beyond each image's actual length (exactly
  the token-pruning bandwidth trick, codec/semantic_vq.py), and an
  in-graph table-automaton decode (``lax.scan`` over bit positions).
  Maximum compression; the honest failure mode is DESYNC — one bit error
  corrupts the rest of the stream — which the SNR sweep measures.
* **Re-alphabet mode** — keep the top ``2^b`` codes by trained usage
  (b even, whole QPSK symbols), snap the rest to their nearest kept code
  in codebook space, and ship fixed ``b``-bit indices through the
  existing uncoded/FEC/HARQ machinery. Less compression than Huffman but
  zero desync risk and full protocol-stack compatibility.

The codeword length of a symbol with clamped probability p is at most
~log2(1/p_min); probabilities are floored at ``P_FLOOR`` so every code
stays transmittable and the padded buffer stays small and static.

Accounting is exact: symbols/image = ceil(total_bits / 2) per example
(the metadata cost of the per-image length field — ~2 bytes — is noted
by the evaluator, mirroring the kept-set bitmap caveat of token
pruning).
"""

from __future__ import annotations

import heapq
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

P_FLOOR = 1e-4


def huffman_lengths(probs: np.ndarray) -> np.ndarray:
    """Codeword length per symbol for a binary Huffman code on ``probs``
    (floored at P_FLOOR and renormalized so zero-usage codes remain
    encodable). Classic heapq merge; ties broken by symbol id for
    determinism."""
    p = np.maximum(np.asarray(probs, np.float64), P_FLOOR)
    p = p / p.sum()
    k = p.shape[0]
    if k == 1:
        return np.array([1], np.int32)
    heap = [(p[i], i, ("leaf", i)) for i in range(k)]
    heapq.heapify(heap)
    uid = k
    while len(heap) > 1:
        pa, _, a = heapq.heappop(heap)
        pb, _, b = heapq.heappop(heap)
        heapq.heappush(heap, (pa + pb, uid, ("node", a, b)))
        uid += 1
    lens = np.zeros(k, np.int32)

    def walk(node, depth):
        if node[0] == "leaf":
            lens[node[1]] = max(depth, 1)
            return
        walk(node[1], depth + 1)
        walk(node[2], depth + 1)

    walk(heap[0][2], 0)
    return lens


def canonical_code(lens: np.ndarray) -> np.ndarray:
    """Canonical Huffman codewords from lengths: (K, Lmax) 0/1, MSB
    first, row i valid for lens[i] bits. Canonical form makes the code a
    pure function of the lengths (reproducible transmitter/receiver
    agreement from the same calibration)."""
    k = lens.shape[0]
    lmax = int(lens.max())
    order = np.lexsort((np.arange(k), lens))     # by length, then symbol
    codes = np.zeros((k, lmax), np.int32)
    code = 0
    prev_len = 0
    for sym in order:
        L = int(lens[sym])
        code <<= (L - prev_len)
        prev_len = L
        for j in range(L):
            codes[sym, j] = (code >> (L - 1 - j)) & 1
        code += 1
    return codes


def decode_table(lens: np.ndarray, codes: np.ndarray):
    """Binary decode automaton: children (n_nodes, 2) int32 node ids and
    emit (n_nodes,) int32 (symbol id at leaves, -1 inside). Node 0 is the
    root; walking a leaf's child restarts implicitly in the decoder."""
    k = lens.shape[0]
    children = [[-1, -1]]
    emit = [-1]
    for sym in range(k):
        node = 0
        for j in range(int(lens[sym])):
            b = int(codes[sym, j])
            if children[node][b] == -1:
                children.append([-1, -1])
                emit.append(-1)
                children[node][b] = len(children) - 1
            node = children[node][b]
        emit[node] = sym
    ch = np.asarray(children, np.int32)
    ch[ch < 0] = 0                                # unreachable; root-reset
    return ch, np.asarray(emit, np.int32)


class HuffmanCodec(NamedTuple):
    """Device-side canonical Huffman codec tables."""

    code_bits: Array      # (K, Lmax) 0/1 int32, MSB first
    code_len: Array       # (K,) int32
    children: Array       # (n_nodes, 2) int32
    emit: Array           # (n_nodes,) int32, -1 = internal

    @property
    def lmax(self) -> int:
        return self.code_bits.shape[1]


def build_huffman(probs) -> HuffmanCodec:
    lens = huffman_lengths(np.asarray(probs))
    codes = canonical_code(lens)
    ch, emit = decode_table(lens, codes)
    return HuffmanCodec(code_bits=jnp.asarray(codes),
                        code_len=jnp.asarray(lens),
                        children=jnp.asarray(ch), emit=jnp.asarray(emit))


def entropy_bits(probs) -> float:
    p = np.maximum(np.asarray(probs, np.float64), 0.0)
    p = p / p.sum()
    nz = p[p > 0]
    return float(-(nz * np.log2(nz)).sum())


def encode_vlc(codec: HuffmanCodec, idx: Array) -> Tuple[Array, Array]:
    """(B, N) indices -> (bits (B, M) with M = N*Lmax rounded up to even,
    total_len (B,) int32). Bits beyond total_len are zero padding (never
    transmitted — the QPSK weights zero them)."""
    b, n = idx.shape
    lmax = codec.lmax
    m = n * lmax + (n * lmax) % 2

    def one(row):
        lens = codec.code_len[row]                      # (N,)
        offs = jnp.cumsum(lens) - lens                  # (N,)
        pos = offs[:, None] + jnp.arange(lmax)[None, :]  # (N, Lmax)
        valid = jnp.arange(lmax)[None, :] < lens[:, None]
        pos = jnp.where(valid, pos, m)                  # dump slot
        bits = codec.code_bits[row]                     # (N, Lmax)
        out = jnp.zeros((m + 1,), jnp.int32)
        out = out.at[pos.reshape(-1)].set(bits.reshape(-1), mode="drop")
        return out[:m], jnp.sum(lens)

    return jax.vmap(one)(idx)


def decode_vlc(codec: HuffmanCodec, bits: Array, total_len: Array,
               n_tokens: int) -> Array:
    """(B, M) hard bits -> (B, N) indices via the canonical automaton.
    Walks one bit per scan step; emits at leaves; bits at or beyond
    ``total_len`` are ignored. Under channel errors the walk can desync —
    the stream decodes to WRONG (and possibly fewer) tokens, which is the
    measured cost of VLC over a noisy link; missing tail tokens decode as
    code 0."""
    b, m = bits.shape

    def one(row, tlen):
        def step(carry, i):
            node, out, cnt = carry
            bit = row[i]
            nxt = codec.children[node, bit]
            sym = codec.emit[nxt]
            is_leaf = sym >= 0
            active = (i < tlen) & (cnt < n_tokens)
            emit_now = is_leaf & active
            out = jax.lax.cond(
                emit_now,
                lambda o: o.at[jnp.minimum(cnt, n_tokens - 1)].set(sym),
                lambda o: o, out)
            cnt = cnt + emit_now.astype(jnp.int32)
            node = jnp.where(active,
                             jnp.where(is_leaf, jnp.int32(0), nxt),
                             node)
            return (node, out, cnt), None

        out0 = jnp.zeros((n_tokens,), jnp.int32)
        (_, out, cnt), _ = jax.lax.scan(
            step, (jnp.int32(0), out0, jnp.int32(0)), jnp.arange(m))
        return out

    return jax.vmap(one)(bits, total_len)


def decode_vlc_np(codec: HuffmanCodec, bits: np.ndarray,
                  total_len: np.ndarray, n_tokens: int) -> np.ndarray:
    """Host (numpy) twin of :func:`decode_vlc` — the receiver-side
    sequential automaton walk. Used by the SNR-sweep evaluator: a
    ~17k-iteration ``lax.scan`` per image is a pathological TPU graph
    (measured: TPU-internal compile/runtime error through the tunnel,
    r5), while the host walk is microseconds per image and bit-identical
    (tested against decode_vlc)."""
    ch = np.asarray(codec.children)
    emit = np.asarray(codec.emit)
    bits = np.asarray(bits)
    total_len = np.asarray(total_len)
    b = bits.shape[0]
    out = np.zeros((b, n_tokens), np.int32)
    for i in range(b):
        node = 0
        cnt = 0
        for j in range(int(total_len[i])):
            if cnt >= n_tokens:
                break
            node = ch[node, bits[i, j]]
            sym = emit[node]
            if sym >= 0:
                out[i, cnt] = sym
                cnt += 1
                node = 0
    return out


def transmit_vlc(codec: HuffmanCodec, idx_tx: Array, snr_db, kind: str,
                 key: Array, n_tokens: int, **channel_kw):
    """The full variable-length link: encode -> zero-power-padded QPSK ->
    channel -> hard bits -> automaton decode. Returns (idx_rx, info) with
    exact per-image symbol accounting."""
    from multimodal_sc_tpu.channel.digital import bits_to_qpsk, qpsk_to_bits
    from multimodal_sc_tpu.channel.layer import channel as channel_op

    bits, total = encode_vlc(codec, idx_tx)
    sym = bits_to_qpsk(bits)                            # (B, M/2, 2)
    active = (jnp.arange(sym.shape[1])[None, :] * 2
              < total[:, None]).astype(jnp.float32)
    channel_kw.setdefault("normalize", False)
    channel_kw.setdefault("modulation", 0)
    y = channel_op(sym * active[..., None], snr_db, kind, key, **channel_kw)
    bits_rx = qpsk_to_bits(y)
    idx_rx = decode_vlc(codec, bits_rx, total, n_tokens)
    info = {"symbols_per_item": jnp.mean(jnp.ceil(total / 2.0)),
            "bits_per_token": jnp.mean(total.astype(jnp.float32))
            / n_tokens,
            "fixed_symbols_per_item": jnp.float32(
                n_tokens * int(np.log2(codec.code_len.shape[0])) / 2)}
    return idx_rx, info


def topk_remap(probs, codebook: Array, keep_codes: int):
    """Re-alphabet tables: keep the ``keep_codes`` most-used codes; map
    every full-alphabet index to its nearest kept code (in codebook
    space). Returns (kept_ids (k,), full_to_small (K,), small_codebook
    (k, D)) — the transmitter sends ``log2(keep_codes)``-bit SMALL
    indices through the existing digital machinery and the receiver
    looks up the kept codebook rows."""
    p = np.asarray(probs)
    kept = np.sort(np.argsort(-p)[:keep_codes])
    cb = np.asarray(codebook)
    d2 = ((cb[:, None, :] - cb[kept][None, :, :]) ** 2).sum(-1)   # (K, k)
    full_to_small = np.argmin(d2, axis=1).astype(np.int32)
    return (jnp.asarray(kept.astype(np.int32)),
            jnp.asarray(full_to_small), jnp.asarray(cb[kept]))
