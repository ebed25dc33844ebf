"""Discrete semantic-token camera codec: VQ bottleneck + digital channel.

The third camera model family (after CNN-JSCC and ViT-JSCC,
BASELINE.json:5): instead of continuous channel symbols, the encoder
quantizes each spatial cell against a learned codebook (VQ-VAE style —
straight-through estimator, codebook + commitment losses) and transmits
the INTEGER indices as bits over QPSK (channel/digital.py). This is the
"semantic tokens over a digital radio" deployment mode: discrete,
arbitrarily channel-codable payloads, with the classic digital
behavior — near-lossless above the waterfall SNR, a cliff below it —
complementing analog deep-JSCC's graceful degradation.

Noise-aware training: the decoder forward sees the RECEIVED (possibly
corrupted) codes while gradients flow through the clean straight-through
path, so the decoder learns robustness to index errors without needing
a differentiable channel.

TPU-first notes: the nearest-code search is one (B*N, K) matmul distance
(MXU-friendly); bits/QPSK mapping is elementwise; all shapes static.

Semantic unequal power allocation (``channel.uep_alpha`` > 0): the
transmitter estimates each token's reconstruction damage under a
single-bit error (decoder VJP probes, :meth:`VQCameraJSCC.token_damage`)
and redistributes QPSK power toward high-damage tokens at exactly unit
mean power. Receiver-transparent (sign detection is scale-invariant) and
parameter-transparent (same checkpoint deploys with or without UEP),
like the FEC flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_sc_tpu.channel import channel as channel_op
from multimodal_sc_tpu.channel import channel_kwargs
from multimodal_sc_tpu.channel.digital import (
    bits_from_indices,
    bits_to_qpsk,
    index_bits,
    indices_from_bits,
    indices_to_qpsk,
    qpsk_soft_bits,
    qpsk_to_bits,
    qpsk_to_indices,
)
from multimodal_sc_tpu.channel.fec import (
    hamming74_decode,
    hamming74_decode_soft,
    hamming74_encode,
)
from multimodal_sc_tpu.codec.camera_cnn import PReLU
from multimodal_sc_tpu.config.configs import ExperimentConfig
from multimodal_sc_tpu.kernels.conv_block import FusedConvPReLU

Array = jax.Array


def farthest_point_order(h: int, w: int):
    """Greedy farthest-point ordering of an (h, w) grid: every prefix of
    the returned (h*w,) int array is maximally spread (min pairwise
    distance maximized greedily). Static numpy at trace time — the
    'scatter' token-selection score (see VQCameraJSCC.__call__):
    measured on the r3 keep sweep, SPATIAL SPREAD of the kept set matters
    more than per-token importance because the random-mask-trained
    decoder inpaints scattered drops far better than clustered ones."""
    import numpy as np

    pts = np.stack(np.meshgrid(np.arange(h), np.arange(w),
                               indexing="ij"), -1).reshape(-1, 2).astype(
        np.float64)
    n = h * w
    order = np.empty(n, np.int64)
    # Start at the center-most point.
    center = np.array([(h - 1) / 2.0, (w - 1) / 2.0])
    d_center = np.sum((pts - center) ** 2, axis=1)
    order[0] = int(np.argmin(d_center))
    mind = np.sum((pts - pts[order[0]]) ** 2, axis=1)
    for i in range(1, n):
        mind[order[:i]] = -1.0
        order[i] = int(np.argmax(mind))
        mind = np.minimum(mind, np.sum((pts - pts[order[i]]) ** 2, axis=1))
    rank = np.empty(n, np.int64)
    rank[order] = np.arange(n)
    return rank                                   # (h*w,) position -> rank


def topk_mask(scores: Array, m: Array) -> Array:
    """(B, N) scores, (B,) counts -> boolean mask keeping each row's top-m
    scores (ties broken by position via argsort stability). Static shapes:
    the double-argsort rank trick instead of a dynamic top_k."""
    order = jnp.argsort(-scores, axis=1)
    rank = jnp.argsort(order, axis=1)
    return rank < m[:, None]


USAGE_SAMPLE_WEIGHT = 0.0


def vq_usage_loss(d2: Array, temp: float = 0.5,
                  sample_weight: float = None) -> Array:
    """Codebook-usage regularizer on SOFT assignments: with
    q_i = softmax(-d2_i / s), minimize
    ``sample_weight * mean_i H(q_i) - H(mean_i q_i)``.

    The DIVERSITY term (-H(q̄)) is the load-bearing half: its gradient
    pulls rarely used codes toward the data (and the encoder toward
    them), directly fighting the collapse measured in r4 (BEV codebook
    perplexity 6.8/256, VERDICT r4 item 1). The per-sample CONFIDENCE
    term (the MaskGIT/VQGAN pairing) guards the degenerate
    all-q-uniform solution — but measured on the tiny-c3 probe
    (results_r5/probe_vq_usage.json) at weight 1.0 it DOMINATED and
    collapsed perplexity 34 -> 4.7 while costing 0.18 mIoU, so the
    default here is diversity-only (the commitment loss already supplies
    the confidence pressure in a VQ pipeline). Differentiable w.r.t.
    both encoder features and the codebook; zero extra state.

    The softmax scale is ``temp * mean(d2)`` (stop-gradiented), so the
    knob is dimensionless and the softness tracks the feature scale as
    training moves it — with raw d2 logits the softmax saturates one-hot
    and every gradient here dies.
    """
    if sample_weight is None:
        sample_weight = USAGE_SAMPLE_WEIGHT
    scale = temp * jax.lax.stop_gradient(jnp.mean(d2)) + 1e-9
    logp = jax.nn.log_softmax(-d2 / scale, axis=-1)
    p = jnp.exp(logp)
    avg = jnp.mean(p.reshape(-1, p.shape[-1]), axis=0)
    avg_ent = -jnp.sum(avg * jnp.log(avg + 1e-9))
    if sample_weight == 0.0:
        return -avg_ent
    sample_ent = -jnp.mean(jnp.sum(p * logp, axis=-1))
    return sample_weight * sample_ent - avg_ent


def vector_quantize(z_e: Array, codebook: Array, beta: float = 0.25,
                    usage_coef: float = 0.0, usage_temp: float = 0.5,
                    with_stats: bool = False):
    """Nearest-code quantization with STE + codebook/commitment losses.

    z_e (..., D), codebook (K, D) -> (z_ste, indices int32, vq_loss).
    The distance search is one (B*N, K) matmul — MXU-friendly.

    ``usage_coef > 0`` adds :func:`vq_usage_loss` (codebook-usage
    regularization, r5 — VERDICT r4 item 1). ``with_stats=True`` (static)
    additionally returns ``{"counts": (K,), "candidates": (K, D)}`` for
    dead-code re-seeding: counts is the batch usage histogram and
    candidates are the K encoder outputs with the LARGEST quantization
    error (k-means++-style re-init targets — revive dead codes exactly
    where the codebook covers the data worst), both stop-gradiented.
    """
    dim = codebook.shape[1]
    flat = z_e.reshape(-1, dim)
    d2 = (jnp.sum(flat * flat, axis=1, keepdims=True)
          - 2.0 * flat @ codebook.T
          + jnp.sum(codebook * codebook, axis=1)[None, :])   # (BN, K)
    idx = jnp.argmin(d2, axis=1)
    z_q = codebook[idx].reshape(z_e.shape)
    codebook_loss = jnp.mean(jnp.square(jax.lax.stop_gradient(z_e) - z_q))
    commit_loss = jnp.mean(jnp.square(z_e - jax.lax.stop_gradient(z_q)))
    vq_loss = codebook_loss + beta * commit_loss
    if usage_coef > 0:
        vq_loss = vq_loss + usage_coef * vq_usage_loss(d2, usage_temp)
    z_ste = z_e + jax.lax.stop_gradient(z_q - z_e)
    if with_stats:
        k = codebook.shape[0]
        counts = jnp.zeros((k,), jnp.int32).at[idx].add(1)
        err = d2[jnp.arange(flat.shape[0]), idx]             # (BN,)
        # Tiny batches (e.g. the 1-example init forward) can have fewer
        # rows than codes — tile the worst rows up to K.
        kk = min(k, flat.shape[0])
        _, worst = jax.lax.top_k(err, kk)
        cand = flat[worst]
        if kk < k:
            reps = -(-k // kk)                               # ceil
            cand = jnp.tile(cand, (reps, 1))[:k]
        stats = {"counts": jax.lax.stop_gradient(counts),
                 "candidates": jax.lax.stop_gradient(cand)}
        idx_r = idx.reshape(z_e.shape[:-1]).astype(jnp.int32)
        return z_ste, idx_r, vq_loss, stats
    idx = idx.reshape(z_e.shape[:-1]).astype(jnp.int32)
    return z_ste, idx, vq_loss


def reseed_dead_codes(codebook: Array, counts: Array, candidates: Array,
                      key: Array, rate: float):
    """Dead-code re-seeding (r5, VERDICT r4 item 1 — the VQ-VAE-v2-style
    revival half of the usage fix): each code UNUSED in the current batch
    jumps, with probability ``rate`` per step, to one of the batch's
    highest-quantization-error encoder outputs (``candidates`` from
    :func:`vector_quantize` ``with_stats``). Batch sizes here put 4k-33k
    assignments per step against <=256 codes, so zero batch usage means
    dead-or-very-rare; the coin keeps rare-but-alive codes from
    thrashing. Returns ``(new_codebook, n_reseeded)``."""
    dead = counts < 1
    coin = jax.random.uniform(key, counts.shape) < rate
    take = dead & coin
    new_cb = jnp.where(take[:, None], candidates.astype(codebook.dtype),
                       codebook)
    return new_cb, jnp.sum(take.astype(jnp.int32))


class VectorQuantizer(nn.Module):
    """Module wrapper owning the codebook param (standalone reuse)."""

    codes: int
    dim: int
    beta: float = 0.25

    @nn.compact
    def __call__(self, z_e: Array):
        cb = self.param(
            "codebook",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (self.codes, self.dim))
        return vector_quantize(z_e, cb, self.beta)


def transmit_indices(ch, idx_tx: Array, codes: int, snr_db, key: Array,
                     token_weights: Array = None) -> Array:
    """The digital link: (B, N) indices -> bits [-> Hamming(7,4)] -> QPSK
    -> ``ch.kind`` channel -> (hard or soft-ML) decision -> received
    indices (B, N). Shared by the reconstruction codec
    (:class:`VQCameraJSCC`) and the RL perception trunk
    (``rl/perception.py`` arch="vq") so FEC deploys identically on both.

    ``token_weights``: optional (B, N) per-token symbol amplitude
    multiplier (semantic UEP weights and/or a kept-token 0/1 mask),
    repeated over each token's contiguous symbols. QPSK is exactly unit
    power, so the channel is applied unnormalized."""
    fec = ch.fec
    if fec in ("hamming74", "hamming74_soft"):
        sym = bits_to_qpsk(hamming74_encode(bits_from_indices(idx_tx, codes)))
    else:
        sym = indices_to_qpsk(idx_tx, codes)
    if token_weights is not None:
        spt = sym.shape[1] // idx_tx.shape[1]
        sym = sym * jnp.repeat(token_weights, spt, axis=1)[..., None]
    ch_kw = channel_kwargs(ch)
    ch_kw["normalize"] = False            # QPSK is exactly unit power
    ch_kw["modulation"] = 0               # mapping already digital
    y = channel_op(sym, snr_db, ch.kind, key, **ch_kw)
    if fec == "hamming74":
        return indices_from_bits(hamming74_decode(qpsk_to_bits(y)), codes)
    if fec == "hamming74_soft":
        # ML correlation decode on the raw received components.
        return indices_from_bits(
            hamming74_decode_soft(qpsk_soft_bits(y)), codes)
    return qpsk_to_indices(y, codes, idx_tx.shape[1])


def transmit_indices_harq(ch, idx_tx: Array, codes: int, snr_db,
                          key: Array):
    """Type-I HARQ variant of :func:`transmit_indices` (r5, VERDICT r4
    item 4 — the protocol stack on the CONTROL path): (B, N) indices ->
    bits -> CRC-8 blocks over QPSK with chase-combined retransmissions
    (channel/harq.py) -> received indices. Returns ``(idx_rx, info)``
    where info carries the exact adaptive-bandwidth accounting
    (symbols_per_item / mean_rounds / residual_fail_rate). Uncoded bits +
    CRC, like the c1_vq HARQ evaluator (`cli eval --harq-sweep`);
    channel.fec is rejected in combination (config validate)."""
    from multimodal_sc_tpu.channel.harq import harq_transmit

    bits = bits_from_indices(idx_tx, codes)
    kw = channel_kwargs(ch)
    kw["normalize"] = False               # QPSK is exactly unit power
    kw["modulation"] = 0                  # mapping already digital
    bits_rx, info = harq_transmit(
        bits, snr_db, ch.kind, key, block_bits=ch.harq_block_bits,
        max_rounds=ch.harq_rounds, **kw)
    return indices_from_bits(bits_rx, codes), info


class VQCameraJSCC(nn.Module):
    """Camera -> semantic tokens -> QPSK digital channel -> reconstruction.

    cfg.camera fields: features (conv trunk), vq_codes (codebook size,
    power of 4), vq_dim (code dimension), vq_beta (commitment weight).
    The channel ride (indices -> QPSK -> cfg.channel -> hard decision)
    happens inside __call__ like the RL perception trunk, so train/eval
    stay one jitted graph.
    """

    cfg: ExperimentConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cam = self.cfg.camera
        n_bits = index_bits(cam.vq_codes)   # validate at construction
        if self.cfg.channel.fec != "none":
            # FEC needs whole nibbles AND an even coded bit count so the
            # 7/4x payload still fills whole QPSK symbols.
            total = self.n_tokens * n_bits
            if total % 8 != 0:
                raise ValueError(
                    "channel.fec needs n_tokens * bits_per_index"
                    f" divisible by 8, got {self.n_tokens} * {n_bits}")
        if cam.vq_prune:
            if self.cfg.channel.uep_alpha > 0:
                raise ValueError(
                    "channel.uep_alpha with camera.vq_prune is not "
                    "supported yet (power renormalization over the kept "
                    "set is unimplemented)")
            # Receiver-side placeholder for untransmitted tokens; trained
            # because dropped positions forward through it.
            self.mask_embed = self.param(
                "mask_embed", nn.initializers.normal(0.02), (cam.vq_dim,))
        feats = cam.features
        strides = (2, 2, 1, 1)
        self.enc_blocks = [
            FusedConvPReLU(f, 5, stride=s, use_pallas=self.cfg.use_pallas,
                           dtype=self.dtype, name=f"enc{i}")
            for i, (f, s) in enumerate(zip(feats, strides))]
        self.to_code = nn.Conv(cam.vq_dim, (1, 1), dtype=self.dtype,
                               name="to_code")
        self.codebook = self.param(
            "codebook",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (cam.vq_codes, cam.vq_dim))
        self.from_code = FusedConvPReLU(
            feats[-1], 5, use_pallas=self.cfg.use_pallas, dtype=self.dtype,
            name="from_code")
        dec_feats = tuple(reversed(feats))
        dec_strides = (1, 1, 2, 2)
        blocks = []
        for i, (f, s) in enumerate(zip(dec_feats, dec_strides)):
            if s == 1:
                blocks.append(FusedConvPReLU(
                    f, 5, use_pallas=self.cfg.use_pallas, dtype=self.dtype,
                    name=f"dec{i}"))
            else:
                blocks.append((nn.ConvTranspose(
                    f, (5, 5), strides=(s, s), padding="SAME",
                    dtype=self.dtype, name=f"deconv{i}"),
                    PReLU(name=f"deprelu{i}")))
        self.dec_blocks = blocks
        self.conv_out = FusedConvPReLU(
            3, 5, with_prelu=False, use_pallas=self.cfg.use_pallas,
            dtype=self.dtype, name="conv_out")

    # --- encode / decode halves (deployment split) ---

    def encode_features(self, img: Array) -> Array:
        """Image -> pre-quantization features (B, h, w, D). Used by
        :func:`init_codebook_from_batch` for data-dependent codebook
        seeding (and as the first half of :meth:`encode_tokens`)."""
        x = img.astype(self.dtype)
        for blk in self.enc_blocks:
            x = blk(x)
        return self.to_code(x).astype(jnp.float32)

    def encode_tokens(self, img: Array):
        """Image -> (indices (B, N) int32, vq_loss, z_ste (B, N, D)).
        The transmitter; indices are the over-the-air payload."""
        cam = self.cfg.camera
        z_e = self.encode_features(img)                    # (B, h, w, D)
        z_ste, idx, vq_loss = vector_quantize(
            z_e, self.codebook, cam.vq_beta,
            usage_coef=cam.vq_usage_coef, usage_temp=cam.vq_usage_temp)
        b, h, w, _ = z_e.shape
        return (idx.reshape(b, h * w), vq_loss,
                z_ste.reshape(b, h * w, self.cfg.camera.vq_dim))

    def codes_to_image(self, z: Array) -> Array:
        """(B, N, D) code vectors -> reconstructed image. The receiver."""
        cam = self.cfg.camera
        h, w = cam.image_hw[0] // 4, cam.image_hw[1] // 4
        x = z.reshape(z.shape[0], h, w, cam.vq_dim).astype(self.dtype)
        x = self.from_code(x)
        for blk in self.dec_blocks:
            if isinstance(blk, tuple):
                deconv, prelu = blk
                x = prelu(deconv(x))
            else:
                x = blk(x)
        return nn.sigmoid(self.conv_out(x).astype(jnp.float32))

    def decode_tokens(self, idx: Array) -> Array:
        """(B, N) received indices -> image (pure receiver path)."""
        return self.codes_to_image(self.codebook[idx])

    # --- semantic-importance unequal power allocation (UEP) ---

    def token_damage(self, idx_tx: Array, key: Array) -> Array:
        """Per-token expected squared reconstruction damage under a
        single-bit index error: D_t = (1/n_bits) Σ_b ‖J_t Δe_t^b‖², where
        J_t = ∂recon/∂z_t at the clean codes and Δe_t^b = e_{idx_t⊕2^b} −
        e_{idx_t} (the embedding jump a bit-b channel error causes).

        Estimated with ``cfg.channel.uep_probes`` random VJP probes —
        unbiased, since for v ~ N(0, I) and g = Jᵀv (one decoder backward
        pass), E_v[(g_t · Δe)²] = ‖J_t Δe‖² exactly. Everything the
        transmitter needs (decoder params, codebook) is local in a JSCC
        autoencoder deployment. Returns (B, N) float32, stop-gradiented.
        """
        cam = self.cfg.camera
        n_bits = index_bits(cam.vq_codes)
        z_clean = self.codebook[idx_tx]                    # (B, N, D)
        _, vjp_fn = nn.vjp(
            lambda m, z: m.codes_to_image(z), self, z_clean,
            vjp_variables=False)
        shifts = (1 << jnp.arange(n_bits, dtype=jnp.int32))
        idx_flip = idx_tx[..., None] ^ shifts              # (B, N, n_bits)
        delta = self.codebook[idx_flip] - z_clean[:, :, None, :]
        b = idx_tx.shape[0]
        h, w = cam.image_hw
        probes = self.cfg.channel.uep_probes
        v = jax.random.normal(key, (probes, b, h, w, 3), jnp.float32)
        # vjp_fn -> (variables_cotangent ({} here), z_cotangent).
        g = jax.vmap(lambda vv: vjp_fn(vv)[1])(v)          # (P, B, N, D)
        dot = jnp.einsum("pbnd,bnkd->pbnk", g, delta)
        return jax.lax.stop_gradient(
            jnp.mean(dot * dot, axis=(0, 3)))              # (B, N)

    def token_drop_damage(self, idx_tx: Array, key: Array) -> Array:
        """Per-token expected squared reconstruction damage when the token
        is NOT transmitted and the receiver decodes the learned mask
        embedding instead: D_t = ‖J_t (mask_embed − e_{idx_t})‖².

        The pruning-specific importance rank: :meth:`token_damage` scores
        the SINGLE-BIT-ERROR jump (a nearby code), which is the wrong
        perturbation model for dropping — measured on the r3 c1_vq_prune
        checkpoint, bit-flip ranking LOST to random selection at every
        keep fraction (BASELINE.md token-pruning section) while this rank
        recovers the semantic win. Same unbiased VJP probe estimator.
        Requires camera.vq_prune (the mask embedding must exist)."""
        cam = self.cfg.camera
        z_clean = self.codebook[idx_tx]                    # (B, N, D)
        _, vjp_fn = nn.vjp(
            lambda m, z: m.codes_to_image(z), self, z_clean,
            vjp_variables=False)
        delta = self.mask_embed[None, None, :] - z_clean   # (B, N, D)
        b = idx_tx.shape[0]
        h, w = cam.image_hw
        probes = self.cfg.channel.uep_probes
        v = jax.random.normal(key, (probes, b, h, w, 3), jnp.float32)
        g = jax.vmap(lambda vv: vjp_fn(vv)[1])(v)          # (P, B, N, D)
        dot = jnp.einsum("pbnd,bnd->pbn", g, delta)
        return jax.lax.stop_gradient(jnp.mean(dot * dot, axis=0))

    @staticmethod
    def waterfill_power(damage: Array, snr_db) -> Array:
        """SNR-aware Chernoff water-filling: minimize Σ_t D_t e^{−s·w²_t/2}
        subject to Σ_t w²_t = N (per-bit error ≈ Q(w√s) ≤ e^{−s·w²/2} at
        linear SNR s). KKT gives w²_t = max(0, (2/s)·ln(s·D_t/(2λ))) with
        λ fixed by 50-step log-bisection per example. Near-uniform at
        high SNR (errors rare everywhere), concentrates power on
        high-damage tokens at low SNR — the adaptation the fixed-α
        family lacks. Returns per-token POWER (B, N), mean exactly 1.
        """
        n = damage.shape[1]
        s = jnp.asarray(snr_db, jnp.float32)
        s = s.reshape(-1, 1) if s.ndim == 1 else s.reshape(1, 1)
        s = jnp.power(10.0, s / 10.0)
        a = jnp.log(s * damage / 2.0 + 1e-30)              # (B, N)
        hi = jnp.max(a, axis=1, keepdims=True)             # total(hi) = 0
        lo = hi - s * (n / 2.0)                            # total(lo) >= N

        def body(_, bounds):
            lo, hi = bounds
            mid = 0.5 * (lo + hi)
            total = jnp.sum(jnp.clip((2.0 / s) * (a - mid), 0.0),
                            axis=1, keepdims=True)
            big = total > n
            return jnp.where(big, mid, lo), jnp.where(big, hi, mid)

        lo, hi = jax.lax.fori_loop(0, 50, body, (lo, hi))
        w2 = jnp.clip((2.0 / s) * (a - 0.5 * (lo + hi)), 0.0)
        tot = jnp.sum(w2, axis=1, keepdims=True)
        # Exact power budget (bisection is within float tolerance); the
        # degenerate all-zero case (flat damage at extreme SNR) falls
        # back to uniform.
        return jnp.where(tot > 1e-8, w2 * (n / jnp.maximum(tot, 1e-8)),
                         jnp.ones_like(w2))

    def uep_weights(self, idx_tx: Array, snr_db, key: Array) -> Array:
        """(B, N) per-token QPSK amplitude weights w_t with exact unit
        mean power (mean_t w_t² == 1): power ∝ damage^alpha, or the
        SNR-aware waterfill allocation (cfg.channel.uep_mode). alpha = 0
        would be uniform (the caller skips UEP entirely then).

        Waterfill under FEC uses the coded error exponent: the pairwise
        soft-ML error between codewords at distance d is
        Q(√(d·s·w²)) — exponent d·s·w²/2 — so the effective SNR scales
        by d_min (3 for soft Hamming(7,4); ~2 for hard syndrome
        decoding, whose block errors need ≥ 2 bit flips). Without this
        the allocator assumes uncoded bits and over-concentrates
        (measured −0.9 dB at 0 dB coded, BASELINE.md UEP section).
        """
        damage = self.token_damage(idx_tx, key)
        if self.cfg.channel.uep_mode == "waterfill":
            dmin = {"none": 1.0, "hamming74": 2.0,
                    "hamming74_soft": 3.0}[self.cfg.channel.fec]
            snr_eff = jnp.asarray(snr_db, jnp.float32) + 10.0 * jnp.log10(
                jnp.float32(dmin))
            return jnp.sqrt(self.waterfill_power(damage, snr_eff))
        p_tok = jnp.power(damage + 1e-12, self.cfg.channel.uep_alpha)
        p_tok = p_tok / jnp.mean(p_tok, axis=1, keepdims=True)
        return jnp.sqrt(p_tok)

    # --- full pipeline (training / eval graph) ---

    def __call__(self, img: Array, snr_db, key: Array, keep=None,
                 select=None):
        """(recon, aux): the whole TX->channel->RX pipeline, one graph.

        aux: vq_loss, index_error_rate. Noise-aware: the decoder forward
        uses the received codes; gradients take the clean STE path.

        keep: optional (B,) per-example kept-token fraction (semantic
        token pruning, camera.vq_prune models). The training driver
        passes random fractions; at deploy `None` falls back to
        cfg.channel.token_keep with cfg.channel.token_select ranking
        ("damage" transmits the semantically important tokens only).
        Dropped tokens transmit nothing (zero symbols = bandwidth
        saved); the receiver decodes them as the learned mask embedding
        and needs the kept-set bitmap (N bits of side-channel metadata
        in a real system).

        select: optional selection-rule override ("damage" | "random");
        None falls back to cfg.channel.token_select. The training driver
        forces "random" (full coverage of drop patterns, no per-step VJP
        probes); deployment ranks by damage.
        """
        cfg = self.cfg
        cam = cfg.camera
        if cam.vq_reseed > 0:
            # Training graph wants dead-code stats for the driver's
            # re-seeding step (train/jscc.py; r5 usage fix) — inline the
            # quantization so counts/candidates come back with the rest.
            z_e = self.encode_features(img)
            z_ste, idx_tx, vq_loss, vq_stats = vector_quantize(
                z_e, self.codebook, cam.vq_beta,
                usage_coef=cam.vq_usage_coef, usage_temp=cam.vq_usage_temp,
                with_stats=True)
            b, gh, gw, _ = z_e.shape
            idx_tx = idx_tx.reshape(b, gh * gw)
            z_ste = z_ste.reshape(b, gh * gw, cam.vq_dim)
        else:
            idx_tx, vq_loss, z_ste = self.encode_tokens(img)
            vq_stats = None
        n_tok = idx_tx.shape[1]
        prune = cfg.camera.vq_prune
        if keep is None and prune and cfg.channel.token_keep < 1.0:
            keep = jnp.full((img.shape[0],), cfg.channel.token_keep,
                            jnp.float32)
        if keep is not None and not prune:
            raise ValueError("keep requires camera.vq_prune=true")
        kept = None
        if prune and keep is not None:
            m = jnp.ceil(keep * n_tok).astype(jnp.int32)   # (B,)
            if select is None:
                select = cfg.channel.token_select
            gh, gw = cfg.camera.image_hw[0] // 4, cfg.camera.image_hw[1] // 4
            if select == "drop_damage":
                scores = self.token_drop_damage(
                    idx_tx, jax.random.fold_in(key, 88))
            elif select == "damage":
                scores = self.token_damage(
                    idx_tx, jax.random.fold_in(key, 88))
            elif select == "scatter":
                # Content-free maximal spatial spread: every prefix of the
                # farthest-point ordering is well-scattered over the token
                # grid (the decoder's inpainting prior is the binding
                # constraint — BASELINE.md token-pruning section).
                scores = jnp.broadcast_to(
                    -jnp.asarray(farthest_point_order(gh, gw),
                                 jnp.float32), idx_tx.shape)
            elif select == "drop_damage_scatter":
                # Semantics + spread: average of the two percentile ranks
                # (drop-damage descending, farthest-point ascending).
                dmg = self.token_drop_damage(
                    idx_tx, jax.random.fold_in(key, 88))
                dmg_rank = jnp.argsort(jnp.argsort(-dmg, axis=1), axis=1)
                sc_rank = jnp.broadcast_to(
                    jnp.asarray(farthest_point_order(gh, gw), jnp.int32),
                    idx_tx.shape)
                scores = -(dmg_rank + sc_rank).astype(jnp.float32)
            else:
                scores = jax.random.uniform(
                    jax.random.fold_in(key, 88), idx_tx.shape)
            # kept = top-m tokens by score, static shapes throughout.
            kept = topk_mask(scores, m)                    # (B, N) bool
        codes = cfg.camera.vq_codes
        w_tok = None
        token_weights = None
        if cfg.channel.uep_alpha > 0:
            # Semantic UEP: redistribute power toward high-damage tokens
            # at exactly unit mean symbol power (token weight repeats
            # over its contiguous symbols — coded or uncoded layout).
            # Receiver-transparent: QPSK hard decisions are sign-based
            # and the soft-FEC metric scales uniformly within a block.
            w_tok = self.uep_weights(idx_tx, snr_db,
                                     jax.random.fold_in(key, 77))
            token_weights = w_tok
        if kept is not None:
            # Dropped tokens transmit nothing — their symbols carry zero
            # power (bandwidth elasticity, not a power trade). UEP with
            # pruning is rejected at construction, so no weight product.
            token_weights = kept.astype(jnp.float32)
        idx_rx = transmit_indices(cfg.channel, idx_tx, codes, snr_db, key,
                                  token_weights=token_weights)
        err = (idx_rx != idx_tx).astype(jnp.float32)
        # Received codes on the forward path, clean STE on the backward.
        z_rx = z_ste + jax.lax.stop_gradient(self.codebook[idx_rx] - z_ste)
        if kept is not None:
            # Untransmitted positions decode as the learned mask
            # embedding (gradient flows to it, not to the encoder —
            # those tokens were never sent); error rate counts
            # transmitted tokens only.
            me = jnp.broadcast_to(self.mask_embed, z_rx.shape)
            z_rx = jnp.where(kept[..., None], z_rx,
                             me.astype(z_rx.dtype))
            kf = kept.astype(jnp.float32)
            idx_err = jnp.sum(err * kf) / jnp.maximum(jnp.sum(kf), 1.0)
        else:
            idx_err = jnp.mean(err)
        recon = self.codes_to_image(z_rx)
        # Codebook-usage perplexity (exp entropy of the index histogram):
        # ~1 means collapse, ~codes means uniform usage. The collapse
        # diagnostic for the degenerate optimum fixed by
        # init_codebook_from_batch.
        p = jnp.mean(jax.nn.one_hot(idx_tx, cfg.camera.vq_codes), axis=(0, 1))
        perplexity = jnp.exp(-jnp.sum(p * jnp.log(p + 1e-10)))
        aux = {"vq_loss": vq_loss, "index_error_rate": idx_err,
               "code_perplexity": perplexity}
        if vq_stats is not None:
            # Dead-code re-seeding inputs for the train driver (r5 usage
            # fix); stripped from metrics there.
            aux["vq_counts"] = vq_stats["counts"]
            aux["vq_candidates"] = vq_stats["candidates"]
        if cfg.channel.uep_alpha > 0:
            # Observability: how nonuniform the allocation actually is
            # (std of per-token power around its unit mean).
            aux["uep_power_spread"] = jnp.mean(
                jnp.std(jnp.square(w_tok), axis=1))
        if kept is not None:
            aux["token_keep_frac"] = jnp.mean(kept.astype(jnp.float32))
        return recon, aux

    @property
    def n_tokens(self) -> int:
        h, w = self.cfg.camera.image_hw
        return (h // 4) * (w // 4)

    @property
    def bits_per_image(self) -> int:
        return self.n_tokens * index_bits(self.cfg.camera.vq_codes)


class VQEncoderTokens(nn.Module):
    """Encoder half of :class:`VQCameraJSCC` as a standalone module — the
    deployed VQ transmitter for the RL perception trunk
    (``rl/perception.py`` arch="vq"). Child param names (``enc{i}``,
    ``to_code``, ``codebook``) deliberately mirror VQCameraJSCC's
    top-level tree so a c1_vq reconstruction checkpoint warm-starts this
    submodule subtree-by-name (``rl/warmstart.py``)."""

    features: tuple
    vq_dim: int
    vq_codes: int
    vq_beta: float = 0.25
    # Codebook-usage regularization + dead-code re-seeding stats (r5 —
    # see CameraCodecConfig; the RL learners consume the sown stats).
    vq_usage_coef: float = 0.0
    vq_usage_temp: float = 0.5
    vq_reseed: float = 0.0
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        strides = (2, 2, 1, 1)
        self.enc_blocks = [
            FusedConvPReLU(f, 5, stride=s, use_pallas=self.use_pallas,
                           dtype=self.dtype, name=f"enc{i}")
            for i, (f, s) in enumerate(zip(self.features, strides))]
        self.to_code = nn.Conv(self.vq_dim, (1, 1), dtype=self.dtype,
                               name="to_code")
        self.codebook = self.param(
            "codebook",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (self.vq_codes, self.vq_dim))

    def encode_features(self, img: Array) -> Array:
        x = img.astype(self.dtype)
        for blk in self.enc_blocks:
            x = blk(x)
        return self.to_code(x).astype(jnp.float32)

    def __call__(self, img: Array):
        """Image -> (indices (B, N) int32, vq_loss, z_ste (B, N, D)).
        With ``vq_reseed > 0`` the batch usage histogram and the
        re-seeding candidates are sown as intermediates for the RL
        learners' dead-code re-seeding step (rl/dqn.py, rl/ppo.py)."""
        z_e = self.encode_features(img)                    # (B, h, w, D)
        if self.vq_reseed > 0:
            z_ste, idx, vq_loss, stats = vector_quantize(
                z_e, self.codebook, self.vq_beta,
                usage_coef=self.vq_usage_coef,
                usage_temp=self.vq_usage_temp, with_stats=True)
            self.sow("intermediates", "vq_counts", stats["counts"])
            self.sow("intermediates", "vq_candidates", stats["candidates"])
        else:
            z_ste, idx, vq_loss = vector_quantize(
                z_e, self.codebook, self.vq_beta,
                usage_coef=self.vq_usage_coef,
                usage_temp=self.vq_usage_temp)
        b, h, w, _ = z_e.shape
        return (idx.reshape(b, h * w), vq_loss,
                z_ste.reshape(b, h * w, self.vq_dim))


class VQTokensCamera(nn.Module):
    """Received code vectors (B, N, vq_dim) -> fusion tokens (B, N, dim).

    The receiver half of the RL VQ camera branch: one 5x5 conv + PReLU on
    the token grid (mirrors ``CameraTokensCNN``'s front-half-of-decoder
    shape), so the fusion transformer sees the same token layout as the
    analog branches."""

    dim: int
    vq_dim: int
    image_hw: tuple = (32, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Array) -> Array:
        b = z.shape[0]
        h, w = self.image_hw[0] // 4, self.image_hw[1] // 4
        x = z.reshape(b, h, w, self.vq_dim).astype(self.dtype)
        x = nn.Conv(self.dim, (5, 5), padding="SAME", dtype=self.dtype,
                    name="conv_in")(x)
        x = PReLU(name="prelu_in")(x)
        return x.reshape(b, h * w, self.dim).astype(jnp.float32)


def seed_codebook(params, z: Array, key: Array):
    """Replace ``params['codebook']`` rows with a random sample of actual
    encoder outputs ``z`` (+ small jitter so duplicated rows separate).
    Shared by :func:`init_codebook_from_batch` (reconstruction driver) and
    the RL drivers' cold-start seeding (``train/dqn.py``/``train/ppo.py``
    with camera.arch="vq")."""
    flat = z.reshape(-1, z.shape[-1])
    k = params["codebook"].shape[0]
    rows = jax.random.choice(key, flat, (k,), replace=flat.shape[0] < k)
    rows = rows + 0.01 * jax.random.normal(
        jax.random.fold_in(key, 1), rows.shape)
    new = dict(params)
    new["codebook"] = rows
    return new


def init_codebook_from_batch(model: VQCameraJSCC, params, img: Array,
                             key: Array):
    """Data-dependent codebook seeding: replace the codebook rows with a
    random sample of actual encoder outputs on a real batch (+ small
    jitter so duplicated rows still separate).

    Fixes the classic VQ degenerate optimum observed with the default
    small-uniform init: every code sits in one tight near-zero cluster, so
    codes are interchangeable, the decoder learns a code-INDEPENDENT mean
    image, and channel index errors stop mattering (measured: 88% index
    errors at -5 dB moved PSNR by 0.0001 dB). Seeding from the encoder's
    own output distribution makes codes informative from step 0.
    Called by the train driver only on a fresh run (never on resume).
    """
    z = model.apply({"params": params}, img, method="encode_features")
    flat = z.reshape(-1, z.shape[-1])
    k = params["codebook"].shape[0]
    rows = jax.random.choice(key, flat, (k,), replace=flat.shape[0] < k)
    rows = rows + 0.01 * jax.random.normal(
        jax.random.fold_in(key, 1), rows.shape)
    new = dict(params)
    new["codebook"] = rows
    return new
