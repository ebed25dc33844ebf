"""LiDAR BEV pillar encoder / semantic-occupancy JSCC codec.

Spec: BASELINE.json:5 ("LiDAR BEV encoder"), :9 ("LiDAR point-cloud -> BEV
pillar encoder + camera branch, late-fusion semantic TX"). Reference repo
has no code (``/root/reference/README.md:1-2``); design follows the
PointPillars pattern (cf. camera-LiDAR fusion papers, PAPERS.md:5-9):
per-point augmented features -> shared PointNet MLP -> max-scatter into the
BEV pillar grid -> 2D conv backbone -> tokens / channel symbols.

The decode direction reconstructs a semantic BEV occupancy grid, giving a
differentiable reconstruction target (binary cross-entropy) and the mIoU
metric required by the SNR-sweep evaluator (BASELINE.json:8).

TPU-first: dynamic voxelization with fully static shapes — every point gets
a pillar id (invalid -> trash cell), scatter via segment_max (XLA) or the
Pallas pillar-scatter kernel; no per-pillar gather/pad loops.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_sc_tpu.kernels.pillar_scatter import scatter_max

Array = jax.Array


def voxelize(
    points: Array, mask: Array,
    bev_hw: Tuple[int, int], x_range: Tuple[float, float],
    y_range: Tuple[float, float],
) -> Tuple[Array, Array]:
    """points (B,N,F>=3), mask (B,N) -> (aug_feats (B,N,F+3), cell_idx (B,N)).

    Augments each point with its offset from the pillar center and routes
    masked/out-of-range points to the trash cell ``H*W``.
    """
    h, w = bev_hw
    dx = (x_range[1] - x_range[0]) / h
    dy = (y_range[1] - y_range[0]) / w
    gx = jnp.floor((points[..., 0] - x_range[0]) / dx).astype(jnp.int32)
    gy = jnp.floor((points[..., 1] - y_range[0]) / dy).astype(jnp.int32)
    in_range = (gx >= 0) & (gx < h) & (gy >= 0) & (gy < w) & mask
    cell = jnp.where(in_range, gx * w + gy, h * w)

    cx = x_range[0] + (gx.astype(points.dtype) + 0.5) * dx
    cy = y_range[0] + (gy.astype(points.dtype) + 0.5) * dy
    offs = jnp.stack([points[..., 0] - cx, points[..., 1] - cy], axis=-1)
    aug = jnp.concatenate(
        [points, offs, in_range[..., None].astype(points.dtype)], axis=-1)
    aug = aug * in_range[..., None].astype(points.dtype)
    return aug, cell


def occupancy_target(
    points: Array, mask: Array, bev_hw: Tuple[int, int],
    x_range: Tuple[float, float], y_range: Tuple[float, float],
    min_points: int = 1,
) -> Array:
    """Ground-truth binary occupancy grid (B, H, W) from a point cloud."""
    _, cell = voxelize(points, mask, bev_hw, x_range, y_range)
    h, w = bev_hw

    def one(cell_b):
        cnt = jnp.zeros((h * w + 1,), jnp.int32).at[cell_b].add(1)
        return (cnt[: h * w] >= min_points).astype(jnp.float32).reshape(h, w)

    return jax.vmap(one)(cell)


def semantic_bev_target(
    points: Array, mask: Array, classes: Array, bev_hw: Tuple[int, int],
    x_range: Tuple[float, float], y_range: Tuple[float, float],
    num_classes: int = 4,
) -> Array:
    """Ground-truth semantic BEV grid (B, H, W) int32 from labeled points.

    Cell class = majority point class (ties -> higher class id, so sparse
    car returns beat dense ground on equal counts); 0 = empty cell. This is
    the harder multi-class gate of VERDICT r1 item 3 (vs the saturated
    binary occupancy).
    """
    _, cell = voxelize(points, mask, bev_hw, x_range, y_range)
    h, w = bev_hw

    def one(cell_b, cls_b):
        counts = []
        for c in range(1, num_classes):
            inc = (cls_b == c).astype(jnp.int32)
            counts.append(
                jnp.zeros((h * w + 1,), jnp.int32).at[cell_b].add(inc))
        cnt = jnp.stack(counts, axis=-1)[: h * w]      # (H*W, C-1)
        # Tie-break toward the higher class id: argmax on the reversed axis.
        best_rev = jnp.argmax(cnt[:, ::-1], axis=-1)
        best = (num_classes - 2) - best_rev + 1        # class id in [1, C)
        total = jnp.sum(cnt, axis=-1)
        return jnp.where(total > 0, best, 0).astype(jnp.int32).reshape(h, w)

    return jax.vmap(one)(cell, classes)


class PillarFeatureNet(nn.Module):
    """Shared per-point MLP then max-scatter to the BEV grid."""

    pillar_dim: int = 64
    bev_hw: Tuple[int, int] = (16, 16)
    x_range: Tuple[float, float] = (0.0, 48.0)
    y_range: Tuple[float, float] = (-12.0, 12.0)
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points: Array, mask: Array) -> Array:
        aug, cell = voxelize(points, mask, self.bev_hw, self.x_range,
                             self.y_range)
        x = nn.Dense(self.pillar_dim, dtype=self.dtype, name="fc1")(
            aug.astype(self.dtype))
        x = nn.LayerNorm(dtype=self.dtype, name="ln")(x)
        x = nn.relu(x)
        x = nn.Dense(self.pillar_dim, dtype=self.dtype, name="fc2")(x)
        x = x.astype(jnp.float32)
        h, w = self.bev_hw
        num_cells = h * w

        def one(feats_b, cell_b):
            return scatter_max(feats_b, cell_b, num_cells,
                               use_pallas=self.use_pallas)

        bev = jax.vmap(one)(x, cell)              # (B, H*W, D)
        return bev.reshape(-1, h, w, self.pillar_dim)


class BEVBackbone(nn.Module):
    """Small 2D conv backbone over the pillar grid."""

    features: Tuple[int, ...] = (64, 128)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, bev: Array) -> Array:
        x = bev.astype(self.dtype)
        for i, f in enumerate(self.features):
            x = nn.Conv(f, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = nn.LayerNorm(dtype=self.dtype, name=f"ln{i}")(x)
            x = nn.relu(x)
        return x


class LidarBEVCodec(nn.Module):
    """Point cloud -> channel symbols; symbols -> semantic BEV logits.

    encode: (points (B,N,F), mask (B,N)) -> z (B, H*W*c_sym, 2)
    decode: z_hat -> BEV logits (B, H, W, C) where C = max(seg_classes, 1);
      seg_classes == 1 is the binary-occupancy mode (single logit + BCE),
      seg_classes > 1 the semantic mode (softmax classes incl. 0 = empty).
    tokens: intermediate BEV tokens (B, H*W, D) for the fusion transformer.
    """

    pillar_dim: int = 64
    bev_hw: Tuple[int, int] = (16, 16)
    c_sym: int = 4
    seg_classes: int = 1
    x_range: Tuple[float, float] = (0.0, 48.0)
    y_range: Tuple[float, float] = (-12.0, 12.0)
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.pfn = PillarFeatureNet(
            pillar_dim=self.pillar_dim, bev_hw=self.bev_hw,
            x_range=self.x_range, y_range=self.y_range,
            use_pallas=self.use_pallas, dtype=self.dtype)
        self.backbone = BEVBackbone(features=(self.pillar_dim, self.pillar_dim),
                                    dtype=self.dtype)
        self.sym_head = nn.Dense(2 * self.c_sym, dtype=self.dtype)
        self.sym_embed = nn.Dense(self.pillar_dim, dtype=self.dtype)
        self.dec_backbone = BEVBackbone(
            features=(self.pillar_dim, self.pillar_dim), dtype=self.dtype)
        self.occ_head = nn.Dense(max(self.seg_classes, 1), dtype=self.dtype)

    def bev_features(self, points: Array, mask: Array) -> Array:
        return self.backbone(self.pfn(points, mask))

    def encode(self, obs, snr_db: Optional[Array] = None) -> Array:
        points, mask = obs
        feats = self.bev_features(points, mask)          # (B, H, W, D)
        x = self.sym_head(feats)                         # (B, H, W, 2c)
        b, h, w, _ = x.shape
        return x.reshape(b, h * w * self.c_sym, 2).astype(jnp.float32)

    def decode(self, z_hat: Array, snr_db: Optional[Array] = None) -> Array:
        b = z_hat.shape[0]
        h, w = self.bev_hw
        x = z_hat.reshape(b, h, w, 2 * self.c_sym).astype(self.dtype)
        x = self.sym_embed(x)
        x = self.dec_backbone(x)
        return self.occ_head(x).astype(jnp.float32)      # logits (B,H,W,1)

    def tokens(self, z_hat: Array) -> Array:
        """Decoded symbols -> BEV tokens for cross-modal fusion."""
        b = z_hat.shape[0]
        h, w = self.bev_hw
        x = z_hat.reshape(b, h, w, 2 * self.c_sym).astype(self.dtype)
        x = self.sym_embed(x)
        x = self.dec_backbone(x)
        return x.reshape(b, h * w, self.pillar_dim).astype(jnp.float32)

    def __call__(self, obs, snr_db: Optional[Array] = None) -> Array:
        return self.decode(self.encode(obs, snr_db), snr_db)

    @property
    def k(self) -> int:
        return self.bev_hw[0] * self.bev_hw[1] * self.c_sym


class LidarBEVVQCodec(nn.Module):
    """Digital LiDAR semantic codec: BEV features -> codebook indices ->
    QPSK digital link -> semantic BEV logits (lidar.arch="vq", r4 —
    VERDICT r3 item 4: the multimodal half of the digital deployment
    story; SURVEY.md §2.2's digital rows were all camera-only).

    Mirrors the camera VQ recipe (codec/semantic_vq.py): STE quantization
    with codebook+commitment losses, noise-aware decoding (decoder sees
    received codes, gradients ride the clean path), the shared
    ``transmit_indices`` link (so Hamming(7,4) hard/soft FEC deploys
    parameter-transparently), and data-dependent codebook seeding on
    fresh runs. At vq_codes=256 on a 32x32 grid the payload is 4096 QPSK
    symbols — exactly the analog c3 bandwidth (32*32*c_sym=4), so the
    digital-vs-analog mIoU sweep is bandwidth-matched.

    ``channel_cfg`` is the ChannelConfig consumed by the in-graph link
    (the ride happens inside __call__ like VQCameraJSCC / the RL trunk).
    """

    pillar_dim: int = 64
    bev_hw: Tuple[int, int] = (16, 16)
    vq_codes: int = 256
    vq_dim: int = 32
    vq_beta: float = 0.25
    # Codebook-usage regularization + dead-code re-seeding (r5 — the fix
    # for this codec's measured collapse to perplexity 6.8/256, VERDICT
    # r4 item 1; semantics in config/configs.py LidarCodecConfig).
    vq_usage_coef: float = 0.0
    vq_usage_temp: float = 0.5
    vq_reseed: float = 0.0
    # Semantic token pruning (r5, VERDICT r4 item 5 — the BEV
    # counterpart of camera.vq_prune): train with per-example random
    # token dropping + a learned receiver mask embedding; deploy at any
    # kept fraction (channel.token_keep / token_select). Dropped tokens
    # transmit ZERO symbols (bandwidth elasticity).
    vq_prune: bool = False
    seg_classes: int = 1
    x_range: Tuple[float, float] = (0.0, 48.0)
    y_range: Tuple[float, float] = (-12.0, 12.0)
    channel_cfg: object = None
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        from multimodal_sc_tpu.channel.digital import index_bits

        n_bits = index_bits(self.vq_codes)      # validates power of 4
        if self.channel_cfg is not None and self.channel_cfg.fec != "none":
            total = self.bev_hw[0] * self.bev_hw[1] * n_bits
            if total % 8 != 0:
                raise ValueError(
                    "channel.fec needs n_tokens * bits_per_index "
                    f"divisible by 8, got {total}")
        self.pfn = PillarFeatureNet(
            pillar_dim=self.pillar_dim, bev_hw=self.bev_hw,
            x_range=self.x_range, y_range=self.y_range,
            use_pallas=self.use_pallas, dtype=self.dtype)
        self.backbone = BEVBackbone(
            features=(self.pillar_dim, self.pillar_dim), dtype=self.dtype)
        self.to_code = nn.Conv(self.vq_dim, (1, 1), dtype=self.dtype,
                               name="to_code")
        self.codebook = self.param(
            "codebook",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (self.vq_codes, self.vq_dim))
        self.from_code = nn.Dense(self.pillar_dim, dtype=self.dtype,
                                  name="from_code")
        if self.vq_prune:
            # Receiver-side placeholder for untransmitted tokens; trained
            # because dropped positions forward through it.
            self.mask_embed = self.param(
                "mask_embed", nn.initializers.normal(0.02), (self.vq_dim,))
        self.dec_backbone = BEVBackbone(
            features=(self.pillar_dim, self.pillar_dim), dtype=self.dtype)
        self.occ_head = nn.Dense(max(self.seg_classes, 1), dtype=self.dtype)

    def encode_features(self, points: Array, mask: Array) -> Array:
        """Point cloud -> pre-quantization code features (B, H, W, D);
        the codebook-seeding hook (seed_codebook)."""
        return self.to_code(
            self.backbone(self.pfn(points, mask))).astype(jnp.float32)

    def encode_tokens(self, points: Array, mask: Array):
        """-> (indices (B, N) int32, vq_loss, z_ste (B, N, D))."""
        from multimodal_sc_tpu.codec.semantic_vq import vector_quantize

        z_e = self.encode_features(points, mask)
        z_ste, idx, vq_loss = vector_quantize(
            z_e, self.codebook, self.vq_beta,
            usage_coef=self.vq_usage_coef, usage_temp=self.vq_usage_temp)
        b, h, w, _ = z_e.shape
        return (idx.reshape(b, h * w), vq_loss,
                z_ste.reshape(b, h * w, self.vq_dim))

    def codes_to_logits(self, z: Array) -> Array:
        """(B, N, D) code vectors -> BEV logits (B, H, W, C)."""
        b = z.shape[0]
        h, w = self.bev_hw
        x = z.reshape(b, h, w, self.vq_dim).astype(self.dtype)
        x = self.dec_backbone(self.from_code(x))
        return self.occ_head(x).astype(jnp.float32)

    def decode_tokens(self, idx: Array) -> Array:
        """(B, N) received indices -> logits (pure receiver path)."""
        return self.codes_to_logits(self.codebook[idx])

    def token_drop_damage(self, idx_tx: Array, key: Array) -> Array:
        """Per-token expected squared BEV-logit damage when the token is
        NOT transmitted and the receiver decodes the mask embedding
        instead: D_t = ||J_t (mask_embed - e_{idx_t})||^2, estimated with
        ``channel_cfg.uep_probes`` unbiased VJP probes — the BEV port of
        VQCameraJSCC.token_drop_damage (same estimator, logit-space
        cotangents). Requires vq_prune."""
        z_clean = self.codebook[idx_tx]                    # (B, N, D)
        _, vjp_fn = nn.vjp(
            lambda m, z: m.codes_to_logits(z), self, z_clean,
            vjp_variables=False)
        delta = self.mask_embed[None, None, :] - z_clean   # (B, N, D)
        b = idx_tx.shape[0]
        h, w = self.bev_hw
        probes = (self.channel_cfg.uep_probes
                  if self.channel_cfg is not None else 2)
        v = jax.random.normal(
            key, (probes, b, h, w, max(self.seg_classes, 1)), jnp.float32)
        g = jax.vmap(lambda vv: vjp_fn(vv)[1])(v)          # (P, B, N, D)
        dot = jnp.einsum("pbnd,bnd->pbn", g, delta)
        return jax.lax.stop_gradient(jnp.mean(dot * dot, axis=0))

    def __call__(self, points: Array, mask: Array, snr_db, key: Array,
                 keep=None, select=None):
        """(logits, aux) through the full digital pipeline, one graph.
        With ``vq_reseed > 0`` aux also carries the dead-code re-seeding
        stats (``vq_counts``/``vq_candidates``) for the fusion train
        driver (train/fusion_jscc.py; r5 usage fix).

        ``keep``: optional (B,) kept-token fractions (vq_prune models —
        the training driver passes random fractions; at deploy ``None``
        falls back to channel_cfg.token_keep with channel_cfg.token_select
        ranking). ``select``: selection-rule override; see
        VQCameraJSCC.__call__ — on the BEV grid the same four rules apply
        (scatter / random / drop_damage / drop_damage_scatter)."""
        from multimodal_sc_tpu.codec.semantic_vq import (
            farthest_point_order,
            topk_mask,
            transmit_indices,
            vector_quantize,
        )

        ch = self.channel_cfg
        vq_stats = None
        if self.vq_reseed > 0:
            z_e = self.encode_features(points, mask)
            z_ste, idx_tx, vq_loss, vq_stats = vector_quantize(
                z_e, self.codebook, self.vq_beta,
                usage_coef=self.vq_usage_coef,
                usage_temp=self.vq_usage_temp, with_stats=True)
            b, gh, gw, _ = z_e.shape
            idx_tx = idx_tx.reshape(b, gh * gw)
            z_ste = z_ste.reshape(b, gh * gw, self.vq_dim)
        else:
            idx_tx, vq_loss, z_ste = self.encode_tokens(points, mask)
        n_tok = idx_tx.shape[1]
        if keep is None and self.vq_prune and ch is not None \
                and ch.token_keep < 1.0:
            keep = jnp.full((idx_tx.shape[0],), ch.token_keep, jnp.float32)
        if keep is not None and not self.vq_prune:
            raise ValueError("keep requires lidar.vq_prune=true")
        kept = None
        if self.vq_prune and keep is not None:
            m = jnp.ceil(keep * n_tok).astype(jnp.int32)
            if select is None:
                select = ch.token_select if ch is not None else "scatter"
            gh, gw = self.bev_hw
            if select == "drop_damage":
                scores = self.token_drop_damage(
                    idx_tx, jax.random.fold_in(key, 88))
            elif select == "scatter":
                scores = jnp.broadcast_to(
                    -jnp.asarray(farthest_point_order(gh, gw),
                                 jnp.float32), idx_tx.shape)
            elif select == "drop_damage_scatter":
                dmg = self.token_drop_damage(
                    idx_tx, jax.random.fold_in(key, 88))
                dmg_rank = jnp.argsort(jnp.argsort(-dmg, axis=1), axis=1)
                sc_rank = jnp.broadcast_to(
                    jnp.asarray(farthest_point_order(gh, gw), jnp.int32),
                    idx_tx.shape)
                scores = -(dmg_rank + sc_rank).astype(jnp.float32)
            elif select == "random":
                scores = jax.random.uniform(
                    jax.random.fold_in(key, 88), idx_tx.shape)
            else:
                raise ValueError(
                    f"unsupported BEV token_select {select!r}")
            kept = topk_mask(scores, m)                    # (B, N) bool
        idx_rx = transmit_indices(
            ch, idx_tx, self.vq_codes, snr_db, key,
            token_weights=(kept.astype(jnp.float32)
                           if kept is not None else None))
        err = (idx_rx != idx_tx).astype(jnp.float32)
        z_rx = z_ste + jax.lax.stop_gradient(self.codebook[idx_rx] - z_ste)
        if kept is not None:
            # Untransmitted positions decode as the learned mask
            # embedding; error rate counts transmitted tokens only.
            me = jnp.broadcast_to(self.mask_embed, z_rx.shape)
            z_rx = jnp.where(kept[..., None], z_rx, me.astype(z_rx.dtype))
            kf = kept.astype(jnp.float32)
            idx_err = jnp.sum(err * kf) / jnp.maximum(jnp.sum(kf), 1.0)
        else:
            idx_err = jnp.mean(err)
        logits = self.codes_to_logits(z_rx)
        p = jnp.mean(jax.nn.one_hot(idx_tx, self.vq_codes), axis=(0, 1))
        perplexity = jnp.exp(-jnp.sum(p * jnp.log(p + 1e-10)))
        aux = {"vq_loss": vq_loss, "index_error_rate": idx_err,
               "code_perplexity": perplexity}
        if kept is not None:
            aux["token_keep_frac"] = jnp.mean(kept.astype(jnp.float32))
        if vq_stats is not None:
            aux["vq_counts"] = vq_stats["counts"]
            aux["vq_candidates"] = vq_stats["candidates"]
        return logits, aux

    @property
    def n_tokens(self) -> int:
        return self.bev_hw[0] * self.bev_hw[1]
