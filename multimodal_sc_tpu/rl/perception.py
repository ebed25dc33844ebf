"""Semantic-communication perception trunk for the RL agents.

Spec: BASELINE.json:5 call-stack (b) (SURVEY.md §3.2): per modality
encode -> channel -> decode-to-tokens, then the cross-modal fusion
transformer produces the policy state. The whole trunk is one flax module
so DQN/PPO heads share it and the entire act() step is one jitted graph.

The channel is applied INSIDE the module call (with an explicit key arg) so
policy gradients flow through the differentiable channel into both codecs —
end-to-end semantic communication (BASELINE.json:11).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_sc_tpu.channel import channel as channel_op
from multimodal_sc_tpu.channel import channel_kwargs
from multimodal_sc_tpu.codec.camera_cnn import CameraEncoderCNN, CameraTokensCNN
from multimodal_sc_tpu.codec.lidar_bev import BEVBackbone, PillarFeatureNet
from multimodal_sc_tpu.config.configs import ExperimentConfig
from multimodal_sc_tpu.fusion.transformer import FusionTransformer

Array = jax.Array


class SemanticPerception(nn.Module):
    """(image, points, mask) -> fused state vector, through noisy channels."""

    cfg: ExperimentConfig

    def setup(self):
        cam, lid, fus = self.cfg.camera, self.cfg.lidar, self.cfg.fusion
        dtype = jnp.bfloat16 if self.cfg.train.bf16 else jnp.float32
        if cam.arch == "vit":
            from multimodal_sc_tpu.codec.camera_vit import (
                ViTEncoderJSCC,
                ViTTokensDecoder,
            )

            attn_pallas = self.cfg.use_pallas or self.cfg.pallas_attention
            self.cam_enc = ViTEncoderJSCC(
                image_hw=cam.image_hw, patch=cam.patch, dim=cam.dim,
                depth=cam.depth, heads=cam.heads, c_sym=cam.c_sym,
                snr_conditioning=False, use_pallas=attn_pallas,
                dtype=dtype)
            self.cam_tok = ViTTokensDecoder(
                image_hw=cam.image_hw, patch=cam.patch, dim=cam.dim,
                depth=max(1, cam.depth // 2), heads=cam.heads,
                c_sym=cam.c_sym, use_pallas=attn_pallas, dtype=dtype)
        elif cam.arch == "vq":
            # Digital semantic deployment on the control path (VERDICT r3
            # item 2): the camera branch quantizes against a learned
            # codebook and ships INTEGER indices over the QPSK digital
            # link (codec/semantic_vq.py transmit_indices — same FEC
            # machinery as the c1_vq reconstruction codec, parameter-
            # transparently codable at deploy time). Tokens, not pixels,
            # feed the fusion transformer.
            from multimodal_sc_tpu.channel.digital import index_bits
            from multimodal_sc_tpu.codec.semantic_vq import (
                VQEncoderTokens,
                VQTokensCamera,
            )

            n_bits = index_bits(cam.vq_codes)   # validates power of 4
            n_tok = (cam.image_hw[0] // 4) * (cam.image_hw[1] // 4)
            if self.cfg.channel.fec != "none" and (n_tok * n_bits) % 8 != 0:
                raise ValueError(
                    "channel.fec needs n_tokens * bits_per_index divisible "
                    f"by 8, got {n_tok} * {n_bits}")
            self.cam_vq = VQEncoderTokens(
                features=cam.features, vq_dim=cam.vq_dim,
                vq_codes=cam.vq_codes, vq_beta=cam.vq_beta,
                vq_usage_coef=cam.vq_usage_coef,
                vq_usage_temp=cam.vq_usage_temp,
                vq_reseed=cam.vq_reseed,
                use_pallas=self.cfg.use_pallas, dtype=dtype)
            self.cam_tok = VQTokensCamera(
                dim=fus.dim, vq_dim=cam.vq_dim, image_hw=cam.image_hw,
                dtype=dtype)
        else:
            self.cam_enc = CameraEncoderCNN(
                features=cam.features, c_sym=cam.c_sym,
                use_pallas=self.cfg.use_pallas, dtype=dtype)
            self.cam_tok = CameraTokensCNN(
                dim=fus.dim, c_sym=cam.c_sym, image_hw=cam.image_hw,
                dtype=dtype)
        self.pfn = PillarFeatureNet(
            pillar_dim=lid.pillar_dim, bev_hw=lid.bev_hw,
            x_range=lid.x_range, y_range=lid.y_range,
            use_pallas=self.cfg.use_pallas, dtype=dtype)
        self.lid_backbone = BEVBackbone(
            features=(lid.pillar_dim, lid.pillar_dim), dtype=dtype)
        if lid.arch == "vq":
            # Digital LiDAR on the control path (r4): BEV features ->
            # codebook indices -> QPSK link -> received codes -> tokens.
            # The V2X RSU branch shares these params, so the cooperative
            # link is digital too. Param names mirror LidarBEVVQCodec
            # (to_code/codebook/from_code) so a c3_vq reconstruction
            # checkpoint warm-starts the deployed firmware by name.
            from multimodal_sc_tpu.channel.digital import index_bits

            index_bits(lid.vq_codes)            # validates power of 4
            self.lid_to_code = nn.Conv(lid.vq_dim, (1, 1), dtype=dtype,
                                       name="lid_to_code")
            self.lid_codebook = self.param(
                "lid_codebook",
                nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
                (lid.vq_codes, lid.vq_dim))
            self.lid_from_code = nn.Dense(lid.pillar_dim, dtype=dtype,
                                          name="lid_from_code")
            if lid.vq_prune:
                # BEV token pruning on the control path (r5, VERDICT r4
                # item 5): learned receiver placeholder for untransmitted
                # tokens; name mirrors LidarBEVVQCodec.mask_embed (via
                # the lid_ prefix convention) for c3_vq_prune warm-starts.
                self.lid_mask_embed = self.param(
                    "lid_mask_embed", nn.initializers.normal(0.02),
                    (lid.vq_dim,))
        else:
            self.lid_sym_head = nn.Dense(2 * lid.c_sym, dtype=dtype)
            self.lid_sym_embed = nn.Dense(lid.pillar_dim, dtype=dtype)
        self.lid_dec = BEVBackbone(
            features=(lid.pillar_dim, lid.pillar_dim), dtype=dtype)
        if self.cfg.env.v2x_rays > 0:
            # V2X cooperative perception (envs/driving.py v2x_scan): the
            # RSU's point cloud rides the SAME LiDAR semantic codec
            # (shared params — the same codec firmware deployed on both
            # units) over its own channel instance; the only new param is
            # this modality embedding, which tells the fusion transformer
            # which tokens came over the V2X link (and therefore carry
            # the static-lookahead RSU frame).
            self.v2x_embed = self.param(
                "v2x_embed", nn.initializers.normal(0.02),
                (1, 1, self.cfg.lidar.pillar_dim))
        attn_pallas = self.cfg.use_pallas or self.cfg.pallas_attention
        self.fusion = FusionTransformer(
            dim=fus.dim, depth=fus.depth, heads=fus.heads,
            state_dim=fus.state_dim, mode=fus.mode,
            use_pallas=attn_pallas,
            fused_block=self.cfg.pallas_mha_block,
            block_kernel=self.cfg.mha_block_kernel, dtype=dtype)

    def __call__(
        self,
        image: Array,            # (B, H, W, 3)
        points: Array,           # (B, N, 4)
        mask: Array,             # (B, N)
        key: Array,
        snr_db: Optional[Array] = None,
        v2x_offset_db: Optional[Array] = None,
        lidar_keep: Optional[Array] = None,
    ) -> Array:
        """``v2x_offset_db`` (scalar): RSU-link SNR offset relative to the
        deployed ``snr_db``. None falls back to the config constant
        (training); the eval drivers pass it as a RUNTIME scalar so
        link-outage ablations (`channel.v2x_snr_offset_db=-40`) reuse the
        healthy-link compiled graph (VERDICT r3 item 5).

        ``lidar_keep`` (optional (B,)): kept-token fractions for the
        pruned digital LiDAR branch (lidar.vq_prune, r5) — the RL
        learners pass random fractions during training (random selection,
        full drop-pattern coverage); ``None`` at deploy falls back to
        channel.token_keep with the content-free channel.token_select
        rule (scatter/random — validate() rejects the decoder-VJP damage
        rules on this path)."""
        ch = self.cfg.channel
        if snr_db is None:
            snr_db = jnp.full((image.shape[0],), ch.snr_db, jnp.float32)
        if v2x_offset_db is None:
            v2x_offset_db = jnp.float32(ch.v2x_snr_offset_db)
        if self.cfg.rl.ablate_lidar:
            # Camera-only ablation arm (VERDICT r2 item 5): identical
            # architecture/params, LiDAR branch fed zeros.
            points = jnp.zeros_like(points)
            mask = jnp.zeros_like(mask)
        v2x = self.cfg.env.v2x_rays > 0
        if v2x:
            # Ego rays first, RSU rays after (envs/driving.py observe).
            r_ego = self.cfg.env.lidar_rays
            points, pts_v2x = points[:, :r_ego], points[:, r_ego:]
            mask, mask_v2x = mask[:, :r_ego], mask[:, r_ego:]
        k_cam, k_lid = jax.random.split(key)

        # Channel-aware policy (r3): with camera.snr_conditioning the
        # camera branch FiLM-modulates on the current SNR (the receiver
        # knows its channel quality), so a policy trained under
        # channel.random_snr can adapt behavior to link conditions.
        # CNN arch only (the RL ViT branch is built unconditioned).
        cond = (self.cfg.camera.snr_conditioning
                and self.cfg.camera.arch == "cnn")
        snr_in = snr_db if cond else None

        # Camera branch: encode -> channel -> token decode.
        if self.cfg.camera.arch == "vq":
            # Digital link: indices over QPSK (+ optional FEC); the token
            # decoder sees the RECEIVED codes while gradients ride the
            # clean straight-through path (noise-aware training, exactly
            # the c1_vq recipe). The VQ codebook/commitment loss is sown
            # as an intermediate — the RL learners add it to their loss
            # (rl.vq_loss_coef), since TD/PPO gradients alone never move
            # the codebook.
            from multimodal_sc_tpu.codec.semantic_vq import (
                transmit_indices,
                transmit_indices_harq,
            )

            idx_tx, vq_loss, z_ste = self.cam_vq(image)
            if ch.harq:
                # Deploy-time Type-I HARQ on the camera token link (r5):
                # adaptive bandwidth, accounting sown for the policy
                # sweep's sym/step column.
                idx_rx, hinfo = transmit_indices_harq(
                    ch, idx_tx, self.cfg.camera.vq_codes, snr_db, k_cam)
                self.sow("intermediates", "harq_syms",
                         hinfo["symbols_per_item"])
                self.sow("intermediates", "harq_rounds",
                         hinfo["mean_rounds"])
                self.sow("intermediates", "harq_resid",
                         hinfo["residual_fail_rate"])
            else:
                idx_rx = transmit_indices(
                    ch, idx_tx, self.cfg.camera.vq_codes, snr_db, k_cam)
            z_rx = z_ste + jax.lax.stop_gradient(
                self.cam_vq.codebook[idx_rx] - z_ste)
            cam_tokens = self.cam_tok(z_rx)
            self.sow("intermediates", "vq_loss", vq_loss)
            self.sow("intermediates", "index_error_rate",
                     jnp.mean((idx_rx != idx_tx).astype(jnp.float32)))
        else:
            z_cam = self.cam_enc(image, snr_in)
            z_cam_hat = channel_op(z_cam, snr_db, ch.kind, k_cam,
                                   **channel_kwargs(ch))
            cam_tokens = self.cam_tok(z_cam_hat, snr_in)

        # LiDAR branch: pillars -> BEV -> symbols -> channel -> tokens.
        lid = self.cfg.lidar

        def lidar_branch(pts, msk, link_snr, k):
            bev = self.lid_backbone(self.pfn(pts, msk))
            if lid.arch == "vq":
                # Digital link: quantize against the shared codebook,
                # ship indices over QPSK (+ optional FEC), decode the
                # RECEIVED codes with clean STE gradients. The sown
                # vq_loss entries (one per branch call — ego and V2X) are
                # summed by the RL learners (rl.vq_loss_coef).
                from multimodal_sc_tpu.codec.semantic_vq import (
                    transmit_indices,
                    vector_quantize,
                )

                z_e = self.lid_to_code(bev).astype(jnp.float32)
                b, h, w, _ = z_e.shape
                if lid.vq_reseed > 0:
                    # Dead-code re-seeding stats for the RL learners (r5
                    # usage fix) — one sown entry per branch call (ego +
                    # V2X); the learner sums counts and takes the ego
                    # candidates.
                    z_ste, idx_tx, vq_loss, stats = vector_quantize(
                        z_e, self.lid_codebook, lid.vq_beta,
                        usage_coef=lid.vq_usage_coef,
                        usage_temp=lid.vq_usage_temp, with_stats=True)
                    self.sow("intermediates", "lid_vq_counts",
                             stats["counts"])
                    self.sow("intermediates", "lid_vq_cands",
                             stats["candidates"])
                else:
                    z_ste, idx_tx, vq_loss = vector_quantize(
                        z_e, self.lid_codebook, lid.vq_beta,
                        usage_coef=lid.vq_usage_coef,
                        usage_temp=lid.vq_usage_temp)
                idx_tx = idx_tx.reshape(b, h * w)
                z_ste = z_ste.reshape(b, h * w, lid.vq_dim)
                kept = None
                if lid.vq_prune:
                    from multimodal_sc_tpu.codec.semantic_vq import (
                        farthest_point_order,
                        topk_mask,
                    )

                    keep_b = lidar_keep
                    if keep_b is None and ch.token_keep < 1.0:
                        keep_b = jnp.full((b,), ch.token_keep, jnp.float32)
                    if keep_b is not None:
                        m_cnt = jnp.ceil(keep_b * h * w).astype(jnp.int32)
                        sel = ("random" if lidar_keep is not None
                               else ch.token_select)
                        if sel == "scatter":
                            scores = jnp.broadcast_to(
                                -jnp.asarray(farthest_point_order(h, w),
                                             jnp.float32), idx_tx.shape)
                        else:       # random (training or deploy ablation)
                            scores = jax.random.uniform(
                                jax.random.fold_in(k, 88), idx_tx.shape)
                        kept = topk_mask(scores, m_cnt)
                if ch.harq:
                    # HARQ on the LiDAR token link — and therefore the
                    # V2X RSU stream, which rides this same branch (r5).
                    from multimodal_sc_tpu.codec.semantic_vq import (
                        transmit_indices_harq,
                    )

                    idx_rx, hinfo = transmit_indices_harq(
                        ch, idx_tx, lid.vq_codes, link_snr, k)
                    self.sow("intermediates", "harq_syms",
                             hinfo["symbols_per_item"])
                    self.sow("intermediates", "harq_rounds",
                             hinfo["mean_rounds"])
                    self.sow("intermediates", "harq_resid",
                             hinfo["residual_fail_rate"])
                else:
                    idx_rx = transmit_indices(
                        ch, idx_tx, lid.vq_codes, link_snr, k,
                        token_weights=(kept.astype(jnp.float32)
                                       if kept is not None else None))
                z_rx = z_ste + jax.lax.stop_gradient(
                    self.lid_codebook[idx_rx] - z_ste)
                if kept is not None:
                    # Untransmitted positions decode as the learned mask
                    # embedding (zero symbols sent — bandwidth saved).
                    me = jnp.broadcast_to(self.lid_mask_embed, z_rx.shape)
                    z_rx = jnp.where(kept[..., None], z_rx,
                                     me.astype(z_rx.dtype))
                self.sow("intermediates", "vq_loss", vq_loss)
                x = self.lid_from_code(
                    z_rx.reshape(b, h, w, lid.vq_dim).astype(bev.dtype))
                return self.lid_dec(x).reshape(
                    b, h * w, lid.pillar_dim).astype(jnp.float32)
            sym = self.lid_sym_head(bev)
            b, h, w, _ = sym.shape
            z = sym.reshape(b, h * w * lid.c_sym, 2).astype(jnp.float32)
            z_hat = channel_op(z, link_snr, ch.kind, k,
                               **channel_kwargs(ch))
            x = z_hat.reshape(b, h, w, 2 * lid.c_sym)
            return self.lid_dec(self.lid_sym_embed(x)).reshape(
                b, h * w, lid.pillar_dim).astype(jnp.float32)

        lid_tokens = lidar_branch(points, mask, snr_db, k_lid)
        if v2x:
            # RSU tokens ride the V2X link (own SNR offset, own noise
            # instance) through the SAME codec, then join the LiDAR token
            # stream tagged by the modality embedding — the fusion
            # transformer needs no structural change.
            v2x_tokens = lidar_branch(
                pts_v2x, mask_v2x, snr_db + v2x_offset_db,
                jax.random.fold_in(k_lid, 0xB2C))
            lid_tokens = jnp.concatenate(
                [lid_tokens,
                 v2x_tokens + self.v2x_embed.astype(v2x_tokens.dtype)],
                axis=1)

        return self.fusion(cam_tokens, lid_tokens)


def collect_reseed_stats(cfg: ExperimentConfig, intermediates) -> dict:
    """Pull the dead-code re-seeding stats the perception trunk sowed
    (``vq_reseed > 0`` paths) out of a ``mutable=["intermediates"]``
    collection. Returns ``{"cam": (counts, candidates), "lid": (...)}``
    with only the branches whose config enables re-seeding; LiDAR counts
    sum the ego + V2X branch calls (shared codebook)."""
    per = intermediates["perception"]
    rs = {}
    if cfg.camera.arch == "vq" and cfg.camera.vq_reseed > 0:
        cv = per["cam_vq"]
        rs["cam"] = (cv["vq_counts"][0], cv["vq_candidates"][0])
    if cfg.lidar.arch == "vq" and cfg.lidar.vq_reseed > 0:
        counts = sum(per["lid_vq_counts"])
        rs["lid"] = (counts, per["lid_vq_cands"][0])
    return rs


def apply_codebook_reseed(cfg: ExperimentConfig, params, rs: dict,
                          key: Array):
    """Dead-code re-seeding on the RL param tree (r5 usage fix; see
    codec/semantic_vq.py reseed_dead_codes): replace batch-dead codebook
    rows with high-quantization-error encoder outputs, with probability
    ``vq_reseed`` per step. Applied by the learners AFTER the optimizer
    update (rl/dqn.py, rl/dqn_sharded.py, rl/ppo.py); the target/EMA
    trees are left alone — a dead code is by definition unused, so its
    stale row there decodes nothing, and the Polyak lerps track the new
    row anyway."""
    from multimodal_sc_tpu.codec.semantic_vq import reseed_dead_codes

    per = dict(params["perception"])
    if "cam" in rs:
        counts, cands = rs["cam"]
        sub = dict(per["cam_vq"])
        sub["codebook"], _ = reseed_dead_codes(
            sub["codebook"], counts, cands, jax.random.fold_in(key, 1),
            cfg.camera.vq_reseed)
        per["cam_vq"] = sub
    if "lid" in rs:
        counts, cands = rs["lid"]
        per["lid_codebook"], _ = reseed_dead_codes(
            per["lid_codebook"], counts, cands, jax.random.fold_in(key, 2),
            cfg.lidar.vq_reseed)
    out = dict(params)
    out["perception"] = per
    return out


class QNetwork(nn.Module):
    """DQN head over the fused state (BASELINE.json:10)."""

    cfg: ExperimentConfig

    def setup(self):
        self.perception = SemanticPerception(self.cfg)
        self.h1 = nn.Dense(256)
        self.h2 = nn.Dense(256)
        self.q = nn.Dense(self.cfg.rl.num_actions)

    def __call__(self, image, points, mask, key, snr_db=None,
                 v2x_offset_db=None, lidar_keep=None) -> Array:
        s = self.perception(image, points, mask, key, snr_db, v2x_offset_db,
                            lidar_keep)
        h = nn.relu(self.h1(s))
        h = nn.relu(self.h2(h))
        return self.q(h)


class ActorCritic(nn.Module):
    """PPO policy/value heads over the fused state (BASELINE.json:11)."""

    cfg: ExperimentConfig

    def setup(self):
        self.perception = SemanticPerception(self.cfg)
        self.pi_h = nn.Dense(256)
        self.pi = nn.Dense(self.cfg.rl.num_actions)
        self.v_h = nn.Dense(256)
        self.v = nn.Dense(1)

    def __call__(self, image, points, mask, key, snr_db=None,
                 v2x_offset_db=None, lidar_keep=None) -> Tuple[Array, Array]:
        s = self.perception(image, points, mask, key, snr_db, v2x_offset_db,
                            lidar_keep)
        logits = self.pi(nn.tanh(self.pi_h(s)))
        value = self.v(nn.tanh(self.v_h(s)))[..., 0]
        return logits, value
