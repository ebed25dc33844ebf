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
        self.lid_sym_head = nn.Dense(2 * lid.c_sym, dtype=dtype)
        self.lid_sym_embed = nn.Dense(lid.pillar_dim, dtype=dtype)
        self.lid_dec = BEVBackbone(
            features=(lid.pillar_dim, lid.pillar_dim), dtype=dtype)
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
    ) -> Array:
        ch = self.cfg.channel
        if snr_db is None:
            snr_db = jnp.full((image.shape[0],), ch.snr_db, jnp.float32)
        if self.cfg.rl.ablate_lidar:
            # Camera-only ablation arm (VERDICT r2 item 5): identical
            # architecture/params, LiDAR branch fed zeros.
            points = jnp.zeros_like(points)
            mask = jnp.zeros_like(mask)
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
        z_cam = self.cam_enc(image, snr_in)
        z_cam_hat = channel_op(z_cam, snr_db, ch.kind, k_cam,
                               **channel_kwargs(ch))
        cam_tokens = self.cam_tok(z_cam_hat, snr_in)

        # LiDAR branch: pillars -> BEV -> symbols -> channel -> tokens.
        lid = self.cfg.lidar
        bev = self.lid_backbone(self.pfn(points, mask))
        sym = self.lid_sym_head(bev)
        b, h, w, _ = sym.shape
        z_lid = sym.reshape(b, h * w * lid.c_sym, 2).astype(jnp.float32)
        z_lid_hat = channel_op(z_lid, snr_db, ch.kind, k_lid,
                               **channel_kwargs(ch))
        x = z_lid_hat.reshape(b, h, w, 2 * lid.c_sym)
        lid_tokens = self.lid_dec(self.lid_sym_embed(x)).reshape(
            b, h * w, lid.pillar_dim).astype(jnp.float32)

        return self.fusion(cam_tokens, lid_tokens)


class QNetwork(nn.Module):
    """DQN head over the fused state (BASELINE.json:10)."""

    cfg: ExperimentConfig

    def setup(self):
        self.perception = SemanticPerception(self.cfg)
        self.h1 = nn.Dense(256)
        self.h2 = nn.Dense(256)
        self.q = nn.Dense(self.cfg.rl.num_actions)

    def __call__(self, image, points, mask, key, snr_db=None) -> Array:
        s = self.perception(image, points, mask, key, snr_db)
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

    def __call__(self, image, points, mask, key, snr_db=None
                 ) -> Tuple[Array, Array]:
        s = self.perception(image, points, mask, key, snr_db)
        logits = self.pi(nn.tanh(self.pi_h(s)))
        value = self.v(nn.tanh(self.v_h(s)))[..., 0]
        return logits, value
