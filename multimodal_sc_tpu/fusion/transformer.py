"""Cross-modal fusion transformer: (camera tokens, LiDAR tokens) -> state.

Spec: BASELINE.json:5 ("cross-modal fusion transformer"), :10
("Cross-attention fusion transformer + DQN driving policy"), :9 (late-fusion
mode for config 3). Reference repo has no code
(``/root/reference/README.md:1-2``); design per SURVEY.md §2.2: N layers of
bidirectional cross-attention + self-attention + MLP with learned modality
embeddings, CLS pooling to the policy state vector.

Attention runs on the shared kernels.attention dispatch (Pallas flash kernel
under ``use_pallas``, XLA twin otherwise) so the whole act() step stays one
jitted graph on the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_sc_tpu.codec.camera_vit import MHA

Array = jax.Array


class FusionLayer(nn.Module):
    """One bidirectional cross-attention + per-modality self-attention layer."""

    dim: int
    heads: int
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cam: Array, lid: Array):
        # Cross: camera attends to lidar, lidar attends to camera.
        cam = cam + MHA(self.dim, self.heads, self.use_pallas, self.dtype,
                        name="cam2lid")(
            nn.LayerNorm(dtype=self.dtype, name="ln_c1")(cam),
            nn.LayerNorm(dtype=self.dtype, name="ln_l1")(lid))
        lid = lid + MHA(self.dim, self.heads, self.use_pallas, self.dtype,
                        name="lid2cam")(
            nn.LayerNorm(dtype=self.dtype, name="ln_l2")(lid),
            nn.LayerNorm(dtype=self.dtype, name="ln_c2")(cam))
        # Self + MLP per modality.
        for name, x in (("cam", cam), ("lid", lid)):
            h = nn.LayerNorm(dtype=self.dtype, name=f"ln_{name}_sa")(x)
            x = x + MHA(self.dim, self.heads, self.use_pallas, self.dtype,
                        name=f"{name}_self")(h)
            h = nn.LayerNorm(dtype=self.dtype, name=f"ln_{name}_mlp")(x)
            h = nn.Dense(self.dim * 4, dtype=self.dtype,
                         name=f"{name}_mlp1")(h)
            h = nn.gelu(h)
            h = nn.Dense(self.dim, dtype=self.dtype, name=f"{name}_mlp2")(h)
            x = x + h
            if name == "cam":
                cam = x
            else:
                lid = x
        return cam, lid


class FusionTransformer(nn.Module):
    """Fuse camera + LiDAR token streams into a single state embedding.

    mode="cross_attention": full bidirectional fusion + CLS pooling.
    mode="late_concat": mean-pool each modality, concat, MLP (config 3).
    """

    dim: int = 128
    depth: int = 2
    heads: int = 4
    state_dim: int = 128
    mode: str = "cross_attention"
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cam_tokens: Array, lid_tokens: Array) -> Array:
        cam = nn.Dense(self.dim, dtype=self.dtype, name="cam_proj")(
            cam_tokens.astype(self.dtype))
        lid = nn.Dense(self.dim, dtype=self.dtype, name="lid_proj")(
            lid_tokens.astype(self.dtype))

        if self.mode == "late_concat":
            pooled = jnp.concatenate(
                [jnp.mean(cam, axis=1), jnp.mean(lid, axis=1)], axis=-1)
            h = nn.Dense(self.state_dim * 2, dtype=self.dtype, name="fc1")(pooled)
            h = nn.gelu(h)
            return nn.Dense(self.state_dim, dtype=self.dtype,
                            name="fc2")(h).astype(jnp.float32)

        # Learned modality embeddings + CLS token on the camera stream.
        mod_cam = self.param("mod_cam", nn.initializers.normal(0.02),
                             (1, 1, self.dim), jnp.float32)
        mod_lid = self.param("mod_lid", nn.initializers.normal(0.02),
                             (1, 1, self.dim), jnp.float32)
        cls = self.param("cls", nn.initializers.normal(0.02),
                         (1, 1, self.dim), jnp.float32)
        b = cam.shape[0]
        cam = cam + mod_cam.astype(self.dtype)
        lid = lid + mod_lid.astype(self.dtype)
        cam = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, self.dim)), cam],
            axis=1)

        for i in range(self.depth):
            cam, lid = FusionLayer(self.dim, self.heads, self.use_pallas,
                                   self.dtype, name=f"layer{i}")(cam, lid)
        state = nn.LayerNorm(dtype=self.dtype, name="ln_out")(cam[:, 0])
        return nn.Dense(self.state_dim, dtype=self.dtype,
                        name="state_head")(state).astype(jnp.float32)
