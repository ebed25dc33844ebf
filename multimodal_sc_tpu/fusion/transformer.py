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
from multimodal_sc_tpu.kernels.mha_block import (block_eligible, mha_block,
                                                 mha_block_reference)

Array = jax.Array


class FusedMHABlock(nn.Module):
    """The whole ``x_q + OutProj(Attn(LN(x_q), LN(x_kv)))`` span as ONE op.

    When ``use_kernel`` (and shapes are eligible) it runs the widened
    Pallas kernel (``kernels/mha_block.py`` — VERDICT r2 item 1: swallow
    the fusion neighborhood the r2 ``pallas_call`` boundary was blocking);
    otherwise the XLA twin with identical semantics. Params live in the
    kernel's packed layout (wq/wk/wv (dim, dim) head-major lanes, wo
    (dim, dim)) — the same distributions as LayerNorm + DenseGeneral, but
    a different tree than the unfused MHA module, so checkpoints do not
    transfer across the ``pallas_mha_block`` flag flip.

    ``self_attn=True`` shares one LayerNorm between the q and kv streams
    (the pre-LN self-attention convention the unfused path uses).
    """

    dim: int
    heads: int
    self_attn: bool = False
    use_kernel: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_q: Array, x_kv: Optional[Array] = None) -> Array:
        if x_kv is None:
            x_kv = x_q
        dense = nn.initializers.lecun_normal()
        p = {
            "ln_q_scale": self.param("ln_q_scale", nn.initializers.ones,
                                     (self.dim,), jnp.float32),
            "ln_q_bias": self.param("ln_q_bias", nn.initializers.zeros,
                                    (self.dim,), jnp.float32),
            "wq": self.param("wq", dense, (self.dim, self.dim), jnp.float32),
            "bq": self.param("bq", nn.initializers.zeros, (self.dim,),
                             jnp.float32),
            "wk": self.param("wk", dense, (self.dim, self.dim), jnp.float32),
            "bk": self.param("bk", nn.initializers.zeros, (self.dim,),
                             jnp.float32),
            "wv": self.param("wv", dense, (self.dim, self.dim), jnp.float32),
            "bv": self.param("bv", nn.initializers.zeros, (self.dim,),
                             jnp.float32),
            "wo": self.param("wo", dense, (self.dim, self.dim), jnp.float32),
            "bo": self.param("bo", nn.initializers.zeros, (self.dim,),
                             jnp.float32),
        }
        if self.self_attn:
            p["ln_kv_scale"], p["ln_kv_bias"] = p["ln_q_scale"], p["ln_q_bias"]
        else:
            p["ln_kv_scale"] = self.param(
                "ln_kv_scale", nn.initializers.ones, (self.dim,), jnp.float32)
            p["ln_kv_bias"] = self.param(
                "ln_kv_bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        if self.use_kernel and block_eligible(self.heads, self.dim,
                                              x_kv.shape[1]):
            return mha_block(x_q, x_kv, p, self.heads)
        return mha_block_reference(x_q, x_kv, p, self.heads)


class FusionLayer(nn.Module):
    """One bidirectional cross-attention + per-modality self-attention layer."""

    dim: int
    heads: int
    use_pallas: bool = False
    fused_block: bool = False
    block_kernel: bool = True   # execution only: Pallas kernel vs XLA twin
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cam: Array, lid: Array):
        if self.fused_block:
            # Whole-span fused blocks (LN+QKV+attn+proj+residual each).
            cam = FusedMHABlock(self.dim, self.heads,
                                use_kernel=self.block_kernel,
                                dtype=self.dtype,
                                name="cam2lid_f")(cam, lid)
            lid = FusedMHABlock(self.dim, self.heads,
                                use_kernel=self.block_kernel,
                                dtype=self.dtype,
                                name="lid2cam_f")(lid, cam)
            for name, x in (("cam", cam), ("lid", lid)):
                x = FusedMHABlock(self.dim, self.heads, self_attn=True,
                                  use_kernel=self.block_kernel,
                                  dtype=self.dtype, name=f"{name}_self_f")(x)
                h = nn.LayerNorm(dtype=self.dtype, name=f"ln_{name}_mlp")(x)
                h = nn.Dense(self.dim * 4, dtype=self.dtype,
                             name=f"{name}_mlp1")(h)
                h = nn.gelu(h)
                h = nn.Dense(self.dim, dtype=self.dtype,
                             name=f"{name}_mlp2")(h)
                x = x + h
                if name == "cam":
                    cam = x
                else:
                    lid = x
            return cam, lid
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
    fused_block: bool = False
    block_kernel: bool = True   # execution only; param tree set by fused_block
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
            cam, lid = FusionLayer(self.dim, self.heads,
                                   use_pallas=self.use_pallas,
                                   fused_block=self.fused_block,
                                   block_kernel=self.block_kernel,
                                   dtype=self.dtype,
                                   name=f"layer{i}")(cam, lid)
        state = nn.LayerNorm(dtype=self.dtype, name="ln_out")(cam[:, 0])
        return nn.Dense(self.state_dim, dtype=self.dtype,
                        name="state_head")(state).astype(jnp.float32)
