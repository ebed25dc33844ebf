"""Camera ViT-JSCC encoder/decoder.

Spec: BASELINE.json:5 ("camera JSCC ... CNN/ViT encoder-decoder"). The
reference has no code (``/root/reference/README.md:1-2``); design follows
the ViT-JSCC literature pattern: patch-embed -> transformer encoder -> per-
patch symbol head; symmetric transformer decoder -> patch de-embed. An SNR
embedding token conditions both directions so one model serves an SNR range
(config 2, BASELINE.json:8).

TPU-first: attention runs through kernels.attention (Pallas flash kernel
when ``use_pallas``, XLA twin otherwise); dims are multiples of 128-friendly
sizes; activations optionally bfloat16 for the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_sc_tpu.kernels.attention import attention
from multimodal_sc_tpu.kernels.attention_packed import (
    packed_attention,
    packed_eligible,
)

Array = jax.Array


class MHA(nn.Module):
    dim: int
    heads: int
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_q: Array, x_kv: Optional[Array] = None) -> Array:
        if x_kv is None:
            x_kv = x_q
        hd = self.dim // self.heads
        q = nn.DenseGeneral((self.heads, hd), dtype=self.dtype, name="q")(x_q)
        k = nn.DenseGeneral((self.heads, hd), dtype=self.dtype, name="k")(x_kv)
        v = nn.DenseGeneral((self.heads, hd), dtype=self.dtype, name="v")(x_kv)
        if self.use_pallas and packed_eligible(self.heads, hd, k.shape[1]):
            # Packed-head kernel: heads stay in the lane dim, so the
            # (B,L,H,d) output reshapes for free — no transposes at all.
            b, lq = q.shape[:2]
            lk = k.shape[1]
            o = packed_attention(q.reshape(b, lq, self.dim),
                                 k.reshape(b, lk, self.dim),
                                 v.reshape(b, lk, self.dim), self.heads)
            o = o.reshape(b, lq, self.heads, hd)
        else:
            # (B, L, H, D) -> (B, H, L, D)
            q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            o = attention(q, k, v, use_pallas=self.use_pallas)
            o = o.transpose(0, 2, 1, 3)
        return nn.DenseGeneral(self.dim, axis=(-2, -1), dtype=self.dtype,
                               name="o")(o)


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: int = 4
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        x = x + MHA(self.dim, self.heads, self.use_pallas, self.dtype,
                    name="attn")(h)
        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype,
                     name="mlp1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp2")(h)
        return x + h


class SNRToken(nn.Module):
    """Embed snr_db into one extra token prepended to the sequence."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, snr_db: Array, batch: int) -> Array:
        s = (snr_db.reshape(-1, 1).astype(self.dtype) - 10.0) / 15.0
        tok = nn.Dense(self.dim, dtype=self.dtype, name="fc1")(s)
        tok = nn.tanh(tok)
        tok = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(tok)
        return tok.reshape(batch, 1, self.dim)


class ViTEncoderJSCC(nn.Module):
    image_hw: tuple = (32, 32)
    patch: int = 4
    dim: int = 128
    depth: int = 4
    heads: int = 4
    c_sym: int = 8
    snr_conditioning: bool = True
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_hw[0] // self.patch) * (self.image_hw[1] // self.patch)

    @nn.compact
    def __call__(self, img: Array, snr_db: Optional[Array] = None) -> Array:
        b = img.shape[0]
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(img.astype(self.dtype))
        x = x.reshape(b, -1, self.dim)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (1, self.num_patches, self.dim), jnp.float32)
        x = x + pos.astype(self.dtype)
        if self.snr_conditioning and snr_db is not None:
            snr_tok = SNRToken(self.dim, self.dtype, name="snr_token")(snr_db, b)
            x = jnp.concatenate([snr_tok, x], axis=1)
        for i in range(self.depth):
            x = TransformerBlock(self.dim, self.heads,
                                 use_pallas=self.use_pallas,
                                 dtype=self.dtype, name=f"block{i}")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_out")(x)
        if self.snr_conditioning and snr_db is not None:
            x = x[:, 1:]  # drop SNR token: symbols carry only content
        x = nn.Dense(2 * self.c_sym, dtype=self.dtype, name="sym_head")(x)
        return x.reshape(b, self.num_patches * self.c_sym, 2).astype(jnp.float32)


class ViTDecoderJSCC(nn.Module):
    image_hw: tuple = (32, 32)
    patch: int = 4
    dim: int = 128
    depth: int = 4
    heads: int = 4
    c_sym: int = 8
    out_channels: int = 3
    snr_conditioning: bool = True
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_hw[0] // self.patch) * (self.image_hw[1] // self.patch)

    @nn.compact
    def __call__(self, z_hat: Array, snr_db: Optional[Array] = None) -> Array:
        b = z_hat.shape[0]
        x = z_hat.reshape(b, self.num_patches, 2 * self.c_sym)
        x = nn.Dense(self.dim, dtype=self.dtype, name="sym_embed")(
            x.astype(self.dtype))
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (1, self.num_patches, self.dim), jnp.float32)
        x = x + pos.astype(self.dtype)
        if self.snr_conditioning and snr_db is not None:
            snr_tok = SNRToken(self.dim, self.dtype, name="snr_token")(snr_db, b)
            x = jnp.concatenate([snr_tok, x], axis=1)
        for i in range(self.depth):
            x = TransformerBlock(self.dim, self.heads,
                                 use_pallas=self.use_pallas,
                                 dtype=self.dtype, name=f"block{i}")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_out")(x)
        if self.snr_conditioning and snr_db is not None:
            x = x[:, 1:]
        x = nn.Dense(self.patch * self.patch * self.out_channels,
                     dtype=self.dtype, name="pixel_head")(x)
        hp, wp = self.image_hw[0] // self.patch, self.image_hw[1] // self.patch
        x = x.reshape(b, hp, wp, self.patch, self.patch, self.out_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, self.image_hw[0], self.image_hw[1], self.out_channels)
        return nn.sigmoid(x.astype(jnp.float32))


class ViTTokensDecoder(nn.Module):
    """Noisy symbols -> decoded ViT tokens (B, num_patches, dim) for fusion.

    The front half of ViTDecoderJSCC (sym embed + pos + transformer blocks,
    no pixel head) so RL perception reuses JSCC-pretrained decoding.
    """

    image_hw: tuple = (32, 32)
    patch: int = 4
    dim: int = 128
    depth: int = 2
    heads: int = 4
    c_sym: int = 8
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z_hat: Array, snr_db: Optional[Array] = None) -> Array:
        b = z_hat.shape[0]
        n = (self.image_hw[0] // self.patch) * (self.image_hw[1] // self.patch)
        x = z_hat.reshape(b, n, 2 * self.c_sym)
        x = nn.Dense(self.dim, dtype=self.dtype, name="sym_embed")(
            x.astype(self.dtype))
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (1, n, self.dim), jnp.float32)
        x = x + pos.astype(self.dtype)
        for i in range(self.depth):
            x = TransformerBlock(self.dim, self.heads,
                                 use_pallas=self.use_pallas,
                                 dtype=self.dtype, name=f"block{i}")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="ln_out")(x)
        return x.astype(jnp.float32)


class ViTJSCC(nn.Module):
    """Bundled ViT encoder/decoder with the codec protocol (encode/decode)."""

    image_hw: tuple = (32, 32)
    patch: int = 4
    dim: int = 128
    depth: int = 4
    heads: int = 4
    c_sym: int = 8
    out_channels: int = 3
    snr_conditioning: bool = True
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(image_hw=self.image_hw, patch=self.patch, dim=self.dim,
                  depth=self.depth, heads=self.heads, c_sym=self.c_sym,
                  snr_conditioning=self.snr_conditioning,
                  use_pallas=self.use_pallas, dtype=self.dtype)
        self.encoder = ViTEncoderJSCC(**kw)
        self.decoder = ViTDecoderJSCC(out_channels=self.out_channels, **kw)

    def encode(self, img: Array, snr_db: Optional[Array] = None) -> Array:
        return self.encoder(img, snr_db)

    def decode(self, z_hat: Array, snr_db: Optional[Array] = None) -> Array:
        return self.decoder(z_hat, snr_db)

    def __call__(self, img: Array, snr_db: Optional[Array] = None) -> Array:
        return self.decode(self.encode(img, snr_db), snr_db)

    @property
    def k(self) -> int:
        return ((self.image_hw[0] // self.patch)
                * (self.image_hw[1] // self.patch) * self.c_sym)
