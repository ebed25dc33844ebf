"""Camera CNN-JSCC encoder/decoder (deep joint source-channel coding).

Spec: BASELINE.json:5 ("camera JSCC (joint source-channel coding) CNN/ViT
encoder-decoder") and BASELINE.json:7 (config 1: single-camera CNN JSCC
autoencoder over AWGN, CIFAR/KITTI crops). The reference repo has no code
(``/root/reference/README.md:1-2``); architecture follows the standard
deep-JSCC pattern (Bourtsoulatze et al. 2019): strided conv downsampling
with PReLU, a final conv to ``2*c_sym`` feature maps reshaped into complex
channel symbols, and a mirrored transpose-conv decoder.

TPU-first notes:
  * NHWC layout (XLA:TPU's native conv layout); channel counts kept at
    multiples of 8/128-friendly sizes so Mosaic/XLA tiles onto the MXU.
  * SNR conditioning: optional per-example snr_db is embedded with a small
    MLP and FiLM-modulates the bottleneck, so a single model serves a whole
    SNR range (config 2, BASELINE.json:8).
  * ``param_dtype`` float32, activations optionally bfloat16 for MXU.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_sc_tpu.kernels.conv_block import FusedConvPReLU

Array = jax.Array


class PReLU(nn.Module):
    """Parametric ReLU with a learned per-channel negative slope."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        alpha = self.param(
            "alpha", nn.initializers.constant(0.25), (x.shape[-1],), jnp.float32
        )
        return jnp.where(x >= 0, x, x * alpha.astype(x.dtype))


class SNRFiLM(nn.Module):
    """FiLM modulation from an SNR(dB) scalar: x -> x * (1+g(snr)) + b(snr)."""

    features: int

    @nn.compact
    def __call__(self, x: Array, snr_db: Array) -> Array:
        # snr_db: (B,) -> (B, 1). Normalize to roughly [-1, 1] over [-5, 25].
        s = (snr_db.reshape(-1, 1).astype(x.dtype) - 10.0) / 15.0
        h = nn.Dense(64, name="fc1")(s)
        h = nn.relu(h)
        gb = nn.Dense(2 * self.features, name="fc2")(h)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (self.features,)
        return x * (1.0 + gamma.reshape(shape)) + beta.reshape(shape)


class RateFiLM(nn.Module):
    """FiLM modulation from the adaptive-rate fraction m/c_sym in (0, 1].

    Bandwidth-agile deep-JSCC (DeepJSCC-l style): conditioning the
    bottleneck on the deployed rate lets one model reorganize information
    into the channels that will actually be transmitted.
    """

    features: int

    @nn.compact
    def __call__(self, x: Array, rate: Array) -> Array:
        # rate: (B,) in (0, 1] -> centre to roughly [-1, 1].
        r = (rate.reshape(-1, 1).astype(x.dtype) - 0.5) * 2.0
        h = nn.Dense(32, name="fc1")(r)
        h = nn.relu(h)
        gb = nn.Dense(2 * self.features, name="fc2")(h)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (self.features,)
        return x * (1.0 + gamma.reshape(shape)) + beta.reshape(shape)


class CameraEncoderCNN(nn.Module):
    """Image (B,H,W,3) in [0,1] -> channel symbols (B, k, 2).

    Downsamples by 4 (two stride-2 convs); the final conv emits 2*c_sym
    channels interpreted as (real, imag) pairs: k = (H/4)*(W/4)*c_sym.
    """

    features: Sequence[int] = (32, 64, 128, 128)
    c_sym: int = 8
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, img: Array, snr_db: Optional[Array] = None,
                 rate: Optional[Array] = None) -> Array:
        x = img.astype(self.dtype)
        strides = (2, 2, 1, 1)
        for i, (f, s) in enumerate(zip(self.features, strides)):
            x = FusedConvPReLU(f, 5, stride=s, use_pallas=self.use_pallas,
                               dtype=self.dtype, name=f"block{i}")(x)
        if snr_db is not None:
            x = SNRFiLM(self.features[-1], name="snr_film")(x, snr_db)
        if rate is not None:
            x = RateFiLM(self.features[-1], name="rate_film")(x, rate)
        x = FusedConvPReLU(2 * self.c_sym, 5, with_prelu=False,
                           use_pallas=self.use_pallas, dtype=self.dtype,
                           name="conv_out")(x)
        b, h, w, _ = x.shape
        return x.reshape(b, h * w * self.c_sym, 2).astype(jnp.float32)


class CameraDecoderCNN(nn.Module):
    """Channel symbols (B, k, 2) -> reconstructed image (B,H,W,3) in [0,1]."""

    features: Sequence[int] = (128, 128, 64, 32)
    c_sym: int = 8
    image_hw: tuple = (32, 32)
    out_channels: int = 3
    seg_classes: int = 0          # >0: also emit segmentation logits
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z_hat: Array, snr_db: Optional[Array] = None,
                 rate: Optional[Array] = None):
        b = z_hat.shape[0]
        h, w = self.image_hw[0] // 4, self.image_hw[1] // 4
        x = z_hat.reshape(b, h, w, 2 * self.c_sym).astype(self.dtype)
        x = FusedConvPReLU(self.features[0], 5, use_pallas=self.use_pallas,
                           dtype=self.dtype, name="block_in")(x)
        if snr_db is not None:
            x = SNRFiLM(self.features[0], name="snr_film")(x, snr_db)
        if rate is not None:
            x = RateFiLM(self.features[0], name="rate_film")(x, rate)
        strides = (1, 1, 2, 2)
        for i, (f, s) in enumerate(zip(self.features, strides)):
            if s == 1:
                x = FusedConvPReLU(f, 5, use_pallas=self.use_pallas,
                                   dtype=self.dtype, name=f"block{i}")(x)
            else:
                # Upsampling stays on XLA ConvTranspose (Mosaic has no
                # native transpose-conv; XLA handles it well).
                x = nn.ConvTranspose(f, (5, 5), strides=(s, s), padding="SAME",
                                     dtype=self.dtype, name=f"deconv{i}")(x)
                x = PReLU(name=f"prelu{i}")(x)
        recon = FusedConvPReLU(self.out_channels, 5, with_prelu=False,
                               use_pallas=self.use_pallas, dtype=self.dtype,
                               name="conv_out")(x)
        recon = nn.sigmoid(recon.astype(jnp.float32))
        if self.seg_classes > 0:
            seg = nn.Conv(self.seg_classes, (3, 3), padding="SAME",
                          dtype=self.dtype, name="seg_head")(x)
            return recon, seg.astype(jnp.float32)
        return recon


class CameraTokensCNN(nn.Module):
    """Noisy symbols -> decoded feature tokens (B, h*w, dim) for fusion.

    Runs the front half of the decoder (conv_in + PReLU [+ FiLM]) so RL
    perception reuses JSCC-pretrained decoding without rendering pixels.
    """

    dim: int = 128
    c_sym: int = 8
    image_hw: tuple = (32, 32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z_hat: Array, snr_db: Optional[Array] = None) -> Array:
        b = z_hat.shape[0]
        h, w = self.image_hw[0] // 4, self.image_hw[1] // 4
        x = z_hat.reshape(b, h, w, 2 * self.c_sym).astype(self.dtype)
        x = nn.Conv(self.dim, (5, 5), padding="SAME", dtype=self.dtype,
                    name="conv_in")(x)
        x = PReLU(name="prelu_in")(x)
        if snr_db is not None:
            x = SNRFiLM(self.dim, name="snr_film")(x, snr_db)
        return x.reshape(b, h * w, self.dim).astype(jnp.float32)


class CameraJSCC(nn.Module):
    """Bundled encoder/decoder so one param tree serves both directions."""

    features: Sequence[int] = (32, 64, 128, 128)
    c_sym: int = 8
    image_hw: tuple = (32, 32)
    out_channels: int = 3
    seg_classes: int = 0
    snr_conditioning: bool = False
    adaptive_rate: bool = False   # bandwidth-agile: rate-FiLM conditioning
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = CameraEncoderCNN(
            features=self.features, c_sym=self.c_sym,
            use_pallas=self.use_pallas, dtype=self.dtype
        )
        self.decoder = CameraDecoderCNN(
            features=tuple(reversed(self.features)),
            c_sym=self.c_sym,
            image_hw=self.image_hw,
            out_channels=self.out_channels,
            seg_classes=self.seg_classes,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
        )

    def _rate(self, rate: Optional[Array]) -> Optional[Array]:
        if not self.adaptive_rate:
            return None
        if rate is None:
            raise ValueError("adaptive_rate codec requires a rate argument")
        return rate

    def encode(self, img: Array, snr_db: Optional[Array] = None,
               rate: Optional[Array] = None) -> Array:
        return self.encoder(img, snr_db if self.snr_conditioning else None,
                            self._rate(rate))

    def decode(self, z_hat: Array, snr_db: Optional[Array] = None,
               rate: Optional[Array] = None) -> Array:
        out = self.decoder(z_hat, snr_db if self.snr_conditioning else None,
                           self._rate(rate))
        return out[0] if self.seg_classes > 0 else out

    def decode_seg(self, z_hat: Array, snr_db: Optional[Array] = None,
                   rate: Optional[Array] = None):
        """(recon, seg_logits); only valid when seg_classes > 0."""
        if self.seg_classes <= 0:
            raise ValueError("decode_seg requires seg_classes > 0")
        return self.decoder(z_hat, snr_db if self.snr_conditioning else None,
                            self._rate(rate))

    def __call__(self, img: Array, snr_db: Optional[Array] = None,
                 rate: Optional[Array] = None) -> Array:
        # Init/inspection path: encode then decode through an ideal channel.
        if self.adaptive_rate and rate is None:
            rate = jnp.ones((img.shape[0],), jnp.float32)
        return self.decode(self.encode(img, snr_db, rate), snr_db, rate)

    @property
    def k(self) -> int:
        h, w = self.image_hw
        return (h // 4) * (w // 4) * self.c_sym
