"""Convenience API: the one-call flows users reach for first.

The five public verbs (encode / channel / decode / act / train_step,
BASELINE.json:5) live in the package root; this module adds the composed
flows on top of them.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from multimodal_sc_tpu.channel import channel as channel_op
from multimodal_sc_tpu.config.configs import ExperimentConfig

Array = jax.Array


def reconstruct(
    model, params, img: Array, snr_db, key: Array,
    kind: str = "awgn", normalize: bool = True, modulation: int = 0,
    pilots: int = 0, subcarriers: int = 64, taps: int = 8,
    rate_sym: int = 0,
) -> Tuple[Array, Array]:
    """Full encode -> channel -> decode pass; returns (recon, symbols).

    One jitted graph when called under jit (SURVEY.md §3.2a). The channel
    statics (`normalize`, `modulation`, `pilots`, `subcarriers`, `taps`)
    must match the training ChannelConfig so evaluation runs over the
    deployed transmission mode (analog or M-QAM, perfect or pilot-
    estimated CSI, flat or OFDM multipath).

    `rate_sym` (adaptive-rate codecs only): transmit the first rate_sym
    of c_sym symbol channels; 0 = full rate. Ignored for fixed-rate
    codecs.
    """
    if jnp.ndim(snr_db) == 0:
        snr_db = jnp.full((img.shape[0],), snr_db, jnp.float32)
    if getattr(model, "adaptive_rate", False):
        from multimodal_sc_tpu.channel import rate_mask

        c_sym = model.c_sym
        m_val = rate_sym if rate_sym else c_sym
        m = jnp.full((img.shape[0],), m_val, jnp.int32)
        rkw = {"rate": m.astype(jnp.float32) / c_sym}
    else:
        rkw, m = {}, None
    z = model.apply({"params": params}, img, snr_db, method="encode", **rkw)
    mask = (None if m is None
            else rate_mask(z.shape[0], z.shape[1], model.c_sym, m))
    z_hat = channel_op(z, snr_db, kind, key, normalize=normalize,
                       modulation=modulation, pilots=pilots,
                       subcarriers=subcarriers, taps=taps, mask=mask)
    recon = model.apply({"params": params}, z_hat, snr_db, method="decode",
                        **rkw)
    return recon, z


def make_trainer(cfg: ExperimentConfig):
    """Return the (init_or_run, make_train_step-ish) driver for cfg.task."""
    task = cfg.train.task
    if task == "jscc":
        from multimodal_sc_tpu.train import jscc

        return jscc
    if task == "jscc_fusion":
        from multimodal_sc_tpu.train import fusion_jscc

        return fusion_jscc
    if task == "dqn":
        from multimodal_sc_tpu.train import dqn

        return dqn
    if task == "ppo":
        from multimodal_sc_tpu.train import ppo

        return ppo
    raise ValueError(f"unknown task {task!r}")


def train(cfg: ExperimentConfig, metrics_path: Optional[str] = None):
    """Run the full training loop for any preset; returns (state, metrics)."""
    return make_trainer(cfg).run(cfg, metrics_path=metrics_path)
