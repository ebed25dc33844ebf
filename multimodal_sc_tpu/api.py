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
) -> Tuple[Array, Array]:
    """Full encode -> channel -> decode pass; returns (recon, symbols).

    One jitted graph when called under jit (SURVEY.md §3.2a). `normalize`
    and `modulation` must match the training ChannelConfig so evaluation
    runs over the deployed (analog or M-QAM) transmission mode.
    """
    if jnp.ndim(snr_db) == 0:
        snr_db = jnp.full((img.shape[0],), snr_db, jnp.float32)
    z = model.apply({"params": params}, img, snr_db, method="encode")
    z_hat = channel_op(z, snr_db, kind, key, normalize=normalize,
                       modulation=modulation)
    recon = model.apply({"params": params}, z_hat, snr_db, method="decode")
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
