"""Deployment export: trained codecs / policies as standalone artifacts.

Semantic communication deploys asymmetrically: the TRANSMITTER carries
only the encoder (sensor frame -> channel symbols), the RECEIVER only the
decoder (noisy symbols -> reconstruction / segmentation), and the driving
agent deploys the greedy policy. Each part is serialized with
``jax.export`` as a self-contained StableHLO function — trained params
baked in as constants, batch-size polymorphic, lowered for BOTH cpu and
tpu — so a deployment target runs it with nothing but jax installed (no
framework code, no Flax module tree, no checkpoint plumbing).

The physical channel is deliberately NOT part of any artifact: it is the
medium between the two ends (the receiver consumes whatever symbols
arrive). Exported graphs force the XLA twins of the flag-gated Pallas
kernels (``mha_block_kernel=False`` — execution flag only, the packed
param tree is unchanged, exactly like the learner losses in
``rl/dqn.py:_td_loss``), so one artifact is portable across platforms
with the twin-equivalence guarantee the kernel tests pin.

Spec: deployment path beyond SURVEY §2.2's inventory; the reference repo
has no code (``/root/reference/README.md:1-2``).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from multimodal_sc_tpu.config.configs import ExperimentConfig

Array = jax.Array

# Lowered for both platforms so one artifact serves CPU receivers and TPU
# fleet serving (jax.export multi-platform lowering needs no tpu present).
PLATFORMS = ("cpu", "tpu")
MANIFEST = "manifest.json"


def _portable(cfg: ExperimentConfig) -> ExperimentConfig:
    """Execution-flag overrides for export: XLA twins everywhere.

    ``pallas_mha_block`` stays as trained (it shapes the PARAM TREE);
    ``mha_block_kernel=False`` routes execution through the twin. The
    narrow kernels (``use_pallas``, ``pallas_attention``) are pure
    execution flags too."""
    return cfg.override(mha_block_kernel=False, use_pallas=False,
                        pallas_attention=False)


def _export(fn: Callable, *args) -> bytes:
    exp = jax.export.export(jax.jit(fn), platforms=PLATFORMS)(*args)
    return exp.serialize()


def _sym_batch(shape, dtype):
    """ShapeDtypeStruct with a symbolic leading (batch) dim. Callers that
    need SEVERAL inputs sharing the symbol must reuse the returned dim."""
    (b,) = jax.export.symbolic_shape("b")
    return jax.ShapeDtypeStruct((b, *shape), dtype), b


def export_camera_codec(cfg: ExperimentConfig, params: Any,
                        batch: Optional[int] = None,
                        model_builder: Optional[Callable] = None,
                        ) -> Dict[str, bytes]:
    """Export the camera JSCC codec (configs 1-3's camera sub-tree).

    Returns ``{"encoder": ..., "decoder": ...}`` plus ``"decoder_seg"``
    when the config has a segmentation head. Each function takes
    ``(x, snr_db)`` with ``snr_db`` shaped ``(b,)`` — per-example SNR,
    matching the training-time channel conditioning. ``batch=None``
    exports batch-size-polymorphic functions. ``model_builder`` overrides
    the module constructor for param trees the plain builder does not
    match (the fusion pipeline's camera codec — see cli.py eval's builder
    note); it is called with the portable-flagged config."""
    cfg = _portable(cfg)
    if model_builder is None:
        from multimodal_sc_tpu.train.jscc import build_model

        model_builder = build_model
    model = model_builder(cfg)
    h, w = cfg.camera.image_hw

    if batch is None:
        img_s, b = _sym_batch((h, w, 3), jnp.float32)
        snr_s = jax.ShapeDtypeStruct((b,), jnp.float32)
    else:
        img_s = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)
        snr_s = jax.ShapeDtypeStruct((batch,), jnp.float32)

    if cfg.camera.arch == "vq":
        # Discrete semantic-token codec (codec/semantic_vq.py): the
        # over-the-air payload is INTEGER indices, so the transmitter
        # exports img -> (b, n_tokens) int32 and the receiver
        # indices -> image. No SNR input — the digital radio between the
        # halves handles modulation/FEC however it likes.
        def enc_vq(img):
            idx, _, _ = model.apply({"params": params}, img,
                                    method="encode_tokens")
            return idx

        idx_spec = jax.eval_shape(enc_vq, img_s)
        idx_s = jax.ShapeDtypeStruct(idx_spec.shape, idx_spec.dtype)

        def dec_vq(idx):
            return model.apply({"params": params}, idx,
                               method="decode_tokens")

        return {"encoder": _export(enc_vq, img_s),
                "decoder": _export(dec_vq, idx_s)}

    def enc(img, snr_db):
        return model.apply({"params": params}, img, snr_db, method="encode")

    # Symbol shape comes from the encoder's output spec (trailing
    # real/imag pair convention, CLAUDE.md); the symbolic batch dim
    # propagates through eval_shape unchanged.
    z_spec = jax.eval_shape(enc, img_s, snr_s)
    z_s = jax.ShapeDtypeStruct(z_spec.shape, z_spec.dtype)

    def dec(z_hat, snr_db):
        return model.apply({"params": params}, z_hat, snr_db,
                           method="decode")

    out = {"encoder": _export(enc, img_s, snr_s),
           "decoder": _export(dec, z_s, snr_s)}

    if cfg.camera.seg_classes > 0 and hasattr(model, "decode_seg"):
        def dec_seg(z_hat, snr_db):
            return model.apply({"params": params}, z_hat, snr_db,
                               method="decode_seg")

        out["decoder_seg"] = _export(dec_seg, z_s, snr_s)
    return out


def export_lidar_codec(cfg: ExperimentConfig, params: Any,
                       batch: Optional[int] = None) -> Dict[str, bytes]:
    """Export the LiDAR BEV codec (config 3's lidar sub-tree).

    Encoder signature ``(points, mask, snr_db) -> z``; decoder
    ``(z_hat, snr_db) -> BEV class logits``. Pass the ``lidar`` subtree
    of a fusion checkpoint's params (``state.params["lidar"]``)."""
    from multimodal_sc_tpu.train.fusion_jscc import build_lidar_codec

    cfg = _portable(cfg)
    model = build_lidar_codec(cfg)
    lid = cfg.lidar

    if batch is None:
        pts_s, b = _sym_batch((lid.max_points, lid.point_features),
                              jnp.float32)
        mask_s = jax.ShapeDtypeStruct((b, lid.max_points), jnp.bool_)
        snr_s = jax.ShapeDtypeStruct((b,), jnp.float32)
    else:
        pts_s = jax.ShapeDtypeStruct(
            (batch, lid.max_points, lid.point_features), jnp.float32)
        mask_s = jax.ShapeDtypeStruct((batch, lid.max_points), jnp.bool_)
        snr_s = jax.ShapeDtypeStruct((batch,), jnp.float32)

    if lid.arch == "vq":
        # Digital LiDAR codec (codec/lidar_bev.py LidarBEVVQCodec):
        # transmitter exports (points, mask) -> indices int32, receiver
        # indices -> BEV logits — same split as the camera VQ export.
        def enc_vq(points, mask):
            idx, _, _ = model.apply({"params": params}, points, mask,
                                    method="encode_tokens")
            return idx

        idx_spec = jax.eval_shape(enc_vq, pts_s, mask_s)
        idx_s = jax.ShapeDtypeStruct(idx_spec.shape, idx_spec.dtype)

        def dec_vq(idx):
            return model.apply({"params": params}, idx,
                               method="decode_tokens")

        return {"lidar_encoder": _export(enc_vq, pts_s, mask_s),
                "lidar_decoder": _export(dec_vq, idx_s)}

    def enc(points, mask, snr_db):
        return model.apply({"params": params}, (points, mask), snr_db,
                           method="encode")

    z_spec = jax.eval_shape(enc, pts_s, mask_s, snr_s)
    z_s = jax.ShapeDtypeStruct(z_spec.shape, z_spec.dtype)

    def dec(z_hat, snr_db):
        return model.apply({"params": params}, z_hat, snr_db,
                           method="decode")

    return {"lidar_encoder": _export(enc, pts_s, mask_s, snr_s),
            "lidar_decoder": _export(dec, z_s, snr_s)}


def export_policy(cfg: ExperimentConfig, params: Any,
                  batch: Optional[int] = None) -> bytes:
    """Export the greedy driving policy (config 4's DQN argmax or config
    5's actor argmax, by ``cfg.rl.algo``).

    Signature: ``(image, points, mask, seed) -> action (b,) int32`` where
    ``seed`` is a scalar int32 driving the in-trunk channel noise (the
    perception trunk transmits through the simulated channel; deployment
    fixes the stream per call)."""
    from multimodal_sc_tpu.envs import driving
    from multimodal_sc_tpu.rl.perception import ActorCritic, QNetwork

    cfg = _portable(cfg)
    # Observation shapes/dtypes come from the env itself (the source of
    # truth for image/points/mask layout), traced abstractly.
    img_spec, pts_spec, mask_spec = jax.eval_shape(
        lambda: driving.observe_batch(
            cfg.env, driving.reset_batch(cfg.env, jax.random.key(0), 1)))

    if batch is None:
        # All three inputs share ONE batch symbol.
        img_s, b = _sym_batch(img_spec.shape[1:], img_spec.dtype)
        pts_s = jax.ShapeDtypeStruct((b, *pts_spec.shape[1:]),
                                     pts_spec.dtype)
        mask_s = jax.ShapeDtypeStruct((b, *mask_spec.shape[1:]),
                                      mask_spec.dtype)
    else:
        img_s = jax.ShapeDtypeStruct((batch, *img_spec.shape[1:]),
                                     img_spec.dtype)
        pts_s = jax.ShapeDtypeStruct((batch, *pts_spec.shape[1:]),
                                     pts_spec.dtype)
        mask_s = jax.ShapeDtypeStruct((batch, *mask_spec.shape[1:]),
                                      mask_spec.dtype)
    seed_s = jax.ShapeDtypeStruct((), jnp.int32)

    net = ActorCritic(cfg) if cfg.rl.algo == "ppo" else QNetwork(cfg)

    def policy(image, points, mask, seed):
        key = jax.random.key(seed)
        out = net.apply({"params": params}, image, points, mask, key)
        logits = out[0] if cfg.rl.algo == "ppo" else out
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    return _export(policy, img_s, pts_s, mask_s, seed_s)


def save_artifact(directory: str, parts: Dict[str, bytes],
                  cfg: ExperimentConfig) -> None:
    """Write serialized parts + the pinned config + a manifest."""
    os.makedirs(directory, exist_ok=True)
    for name, blob in parts.items():
        with open(os.path.join(directory, f"{name}.stablehlo"), "wb") as f:
            f.write(blob)
    with open(os.path.join(directory, "config.json"), "w") as f:
        f.write(cfg.to_json())
    with open(os.path.join(directory, MANIFEST), "w") as f:
        json.dump({"parts": sorted(parts),
                   "platforms": list(PLATFORMS),
                   "jax_version": jax.__version__,
                   "format": "jax.export/stablehlo"}, f, indent=1)


def load_artifact(directory: str) -> Dict[str, Callable]:
    """Deserialize every part of a saved artifact into callables.

    Needs only jax at load time — no framework modules, params, or
    checkpoints; each callable validates its input shapes/dtypes against
    the exported signature (symbolic batch accepts any size)."""
    manifest = json.load(open(os.path.join(directory, MANIFEST)))
    out: Dict[str, Callable] = {}
    for name in manifest["parts"]:
        with open(os.path.join(directory, f"{name}.stablehlo"), "rb") as f:
            out[name] = jax.export.deserialize(f.read()).call
    return out
