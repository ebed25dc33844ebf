"""JSCC-pretrain -> RL warm-start (SURVEY.md §7 hard-part 4).

Reconstruction pretraining (configs 1-3) learns the semantic codecs; this
module maps those codec params into the RL perception trunk
(``rl/perception.py`` — its submodule param trees intentionally mirror the
codec modules) so DQN/PPO (configs 4-5) start from a channel-robust
representation instead of random features.

Source checkpoints:
  * ``train/jscc.py`` (c1/c2): TrainState params ``{"encoder", "decoder"}``
    of ``CameraJSCC`` -> ``perception.cam_enc``.
  * ``train/fusion_jscc.py`` (c3): ``{"camera": {...}, "lidar": {...}}`` of
    ``LateFusionJSCC`` -> camera encoder plus the five LiDAR trunk modules.

Every copy is shape-checked leaf by leaf; mismatches (e.g. a ViT camera
checkpoint warm-starting a CNN trunk) are skipped with a warning, never
silently mis-assigned.
"""

from __future__ import annotations

import warnings
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from multimodal_sc_tpu.config.configs import ExperimentConfig


def _leaf_paths(tree: Any) -> Dict[Tuple, Any]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {tuple(str(k) for k in path): leaf for path, leaf in flat}


def _shape_checked_copy(dst: Any, src: Any) -> Tuple[bool, Any]:
    """Return (ok, dst-with-src-values). ok=False on any key/shape mismatch."""
    flat_dst, treedef = jax.tree_util.tree_flatten_with_path(dst)
    src_by_path = _leaf_paths(src)
    d_paths = {tuple(str(k) for k in p) for p, _ in flat_dst}
    if d_paths != set(src_by_path):
        return False, dst
    new_leaves = []
    for path, leaf in flat_dst:
        v = src_by_path[tuple(str(k) for k in path)]
        if tuple(jnp.shape(leaf)) != tuple(jnp.shape(v)):
            return False, dst
        v = jnp.asarray(v, dtype=jnp.asarray(leaf).dtype)
        if hasattr(leaf, "sharding"):
            v = jax.device_put(v, leaf.sharding)
        new_leaves.append(v)
    return True, jax.tree_util.tree_unflatten(treedef, new_leaves)


def load_jscc_into_perception(cfg: ExperimentConfig, params: Any,
                              ckpt_dir: str,
                              return_loaded: bool = False) -> Any:
    """Return `params` with perception submodules warm-started from the
    JSCC checkpoint at `ckpt_dir` (a train/jscc or train/fusion_jscc
    checkpoint directory). Raises if nothing at all could be mapped.
    ``return_loaded=True`` returns ``(params, loaded_names)`` so the RL
    drivers can detect a VQ codebook that was NOT warm-started (analog
    source -> digital trunk) and fall back to data-dependent seeding
    (ADVICE r4: the default init collapses to a code-independent trunk)."""
    from multimodal_sc_tpu.io.checkpoint import CheckpointManager

    mgr = CheckpointManager(ckpt_dir)
    raw = mgr.restore_raw_latest()
    mgr.close()
    if raw is None:
        raise FileNotFoundError(f"no checkpoint found under {ckpt_dir!r}")
    src = raw.get("params", raw) if isinstance(raw, dict) else raw

    if "perception" not in params:
        raise KeyError("target params have no 'perception' submodule")
    per = dict(params["perception"])

    # Resolve source layout: plain CameraJSCC vs LateFusionJSCC.
    cam_src = None
    lid_src = None
    if "encoder" in src:                       # CameraJSCC TrainState (c1/c2)
        cam_src = src
    if "to_code" in src and "codebook" in src:  # VQCameraJSCC (c1 arch=vq)
        cam_src = src
    if "camera" in src:                        # LateFusionJSCC (c3)
        cam_src = src["camera"]
        lid_src = src.get("lidar")

    assignments: List[Tuple[str, Any]] = []
    if cam_src is not None and "encoder" in cam_src:
        assignments.append(("cam_enc", cam_src["encoder"]))
    if (cam_src is not None and "codebook" in cam_src
            and "to_code" in cam_src and "cam_vq" in per):
        # VQCameraJSCC checkpoint (c1 arch="vq") -> the RL trunk's
        # VQEncoderTokens submodule: its child names (enc{i}, to_code,
        # codebook) mirror the codec's top-level tree by design
        # (codec/semantic_vq.py VQEncoderTokens docstring), so the
        # deployed transmitter firmware is copied subtree-by-name.
        sub = {k: cam_src[k] for k in per["cam_vq"] if k in cam_src}
        assignments.append(("cam_vq", sub))
    if lid_src is not None:
        assignments += [
            ("pfn", lid_src.get("pfn")),
            ("lid_backbone", lid_src.get("backbone")),
            ("lid_dec", lid_src.get("dec_backbone")),
        ]
        # Arch-specific trunk modules, gated on the TARGET tree so an
        # analog c3 -> analog c4 warm-start never emits a misleading
        # "skipped ['lid_to_code', ...]" warning for modules that exist in
        # neither source nor target (ADVICE r4). A genuine arch mismatch
        # (analog source, digital target or vice versa) still appends the
        # target's modules with a None/absent source and warns.
        if "lid_to_code" in per:
            # Digital (lidar.arch=vq) trunk: names mirror LidarBEVVQCodec.
            assignments += [
                ("lid_to_code", lid_src.get("to_code")),
                ("lid_codebook", lid_src.get("codebook")),
                ("lid_from_code", lid_src.get("from_code")),
            ]
            if "lid_mask_embed" in per:
                # Pruned digital trunk (lidar.vq_prune): the receiver
                # placeholder maps from a c3_vq_prune source by name.
                assignments.append(
                    ("lid_mask_embed", lid_src.get("mask_embed")))
        else:
            assignments += [
                ("lid_sym_head", lid_src.get("sym_head")),
                ("lid_sym_embed", lid_src.get("sym_embed")),
            ]

    loaded, skipped = [], []
    for name, sub in assignments:
        if sub is None or name not in per:
            skipped.append(name)
            continue
        ok, new_sub = _shape_checked_copy(per[name], sub)
        if ok:
            per[name] = new_sub
            loaded.append(name)
        else:
            skipped.append(name)
    if not loaded:
        raise ValueError(
            f"warm-start from {ckpt_dir!r} mapped nothing into the "
            f"perception trunk (skipped: {skipped}) — arch/shape mismatch?")
    if skipped:
        warnings.warn(
            f"warm-start skipped {skipped} (shape/arch mismatch with "
            f"{ckpt_dir!r}); loaded {loaded}", stacklevel=2)

    new_params = dict(params)
    new_params["perception"] = per
    if return_loaded:
        return new_params, loaded
    return new_params


def seed_vq_codebook_params(cfg: ExperimentConfig, params: Any,
                            key: Array = None,
                            seed_camera: bool = True,
                            seed_lidar: bool = True) -> Any:
    """Data-dependent codebook seeding for a COLD RL run with
    camera.arch="vq" (``params`` is the full DQN/PPO param tree with a
    ``perception.cam_vq`` subtree): replace the codebook rows with a
    sample of the fresh encoder's outputs on freshly rendered env
    observations. Same fix as codec/semantic_vq.py
    init_codebook_from_batch — the default init collapses into one tight
    cluster, making codes interchangeable and channel errors meaningless.
    Called by the train drivers on fresh runs only (never on resume or
    after a warm-start that brought its own codebook)."""
    import jax.numpy as jnp

    from multimodal_sc_tpu.codec.semantic_vq import (
        VQEncoderTokens,
        seed_codebook,
    )
    from multimodal_sc_tpu.envs import driving

    if key is None:
        key = jax.random.key(cfg.train.seed)
    key = jax.random.fold_in(key, 0xC0DE)
    states = driving.reset_batch(cfg.env, key, 64)
    img, pts, mask = driving.observe_batch(cfg.env, states)
    dtype = jnp.bfloat16 if cfg.train.bf16 else jnp.float32
    per = dict(params["perception"])

    def _keep_placement(old, new):
        return jax.device_put(new, old.sharding) \
            if hasattr(old, "sharding") else new

    if cfg.camera.arch == "vq" and seed_camera:
        cam = cfg.camera
        enc = VQEncoderTokens(
            features=cam.features, vq_dim=cam.vq_dim, vq_codes=cam.vq_codes,
            vq_beta=cam.vq_beta, use_pallas=cfg.use_pallas, dtype=dtype)
        sub = dict(per["cam_vq"])
        z = enc.apply({"params": sub}, img, method="encode_features")
        old = sub["codebook"]
        sub = seed_codebook(sub, z, jax.random.fold_in(key, 1))
        sub["codebook"] = _keep_placement(old, sub["codebook"])
        per["cam_vq"] = sub

    if cfg.lidar.arch == "vq" and seed_lidar:
        # Same fix for the LiDAR codebook: BEV features from the fresh
        # pillar trunk, to_code projection, sample rows.
        from flax import linen as nn

        from multimodal_sc_tpu.codec.lidar_bev import (
            BEVBackbone,
            PillarFeatureNet,
        )

        lid = cfg.lidar
        pfn = PillarFeatureNet(
            pillar_dim=lid.pillar_dim, bev_hw=lid.bev_hw,
            x_range=lid.x_range, y_range=lid.y_range,
            use_pallas=cfg.use_pallas, dtype=dtype)
        bb = BEVBackbone(features=(lid.pillar_dim, lid.pillar_dim),
                         dtype=dtype)
        to_code = nn.Conv(lid.vq_dim, (1, 1), dtype=dtype)
        # The ego rays only (V2X appends RSU rays; same codec anyway).
        r = cfg.env.lidar_rays
        x = pfn.apply({"params": per["pfn"]}, pts[:, :r], mask[:, :r])
        x = bb.apply({"params": per["lid_backbone"]}, x)
        z = to_code.apply({"params": per["lid_to_code"]}, x)
        old = per["lid_codebook"]
        seeded = seed_codebook({"codebook": old},
                               jnp.asarray(z, jnp.float32),
                               jax.random.fold_in(key, 2))
        per["lid_codebook"] = _keep_placement(old, seeded["codebook"])

    new_params = dict(params)
    new_params["perception"] = per
    return new_params
