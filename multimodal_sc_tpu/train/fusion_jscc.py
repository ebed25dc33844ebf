"""Config-3 driver: camera + LiDAR late-fusion semantic transmission.

Spec: BASELINE.json:9 — "LiDAR point-cloud -> BEV pillar encoder + camera
branch, late-fusion semantic TX". Both codecs transmit through the same
noisy channel; the joint loss is camera MSE + LiDAR occupancy BCE, and the
late-fusion head (concat of pooled decoded features) predicts a scene
summary used as a consistency check. Metrics: PSNR (camera) + mIoU (LiDAR
occupancy), the pair required by the SNR-sweep evaluator (BASELINE.json:8).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax.training import train_state

from multimodal_sc_tpu.channel import channel as channel_op
from multimodal_sc_tpu.channel import channel_kwargs
from multimodal_sc_tpu.codec.camera_vit import ViTJSCC
from multimodal_sc_tpu.codec.camera_cnn import CameraJSCC
from multimodal_sc_tpu.codec.lidar_bev import (
    LidarBEVCodec,
    occupancy_target,
    semantic_bev_target,
)
from multimodal_sc_tpu.config.configs import ExperimentConfig
from multimodal_sc_tpu.envs.datasets import (
    ImageDataset,
    synthetic_pointcloud_batch,
)
from multimodal_sc_tpu.evaluation.metrics import miou, psnr
from multimodal_sc_tpu.obs.metrics_writer import MetricsWriter, Timer
from multimodal_sc_tpu.obs.profiling import NaNWatchdog, maybe_trace

Array = jax.Array


def build_camera_codec(cfg: ExperimentConfig):
    """The fusion pipeline's camera codec module. Shared by
    LateFusionJSCC.setup and the standalone SNR-sweep evaluator (cli
    eval) so the eval model's param tree always matches the checkpoint
    (note: unlike the plain-jscc builder, the fusion camera branch has
    NO seg head — segmentation lives on the LiDAR BEV side)."""
    cam = cfg.camera
    dtype = jnp.bfloat16 if cfg.train.bf16 else jnp.float32
    if cam.arch == "vit":
        return ViTJSCC(
            image_hw=cam.image_hw, patch=cam.patch, dim=cam.dim,
            depth=cam.depth, heads=cam.heads, c_sym=cam.c_sym,
            snr_conditioning=cam.snr_conditioning,
            use_pallas=cfg.use_pallas or cfg.pallas_attention,
            dtype=dtype)
    return CameraJSCC(
        features=cam.features, c_sym=cam.c_sym, image_hw=cam.image_hw,
        snr_conditioning=cam.snr_conditioning,
        use_pallas=cfg.use_pallas, dtype=dtype)


def build_lidar_codec(cfg: ExperimentConfig):
    """The fusion pipeline's LiDAR BEV codec module (same sharing).
    ``lidar.arch="vq"`` builds the digital codec (codec/lidar_bev.py
    LidarBEVVQCodec — discrete indices over QPSK, r4)."""
    lid = cfg.lidar
    dtype = jnp.bfloat16 if cfg.train.bf16 else jnp.float32
    if lid.arch == "vq":
        from multimodal_sc_tpu.codec.lidar_bev import LidarBEVVQCodec

        return LidarBEVVQCodec(
            pillar_dim=lid.pillar_dim, bev_hw=lid.bev_hw,
            vq_codes=lid.vq_codes, vq_dim=lid.vq_dim, vq_beta=lid.vq_beta,
            vq_usage_coef=lid.vq_usage_coef,
            vq_usage_temp=lid.vq_usage_temp, vq_reseed=lid.vq_reseed,
            vq_prune=lid.vq_prune,
            seg_classes=lid.seg_classes,
            x_range=lid.x_range, y_range=lid.y_range,
            channel_cfg=cfg.channel,
            use_pallas=cfg.use_pallas, dtype=dtype)
    return LidarBEVCodec(
        pillar_dim=lid.pillar_dim, bev_hw=lid.bev_hw, c_sym=lid.c_sym,
        seg_classes=lid.seg_classes,
        x_range=lid.x_range, y_range=lid.y_range,
        use_pallas=cfg.use_pallas, dtype=dtype)


class LateFusionJSCC(nn.Module):
    """Camera codec + LiDAR codec under one param tree (late fusion)."""

    cfg: ExperimentConfig

    def setup(self):
        self.camera = build_camera_codec(self.cfg)
        self.lidar = build_lidar_codec(self.cfg)

    def __call__(self, img, points, mask, snr_db, key, lidar_keep=None,
                 lidar_select=None):
        """Full late-fusion TX: both branches through the channel.
        Returns (recon, occ_logits, lidar_aux) — aux is empty for the
        analog LiDAR codec, {vq_loss, index_error_rate, code_perplexity}
        for lidar.arch="vq" (its digital ride happens inside its own
        __call__, like the camera VQ codec)."""
        ch = self.cfg.channel
        k_cam, k_lid = jax.random.split(key)
        z_cam = self.camera.encode(img, snr_db)
        z_cam_hat = channel_op(z_cam, snr_db, ch.kind, k_cam,
                               **channel_kwargs(ch))
        recon = self.camera.decode(z_cam_hat, snr_db)
        if self.cfg.lidar.arch == "vq":
            occ_logits, lid_aux = self.lidar(points, mask, snr_db, k_lid,
                                             keep=lidar_keep,
                                             select=lidar_select)
            return recon, occ_logits, lid_aux
        z_lid = self.lidar.encode((points, mask))
        z_lid_hat = channel_op(z_lid, snr_db, ch.kind, k_lid,
                               **channel_kwargs(ch))
        occ_logits = self.lidar.decode(z_lid_hat)
        return recon, occ_logits, {}


class TrainState(train_state.TrainState):
    pass


def create_train_state(cfg: ExperimentConfig, key: Array) -> TrainState:
    model = LateFusionJSCC(cfg)
    h, w = cfg.camera.image_hw
    img = jnp.zeros((2, h, w, 3), jnp.float32)
    pts = jnp.zeros((2, cfg.lidar.max_points, 4), jnp.float32)
    mask = jnp.ones((2, cfg.lidar.max_points), bool)
    snr = jnp.full((2,), cfg.channel.snr_db, jnp.float32)
    params = model.init(key, img, pts, mask, snr, jax.random.key(0))["params"]
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip),
        optax.adamw(cfg.train.lr),
    )
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def _step_body(cfg: ExperimentConfig):
    """Un-jitted single train step; shared by the per-step and chunked
    dispatch paths (identical numerics either way — see train/jscc.py)."""
    model = LateFusionJSCC(cfg)
    lid = cfg.lidar
    semantic = lid.seg_classes > 1

    def train_step(state: TrainState, img, pts, mask, cls, key):
        ksnr, kch = jax.random.split(key)
        if cfg.channel.random_snr:
            snr_db = jax.random.uniform(
                ksnr, (img.shape[0],), minval=cfg.channel.snr_min_db,
                maxval=cfg.channel.snr_max_db)
        else:
            snr_db = jnp.full((img.shape[0],), cfg.channel.snr_db, jnp.float32)
        if semantic:
            target = semantic_bev_target(pts, mask, cls, lid.bev_hw,
                                         lid.x_range, lid.y_range,
                                         num_classes=lid.seg_classes)
        else:
            target = occupancy_target(pts, mask, lid.bev_hw, lid.x_range,
                                      lid.y_range)

        # BEV token pruning (lidar.vq_prune, r5): train with per-example
        # random kept fractions + random selection (full coverage of drop
        # patterns; the deploy-time ranking is a pure eval choice).
        prune = cfg.lidar.vq_prune
        keep = (jax.random.uniform(
            jax.random.fold_in(key, 0x6EEA), (img.shape[0],),
            minval=cfg.lidar.vq_keep_min, maxval=1.0) if prune else None)

        def loss_fn(params):
            kw = ({"lidar_keep": keep, "lidar_select": "random"}
                  if prune else {})
            recon, logits, lid_aux = model.apply(
                {"params": params}, img, pts, mask, snr_db, kch, **kw)
            cam_loss = jnp.mean(jnp.square(recon - img))
            if semantic:
                lid_loss = jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(
                        logits, target))
            else:
                l = logits[..., 0]
                occ = target
                lid_loss = jnp.mean(jnp.maximum(l, 0) - l * occ
                                    + jnp.log1p(jnp.exp(-jnp.abs(l))))
            loss = cam_loss + 0.5 * lid_loss
            if "vq_loss" in lid_aux:
                # Digital LiDAR codec: the codebook trains only through
                # its own codebook+commitment term (STE gradients bypass
                # it) — same weight as the camera VQ recipe.
                loss = loss + lid_aux["vq_loss"]
            return loss, (recon, logits, cam_loss, lid_loss, lid_aux)

        (loss, (recon, logits, cam_loss, lid_loss, lid_aux)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        if "vq_counts" in lid_aux:
            # Dead-code re-seeding AFTER the optimizer step (r5 usage
            # fix, codec/semantic_vq.py reseed_dead_codes); key derived
            # from the step key — chunked and single dispatch identical.
            from multimodal_sc_tpu.codec.semantic_vq import (
                reseed_dead_codes,
            )

            new_lid = dict(state.params["lidar"])
            new_lid["codebook"], n_rs = reseed_dead_codes(
                new_lid["codebook"], lid_aux["vq_counts"],
                lid_aux["vq_candidates"], jax.random.fold_in(key, 0xD0D0),
                cfg.lidar.vq_reseed)
            state = state.replace(
                params={**state.params, "lidar": new_lid})
        if semantic:
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            m = miou(pred, target, lid.seg_classes)
        else:
            pred = (logits[..., 0] > 0).astype(jnp.int32)
            m = miou(pred, target.astype(jnp.int32), 2)
        metrics = {
            "loss": loss, "cam_loss": cam_loss, "lidar_loss": lid_loss,
            "psnr": psnr(recon, img),
            "miou": m,
        }
        if "vq_loss" in lid_aux:
            metrics["lidar_vq_loss"] = lid_aux["vq_loss"]
            metrics["lidar_index_err"] = lid_aux["index_error_rate"]
            metrics["lidar_code_perplexity"] = lid_aux["code_perplexity"]
        if "vq_counts" in lid_aux:
            metrics["lidar_vq_reseeded"] = n_rs.astype(jnp.float32)
        if "token_keep_frac" in lid_aux:
            metrics["lidar_token_keep_frac"] = lid_aux["token_keep_frac"]
        return state, metrics

    return train_step


def make_train_step(cfg: ExperimentConfig):
    return jax.jit(_step_body(cfg))


def make_train_step_chunked(cfg: ExperimentConfig, chunk: int):
    """``chunk`` fusion train steps per device dispatch via ``lax.scan``.

    Images come stacked from the host; the synthetic point clouds are
    generated IN-GRAPH from the same ``fold_in(data_key, global_step)``
    stream the host loop uses, so the chunked run is step-for-step
    identical while eliminating both the per-step dispatch round trip
    and the per-step point-cloud transfer."""
    import functools

    body = _step_body(cfg)
    batch = cfg.train.batch_size
    lid = cfg.lidar

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chunked(state: TrainState, imgs: Array, root_key: Array,
                data_key: Array, step0: Array):
        def scan_body(s, inp):
            img, i = inp
            pts, mask, cls = synthetic_pointcloud_batch(
                jax.random.fold_in(data_key, step0 + i), batch,
                lid.max_points, lid.x_range, lid.y_range, with_classes=True)
            return body(s, img, pts, mask, cls,
                        jax.random.fold_in(root_key, step0 + i))

        return jax.lax.scan(
            scan_body, state,
            (imgs, jnp.arange(chunk, dtype=jnp.int32)))

    return chunked


def run(cfg: ExperimentConfig, metrics_path: Optional[str] = None):
    key = jax.random.key(cfg.train.seed)
    key, init_key = jax.random.split(key)
    state = create_train_state(cfg, init_key)
    train_step = make_train_step(cfg)

    data = ImageDataset(cfg.train.dataset, cfg.train.batch_size,
                        seed=cfg.train.seed, data_root=cfg.train.data_root)
    writer = MetricsWriter(metrics_path, config_json=cfg.to_json())
    watchdog = NaNWatchdog()
    ckpt_mgr = None
    if cfg.train.checkpoint_dir:
        from multimodal_sc_tpu.io.checkpoint import CheckpointManager

        ckpt_mgr = CheckpointManager(cfg.train.checkpoint_dir)
        ckpt_mgr.save_config(cfg.to_json())
        restored = ckpt_mgr.restore_latest(state)
        if restored is not None:
            state = restored

    start_step = int(jax.device_get(state.step))
    if cfg.lidar.arch == "vq" and start_step == 0:
        # Fresh run: data-dependent codebook seeding from real encoder
        # outputs (never on resume) — the default init collapses to a
        # code-independent decoder (codec/semantic_vq.py
        # init_codebook_from_batch, same failure mode).
        from multimodal_sc_tpu.codec.semantic_vq import seed_codebook

        pts0, mask0, _ = synthetic_pointcloud_batch(
            jax.random.fold_in(key, 0xC0DE), cfg.train.batch_size,
            cfg.lidar.max_points, cfg.lidar.x_range, cfg.lidar.y_range,
            with_classes=True)
        lid_model = build_lidar_codec(cfg)
        z = lid_model.apply({"params": state.params["lidar"]}, pts0, mask0,
                            method="encode_features")
        new_lidar = seed_codebook(dict(state.params["lidar"]), z,
                                  jax.random.fold_in(key, 0xC0DF))
        state = state.replace(params={**state.params, "lidar": new_lidar})
    data._step = start_step
    # Distinct stream from the dataset's fold_in(key(seed), step) — a raw
    # key(seed) here would make channel/SNR draws correlate with image
    # content (same bits every step).
    root_key = jax.random.fold_in(jax.random.key(cfg.train.seed), 0x5EED)
    data_key = jax.random.key(cfg.train.seed + 1)
    chunk = max(1, cfg.train.iters_per_dispatch)
    chunked_step = (make_train_step_chunked(cfg, chunk)
                    if chunk > 1 else None)

    def _chunk_ok(step: int) -> bool:
        """See train/jscc.py — exact checkpoint cadence around chunks."""
        if chunk == 1 or step % chunk != 0 or step + chunk > cfg.train.steps:
            return False
        if ckpt_mgr and any((step + j) % cfg.train.checkpoint_every == 0
                            for j in range(1, chunk)):
            return False
        return True

    import time as _time

    first_s = None
    first_n = 0
    ckpt_s = 0.0
    last = {}
    with maybe_trace(cfg.train.profile_dir), Timer() as t:
        step = start_step
        while step < cfg.train.steps:
            t0 = _time.perf_counter() if first_s is None else None
            if _chunk_ok(step):
                imgs = jnp.stack([jnp.asarray(next(data))
                                  for _ in range(chunk)])
                state, stacked = chunked_step(state, imgs, root_key,
                                              data_key, jnp.int32(step))
                if t0 is not None:
                    jax.block_until_ready(stacked["loss"])
                    first_s = _time.perf_counter() - t0
                    first_n = chunk
                for j in range(chunk):
                    g = step + 1 + j
                    if g % cfg.train.log_every == 0:
                        m_j = {k: v[j] for k, v in stacked.items()}
                        writer.write(g, m_j)
                        watchdog.check(g, m_j)
                last = {k: v[-1] for k, v in stacked.items()}
                step += chunk
            else:
                img = jnp.asarray(next(data))
                pts, mask, cls = synthetic_pointcloud_batch(
                    jax.random.fold_in(data_key, step), cfg.train.batch_size,
                    cfg.lidar.max_points, cfg.lidar.x_range,
                    cfg.lidar.y_range, with_classes=True)
                sk = jax.random.fold_in(root_key, step)
                state, metrics = train_step(state, img, pts, mask, cls, sk)
                if t0 is not None:
                    jax.block_until_ready(metrics)
                    first_s = _time.perf_counter() - t0
                    first_n = 1
                last = metrics
                step += 1
                if step % cfg.train.log_every == 0:
                    writer.write(step, metrics)
                    watchdog.check(step, metrics)
            if ckpt_mgr and step % cfg.train.checkpoint_every == 0:
                t_ck = _time.perf_counter()
                ckpt_mgr.save(step, state)
                ckpt_s += _time.perf_counter() - t_ck
    jax.block_until_ready(last)
    close_s = 0.0
    if ckpt_mgr:
        t_ck = _time.perf_counter()
        ckpt_mgr.close()
        close_s = _time.perf_counter() - t_ck
    out = dict(jax.device_get(last))
    n_steps = cfg.train.steps - start_step
    if ckpt_mgr:
        out["ckpt_save_s"] = round(ckpt_s, 2)
        out["ckpt_close_s"] = round(close_s, 2)
    if first_s is not None and n_steps > first_n and \
            t.elapsed > first_s + ckpt_s:
        out["first_dispatch_s"] = round(first_s, 2)
        out["steady_steps_per_sec"] = round(
            (n_steps - first_n) / (t.elapsed - first_s - ckpt_s), 2)
    writer.write(cfg.train.steps, out)
    writer.close()
    return state, out
