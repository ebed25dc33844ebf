"""JSCC reconstruction training driver (configs 1-3, BASELINE.json:7-9).

One jitted ``train_step`` tracing the full encode -> power-norm channel ->
decode -> MSE graph (BASELINE.json:5 "one jitted graph"); the host loop only
feeds batches and pulls metrics every K steps. Reference repo has no
training code (``/root/reference/README.md:1-2``).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from multimodal_sc_tpu.channel import channel as channel_op
from multimodal_sc_tpu.config.configs import ExperimentConfig
from multimodal_sc_tpu.envs.datasets import ImageDataset
from multimodal_sc_tpu.evaluation.metrics import psnr
from multimodal_sc_tpu.obs.profiling import NaNWatchdog, maybe_trace
from multimodal_sc_tpu.obs.metrics_writer import MetricsWriter, Timer
from multimodal_sc_tpu.runtime import mesh as mesh_lib
from multimodal_sc_tpu.runtime.prefetch import prefetch_to_device

Array = jax.Array


class TrainState(train_state.TrainState):
    pass


def build_model(cfg: ExperimentConfig):
    if cfg.camera.arch == "cnn":
        from multimodal_sc_tpu.codec.camera_cnn import CameraJSCC

        return CameraJSCC(
            features=cfg.camera.features,
            c_sym=cfg.camera.c_sym,
            image_hw=cfg.camera.image_hw,
            seg_classes=cfg.camera.seg_classes,
            snr_conditioning=cfg.camera.snr_conditioning,
            use_pallas=cfg.use_pallas,
            dtype=jnp.bfloat16 if cfg.train.bf16 else jnp.float32,
        )
    elif cfg.camera.arch == "vit":
        from multimodal_sc_tpu.codec.camera_vit import ViTJSCC

        return ViTJSCC(
            image_hw=cfg.camera.image_hw,
            patch=cfg.camera.patch,
            dim=cfg.camera.dim,
            depth=cfg.camera.depth,
            heads=cfg.camera.heads,
            c_sym=cfg.camera.c_sym,
            snr_conditioning=cfg.camera.snr_conditioning,
            dtype=jnp.bfloat16 if cfg.train.bf16 else jnp.float32,
            # pallas_attention reaches the ViT's MHA (attention-only flag,
            # same dispatch as the RL perception trunk).
            use_pallas=cfg.use_pallas or cfg.pallas_attention,
        )
    raise ValueError(f"unknown camera arch {cfg.camera.arch!r}")


def create_train_state(cfg: ExperimentConfig, key: Array) -> TrainState:
    model = build_model(cfg)
    h, w = cfg.camera.image_hw
    dummy = jnp.zeros((2, h, w, 3), jnp.float32)
    dummy_snr = jnp.full((2,), cfg.channel.snr_db, jnp.float32)
    params = model.init(key, dummy, dummy_snr)["params"]
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.train.grad_clip),
        optax.adamw(
            optax.warmup_cosine_decay_schedule(
                0.0, cfg.train.lr, cfg.train.warmup_steps,
                max(cfg.train.steps, cfg.train.warmup_steps + 1),
            )
        ),
    )
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def _sample_snr(cfg: ExperimentConfig, key: Array, batch: int) -> Array:
    if cfg.channel.random_snr:
        return jax.random.uniform(
            key, (batch,), minval=cfg.channel.snr_min_db,
            maxval=cfg.channel.snr_max_db,
        )
    return jnp.full((batch,), cfg.channel.snr_db, jnp.float32)


def reconstruct(
    params, model, img: Array, snr_db: Array, key: Array,
    kind: str, normalize: bool = True, modulation: int = 0,
) -> Tuple[Array, Array]:
    """encode -> channel -> decode; returns (recon, symbols).

    Thin delegate to api.reconstruct (single source of truth for the flow).
    """
    from multimodal_sc_tpu import api

    return api.reconstruct(model, params, img, snr_db, key, kind, normalize,
                           modulation)


def make_train_step(cfg: ExperimentConfig, model):
    kind = cfg.channel.kind
    normalize = cfg.channel.normalize
    modulation = cfg.channel.modulation
    with_seg = cfg.camera.seg_classes > 0 and cfg.camera.arch == "cnn"

    def loss_fn(params, img, seg, snr_db, key):
        z = model.apply({"params": params}, img, snr_db, method="encode")
        z_hat = channel_op(z, snr_db, kind, key, normalize=normalize,
                           modulation=modulation)
        if with_seg:
            recon, seg_logits = model.apply(
                {"params": params}, z_hat, snr_db, method="decode_seg")
            mse = jnp.mean(jnp.square(recon - img))
            ce = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                seg_logits, seg))
            return mse + 0.1 * ce, (recon, seg_logits)
        recon = model.apply({"params": params}, z_hat, snr_db,
                            method="decode")
        return jnp.mean(jnp.square(recon - img)), (recon, None)

    @jax.jit
    def train_step(state: TrainState, img: Array, seg, key: Array):
        ksnr, kch = jax.random.split(key)
        snr_db = _sample_snr(cfg, ksnr, img.shape[0])
        (loss, (recon, seg_logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, img, seg, snr_db, kch)
        state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss, "psnr": psnr(recon, img)}
        if with_seg:
            from multimodal_sc_tpu.evaluation.metrics import miou

            pred = jnp.argmax(seg_logits, axis=-1)
            metrics["miou"] = miou(pred, seg, cfg.camera.seg_classes)
        return state, metrics

    return train_step


def make_eval_step(cfg: ExperimentConfig, model):
    """Jitted PSNR eval step at the config's deployed channel mode."""
    kind = cfg.channel.kind
    normalize = cfg.channel.normalize
    modulation = cfg.channel.modulation

    @functools.partial(jax.jit, static_argnames=("eval_kind",))
    def eval_step(params, img, snr_db, key, eval_kind=kind):
        recon, _ = reconstruct(params, model, img, snr_db, key, eval_kind,
                               normalize, modulation)
        return psnr(recon, img)

    return eval_step


def run(cfg: ExperimentConfig, metrics_path: Optional[str] = None):
    """Host training loop for configs 1-3. Returns (state, last_metrics)."""
    key = jax.random.key(cfg.train.seed)
    key, init_key = jax.random.split(key)
    state = create_train_state(cfg, init_key)
    model = build_model(cfg)
    train_step = make_train_step(cfg, model)
    dev_mesh = mesh_lib.make_mesh()
    state = mesh_lib.replicate(dev_mesh, state)

    with_seg = cfg.camera.seg_classes > 0 and cfg.camera.arch == "cnn"
    data = ImageDataset(cfg.train.dataset, cfg.train.batch_size,
                        seed=cfg.train.seed, with_seg=with_seg,
                        data_root=cfg.train.data_root)
    writer = MetricsWriter(metrics_path, config_json=cfg.to_json())
    watchdog = NaNWatchdog()
    last = {}
    ckpt_mgr = None
    if cfg.train.checkpoint_dir:
        from multimodal_sc_tpu.io.checkpoint import CheckpointManager

        ckpt_mgr = CheckpointManager(cfg.train.checkpoint_dir)
        ckpt_mgr.save_config(cfg.to_json())
        restored = ckpt_mgr.restore_latest(state)
        if restored is not None:
            state = restored

    start_step = int(jax.device_get(state.step))
    # Resume-determinism: per-step keys and data batches are derived from
    # the global step index, so a restored run replays the exact same
    # stream as an uninterrupted one (kill-and-resume test, SURVEY §5.3).
    data._step = start_step
    # Double-buffered host->device transfer: batch N+1 moves (with `data`
    # sharding) while batch N trains (runtime/prefetch.py). Matters most for
    # the real CIFAR/KITTI file banks, free for the synthetic generators.
    batches = prefetch_to_device(data, size=2, mesh=dev_mesh)
    # Held-out eval stream + jitted eval step at the deployed channel mode.
    eval_step = make_eval_step(cfg, model)
    eval_img = jnp.asarray(next(ImageDataset(
        cfg.train.dataset, cfg.train.batch_size, seed=cfg.train.seed + 999,
        data_root=cfg.train.data_root, real_bank=data._real)))
    eval_snr = jnp.full((eval_img.shape[0],), cfg.channel.snr_db, jnp.float32)
    # Distinct stream from the dataset's fold_in(key(seed), step) — a raw
    # key(seed) here would make channel/SNR draws correlate with image
    # content (same bits every step).
    root_key = jax.random.fold_in(jax.random.key(cfg.train.seed), 0x5EED)
    eval_key = jax.random.fold_in(root_key, 0xE7A1)
    # First-step wall (compile + first run) recorded separately for the
    # compile-vs-steady breakdown (VERDICT r2 item 3; see train/dqn.py).
    import time as _time

    first_s = None
    with maybe_trace(cfg.train.profile_dir), Timer() as t:
        for step in range(start_step, cfg.train.steps):
            batch = next(batches)
            if with_seg:
                img, seg = batch
            else:
                img, seg = batch, None
            sk = jax.random.fold_in(root_key, step)
            t0 = _time.perf_counter() if first_s is None else None
            state, metrics = train_step(state, img, seg, sk)
            if t0 is not None:
                jax.block_until_ready(metrics)
                first_s = _time.perf_counter() - t0
            last = metrics
            if (step + 1) % cfg.train.log_every == 0:
                writer.write(step + 1, metrics)
                watchdog.check(step + 1, metrics)
            if (step + 1) % cfg.train.eval_every == 0:
                ep = eval_step(state.params, eval_img, eval_snr,
                               jax.random.fold_in(eval_key, step))
                last = {**metrics, "eval_psnr": ep}
                writer.write(step + 1, {"eval_psnr": ep})
            if ckpt_mgr and (step + 1) % cfg.train.checkpoint_every == 0:
                ckpt_mgr.save(step + 1, state)
    jax.block_until_ready(last)
    out = dict(jax.device_get(last))
    n_steps = cfg.train.steps - start_step
    if first_s is not None and n_steps > 1 and t.elapsed > first_s:
        out["first_dispatch_s"] = round(first_s, 2)
        out["steady_steps_per_sec"] = round(
            (n_steps - 1) / (t.elapsed - first_s), 2)
    writer.write(cfg.train.steps, out)
    writer.close()
    if ckpt_mgr:
        ckpt_mgr.close()
    return state, out
