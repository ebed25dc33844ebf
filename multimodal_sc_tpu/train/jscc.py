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
from multimodal_sc_tpu.channel import channel_kwargs
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
            adaptive_rate=cfg.camera.adaptive_rate,
            use_pallas=cfg.use_pallas,
            dtype=jnp.bfloat16 if cfg.train.bf16 else jnp.float32,
        )
    elif cfg.camera.arch == "vq":
        from multimodal_sc_tpu.codec.semantic_vq import VQCameraJSCC

        return VQCameraJSCC(
            cfg=cfg,
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
    if cfg.camera.arch == "vq":
        # The VQ pipeline's __call__ runs the digital channel inside the
        # graph, so init also takes a channel key.
        params = model.init(key, dummy, dummy_snr, jax.random.key(0))[
            "params"]
    else:
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
    pilots: int = 0, subcarriers: int = 64, taps: int = 8,
    rate_sym: int = 0,
) -> Tuple[Array, Array]:
    """encode -> channel -> decode; returns (recon, symbols).

    Thin delegate to api.reconstruct (single source of truth for the flow).
    """
    from multimodal_sc_tpu import api

    return api.reconstruct(model, params, img, snr_db, key, kind, normalize,
                           modulation, pilots, subcarriers, taps, rate_sym)


def _step_body(cfg: ExperimentConfig, model):
    """Un-jitted single train step; shared by the per-step and chunked
    dispatch paths (identical numerics either way)."""
    kind = cfg.channel.kind
    ch_kw = channel_kwargs(cfg.channel)
    with_seg = cfg.camera.seg_classes > 0 and cfg.camera.arch == "cnn"
    adaptive = cfg.camera.adaptive_rate
    c_sym, m_min = cfg.camera.c_sym, cfg.camera.rate_min_sym

    if cfg.camera.arch == "vq":
        # Discrete semantic-token pipeline (codec/semantic_vq.py): the
        # model's __call__ runs TX -> QPSK digital channel -> RX in one
        # graph; loss = MSE + VQ codebook/commitment terms.
        prune = cfg.camera.vq_prune
        keep_min = cfg.camera.vq_keep_min

        def vq_loss_fn(params, img, snr_db, key, keep):
            # Token-pruned training transmits RANDOM subsets (select=
            # "random": cheap, and covers every drop pattern the
            # damage-ranked deployment can produce); dropped positions
            # decode as the learned mask embedding.
            kw = {"keep": keep, "select": "random"} if prune else {}
            recon, aux = model.apply({"params": params}, img, snr_db, key,
                                     **kw)
            mse = jnp.mean(jnp.square(recon - img))
            return mse + aux["vq_loss"], (recon, aux)

        def vq_body(state: TrainState, img: Array, seg, key: Array):
            ksnr, kch = jax.random.split(key)
            snr_db = _sample_snr(cfg, ksnr, img.shape[0])
            # Per-example kept-token fraction in [vq_keep_min, 1] —
            # bandwidth-agile digital training, mirroring the analog
            # adaptive_rate branch below. Folded key: non-prune configs
            # keep the exact pre-existing stream.
            keep = (jax.random.uniform(
                jax.random.fold_in(key, 0x6EE9), (img.shape[0],),
                minval=keep_min, maxval=1.0) if prune else None)
            (loss, (recon, aux)), grads = jax.value_and_grad(
                vq_loss_fn, has_aux=True)(state.params, img, snr_db, kch,
                                          keep)
            state = state.apply_gradients(grads=grads)
            metrics = {"loss": loss, "psnr": psnr(recon, img),
                       "vq_loss": aux["vq_loss"],
                       "index_error_rate": aux["index_error_rate"],
                       "code_perplexity": aux["code_perplexity"]}
            if "vq_counts" in aux:
                # Dead-code re-seeding AFTER the optimizer step (r5 usage
                # fix; camera.vq_reseed > 0): batch-dead codes jump to the
                # batch's worst-quantized encoder outputs.
                from multimodal_sc_tpu.codec.semantic_vq import (
                    reseed_dead_codes,
                )

                new_cb, n_rs = reseed_dead_codes(
                    state.params["codebook"], aux["vq_counts"],
                    aux["vq_candidates"], jax.random.fold_in(key, 0xD0D0),
                    cfg.camera.vq_reseed)
                state = state.replace(
                    params={**state.params, "codebook": new_cb})
                metrics["vq_reseeded"] = n_rs.astype(jnp.float32)
            if prune:
                metrics["token_keep_frac"] = aux["token_keep_frac"]
            return state, metrics

        return vq_body

    def loss_fn(params, img, seg, snr_db, key, krate):
        if adaptive:
            # Bandwidth-agile training: per-example random rate m/c_sym
            # (configs.py CameraCodecConfig). The encoder/decoder see the
            # rate via FiLM; the channel transmits only the first m
            # symbol channels (mask-aware power normalization).
            from multimodal_sc_tpu.channel import rate_mask

            m = jax.random.randint(krate, (img.shape[0],), m_min, c_sym + 1)
            rkw = {"rate": m.astype(jnp.float32) / c_sym}
        else:
            rkw, m = {}, None
        z = model.apply({"params": params}, img, snr_db, method="encode",
                        **rkw)
        mask = (rate_mask(z.shape[0], z.shape[1], c_sym, m)
                if adaptive else None)
        z_hat = channel_op(z, snr_db, kind, key, mask=mask, **ch_kw)
        if with_seg:
            recon, seg_logits = model.apply(
                {"params": params}, z_hat, snr_db, method="decode_seg",
                **rkw)
            mse = jnp.mean(jnp.square(recon - img))
            ce = jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                seg_logits, seg))
            return mse + 0.1 * ce, (recon, seg_logits)
        recon = model.apply({"params": params}, z_hat, snr_db,
                            method="decode", **rkw)
        return jnp.mean(jnp.square(recon - img)), (recon, None)

    def body(state: TrainState, img: Array, seg, key: Array):
        ksnr, kch = jax.random.split(key)
        # Static stream layout: the rate key only exists for adaptive
        # configs, so non-adaptive configs keep the exact pre-r3 stream.
        krate = jax.random.fold_in(key, 0xA7E) if adaptive else kch
        snr_db = _sample_snr(cfg, ksnr, img.shape[0])
        (loss, (recon, seg_logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, img, seg, snr_db, kch,
                                   krate)
        state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss, "psnr": psnr(recon, img)}
        if with_seg:
            from multimodal_sc_tpu.evaluation.metrics import miou

            pred = jnp.argmax(seg_logits, axis=-1)
            metrics["miou"] = miou(pred, seg, cfg.camera.seg_classes)
        return state, metrics

    return body


def make_train_step(cfg: ExperimentConfig, model):
    return jax.jit(_step_body(cfg, model))


def make_train_step_chunked(cfg: ExperimentConfig, model, chunk: int):
    """``chunk`` train steps per device dispatch via ``lax.scan``.

    One dispatch consumes ``chunk`` stacked batches; per-step PRNG keys
    still derive from the GLOBAL step index (``fold_in(root_key, step)``,
    resume determinism), so the stream is identical to ``chunk`` single
    dispatches. Amortizes the per-dispatch host round trip, which
    dominates the c1/c2 training wall through the axon tunnel the same
    way it dominated c4's (VERDICT r2 item 3; train/dqn.py chunking).
    Metrics come back stacked ``(chunk,)`` per key."""
    body = _step_body(cfg, model)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chunked(state: TrainState, imgs: Array, segs, root_key: Array,
                step0: Array):
        def scan_body(s, inp):
            img, seg, i = inp
            return body(s, img, seg, jax.random.fold_in(root_key, step0 + i))

        segs_in = (segs if segs is not None
                   else jnp.zeros((chunk,), jnp.int32))  # unused placeholder
        return jax.lax.scan(
            scan_body, state,
            (imgs, segs_in, jnp.arange(chunk, dtype=jnp.int32)))

    return chunked


def make_eval_step(cfg: ExperimentConfig, model):
    """Jitted PSNR eval step at the config's deployed channel mode."""
    kind = cfg.channel.kind
    ch_kw = channel_kwargs(cfg.channel)

    if cfg.camera.arch == "vq":
        # The VQ model runs its digital channel inside __call__.
        @jax.jit
        def vq_eval_step(params, img, snr_db, key):
            recon, _ = model.apply({"params": params}, img, snr_db, key)
            return psnr(recon, img)

        return vq_eval_step

    @functools.partial(jax.jit, static_argnames=("eval_kind",))
    def eval_step(params, img, snr_db, key, eval_kind=kind):
        recon, _ = reconstruct(params, model, img, snr_db, key, eval_kind,
                               **ch_kw)
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
    if cfg.camera.arch == "vq" and start_step == 0:
        # Fresh VQ runs seed the codebook from real encoder outputs
        # (codec/semantic_vq.py init_codebook_from_batch — the collapse
        # fix). Dedicated stream, so the train/eval streams are untouched;
        # resumed runs restore the trained codebook instead.
        from multimodal_sc_tpu.codec.semantic_vq import (
            init_codebook_from_batch,
        )

        init_img = jnp.asarray(next(ImageDataset(
            cfg.train.dataset, cfg.train.batch_size,
            seed=cfg.train.seed + 777, data_root=cfg.train.data_root,
            real_bank=data._real)))
        state = state.replace(params=init_codebook_from_batch(
            model, state.params, init_img,
            jax.random.fold_in(jax.random.key(cfg.train.seed), 0xCB)))
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

    chunk = max(1, cfg.train.iters_per_dispatch)
    chunked_step = (make_train_step_chunked(cfg, model, chunk)
                    if chunk > 1 else None)

    def _chunk_ok(step: int) -> bool:
        """Chunked dispatch only when it keeps the eval/checkpoint cadence
        exact: aligned start, no overrun, and no eval or checkpoint
        boundary strictly inside the chunk (state is only on host at
        dispatch boundaries). Log cadence survives chunking — metrics come
        back stacked per step."""
        if chunk == 1 or step % chunk != 0 or step + chunk > cfg.train.steps:
            return False
        for j in range(1, chunk):
            g = step + j
            if g % cfg.train.eval_every == 0:
                return False
            if ckpt_mgr and g % cfg.train.checkpoint_every == 0:
                return False
        return True

    def _next_batch():
        b = next(batches)
        return b if with_seg else (b, None)

    first_s = None
    first_n = 0
    ckpt_s = 0.0
    with maybe_trace(cfg.train.profile_dir), Timer() as t:
        step = start_step
        while step < cfg.train.steps:
            t0 = _time.perf_counter() if first_s is None else None
            if _chunk_ok(step):
                pairs = [_next_batch() for _ in range(chunk)]
                imgs = jnp.stack([p[0] for p in pairs])
                segs = (jnp.stack([p[1] for p in pairs])
                        if with_seg else None)
                state, stacked = chunked_step(state, imgs, segs, root_key,
                                              jnp.int32(step))
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
                img, seg = _next_batch()
                sk = jax.random.fold_in(root_key, step)
                state, metrics = train_step(state, img, seg, sk)
                if t0 is not None:
                    jax.block_until_ready(metrics)
                    first_s = _time.perf_counter() - t0
                    first_n = 1
                last = metrics
                step += 1
                if step % cfg.train.log_every == 0:
                    writer.write(step, metrics)
                    watchdog.check(step, metrics)
            if step % cfg.train.eval_every == 0:
                ep = eval_step(state.params, eval_img, eval_snr,
                               jax.random.fold_in(eval_key, step - 1))
                last = {**last, "eval_psnr": ep}
                writer.write(step, {"eval_psnr": ep})
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
