"""SNR-sweep JSCC evaluator: PSNR / mIoU curves over AWGN + Rayleigh.

Spec: BASELINE.json:8 — "SNR-sweep JSCC eval (AWGN + Rayleigh fading,
power-normalized) with PSNR/mIoU curves" (config 2). Reference repo has no
eval code (``/root/reference/README.md:1-2``).

One jitted eval step per (kind) channel; the SNR axis is fed as data (a
per-example SNR vector), so the whole sweep is a handful of compiles, not
one per SNR point.
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_sc_tpu.channel import channel as channel_op
from multimodal_sc_tpu.evaluation.metrics import miou, psnr, ssim

Array = jax.Array

DEFAULT_SNRS = tuple(range(-5, 26, 5))  # -5 .. 25 dB


def sweep_camera(
    model, params, images: Array, key: Array,
    snrs_db: Sequence[float] = DEFAULT_SNRS,
    kinds: Sequence[str] = ("awgn", "rayleigh"),
    batches_per_point: int = 4,
    seg: Array = None,
    normalize: bool = True,
    modulation: int = 0,
    pilots: int = 0,
    subcarriers: int = 64,
    taps: int = 8,
) -> Dict[str, List[dict]]:
    """PSNR + SSIM (+ mIoU when the codec has a seg head and `seg` labels
    are given) curves for an image codec:
    {kind: [{snr_db, psnr, ssim[, miou]}]}. PSNR is the spec metric
    (BASELINE.json:8); SSIM (tf.image-oracle-tested) adds the perceptual
    axis the MSE loss can trade away.

    `normalize`/`modulation`/`pilots`/`subcarriers`/`taps` must mirror the
    training ChannelConfig so a model trained in M-QAM / estimated-CSI /
    OFDM mode is evaluated over the same deployed channel (ADVICE r1)."""

    import functools

    with_seg = seg is not None and getattr(model, "seg_classes", 0) > 0
    adaptive = getattr(model, "adaptive_rate", False)

    @functools.partial(jax.jit, static_argnames=("kind", "rate_sym"))
    def eval_point(params, img, seg, snr_db, key, kind, rate_sym=0):
        snr_vec = jnp.full((img.shape[0],), snr_db, jnp.float32)
        if adaptive:
            from multimodal_sc_tpu.channel import rate_mask

            m_val = rate_sym if rate_sym else model.c_sym
            m = jnp.full((img.shape[0],), m_val, jnp.int32)
            rkw = {"rate": m.astype(jnp.float32) / model.c_sym}
        else:
            rkw, m = {}, None
        z = model.apply({"params": params}, img, snr_vec, method="encode",
                        **rkw)
        mask = (None if m is None
                else rate_mask(z.shape[0], z.shape[1], model.c_sym, m))
        z_hat = channel_op(z, snr_vec, kind, key, normalize=normalize,
                           modulation=modulation, pilots=pilots,
                           subcarriers=subcarriers, taps=taps, mask=mask)
        if with_seg:
            rec, seg_logits = model.apply({"params": params}, z_hat, snr_vec,
                                          method="decode_seg", **rkw)
            pred = jnp.argmax(seg_logits, axis=-1)
            return (psnr(rec, img), ssim(rec, img),
                    miou(pred, seg, model.seg_classes))
        rec = model.apply({"params": params}, z_hat, snr_vec,
                          method="decode", **rkw)
        return psnr(rec, img), ssim(rec, img), jnp.float32(0)

    results: Dict[str, List[dict]] = {}
    for ki, kind in enumerate(kinds):
        curve = []
        for si, snr_db in enumerate(snrs_db):
            pv, sv, mv = [], [], []
            for b in range(batches_per_point):
                # Deterministic stream id (hash() is salted per process).
                k = jax.random.fold_in(key, ki * 100000 + si * 100 + b)
                p, s, m = eval_point(params, images, seg, float(snr_db), k,
                                     kind)
                pv.append(float(p))
                sv.append(float(s))
                mv.append(float(m))
            point = {"snr_db": float(snr_db), "psnr": float(np.mean(pv)),
                     "ssim": float(np.mean(sv))}
            if with_seg:
                point["miou"] = float(np.mean(mv))
            curve.append(point)
        results[kind] = curve
    return results


def sweep_camera_rate(
    model, params, images: Array, key: Array,
    snr_db: float = 10.0,
    rates_sym: Sequence[int] = (),
    kind: str = "awgn",
    batches_per_point: int = 4,
    normalize: bool = True,
    modulation: int = 0,
    pilots: int = 0,
    subcarriers: int = 64,
    taps: int = 8,
) -> List[dict]:
    """PSNR/SSIM vs deployed bandwidth for an adaptive-rate codec.

    One trained model evaluated at every rate m/c_sym, m in `rates_sym`
    (default 1..c_sym): the bandwidth-agility curve (codec/camera_cnn.py
    RateFiLM + channel/layer.py rate_mask). Returns
    [{rate_sym, rate, psnr, ssim}].
    """
    from multimodal_sc_tpu import api

    if not getattr(model, "adaptive_rate", False):
        raise ValueError("sweep_camera_rate requires an adaptive_rate codec")
    rates = tuple(rates_sym) or tuple(range(1, model.c_sym + 1))

    import functools

    @functools.partial(jax.jit, static_argnames=("rate_sym",))
    def eval_point(params, img, key, rate_sym):
        rec, _ = api.reconstruct(
            model, params, img, float(snr_db), key, kind,
            normalize=normalize, modulation=modulation, pilots=pilots,
            subcarriers=subcarriers, taps=taps, rate_sym=rate_sym)
        return psnr(rec, img), ssim(rec, img)

    curve = []
    for ri, m in enumerate(rates):
        pv, sv = [], []
        for b in range(batches_per_point):
            k = jax.random.fold_in(key, ri * 100 + b)
            p, s = eval_point(params, images, k, int(m))
            pv.append(float(p))
            sv.append(float(s))
        curve.append({"rate_sym": int(m), "rate": m / model.c_sym,
                      "psnr": float(np.mean(pv)), "ssim": float(np.mean(sv))})
    return curve


def sweep_camera_vq(
    cfg, params, images: Array, key: Array,
    snrs_db: Sequence[float] = DEFAULT_SNRS,
    kinds: Sequence[str] = ("awgn", "rayleigh"),
    batches_per_point: int = 4,
) -> Dict[str, List[dict]]:
    """PSNR/SSIM + index-error-rate curves for the discrete semantic-token
    codec (codec/semantic_vq.py). The digital channel runs inside the
    model, so each kind gets a model rebuilt with the overridden
    cfg.channel.kind. Returns {kind: [{snr_db, psnr, ssim, index_err}]}.
    """
    import functools

    from multimodal_sc_tpu.train import jscc

    results: Dict[str, List[dict]] = {}
    for ki, kind in enumerate(kinds):
        model = jscc.build_model(
            cfg.override_str([f"channel.kind={kind}"]))

        @functools.partial(jax.jit)
        def eval_point(params, img, snr_db, key, model=model):
            snr_vec = jnp.full((img.shape[0],), snr_db, jnp.float32)
            rec, aux = model.apply({"params": params}, img, snr_vec, key)
            return psnr(rec, img), ssim(rec, img), aux["index_error_rate"]

        curve = []
        for si, snr_db in enumerate(snrs_db):
            pv, sv, ev = [], [], []
            for b in range(batches_per_point):
                k = jax.random.fold_in(key, ki * 100000 + si * 100 + b)
                p, s, e = eval_point(params, images, float(snr_db), k)
                pv.append(float(p))
                sv.append(float(s))
                ev.append(float(e))
            curve.append({"snr_db": float(snr_db),
                          "psnr": float(np.mean(pv)),
                          "ssim": float(np.mean(sv)),
                          "index_err": float(np.mean(ev))})
        results[kind] = curve
    return results


DEFAULT_KEEPS = (0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 1.0)


def sweep_camera_vq_keep(
    cfg, params, images: Array, key: Array,
    keeps: Sequence[float] = DEFAULT_KEEPS,
    selects: Sequence[str] = ("drop_damage", "random", "scatter",
                              "drop_damage_scatter"),
    batches_per_point: int = 4,
) -> Dict[str, List[dict]]:
    """PSNR/SSIM vs kept-token fraction for a token-pruned VQ codec.

    The digital analogue of :func:`sweep_camera_rate`: one camera.vq_prune
    model (codec/semantic_vq.py) deployed at every keep fraction, at the
    config's channel kind/SNR. Each selection rule gets its own curve —
    the damage-vs-random gap at equal keep IS the semantic story (the
    transmitter spends its token budget on the tokens whose corruption
    costs the most reconstruction). Returns
    {select: [{keep, psnr, ssim, index_err}]}.
    """
    import functools

    from multimodal_sc_tpu.train import jscc

    if not cfg.camera.vq_prune:
        raise ValueError("sweep_camera_vq_keep requires camera.vq_prune")
    model = jscc.build_model(cfg)

    @functools.partial(jax.jit, static_argnames=("select",))
    def eval_point(params, img, keep, key, select):
        snr_vec = jnp.full((img.shape[0],), cfg.channel.snr_db, jnp.float32)
        keep_vec = jnp.full((img.shape[0],), keep, jnp.float32)
        rec, aux = model.apply({"params": params}, img, snr_vec, key,
                               keep=keep_vec, select=select)
        return psnr(rec, img), ssim(rec, img), aux["index_error_rate"]

    results: Dict[str, List[dict]] = {}
    for si, select in enumerate(selects):
        curve = []
        for ki, keep in enumerate(keeps):
            pv, sv, ev = [], [], []
            for b in range(batches_per_point):
                k = jax.random.fold_in(key, si * 100000 + ki * 100 + b)
                p, s, e = eval_point(params, images, float(keep), k, select)
                pv.append(float(p))
                sv.append(float(s))
                ev.append(float(e))
            curve.append({"keep": float(keep),
                          "psnr": float(np.mean(pv)),
                          "ssim": float(np.mean(sv)),
                          "index_err": float(np.mean(ev))})
        results[select] = curve
    return results


def sweep_camera_vq_harq(
    cfg, params, images: Array, key: Array,
    snrs_db: Sequence[float] = DEFAULT_SNRS,
    kinds: Sequence[str] = ("awgn", "rayleigh"),
    batches_per_point: int = 4,
    max_rounds: int = 4,
    block_bits: int = 64,
    crc_bits: int = 8,
) -> Dict[str, List[dict]]:
    """Type-I HARQ deployment curves for the VQ codec (channel/harq.py).

    Same checkpoint as the one-shot/FEC deployments (the protocol is
    parameter-transparent); each point also records the ADAPTIVE bandwidth
    actually spent — symbols_per_item vs the one-shot cost — and the mean
    transmission rounds. Returns {kind: [{snr_db, psnr, ssim, index_err,
    symbols_per_item, mean_rounds, residual_fail_rate}]}.
    """
    import functools

    from multimodal_sc_tpu.channel.digital import (
        bits_from_indices,
        indices_from_bits,
    )
    from multimodal_sc_tpu.channel.harq import harq_transmit
    from multimodal_sc_tpu.train import jscc

    model = jscc.build_model(cfg)
    codes = cfg.camera.vq_codes

    @functools.partial(jax.jit, static_argnames=("kind",))
    def eval_point(params, img, snr_db, key, kind):
        snr_vec = jnp.full((img.shape[0],), snr_db, jnp.float32)
        idx_tx, _, _ = model.apply({"params": params}, img,
                                   method="encode_tokens")
        bits = bits_from_indices(idx_tx, codes)
        bits_rx, info = harq_transmit(
            bits, snr_vec, kind, key, block_bits=block_bits,
            crc_bits=crc_bits, max_rounds=max_rounds)
        idx_rx = indices_from_bits(bits_rx, codes)
        rec = model.apply({"params": params}, idx_rx,
                          method="decode_tokens")
        err = jnp.mean((idx_rx != idx_tx).astype(jnp.float32))
        return psnr(rec, img), ssim(rec, img), err, info

    results: Dict[str, List[dict]] = {}
    for ki, kind in enumerate(kinds):
        curve = []
        for si, snr_db in enumerate(snrs_db):
            acc: Dict[str, list] = {}
            for b in range(batches_per_point):
                k = jax.random.fold_in(key, ki * 100000 + si * 100 + b)
                p, s, e, info = eval_point(params, images, float(snr_db),
                                           k, kind)
                for name, v in (("psnr", p), ("ssim", s), ("index_err", e),
                                *info.items()):
                    acc.setdefault(name, []).append(float(v))
            curve.append({"snr_db": float(snr_db),
                          **{k_: float(np.mean(v)) for k_, v in
                             acc.items()}})
        results[kind] = curve
    return results


def sweep_lidar(
    model, params, points: Array, mask: Array, occ_target: Array, key: Array,
    snrs_db: Sequence[float] = DEFAULT_SNRS,
    kinds: Sequence[str] = ("awgn", "rayleigh"),
    normalize: bool = True,
    modulation: int = 0,
    pilots: int = 0,
    subcarriers: int = 64,
    taps: int = 8,
) -> Dict[str, List[dict]]:
    """mIoU curve for the LiDAR BEV codec.

    Handles both modes of LidarBEVCodec: binary occupancy (single logit,
    `occ_target` a 0/1 grid) and semantic BEV (`model.seg_classes` > 1,
    `occ_target` an int class grid)."""

    import functools

    n_classes = getattr(model, "seg_classes", 1)

    @functools.partial(jax.jit, static_argnames=("kind",))
    def eval_point(params, points, mask, occ, snr_db, key, kind):
        z = model.apply({"params": params}, (points, mask), method="encode")
        snr_vec = jnp.full((points.shape[0],), snr_db, jnp.float32)
        z_hat = channel_op(z, snr_vec, kind, key, normalize=normalize,
                           modulation=modulation, pilots=pilots,
                           subcarriers=subcarriers, taps=taps)
        logits = model.apply({"params": params}, z_hat, method="decode")
        if n_classes > 1:
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return miou(pred, occ.astype(jnp.int32), n_classes)
        pred = (logits[..., 0] > 0).astype(jnp.int32)
        return miou(pred, occ.astype(jnp.int32), 2)

    results: Dict[str, List[dict]] = {}
    for ki, kind in enumerate(kinds):
        curve = []
        for si, snr_db in enumerate(snrs_db):
            k = jax.random.fold_in(key, ki * 100000 + si * 100)
            v = float(eval_point(params, points, mask, occ_target,
                                 float(snr_db), k, kind))
            curve.append({"snr_db": float(snr_db), "miou": v})
        results[kind] = curve
    return results


def sweep_lidar_vq(
    cfg, params, points: Array, mask: Array, occ_target: Array, key: Array,
    snrs_db: Sequence[float] = DEFAULT_SNRS,
    kinds: Sequence[str] = ("awgn", "rayleigh"),
    batches_per_point: int = 4,
) -> Dict[str, List[dict]]:
    """mIoU + index-error-rate curves for the DIGITAL LiDAR codec
    (codec/lidar_bev.py LidarBEVVQCodec, lidar.arch="vq"). The digital
    link runs inside the model (like sweep_camera_vq), so each kind gets
    a model rebuilt with the overridden cfg.channel.kind; cfg.channel.fec
    deploys parameter-transparently. Returns
    {kind: [{snr_db, miou, index_err}]}."""
    import functools

    from multimodal_sc_tpu.train.fusion_jscc import build_lidar_codec

    n_classes = cfg.lidar.seg_classes
    results: Dict[str, List[dict]] = {}
    for ki, kind in enumerate(kinds):
        model = build_lidar_codec(cfg.override_str([f"channel.kind={kind}"]))

        @functools.partial(jax.jit)
        def eval_point(params, pts, msk, occ, snr_db, key, model=model):
            snr_vec = jnp.full((pts.shape[0],), snr_db, jnp.float32)
            logits, aux = model.apply({"params": params}, pts, msk,
                                      snr_vec, key)
            if n_classes > 1:
                pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                m = miou(pred, occ.astype(jnp.int32), n_classes)
            else:
                pred = (logits[..., 0] > 0).astype(jnp.int32)
                m = miou(pred, occ.astype(jnp.int32), 2)
            return m, aux["index_error_rate"]

        curve = []
        for si, snr_db in enumerate(snrs_db):
            mv, ev = [], []
            for b in range(batches_per_point):
                k = jax.random.fold_in(key, ki * 100000 + si * 100 + b)
                m, e = eval_point(params, points, mask, occ_target,
                                  float(snr_db), k)
                mv.append(float(m))
                ev.append(float(e))
            curve.append({"snr_db": float(snr_db),
                          "miou": float(np.mean(mv)),
                          "index_err": float(np.mean(ev))})
        results[kind] = curve
    return results


def sweep_lidar_vq_keep(
    cfg, params, points: Array, mask: Array, occ_target: Array, key: Array,
    keeps: Sequence[float] = (0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 1.0),
    selects: Sequence[str] = ("scatter", "random", "drop_damage",
                              "drop_damage_scatter"),
    batches_per_point: int = 4,
) -> Dict[str, List[dict]]:
    """Kept-token-fraction sweep for the PRUNED digital BEV codec
    (lidar.vq_prune, r5 — VERDICT r4 item 5): mIoU at each deploy-time
    keep fraction under each selection rule, at the config's deployed
    SNR/kind. The BEV re-run of the r3 camera selection-rule study
    (BASELINE.md token-pruning section: does spatial scatter still beat
    importance ranking on the BEV grid?). Returns
    ``{select: [{keep, miou}]}``."""
    import functools

    from multimodal_sc_tpu.train.fusion_jscc import build_lidar_codec

    model = build_lidar_codec(cfg)
    n_classes = cfg.lidar.seg_classes
    results: Dict[str, List[dict]] = {}
    for sel_i, select in enumerate(selects):

        @functools.partial(jax.jit, static_argnames=("select",))
        def point(params, keep, k, select):
            snr_vec = jnp.full((points.shape[0],), cfg.channel.snr_db,
                               jnp.float32)
            kv = jnp.full((points.shape[0],), keep, jnp.float32)
            logits, aux = model.apply({"params": params}, points, mask,
                                      snr_vec, k, keep=kv, select=select)
            if n_classes > 1:
                pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                m = miou(pred, occ_target.astype(jnp.int32), n_classes)
            else:
                pred = (logits[..., 0] > 0).astype(jnp.int32)
                m = miou(pred, occ_target.astype(jnp.int32), 2)
            return m, aux["token_keep_frac"]

        curve = []
        for ki_, keep in enumerate(keeps):
            mv = []
            for b in range(batches_per_point):
                k = jax.random.fold_in(key, sel_i * 100000 + ki_ * 100 + b)
                m, kf = point(params, float(keep), k, select)
                mv.append(float(m))
            curve.append({"keep": float(keep), "miou": float(np.mean(mv)),
                          "keep_frac_actual": float(kf)})
        results[select] = curve
    return results


def sweep_lidar_vq_entropy(
    cfg, params, points: Array, mask: Array, occ_target: Array, key: Array,
    snrs_db: Sequence[float] = DEFAULT_SNRS,
    kinds: Sequence[str] = ("awgn", "rayleigh"),
    batches_per_point: int = 4,
    keep_codes: int = 16,
) -> Dict:
    """Entropy-aware index transport study on the digital BEV codec (r5,
    VERDICT r4 item 6): three parameter-transparent deployments of the
    SAME checkpoint —

    * ``full``  — the fixed 8-bit/token baseline (channel/digital.py),
    * ``vlc``   — canonical Huffman driven by the trained code
      distribution (channel/entropy_coding.py), exact per-image symbol
      accounting, zero-power padding; the desync cost under errors is the
      measured low-SNR story,
    * ``fixed`` — top-``keep_codes`` re-alphabet (nearest-kept snap),
      fixed log2(keep_codes) bits/token, no desync risk.

    Calibration (the code histogram) uses the evaluation batch itself —
    one encoder pass; a deployment would ship the table with the
    checkpoint. Returns ``{"calibration": {...}, kinds...}`` where each
    kind maps to rows ``{snr_db, miou_*, index_err_*, syms_*}``.
    """
    import functools

    from multimodal_sc_tpu.channel.digital import bits_to_qpsk, qpsk_to_bits
    from multimodal_sc_tpu.channel.entropy_coding import (
        build_huffman,
        decode_vlc_np,
        encode_vlc,
        entropy_bits,
        topk_remap,
    )
    from multimodal_sc_tpu.channel.layer import channel as channel_op
    from multimodal_sc_tpu.codec.semantic_vq import transmit_indices
    from multimodal_sc_tpu.train.fusion_jscc import build_lidar_codec

    model = build_lidar_codec(cfg)
    n_classes = cfg.lidar.seg_classes
    codes = cfg.lidar.vq_codes

    idx_cal, _, _ = model.apply({"params": params}, points, mask,
                                method="encode_tokens")
    n_tok = idx_cal.shape[1]
    probs = (np.bincount(np.asarray(idx_cal).ravel(), minlength=codes)
             / idx_cal.size)
    codec = build_huffman(probs)
    kept, full_to_small, _ = topk_remap(probs, params["codebook"],
                                        keep_codes)
    mean_bits = float(np.sum(probs * np.asarray(codec.code_len)))
    calibration = {
        "entropy_bits_per_token": entropy_bits(probs),
        "huffman_mean_bits_per_token": mean_bits,
        "code_perplexity": float(np.exp(
            -np.sum(probs[probs > 0] * np.log(probs[probs > 0])))),
        "keep_codes": int(keep_codes),
        "topk_mass": float(np.sort(probs)[::-1][:keep_codes].sum()),
        "fixed_bits_per_token": float(np.log2(codes)),
    }

    def _miou(logits):
        if n_classes > 1:
            pred = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return miou(pred, occ_target.astype(jnp.int32), n_classes)
        pred = (logits[..., 0] > 0).astype(jnp.int32)
        return miou(pred, occ_target.astype(jnp.int32), 2)

    ch_kw = dict(pilots=cfg.channel.pilots,
                 subcarriers=cfg.channel.ofdm_subcarriers,
                 taps=cfg.channel.ofdm_taps)
    results: Dict = {"calibration": calibration}
    for ki, kind in enumerate(kinds):
        cfg_k = cfg.override_str([f"channel.kind={kind}"])

        @functools.partial(jax.jit)
        def point(params, snr_db, k):
            snr_vec = jnp.full((points.shape[0],), snr_db, jnp.float32)
            idx_tx, _, _ = model.apply({"params": params}, points, mask,
                                       method="encode_tokens")
            out = {}
            # full-alphabet fixed-length baseline
            rx_full = transmit_indices(cfg_k.channel, idx_tx, codes,
                                       snr_vec, jax.random.fold_in(k, 0))
            out["miou_full"] = _miou(model.apply(
                {"params": params}, rx_full, method="decode_tokens"))
            out["index_err_full"] = jnp.mean(
                (rx_full != idx_tx).astype(jnp.float32))
            # Huffman VLC: TPU transmits (encode + zero-power-padded QPSK
            # + hard bits); the sequential automaton decode runs on the
            # HOST (decode_vlc_np — a ~17k-step lax.scan is a
            # pathological TPU graph; measured TPU-internal error, r5).
            bits_tx, total = encode_vlc(codec, idx_tx)
            sym = bits_to_qpsk(bits_tx)
            active = (jnp.arange(sym.shape[1])[None, :] * 2
                      < total[:, None]).astype(jnp.float32)
            y = channel_op(sym * active[..., None], snr_vec, kind,
                           jax.random.fold_in(k, 1), normalize=False,
                           modulation=0, **ch_kw)
            out["syms_vlc"] = jnp.mean(jnp.ceil(total / 2.0))
            out["bits_per_token_vlc"] = (
                jnp.mean(total.astype(jnp.float32)) / n_tok)
            # top-k re-alphabet
            small_tx = full_to_small[idx_tx]
            small_rx = transmit_indices(cfg_k.channel, small_tx,
                                        keep_codes, snr_vec,
                                        jax.random.fold_in(k, 2))
            rx_fixed = kept[small_rx]
            out["miou_fixed"] = _miou(model.apply(
                {"params": params}, rx_fixed, method="decode_tokens"))
            out["index_err_fixed"] = jnp.mean(
                (rx_fixed != kept[small_tx]).astype(jnp.float32))
            return out, idx_tx, qpsk_to_bits(y), total

        @functools.partial(jax.jit)
        def vlc_metrics(params, idx_rx, idx_tx):
            m = _miou(model.apply({"params": params}, idx_rx,
                                  method="decode_tokens"))
            err = jnp.mean((idx_rx != idx_tx).astype(jnp.float32))
            return m, err

        curve = []
        for si, snr_db in enumerate(snrs_db):
            acc: Dict[str, list] = {}
            for b in range(batches_per_point):
                k = jax.random.fold_in(key, ki * 100000 + si * 100 + b)
                o, idx_tx, bits_rx, total = point(params, float(snr_db), k)
                idx_rx = jnp.asarray(decode_vlc_np(
                    codec, bits_rx, total, n_tok))
                mv, ev = vlc_metrics(params, idx_rx, idx_tx)
                o = dict(o)
                o["miou_vlc"] = mv
                o["index_err_vlc"] = ev
                for name, v in o.items():
                    acc.setdefault(name, []).append(float(v))
            row = {"snr_db": float(snr_db)}
            row.update({name: float(np.mean(v)) for name, v in acc.items()})
            row["syms_full"] = n_tok * float(np.log2(codes)) / 2
            row["syms_fixed"] = n_tok * float(np.log2(keep_codes)) / 2
            curve.append(row)
        results[kind] = curve
    return results


def save_curves(curves: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(curves, f, indent=2)


def format_table(curves: Dict[str, List[dict]], metric: str = "psnr") -> str:
    lines = [f"{'snr_db':>8} " + " ".join(f"{k:>10}" for k in curves)]
    snrs = [p["snr_db"] for p in next(iter(curves.values()))]
    for i, s in enumerate(snrs):
        row = f"{s:>8.1f} " + " ".join(
            f"{curves[k][i][metric]:>10.3f}" for k in curves)
        lines.append(row)
    return "\n".join(lines)
