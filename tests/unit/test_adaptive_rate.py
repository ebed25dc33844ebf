"""Bandwidth-agile (adaptive-rate) JSCC: mask-aware power normalization,
rate-mask layout, RateFiLM-conditioned codec, and the PSNR-vs-rate sweep.

One model trained with per-example random symbol-channel masking deploys
at any rate m/c_sym (codec/camera_cnn.py RateFiLM, channel/layer.py
power_normalize_masked / rate_mask, train/jscc.py adaptive branch).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import multimodal_sc_tpu as msc
from multimodal_sc_tpu.channel import (
    channel,
    power_normalize,
    power_normalize_masked,
    rate_mask,
)


class TestMaskedNormalize:
    def test_unit_power_over_transmitted_symbols(self, key):
        z = jax.random.normal(key, (8, 64, 2)) * 2.0 + 0.3
        m = jnp.arange(1, 9, dtype=jnp.int32)          # per-example rates
        mask = rate_mask(8, 64, 8, m)
        zn = power_normalize_masked(z, mask)
        # Power concentrated on transmitted symbols: sum |z|^2 == k_eff.
        p = np.asarray(jnp.sum(jnp.square(zn), axis=(1, 2)))
        k_eff = np.asarray(jnp.sum(mask[..., 0], axis=1))
        np.testing.assert_allclose(p, k_eff, rtol=1e-4)
        # Untransmitted slots are exactly zero.
        assert float(jnp.sum(jnp.abs(zn * (1 - mask)))) == 0.0

    def test_full_mask_equals_power_normalize(self, key):
        z = jax.random.normal(key, (4, 32, 2))
        full = jnp.ones((4, 32, 1))
        np.testing.assert_allclose(
            np.asarray(power_normalize_masked(z, full)),
            np.asarray(power_normalize(z)), rtol=1e-6)

    def test_channel_full_mask_matches_no_mask(self, key):
        """channel(mask=ones) is bit-identical to channel(mask=None)."""
        z = jax.random.normal(key, (4, 32, 2))
        full = jnp.ones((4, 32, 1))
        for kind in ("awgn", "rayleigh", "ofdm"):
            a = channel(z, 10.0, kind, jax.random.key(3))
            b = channel(z, 10.0, kind, jax.random.key(3), mask=full)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=kind)

    def test_rate_mask_layout_matches_codec_flatten(self):
        """Flat symbol i carries feature channel i % c_sym — the codec's
        (h, w, 2*c_sym) -> (h*w*c_sym, 2) reshape order."""
        c_sym, h, w = 4, 2, 3
        x = jnp.arange(h * w * 2 * c_sym, dtype=jnp.float32).reshape(
            1, h, w, 2 * c_sym)
        z = x.reshape(1, h * w * c_sym, 2)
        m = jnp.array([2], jnp.int32)
        mask = rate_mask(1, h * w * c_sym, c_sym, m)
        kept = np.asarray(z * mask).reshape(h, w, c_sym, 2)
        orig = np.asarray(x).reshape(h, w, c_sym, 2)
        np.testing.assert_array_equal(kept[:, :, :2], orig[:, :, :2])
        assert np.all(kept[:, :, 2:] == 0)

    def test_gradient_flows_through_mask(self, key):
        z = jax.random.normal(key, (2, 16, 2))
        mask = rate_mask(2, 16, 4, jnp.array([1, 3], jnp.int32))

        def loss(z):
            y = channel(z, 10.0, "awgn", jax.random.key(0), mask=mask)
            return jnp.sum(jnp.square(y))

        g = np.asarray(jax.grad(loss)(z))
        assert np.all(np.isfinite(g))
        # No gradient into untransmitted symbols.
        assert np.all(g[np.asarray(mask)[..., 0] == 0] == 0)


class TestAdaptiveCodec:
    def _cfg(self):
        return msc.get_preset("c1").override_str([
            "camera.adaptive_rate=true", "camera.rate_min_sym=1",
            "camera.features=8,16,16,16", "camera.c_sym=4",
            "train.batch_size=4", "train.steps=2",
        ])

    def test_model_has_rate_film_params(self, key):
        from multimodal_sc_tpu.train import jscc

        cfg = self._cfg()
        state = jscc.create_train_state(cfg, key)
        names = jax.tree_util.tree_leaves_with_path(state.params)
        paths = {jax.tree_util.keystr(p) for p, _ in names}
        assert any("rate_film" in p for p in paths), sorted(paths)[:10]

    def test_requires_rate_argument(self, key):
        from multimodal_sc_tpu.train import jscc

        cfg = self._cfg()
        state = jscc.create_train_state(cfg, key)
        model = jscc.build_model(cfg)
        img = jnp.zeros((4, 32, 32, 3))
        with pytest.raises(ValueError, match="rate"):
            model.apply({"params": state.params}, img, None,
                        method="encode")

    def test_train_step_runs_and_loss_finite(self, key):
        from multimodal_sc_tpu.train import jscc

        cfg = self._cfg()
        state = jscc.create_train_state(cfg, key)
        model = jscc.build_model(cfg)
        step = jscc.make_train_step(cfg, model)
        img = jax.random.uniform(jax.random.key(1), (4, 32, 32, 3))
        state, metrics = step(state, img, None, jax.random.key(2))
        assert np.isfinite(float(metrics["loss"]))

    def test_config_validation(self):
        with pytest.raises(ValueError, match="rate_min_sym"):
            msc.get_preset("c1").override_str(
                ["camera.adaptive_rate=true", "camera.rate_min_sym=99"])
        with pytest.raises(ValueError, match="cnn"):
            msc.get_preset("c1").override_str(
                ["camera.arch=vit", "camera.adaptive_rate=true"])

    def test_rate_sweep_shapes_and_finite(self, key):
        from multimodal_sc_tpu.evaluation import snr_sweep
        from multimodal_sc_tpu.train import jscc

        cfg = self._cfg()
        state = jscc.create_train_state(cfg, key)
        model = jscc.build_model(cfg)
        img = jax.random.uniform(jax.random.key(1), (4, 32, 32, 3))
        curve = snr_sweep.sweep_camera_rate(
            model, state.params, img, key, snr_db=10.0,
            batches_per_point=1)
        assert [p["rate_sym"] for p in curve] == [1, 2, 3, 4]
        assert all(np.isfinite(p["psnr"]) for p in curve)

    def test_rate_sweep_rejects_fixed_rate_codec(self, key):
        from multimodal_sc_tpu.evaluation import snr_sweep
        from multimodal_sc_tpu.train import jscc

        cfg = msc.get_preset("c1").override_str(
            ["camera.features=8,16,16,16", "camera.c_sym=4"])
        state = jscc.create_train_state(cfg, key)
        model = jscc.build_model(cfg)
        img = jnp.zeros((2, 32, 32, 3))
        with pytest.raises(ValueError, match="adaptive_rate"):
            snr_sweep.sweep_camera_rate(model, state.params, img, key)


@pytest.mark.slow
def test_adaptive_rate_trains_and_curve_is_monotone():
    """800-step adaptive model: PSNR is non-decreasing in deployed
    bandwidth with the top rate strictly above the bottom rate.

    CPU-scale honesty note (measured): at unit-test training budgets the
    reconstruction is training-bound, not bandwidth-bound — fixed-rate
    c_sym=1 vs c_sym=4 twins differ by only ~0.3 dB at 600 steps — so
    the gate here is the ORDERING, not a large margin. The full-scale
    bandwidth separation is a TPU baselines arm (BASELINE.md c1_rate).
    """
    from multimodal_sc_tpu.evaluation import snr_sweep
    from multimodal_sc_tpu.train import jscc

    cfg = msc.get_preset("c1").override_str([
        "camera.adaptive_rate=true",
        "camera.features=16,32,64,64", "camera.c_sym=4",
        "train.steps=800", "train.batch_size=16", "train.log_every=800",
    ])
    state, last = jscc.run(cfg)
    assert float(last["psnr"]) > 17.0, dict(last)
    model = jscc.build_model(cfg)
    # Held-out batch from the TRAINING distribution (uniform-noise images
    # are incompressible and flatten the curve).
    from multimodal_sc_tpu.envs.datasets import ImageDataset

    img = jax.numpy.asarray(next(ImageDataset(
        cfg.train.dataset, 16, seed=cfg.train.seed + 999)))
    curve = snr_sweep.sweep_camera_rate(
        model, state.params, img, jax.random.key(2), snr_db=5.0,
        batches_per_point=2)
    psnrs = [p["psnr"] for p in curve]
    assert psnrs[-1] > psnrs[0] + 0.1, psnrs
    for lo, hi in zip(psnrs, psnrs[1:]):              # ordering, with a
        assert hi > lo - 0.1, psnrs                   # small noise margin
