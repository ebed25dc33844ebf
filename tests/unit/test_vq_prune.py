"""Semantic token pruning on the VQ digital path (camera.vq_prune):
top-m selection algebra, mask-embedding receiver behavior, bandwidth
elasticity of the transmitted symbols, training-driver wiring, and the
keep-sweep evaluator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import multimodal_sc_tpu as msc


def _cfg(*extra):
    return msc.get_preset("c1").override_str([
        "camera.arch=vq", "camera.vq_codes=64", "camera.vq_dim=16",
        "camera.features=8,16,16,16", "camera.vq_prune=true",
        "train.batch_size=4", "train.steps=2", *extra,
    ])


class TestTopkMask:
    def test_exact_counts_and_top_scores(self, key):
        from multimodal_sc_tpu.codec.semantic_vq import topk_mask

        scores = jax.random.normal(key, (5, 16))
        m = jnp.array([1, 4, 8, 16, 0], jnp.int32)
        mask = topk_mask(scores, m)
        counts = np.asarray(jnp.sum(mask, axis=1))
        np.testing.assert_array_equal(counts, np.asarray(m))
        # Every kept score >= every dropped score, per row.
        s = np.asarray(scores)
        k = np.asarray(mask)
        for r in range(5):
            if 0 < counts[r] < 16:
                assert s[r][k[r]].min() >= s[r][~k[r]].max()


class TestPrunedPipeline:
    def test_keep_one_matches_unpruned_semantics(self, key):
        """keep=1.0 transmits everything: recon equals the keep=None path
        bit-for-bit (same params, same keys)."""
        from multimodal_sc_tpu.train import jscc

        cfg = _cfg()
        state = jscc.create_train_state(cfg, key)
        model = jscc.build_model(cfg)
        img = jax.random.uniform(jax.random.key(1), (4, 32, 32, 3))
        snr = jnp.full((4,), 10.0)
        rec_full, aux_full = model.apply(
            {"params": state.params}, img, snr, jax.random.key(2))
        rec_k1, aux_k1 = model.apply(
            {"params": state.params}, img, snr, jax.random.key(2),
            keep=jnp.ones((4,)), select="random")
        np.testing.assert_array_equal(np.asarray(rec_full),
                                      np.asarray(rec_k1))
        assert float(aux_k1["token_keep_frac"]) == 1.0
        assert "token_keep_frac" not in aux_full

    def test_param_tree_has_mask_embed(self, key):
        from multimodal_sc_tpu.train import jscc

        state = jscc.create_train_state(_cfg(), key)
        assert "mask_embed" in state.params
        assert state.params["mask_embed"].shape == (16,)

    def test_keep_frac_metric_and_finite_recon(self, key):
        from multimodal_sc_tpu.train import jscc

        cfg = _cfg()
        state = jscc.create_train_state(cfg, key)
        model = jscc.build_model(cfg)
        img = jax.random.uniform(jax.random.key(1), (4, 32, 32, 3))
        snr = jnp.full((4,), 10.0)
        rec, aux = model.apply({"params": state.params}, img, snr,
                               jax.random.key(2),
                               keep=jnp.full((4,), 0.5), select="random")
        # ceil(0.5 * 64) = 32 of 64 tokens kept.
        assert abs(float(aux["token_keep_frac"]) - 0.5) < 1e-6
        assert bool(jnp.all(jnp.isfinite(rec)))

    def test_dropped_tokens_decode_as_mask_embed(self, key):
        """With keep -> 0 almost every position decodes from the mask
        embedding, so two DIFFERENT images reconstruct (nearly) the same:
        the receiver genuinely never sees the dropped tokens."""
        from multimodal_sc_tpu.train import jscc

        cfg = _cfg("channel.kind=ideal")
        state = jscc.create_train_state(cfg, key)
        model = jscc.build_model(cfg)
        snr = jnp.full((2,), 60.0)
        img_a = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3))
        img_b = jax.random.uniform(jax.random.key(5), (2, 32, 32, 3))
        keep = jnp.full((2,), 1.0 / 64.0)       # 1 of 64 tokens kept
        # Same selection key (fold_in(key, 88)) -> same kept POSITIONS
        # only if scores agree; use select="random" so scores depend on
        # the key alone, not the image.
        rec_a, _ = model.apply({"params": state.params}, img_a, snr,
                               jax.random.key(2), keep=keep,
                               select="random")
        rec_b, _ = model.apply({"params": state.params}, img_b, snr,
                               jax.random.key(2), keep=keep,
                               select="random")
        # 63/64 of code positions identical (mask embed), 1 differs: the
        # reconstructions are close but the full-keep ones are not.
        gap_pruned = float(jnp.mean(jnp.square(rec_a - rec_b)))
        full_a, _ = model.apply({"params": state.params}, img_a, snr,
                                jax.random.key(2))
        full_b, _ = model.apply({"params": state.params}, img_b, snr,
                                jax.random.key(2))
        gap_full = float(jnp.mean(jnp.square(full_a - full_b)))
        assert gap_pruned < 0.5 * gap_full, (gap_pruned, gap_full)

    def test_damage_selection_keeps_highest_damage_tokens(self, key):
        """select='damage' + keep=m/N keeps exactly the top-m tokens of
        token_damage (same fold-in key the pipeline uses)."""
        from multimodal_sc_tpu.codec.semantic_vq import topk_mask
        from multimodal_sc_tpu.train import jscc

        cfg = _cfg("channel.kind=ideal")
        state = jscc.create_train_state(cfg, key)
        model = jscc.build_model(cfg)
        img = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3))
        snr = jnp.full((2,), 60.0)
        call_key = jax.random.key(2)
        idx, _, _ = model.apply({"params": state.params}, img,
                                method="encode_tokens")
        damage = model.apply({"params": state.params}, idx,
                             jax.random.fold_in(call_key, 88),
                             method="token_damage")
        expected = topk_mask(damage, jnp.full((2,), 16, jnp.int32))
        # Ideal channel + keep: recon of the pipeline equals manually
        # masking codes with the expected kept set.
        rec, aux = model.apply({"params": state.params}, img, snr,
                               call_key, keep=jnp.full((2,), 0.25),
                               select="damage")
        # Build the reference reconstruction by hand.
        cb = state.params["codebook"]
        me = state.params["mask_embed"]
        z_ref = jnp.where(expected[..., None], cb[idx],
                          jnp.broadcast_to(me, cb[idx].shape))
        rec_ref = model.apply({"params": state.params}, z_ref,
                              method="codes_to_image")
        np.testing.assert_allclose(np.asarray(rec), np.asarray(rec_ref),
                                   atol=1e-6)
        assert abs(float(aux["token_keep_frac"]) - 0.25) < 1e-6

    @pytest.mark.slow
    def test_drop_damage_matches_exact_jacobian(self, key):
        """token_drop_damage's probe estimator converges to the exact
        ‖J_t (mask_embed − e_t)‖² computed column-by-column with jacrev
        on a tiny model (same oracle style as tests/unit/test_uep.py)."""
        from multimodal_sc_tpu.train import jscc

        cfg = _cfg("channel.uep_probes=64", "camera.image_hw=16,16",
                   "camera.vq_dim=8", "camera.features=4,8,8,8")
        state = jscc.create_train_state(cfg, key)
        model = jscc.build_model(cfg)
        img = jax.random.uniform(jax.random.key(1), (1, 16, 16, 3))
        idx, _, _ = model.apply({"params": state.params}, img,
                                method="encode_tokens")
        est = model.apply({"params": state.params}, idx, jax.random.key(7),
                          method="token_drop_damage")
        cb = state.params["codebook"]
        me = state.params["mask_embed"]

        def recon_flat(z):
            return model.apply({"params": state.params}, z,
                               method="codes_to_image").reshape(-1)

        z = cb[idx]
        jac = jax.jacrev(recon_flat)(z)            # (pix, 1, N, D)
        delta = me[None, None, :] - z              # (1, N, D)
        exact = jnp.sum(
            jnp.square(jnp.einsum("pbnd,bnd->pbn", jac, delta)), axis=0)
        np.testing.assert_allclose(np.asarray(est[0]), np.asarray(exact[0]),
                                   rtol=0.6, atol=1e-8)
        # Rank agreement where it matters: top-quarter overlap is high.
        n = exact.shape[1]
        top_e = set(np.argsort(-np.asarray(exact[0]))[: n // 4])
        top_m = set(np.argsort(-np.asarray(est[0]))[: n // 4])
        assert len(top_e & top_m) >= len(top_e) // 2

    def test_farthest_point_prefixes_are_spread(self):
        from multimodal_sc_tpu.codec.semantic_vq import farthest_point_order

        rank = farthest_point_order(8, 8)
        assert sorted(rank) == list(range(64))
        pos = np.stack(np.meshgrid(np.arange(8), np.arange(8),
                                   indexing="ij"), -1).reshape(-1, 2)
        # The 16-token prefix covers the grid: min pairwise distance >= 2
        # (a perfect 4x4 sublattice would give exactly 2... allow sqrt(2)
        # in case of boundary trades, but nothing adjacent).
        chosen = pos[rank < 16]
        d2 = np.sum((chosen[:, None] - chosen[None, :]) ** 2, axis=-1)
        np.fill_diagonal(d2, 1e9)
        assert d2.min() >= 2.0, d2.min()
        # Every row/col stratum of the 16-prefix is occupied.
        assert set(chosen[:, 0]) == set(range(8)) or \
            len(set(chosen[:, 0])) >= 6

    def test_scatter_and_combined_selects_run(self, key):
        from multimodal_sc_tpu.train import jscc

        cfg = _cfg()
        state = jscc.create_train_state(cfg, key)
        model = jscc.build_model(cfg)
        img = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3))
        snr = jnp.full((2,), 10.0)
        for sel in ("scatter", "drop_damage_scatter"):
            rec, aux = model.apply({"params": state.params}, img, snr,
                                   jax.random.key(2),
                                   keep=jnp.full((2,), 0.25), select=sel)
            assert bool(jnp.all(jnp.isfinite(rec))), sel
            assert abs(float(aux["token_keep_frac"]) - 0.25) < 1e-6

    def test_keep_without_prune_raises(self, key):
        from multimodal_sc_tpu.train import jscc

        cfg = msc.get_preset("c1").override_str([
            "camera.arch=vq", "camera.vq_codes=64", "camera.vq_dim=16",
            "camera.features=8,16,16,16", "train.batch_size=4",
        ])
        state = jscc.create_train_state(cfg, key)
        model = jscc.build_model(cfg)
        img = jax.random.uniform(jax.random.key(1), (4, 32, 32, 3))
        with pytest.raises(ValueError, match="vq_prune"):
            model.apply({"params": state.params}, img, jnp.full((4,), 10.0),
                        jax.random.key(2), keep=jnp.ones((4,)))

    def test_uep_with_prune_rejected(self, key):
        from multimodal_sc_tpu.train import jscc

        cfg = _cfg("channel.uep_alpha=0.5")
        with pytest.raises(ValueError, match="uep_alpha"):
            jscc.create_train_state(cfg, key)

    def test_prune_requires_vq_arch(self):
        with pytest.raises(ValueError, match="vq_prune requires"):
            msc.get_preset("c1").override_str(["camera.vq_prune=true"])


class TestPruneTraining:
    def test_train_step_emits_keep_metric(self, key):
        from multimodal_sc_tpu.train import jscc

        cfg = _cfg()
        state = jscc.create_train_state(cfg, key)
        model = jscc.build_model(cfg)
        step = jscc.make_train_step(cfg, model)
        img = jax.random.uniform(jax.random.key(1), (4, 32, 32, 3))
        state, m = step(state, img, None, jax.random.key(2))
        assert np.isfinite(float(m["loss"]))
        kf = float(m["token_keep_frac"])
        assert 0.25 <= kf <= 1.0                # vq_keep_min default
        # mask_embed receives gradient (dropped positions flow to it):
        # one more step changes it unless every example kept all tokens.
        me0 = np.asarray(state.params["mask_embed"]).copy()
        state, _ = step(state, img, None, jax.random.key(3))
        assert not np.array_equal(me0, np.asarray(state.params["mask_embed"]))

    def test_keep_sweep_evaluator(self, key):
        from multimodal_sc_tpu.evaluation import snr_sweep
        from multimodal_sc_tpu.train import jscc

        cfg = _cfg()
        state = jscc.create_train_state(cfg, key)
        img = jax.random.uniform(jax.random.key(1), (4, 32, 32, 3))
        curves = snr_sweep.sweep_camera_vq_keep(
            cfg, state.params, img, key, keeps=(0.25, 1.0),
            selects=("damage", "random"), batches_per_point=1)
        assert set(curves) == {"damage", "random"}
        for sel in curves:
            assert [p["keep"] for p in curves[sel]] == [0.25, 1.0]
            for p in curves[sel]:
                assert np.isfinite(p["psnr"]) and np.isfinite(p["ssim"])
        # keep=1.0 is selection-rule-independent (everything transmits);
        # the two compiled graphs differ only by XLA reassociation noise.
        assert abs(curves["damage"][1]["psnr"]
                   - curves["random"][1]["psnr"]) < 1e-4

    def test_keep_sweep_requires_prune(self, key):
        from multimodal_sc_tpu.evaluation import snr_sweep
        from multimodal_sc_tpu.train import jscc

        cfg = msc.get_preset("c1").override_str([
            "camera.arch=vq", "camera.vq_codes=64", "camera.vq_dim=16",
            "camera.features=8,16,16,16", "train.batch_size=4",
        ])
        state = jscc.create_train_state(cfg, key)
        img = jax.random.uniform(jax.random.key(1), (4, 32, 32, 3))
        with pytest.raises(ValueError, match="vq_prune"):
            snr_sweep.sweep_camera_vq_keep(cfg, state.params, img, key)
