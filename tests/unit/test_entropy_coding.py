"""Entropy-aware index transport (channel/entropy_coding.py, r5 —
VERDICT r4 item 6): Huffman optimality/roundtrip, in-graph encode/decode,
exact symbol accounting, re-alphabet snapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sc_tpu.channel.entropy_coding import (
    build_huffman,
    canonical_code,
    decode_table,
    decode_vlc,
    encode_vlc,
    entropy_bits,
    huffman_lengths,
    topk_remap,
    transmit_vlc,
)


class TestHuffman:
    def test_lengths_kraft_and_near_entropy(self):
        rng = np.random.default_rng(0)
        p = rng.dirichlet(np.full(32, 0.3))
        lens = huffman_lengths(p)
        # Kraft equality for a complete binary code.
        assert abs(np.sum(2.0 ** -lens.astype(np.float64)) - 1.0) < 1e-9
        mean_bits = float(np.sum(p * lens))
        h = entropy_bits(p)
        assert h <= mean_bits + 1e-9 <= h + 1.0 + 0.1  # Huffman bound

    def test_skewed_distribution_compresses(self):
        # The r4 regime: ~7 effective codes of 256 -> ~3 bits/token.
        p = np.full(256, 1e-6)
        p[:7] = 1.0 / 7
        p = p / p.sum()
        lens = huffman_lengths(p)
        mean_bits = float(np.sum(p * lens))
        assert mean_bits < 4.0          # vs the 8 fixed bits
        assert lens.max() <= 32         # P_FLOOR caps the tail

    def test_prefix_free(self):
        p = np.random.default_rng(1).dirichlet(np.full(16, 0.2))
        lens = huffman_lengths(p)
        codes = canonical_code(lens)
        words = ["".join(str(b) for b in codes[i][: lens[i]])
                 for i in range(16)]
        assert len(set(words)) == 16
        for i, w in enumerate(words):
            for j, v in enumerate(words):
                if i != j:
                    assert not v.startswith(w)

    def test_decode_table_roundtrips_every_symbol(self):
        p = np.random.default_rng(2).dirichlet(np.full(64, 0.1))
        lens = huffman_lengths(p)
        codes = canonical_code(lens)
        ch, emit = decode_table(lens, codes)
        for sym in range(64):
            node = 0
            for j in range(int(lens[sym])):
                node = ch[node, codes[sym, j]]
            assert emit[node] == sym


class TestInGraph:
    def _codec(self, k=16, seed=3):
        p = np.random.default_rng(seed).dirichlet(np.full(k, 0.25))
        return build_huffman(p)

    def test_encode_decode_roundtrip_clean(self, key):
        codec = self._codec()
        idx = jax.random.randint(key, (4, 24), 0, 16)
        bits, total = encode_vlc(codec, idx)
        # Exact accounting: total == sum of codeword lengths.
        lens = np.asarray(codec.code_len)[np.asarray(idx)]
        np.testing.assert_array_equal(np.asarray(total), lens.sum(axis=1))
        out = decode_vlc(codec, bits, total, 24)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(idx))

    def test_transmit_vlc_high_snr_exact_and_cheaper(self, key):
        # Skewed source: VLC must round-trip error-free at high SNR with
        # fewer symbols than the fixed-length link.
        p = np.full(16, 1e-6)
        p[:3] = [0.6, 0.3, 0.1]
        codec = build_huffman(p / p.sum())
        idx = jnp.asarray(
            np.random.default_rng(0).choice(3, size=(4, 64),
                                            p=[0.6, 0.3, 0.1]))
        snr = jnp.full((4,), 30.0)
        rx, info = transmit_vlc(codec, idx, snr, "awgn", key, 64)
        np.testing.assert_array_equal(np.asarray(rx), np.asarray(idx))
        assert float(info["symbols_per_item"]) < float(
            info["fixed_symbols_per_item"]) * 0.6

    def test_transmit_vlc_low_snr_desyncs(self, key):
        # The honest VLC failure mode: heavy bit errors corrupt the
        # stream badly (index error rate well above zero).
        codec = self._codec()
        idx = jax.random.randint(key, (4, 64), 0, 16)
        snr = jnp.full((4,), -5.0)
        rx, _ = transmit_vlc(codec, idx, snr, "awgn",
                             jax.random.fold_in(key, 1), 64)
        err = np.mean(np.asarray(rx) != np.asarray(idx))
        assert err > 0.2


class TestRealphabet:
    def test_topk_remap_snaps_to_nearest_kept(self, key):
        probs = np.zeros(16)
        probs[[2, 5, 7, 11]] = [0.4, 0.3, 0.2, 0.1]
        cb = jax.random.normal(key, (16, 4))
        kept, full_to_small, small_cb = topk_remap(probs, cb, 4)
        np.testing.assert_array_equal(np.asarray(kept), [2, 5, 7, 11])
        np.testing.assert_allclose(np.asarray(small_cb),
                                   np.asarray(cb)[[2, 5, 7, 11]])
        # Kept codes map to themselves; others to nearest kept in
        # codebook space.
        f2s = np.asarray(full_to_small)
        for i, kc in enumerate([2, 5, 7, 11]):
            assert f2s[kc] == i
        d2 = np.sum((np.asarray(cb)[:, None]
                     - np.asarray(cb)[[2, 5, 7, 11]][None]) ** 2, -1)
        np.testing.assert_array_equal(f2s, np.argmin(d2, axis=1))


@pytest.mark.slow
class TestEvaluator:
    def test_sweep_lidar_vq_entropy(self, key):
        import multimodal_sc_tpu as msc
        from multimodal_sc_tpu.codec.lidar_bev import semantic_bev_target
        from multimodal_sc_tpu.envs.datasets import (
            synthetic_pointcloud_batch,
        )
        from multimodal_sc_tpu.evaluation.snr_sweep import (
            sweep_lidar_vq_entropy,
        )
        from multimodal_sc_tpu.train import fusion_jscc

        cfg = msc.get_preset("c3").override_str([
            "lidar.arch=vq", "lidar.bev_hw=8,8", "lidar.pillar_dim=16",
            "lidar.vq_codes=16", "lidar.vq_dim=8", "lidar.max_points=64",
            "camera.image_hw=16,16", "camera.dim=32", "camera.depth=1",
            "camera.heads=2", "camera.patch=4", "train.batch_size=4",
        ])
        state = fusion_jscc.create_train_state(cfg, key)
        pts, mask, cls = synthetic_pointcloud_batch(
            key, 4, cfg.lidar.max_points, cfg.lidar.x_range,
            cfg.lidar.y_range, with_classes=True)
        target = semantic_bev_target(pts, mask, cls, cfg.lidar.bev_hw,
                                     cfg.lidar.x_range, cfg.lidar.y_range,
                                     num_classes=cfg.lidar.seg_classes)
        out = sweep_lidar_vq_entropy(
            cfg, state.params["lidar"], pts, mask, target, key,
            snrs_db=(0.0, 25.0), kinds=("awgn",), batches_per_point=1,
            keep_codes=4)
        cal = out["calibration"]
        assert cal["huffman_mean_bits_per_token"] <= 1e-9 + np.log2(16)
        rows = out["awgn"]
        hi = rows[-1]
        assert hi["syms_vlc"] <= hi["syms_full"] + 1e-6
        assert hi["syms_fixed"] == 8 * 8 * 2 / 2
        for name in ("miou_full", "miou_vlc", "miou_fixed"):
            assert 0.0 <= hi[name] <= 1.0


def test_host_decode_matches_in_graph(key):
    """decode_vlc_np (the evaluator's host-side receiver) is bit-identical
    to the in-graph automaton — including under channel errors."""
    from multimodal_sc_tpu.channel.entropy_coding import decode_vlc_np

    p = np.random.default_rng(7).dirichlet(np.full(16, 0.2))
    codec = build_huffman(p)
    idx = jax.random.randint(key, (4, 32), 0, 16)
    bits, total = encode_vlc(codec, idx)
    # Clean and corrupted streams.
    flip = jax.random.bernoulli(jax.random.fold_in(key, 1), 0.05,
                                bits.shape).astype(bits.dtype)
    for b in (bits, (bits + flip) % 2):
        a = decode_vlc(codec, b, total, 32)
        h = decode_vlc_np(codec, np.asarray(b), np.asarray(total), 32)
        np.testing.assert_array_equal(np.asarray(a), h)
