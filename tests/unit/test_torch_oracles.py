"""PyTorch-CPU cross-check oracles (SURVEY.md §4.2).

The reference repo has no outputs to compare against (title-only README),
so the numerically delicate pieces are pinned to freshly-written torch
twins on shared weights. This is new oracle code, not ported reference code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_conv_prelu_matches_torch(key):
    """SAME 5x5 conv + bias + PReLU vs torch.nn.functional twins."""
    from multimodal_sc_tpu.kernels.conv_block import conv_prelu_reference

    kx, kw, kb, ka = jax.random.split(key, 4)
    x = np.asarray(jax.random.normal(kx, (2, 8, 8, 3)), np.float32)
    w = np.asarray(jax.random.normal(kw, (5, 5, 3, 8)) * 0.1, np.float32)
    b = np.asarray(jax.random.normal(kb, (8,)), np.float32)
    a = np.asarray(jax.random.uniform(ka, (8,)), np.float32)

    y_jax = conv_prelu_reference(jnp.asarray(x), jnp.asarray(w),
                                 jnp.asarray(b), jnp.asarray(a), stride=1)

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)          # NCHW
    wt = torch.from_numpy(w).permute(3, 2, 0, 1)          # OIHW
    yt = torch.nn.functional.conv2d(xt, wt, torch.from_numpy(b), padding=2)
    at = torch.from_numpy(a).view(1, -1, 1, 1)
    yt = torch.where(yt >= 0, yt, yt * at)
    yt = yt.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(y_jax), yt, atol=1e-5, rtol=1e-5)


def test_strided_conv_matches_torch(key):
    from multimodal_sc_tpu.kernels.conv_block import conv_prelu_reference

    kx, kw = jax.random.split(key)
    x = np.asarray(jax.random.normal(kx, (2, 8, 8, 4)), np.float32)
    w = np.asarray(jax.random.normal(kw, (5, 5, 4, 8)) * 0.1, np.float32)
    b = np.zeros((8,), np.float32)
    y_jax = conv_prelu_reference(jnp.asarray(x), jnp.asarray(w),
                                 jnp.asarray(b), None, stride=2)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    wt = torch.from_numpy(w).permute(3, 2, 0, 1)
    # XLA SAME stride-2 on even size pads (1 front, 2 back); torch has no
    # asymmetric padding in conv2d -> pad manually.
    xt = torch.nn.functional.pad(xt, (1, 2, 1, 2))
    yt = torch.nn.functional.conv2d(xt, wt, torch.from_numpy(b), stride=2)
    yt = yt.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(y_jax), yt, atol=1e-5, rtol=1e-5)


def test_attention_matches_torch(key):
    from multimodal_sc_tpu.kernels.attention import attention_reference

    kq, kk, kv = jax.random.split(key, 3)
    q = np.asarray(jax.random.normal(kq, (2, 4, 16, 32)), np.float32)
    k = np.asarray(jax.random.normal(kk, (2, 4, 24, 32)), np.float32)
    v = np.asarray(jax.random.normal(kv, (2, 4, 24, 32)), np.float32)

    y_jax = attention_reference(jnp.asarray(q), jnp.asarray(k),
                                jnp.asarray(v))
    yt = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
    ).numpy()
    np.testing.assert_allclose(np.asarray(y_jax), yt, atol=2e-5, rtol=2e-5)


def test_gae_matches_torch_style_reference(key):
    """GAE vs an independent torch implementation (different code path)."""
    from multimodal_sc_tpu.rl.gae import gae

    T, B = 10, 2
    k1, k2, k3 = jax.random.split(key, 3)
    r = np.asarray(jax.random.normal(k1, (T, B)), np.float32)
    v = np.asarray(jax.random.normal(k2, (T, B)), np.float32)
    d = np.asarray(jax.random.bernoulli(k3, 0.15, (T, B)), np.float32)
    lv = np.zeros((B,), np.float32)
    gamma, lam = 0.99, 0.95

    rt, vt, dt = (torch.from_numpy(a) for a in (r, v, d))
    adv_t = torch.zeros(T, B)
    gae_acc = torch.zeros(B)
    v_next = torch.from_numpy(lv)
    for t in reversed(range(T)):
        nonterm = 1.0 - dt[t]
        delta = rt[t] + gamma * v_next * nonterm - vt[t]
        gae_acc = delta + gamma * lam * nonterm * gae_acc
        adv_t[t] = gae_acc
        v_next = vt[t]

    adv_j, _ = gae(jnp.asarray(r), jnp.asarray(v), jnp.asarray(d),
                   jnp.asarray(lv), gamma, lam)
    np.testing.assert_allclose(np.asarray(adv_j), adv_t.numpy(), atol=1e-5)


def test_channel_noise_power_matches_torch_formula(key):
    """AWGN sigma from snr_db: torch-computed noise power expectation."""
    from multimodal_sc_tpu.channel import awgn, power_normalize

    z = power_normalize(jax.random.normal(key, (512, 256, 2)))
    snr_db = 7.0
    y = awgn(z, snr_db, jax.random.key(1))
    measured = float(jnp.mean(jnp.sum((y - z) ** 2, axis=-1)))
    expected = float(torch.tensor(10.0) ** (-snr_db / 10.0))
    assert abs(measured - expected) / expected < 0.05
