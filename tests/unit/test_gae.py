"""GAE vs naive O(T^2) Python oracle (SURVEY.md §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_sc_tpu.rl.gae import gae


def naive_gae(rewards, values, dones, last_value, gamma, lam):
    """O(T^2) reference: direct sum of discounted deltas per timestep."""
    T, B = rewards.shape
    v_next = np.concatenate([values[1:], last_value[None]], axis=0)
    nonterm = 1.0 - dones
    deltas = rewards + gamma * v_next * nonterm - values
    adv = np.zeros_like(rewards)
    for t in range(T):
        coef = np.ones(B)
        for k in range(t, T):
            adv[t] += coef * deltas[k]
            coef = coef * gamma * lam * nonterm[k]
    return adv, adv + values


def test_gae_matches_naive_oracle(key):
    T, B = 12, 3
    k1, k2, k3, k4 = jax.random.split(key, 4)
    rewards = np.asarray(jax.random.normal(k1, (T, B)))
    values = np.asarray(jax.random.normal(k2, (T, B)))
    dones = np.asarray(
        jax.random.bernoulli(k3, 0.2, (T, B))).astype(np.float32)
    last_value = np.asarray(jax.random.normal(k4, (B,)))

    adv_j, ret_j = gae(jnp.asarray(rewards), jnp.asarray(values),
                       jnp.asarray(dones), jnp.asarray(last_value),
                       gamma=0.99, lam=0.95)
    adv_n, ret_n = naive_gae(rewards, values, dones, last_value, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(adv_j), adv_n, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ret_j), ret_n, atol=1e-4)


def test_gae_no_dones_geometric():
    """Constant reward, zero values: adv_t = sum_k (gamma*lam)^k * r."""
    T, B = 8, 1
    gamma, lam = 0.9, 0.8
    rewards = jnp.ones((T, B))
    values = jnp.zeros((T, B))
    dones = jnp.zeros((T, B))
    adv, _ = gae(rewards, values, dones, jnp.zeros((B,)), gamma, lam)
    g = gamma * lam
    expected = [(1 - g ** (T - t)) / (1 - g) for t in range(T)]
    np.testing.assert_allclose(np.asarray(adv[:, 0]), expected, rtol=1e-5)


def test_gae_cuts_at_done():
    """A done at t isolates advantages before/after the boundary."""
    T, B = 4, 1
    rewards = jnp.array([[1.0], [1.0], [1.0], [1.0]])
    values = jnp.zeros((T, B))
    dones = jnp.array([[0.0], [1.0], [0.0], [0.0]])
    adv, _ = gae(rewards, values, dones, jnp.zeros((B,)), 1.0, 1.0)
    # t=1 ends an episode: adv_1 = 1; adv_0 = 1 + adv_1 = 2
    np.testing.assert_allclose(np.asarray(adv[:, 0]), [2.0, 1.0, 2.0, 1.0])


def test_entropy_coef_schedule():
    """Constant when entropy_coef_final < 0; linear anneal otherwise."""
    import jax.numpy as jnp

    from multimodal_sc_tpu.config.presets import get_preset
    from multimodal_sc_tpu.rl.ppo import _entropy_coef

    import numpy as np

    cfg = get_preset("c5").override_str(["train.steps=101"])
    for u in (0, 100):
        np.testing.assert_allclose(float(_entropy_coef(cfg, jnp.int32(u))),
                                    cfg.rl.entropy_coef, rtol=1e-6)

    cfg = cfg.override_str(["rl.entropy_coef_final=0.001"])
    np.testing.assert_allclose(float(_entropy_coef(cfg, jnp.int32(0))), 0.01,
                               rtol=1e-6)
    np.testing.assert_allclose(float(_entropy_coef(cfg, jnp.int32(50))),
                               0.0055, rtol=1e-5)
    np.testing.assert_allclose(float(_entropy_coef(cfg, jnp.int32(100))),
                               0.001, rtol=1e-5)
    # Clipped past the end (resume beyond train.steps).
    np.testing.assert_allclose(float(_entropy_coef(cfg, jnp.int32(500))),
                               0.001, rtol=1e-5)
