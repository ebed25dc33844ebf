"""n-step return window vs a naive Python oracle (SURVEY §4.2 style)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_sc_tpu.rl import nstep

GAMMA = 0.9


def _naive_nstep(rewards, dones, n, t):
    """Truncated n-step return anchored at step t (needs t+n-1 < T)."""
    r = 0.0
    for k in range(n):
        r += (GAMMA ** k) * rewards[t + k]
        if dones[t + k]:
            break
    done_any = any(dones[t:t + n])
    return r, done_any


def test_window_matches_naive_oracle(key):
    T, B, n = 12, 3, 3
    rewards = np.asarray(jax.random.normal(key, (T, B)))
    dones = np.asarray(
        jax.random.bernoulli(jax.random.fold_in(key, 1), 0.2, (T, B)))
    obs_ids = np.arange(T * B, dtype=np.int32).reshape(T, B)

    win = nstep.create({"id": jnp.zeros((B,), jnp.int32)}, n, B)
    emitted = []
    for t in range(T):
        win, oldest, big_r, done_any, valid = nstep.push(
            win, {"id": jnp.asarray(obs_ids[t])},
            jnp.asarray(rewards[t]), jnp.asarray(dones[t]), GAMMA)
        if bool(valid):
            emitted.append((t, np.asarray(oldest["id"]),
                            np.asarray(big_r), np.asarray(done_any)))

    # First emission happens at t = n-1 and anchors at t-n+1.
    assert emitted[0][0] == n - 1
    for t, ids, big_r, done_any in emitted:
        anchor = t - n + 1
        np.testing.assert_array_equal(ids, obs_ids[anchor])
        for b in range(B):
            r_ref, d_ref = _naive_nstep(rewards[:, b], dones[:, b], n, anchor)
            np.testing.assert_allclose(big_r[b], r_ref, rtol=1e-5,
                                       err_msg=f"t={t} b={b}")
            assert bool(done_any[b]) == d_ref


def test_n1_is_identity(key):
    B = 4
    win = nstep.create({"id": jnp.zeros((B,), jnp.int32)}, 1, B)
    r = jnp.arange(B, dtype=jnp.float32)
    d = jnp.array([False, True, False, False])
    win, oldest, big_r, done_any, valid = nstep.push(
        win, {"id": jnp.arange(B, dtype=jnp.int32)}, r, d, GAMMA)
    assert bool(valid)
    np.testing.assert_array_equal(np.asarray(big_r), np.asarray(r))
    np.testing.assert_array_equal(np.asarray(done_any), np.asarray(d))
    np.testing.assert_array_equal(np.asarray(oldest["id"]), np.arange(B))
