"""Fixed-seed golden-episode regression for the driving env (SURVEY §4.2).

Goldens are generated once (tests/data/env_golden.npz) and committed; any
change to env dynamics/sensors that shifts them is a deliberate,
reviewable event (regenerate with: python -m tests.unit.test_env_golden).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_sc_tpu.config.configs import EnvConfig
from multimodal_sc_tpu.envs import driving

CFG = EnvConfig(num_npcs=3, image_hw=(16, 16), lidar_rays=16, max_steps=32)
GOLDEN = os.path.join(os.path.dirname(__file__), "..", "data",
                      "env_golden.npz")


def _run_episode():
    s = driving.reset(CFG, jax.random.key(42))
    rewards, egos, img_sums = [], [], []
    for t in range(8):
        s, ts = driving.step(CFG, s, jnp.int32(t % 9))
        rewards.append(float(ts.reward))
        egos.append(np.asarray(s.ego))
        img_sums.append(float(ts.image.sum()))
    return (np.asarray(rewards), np.stack(egos), np.asarray(img_sums))


def test_episode_matches_golden():
    rewards, egos, img_sums = _run_episode()
    g = np.load(GOLDEN)
    np.testing.assert_allclose(rewards, g["rewards"], atol=1e-4)
    np.testing.assert_allclose(egos, g["egos"], atol=1e-4)
    np.testing.assert_allclose(img_sums, g["img_sums"], rtol=1e-4)


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    rewards, egos, img_sums = _run_episode()
    np.savez(GOLDEN, rewards=rewards, egos=egos, img_sums=img_sums)
    print(f"wrote {GOLDEN}")
