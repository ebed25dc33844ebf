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
    rewards, egos, img_sums, pts_sums, hit_counts = [], [], [], [], []
    for t in range(8):
        s, ts = driving.step(CFG, s, jnp.int32(t % 9))
        rewards.append(float(ts.reward))
        egos.append(np.asarray(s.ego))
        img_sums.append(float(ts.image.sum()))
        pts_sums.append(float(ts.points.sum()))
        hit_counts.append(int(ts.mask.sum()))
    return (np.asarray(rewards), np.stack(egos), np.asarray(img_sums),
            np.asarray(pts_sums), np.asarray(hit_counts))


def test_episode_matches_golden():
    rewards, egos, img_sums, pts_sums, hit_counts = _run_episode()
    g = np.load(GOLDEN)
    np.testing.assert_allclose(rewards, g["rewards"], atol=1e-4)
    np.testing.assert_allclose(egos, g["egos"], atol=1e-4)
    np.testing.assert_allclose(img_sums, g["img_sums"], rtol=1e-4)
    # r3: LiDAR covered too (curb returns, VERDICT r2 item 5).
    np.testing.assert_allclose(pts_sums, g["pts_sums"], rtol=1e-4)
    np.testing.assert_array_equal(hit_counts, g["hit_counts"])


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    rewards, egos, img_sums, pts_sums, hit_counts = _run_episode()
    np.savez(GOLDEN, rewards=rewards, egos=egos, img_sums=img_sums,
             pts_sums=pts_sums, hit_counts=hit_counts)
    print(f"wrote {GOLDEN}")
