"""Fog sensor degradation + V2X cooperative perception (envs/driving.py
v2x_scan, rl/perception.py V2X branch): scan geometry, observation
plumbing, trunk params, and a full DQN iteration smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import multimodal_sc_tpu as msc
from multimodal_sc_tpu.envs import driving


def _env_cfg(**kw):
    cfg = msc.get_preset("c4")
    return cfg.override(**{f"env.{k}": v for k, v in kw.items()}).env


def _state_with_npc_ahead(cfg, dist):
    """Ego at s=0 straight road, one NPC dead ahead at arc distance."""
    state = driving.reset(cfg, jax.random.key(0))
    road = jnp.zeros((6,))                       # straight road
    ego = jnp.array([0.0, 0.0, 0.0, 5.0])
    npcs = jnp.zeros_like(state.npcs)
    npcs = npcs.at[:, 0].set(1e5)                # park the others far away
    npcs = npcs.at[0].set(jnp.array([dist, 0.0, 5.0, 0.0, 5.0]))
    return state._replace(ego=ego, npcs=npcs, road=road)


class TestFog:
    def test_lidar_drops_returns_beyond_fog(self):
        cfg = _env_cfg(fog_range=20.0, lidar_road=False)
        near = _state_with_npc_ahead(cfg, 12.0)
        far = _state_with_npc_ahead(cfg, 35.0)
        _, m_near = driving.lidar_scan(cfg, near, max_range=cfg.fog_range)
        _, m_far = driving.lidar_scan(cfg, far, max_range=cfg.fog_range)
        assert bool(jnp.any(m_near))             # 12 - 1.6 ~ 10.4 m: seen
        assert not bool(jnp.any(m_far))          # 33.4 m: beyond the fog
        # Clear sky sees the far one.
        _, m_clear = driving.lidar_scan(cfg, far)
        assert bool(jnp.any(m_clear))

    def test_camera_fades_to_fog_color(self):
        cfg = _env_cfg(fog_range=20.0)
        state = _state_with_npc_ahead(cfg, 35.0)
        img = driving.render_camera(cfg, state)
        # Top rows look 48 m ahead -> fog gray; bottom rows (~0 m) don't.
        top = np.asarray(img[0])                 # farthest row
        np.testing.assert_allclose(
            top, np.broadcast_to(np.asarray(driving.FOG_COLOR), top.shape),
            atol=1e-3)
        bottom = np.asarray(img[-1])
        assert np.abs(bottom - np.asarray(driving.FOG_COLOR)).max() > 0.15
        # Fog off: unchanged rendering far ahead (not gray). Fog is a
        # RUNTIME scalar carried in the state (EnvState.fog), so clearing
        # it is a state edit, not a re-trace.
        clear = driving.render_camera(
            cfg, state._replace(fog=jnp.float32(0.0)))
        assert np.abs(np.asarray(clear[0])
                      - np.asarray(driving.FOG_COLOR)).max() > 0.1

    def test_front_camera_fog(self):
        cfg = _env_cfg(fog_range=20.0, camera_mode="front")
        state = _state_with_npc_ahead(cfg, 35.0)
        img = driving.render_camera_front(cfg, state)
        # Sky (top row, depth 1e6) sits at the fog color.
        top = np.asarray(img[0])
        np.testing.assert_allclose(
            top, np.broadcast_to(np.asarray(driving.FOG_COLOR), top.shape),
            atol=1e-3)

    def test_fog_is_runtime_not_retraced(self):
        """Fog on/off/range changes reuse ONE compiled graph (VERDICT r3
        item 5: the c4_fog arm burned 708 s recompiling because fog was a
        trace-time constant)."""
        cfg = _env_cfg()
        state = _state_with_npc_ahead(cfg, 15.0)
        # Count TRACES (the Python body runs once per trace) rather than
        # poking jit-cache internals, which vary with the persistent
        # compilation cache the suite conftest enables.
        traces = []

        @jax.jit
        def render(s):
            traces.append(1)
            return driving.render_camera(cfg, s)

        clear = render(state)
        foggy = render(state._replace(fog=jnp.float32(10.0)))
        assert len(traces) == 1
        assert np.abs(np.asarray(clear) - np.asarray(foggy)).max() > 0.05

        scans = []

        @jax.jit
        def scan(s):
            scans.append(1)
            return driving.lidar_scan(cfg, s, max_range=s.fog)

        _, m_clear = scan(state)
        _, m_fog = scan(state._replace(fog=jnp.float32(5.0)))
        assert len(scans) == 1
        assert int(jnp.sum(m_clear)) > int(jnp.sum(m_fog))

    def test_fog_zero_is_identity(self):
        cfg = _env_cfg()
        state = _state_with_npc_ahead(cfg, 15.0)
        img = driving.render_camera(cfg, state)
        pts, mask = driving.lidar_scan(cfg, state)
        cfg0 = _env_cfg(fog_range=0.0)
        np.testing.assert_array_equal(
            np.asarray(img), np.asarray(driving.render_camera(cfg0, state)))
        p0, m0 = driving.lidar_scan(cfg0, state, max_range=cfg0.fog_range)
        np.testing.assert_array_equal(np.asarray(pts), np.asarray(p0))
        np.testing.assert_array_equal(np.asarray(mask), np.asarray(m0))


class TestV2XScan:
    def test_rsu_sees_what_fog_hides(self):
        """NPC beyond the ego's fog range but near the RSU: invisible to
        the ego scan, a vehicle return in the RSU scan at the RSU-frame
        distance."""
        cfg = _env_cfg(fog_range=20.0, v2x_rays=32, v2x_lookahead=24.0,
                       lidar_road=False)
        state = _state_with_npc_ahead(cfg, 34.0)  # 10 m ahead of the RSU
        img, pts, mask = driving.observe(cfg, state)
        r = cfg.lidar_rays
        assert pts.shape == (r + 32, 4) and mask.shape == (r + 32,)
        ego_part, v2x_part = mask[:r], mask[r:]
        assert not bool(jnp.any(ego_part))        # fog hides it
        assert bool(jnp.any(v2x_part))            # RSU sees it
        hit = np.asarray(pts[r:][np.asarray(v2x_part)])
        d = np.sqrt(hit[:, 0] ** 2 + hit[:, 1] ** 2)
        # Ray-circle first hit: 10 - NPC_RADIUS = 8.4 m in the RSU frame.
        assert abs(d.min() - 8.4) < 0.5, d
        np.testing.assert_allclose(hit[:, 2], 0.5)   # vehicle z channel

    def test_v2x_scan_has_curbs(self):
        cfg = _env_cfg(v2x_rays=32, lidar_road=True)
        state = _state_with_npc_ahead(cfg, 1e5)      # no NPC nearby
        pts, mask = driving.v2x_scan(cfg, state)
        hit = np.asarray(pts[np.asarray(mask)])
        assert hit.shape[0] > 0                      # curb returns exist
        np.testing.assert_allclose(hit[:, 2], 0.15)  # curb z channel

    def test_default_off_shapes_unchanged(self):
        cfg = _env_cfg()
        state = driving.reset(cfg, jax.random.key(0))
        img, pts, mask = driving.observe(cfg, state)
        assert pts.shape == (cfg.lidar_rays, 4)

    def test_config_validation(self):
        with pytest.raises(ValueError, match="fog_range"):
            _env_cfg(fog_range=-1.0)
        with pytest.raises(ValueError, match="v2x_rays"):
            _env_cfg(v2x_rays=-2)


def _tiny_c4(*extra):
    return msc.get_preset("c4").override_str([
        "camera.features=8,16,16,16", "camera.c_sym=2",
        "camera.image_hw=16,16", "env.image_hw=16,16",
        "lidar.pillar_dim=16", "lidar.c_sym=2", "lidar.bev_hw=8,8",
        "fusion.dim=32", "fusion.depth=1", "fusion.heads=2",
        "fusion.state_dim=32", "env.num_npcs=2", "env.lidar_rays=16",
        "rl.replay_capacity=64", "rl.batch_size=4",
        "rl.target_update_period=2", *extra,
    ])


class TestV2XTrunk:
    def test_param_tree_gains_only_the_embed(self, key):
        from multimodal_sc_tpu.rl import dqn as dqn_lib

        base = dqn_lib.init_params(_tiny_c4(), key)
        v2x = dqn_lib.init_params(
            _tiny_c4("env.fog_range=10", "env.v2x_rays=16"), key)
        flat_b = {"/".join(map(str, p)) for p, _ in
                  jax.tree_util.tree_flatten_with_path(base)[0]}
        flat_v = {"/".join(map(str, p)) for p, _ in
                  jax.tree_util.tree_flatten_with_path(v2x)[0]}
        extra = flat_v - flat_b
        assert len(extra) == 1 and "v2x_embed" in next(iter(extra))
        assert flat_b - flat_v == set()

    def test_act_and_iteration_with_v2x(self, key):
        from multimodal_sc_tpu.rl import dqn as dqn_lib

        cfg = _tiny_c4("env.fog_range=10", "env.v2x_rays=16")
        state = dqn_lib.init(cfg, key, num_envs=4)
        it = dqn_lib.make_iteration(cfg, learn=True)
        for _ in range(6):                       # past replay warmup
            state, m = it(state)
        assert int(state.step) >= 1              # learner ran
        assert all(np.isfinite(float(v)) for v in
                   jax.tree_util.tree_leaves(m))

    def test_ppo_update_with_v2x(self, key):
        """The PPO driver shares SemanticPerception; one full update with
        fog+V2X on tiny shapes must run with finite metrics."""
        from multimodal_sc_tpu.rl import ppo as ppo_lib

        cfg = _tiny_c4(
            "env.fog_range=10", "env.v2x_rays=16", "rl.algo=ppo",
            "train.task=ppo", "rl.rollout_length=4", "rl.num_envs=4",
            "rl.num_minibatches=2", "rl.ppo_epochs=1")
        state = ppo_lib.init(cfg, key)
        step = ppo_lib.make_train_step(cfg)
        state, metrics = step(state)
        assert all(np.isfinite(float(v)) for v in
                   jax.tree_util.tree_leaves(metrics))

    def test_v2x_snr_offset_changes_only_the_v2x_link(self, key):
        """With a huge negative offset the V2X tokens turn to noise: the
        Q-values move vs offset 0; with v2x off the offset is inert."""
        from multimodal_sc_tpu.rl import dqn as dqn_lib
        from multimodal_sc_tpu.rl.perception import QNetwork

        cfg = _tiny_c4("env.fog_range=10", "env.v2x_rays=16",
                       "channel.kind=awgn")
        params = dqn_lib.init_params(cfg, key)
        env_states = driving.reset_batch(cfg.env, jax.random.key(1), 2)
        img, pts, mask = driving.observe_batch(cfg.env, env_states)
        q0 = QNetwork(cfg).apply({"params": params}, img, pts, mask,
                                 jax.random.key(2))
        cfg_bad = cfg.override_str(["channel.v2x_snr_offset_db=-40"])
        q_bad = QNetwork(cfg_bad).apply({"params": params}, img, pts, mask,
                                        jax.random.key(2))
        assert np.abs(np.asarray(q0) - np.asarray(q_bad)).max() > 1e-6
