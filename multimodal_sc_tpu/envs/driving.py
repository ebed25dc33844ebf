"""Pure-JAX vectorized driving environment (CARLA-style kinematics + sensors).

Spec: BASELINE.json:5 ("vmap-batched environment rollouts"), :10-11 (DQN /
closed-loop PPO driving agent, "CARLA-style env"). The reference names no
environment (``/root/reference/README.md:1-2`` only names the domain); real
CARLA cannot run inside an XLA graph, so this is the one subsystem designed
from scratch (SURVEY.md §2.2 "Vectorized driving environment").

Design rules (TPU-first):
  * Pure functions, explicit PRNG keys, static shapes everywhere: reset /
    step / observe are jit- and vmap-compatible, so a whole rollout is one
    ``lax.scan`` of ``env.step ∘ agent.act`` on device.
  * Scene: straight multi-lane road along +x; ego follows kinematic-bicycle
    dynamics; NPC vehicles hold lane/speed and respawn ahead when passed.
  * Camera obs: ego-centric top-down RGB rasterization of road, lane
    markings, NPC boxes (smooth box masks — no gather/scatter, pure VPU).
  * LiDAR obs: fixed ray fan, ray-circle intersection against NPCs ->
    (num_rays, 4) points + hit mask, matching the BEV pillar codec input.
  * Reward: forward progress - collision - off-road - lane-wobble.
  * Auto-reset on done inside ``step`` keeps scan shapes static.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from multimodal_sc_tpu.config.configs import EnvConfig

Array = jax.Array

# Vehicle geometry / dynamics constants.
WHEELBASE = 2.5
CAR_HALF_LEN = 2.2
CAR_HALF_WID = 0.9
V_MAX = 20.0
NPC_V_MIN, NPC_V_MAX = 4.0, 10.0
SPAWN_AHEAD_MIN, SPAWN_AHEAD_MAX = 10.0, 45.0
BEHIND_CUTOFF = -8.0
LIDAR_MAX_RANGE = 50.0
NPC_RADIUS = 1.6          # collision circle for ray casting

STEERS = jnp.array([-0.25, 0.0, 0.25])
ACCELS = jnp.array([-4.0, 0.0, 3.0])


class EnvState(NamedTuple):
    ego: Array        # (4,) x, y, heading, speed  (x is cumulative distance)
    npcs: Array       # (N, 4) x_rel_world, y, heading(=0), speed
    t: Array          # () int32 step counter
    key: Array        # PRNG key for respawns / auto-reset


class TimeStep(NamedTuple):
    image: Array      # (H, W, 3) float32 in [0, 1]
    points: Array     # (R, 4) x, y, z, intensity in EGO frame
    mask: Array       # (R,) bool valid-hit mask
    reward: Array     # () float32
    done: Array       # () bool
    info: dict


def _road_half_width(cfg: EnvConfig) -> float:
    return cfg.num_lanes * cfg.lane_width / 2.0


def _lane_centers(cfg: EnvConfig) -> Array:
    i = jnp.arange(cfg.num_lanes, dtype=jnp.float32)
    return (i - (cfg.num_lanes - 1) / 2.0) * cfg.lane_width


def action_table() -> Tuple[Array, Array]:
    """9 discrete actions = steer x accel grids (RLConfig.num_actions)."""
    s, a = jnp.meshgrid(STEERS, ACCELS, indexing="ij")
    return s.reshape(-1), a.reshape(-1)


def reset(cfg: EnvConfig, key: Array) -> EnvState:
    k_lane, k_v, k_npc, k_state = jax.random.split(key, 4)
    lanes = _lane_centers(cfg)
    ego_lane = jax.random.randint(k_lane, (), 0, cfg.num_lanes)
    ego = jnp.array([0.0, 0.0, 0.0, 0.0], jnp.float32)
    ego = ego.at[1].set(lanes[ego_lane])
    ego = ego.at[3].set(jax.random.uniform(k_v, (), minval=3.0, maxval=8.0))

    kx, kl, kv = jax.random.split(k_npc, 3)
    npc_x = jax.random.uniform(kx, (cfg.num_npcs,), minval=SPAWN_AHEAD_MIN,
                               maxval=SPAWN_AHEAD_MAX)
    npc_lane = jax.random.randint(kl, (cfg.num_npcs,), 0, cfg.num_lanes)
    npc_y = lanes[npc_lane]
    npc_v = jax.random.uniform(kv, (cfg.num_npcs,), minval=NPC_V_MIN,
                               maxval=NPC_V_MAX)
    npcs = jnp.stack([npc_x, npc_y, jnp.zeros_like(npc_x), npc_v], axis=-1)
    return EnvState(ego=ego, npcs=npcs, t=jnp.int32(0), key=k_state)


def _dynamics(cfg: EnvConfig, ego: Array, steer: Array, accel: Array) -> Array:
    x, y, psi, v = ego[0], ego[1], ego[2], ego[3]
    x = x + v * jnp.cos(psi) * cfg.dt
    y = y + v * jnp.sin(psi) * cfg.dt
    psi = psi + v / WHEELBASE * jnp.tan(steer) * cfg.dt
    psi = jnp.clip(psi, -0.6, 0.6)
    v = jnp.clip(v + accel * cfg.dt, 0.0, V_MAX)
    return jnp.stack([x, y, psi, v])


def _advance_npcs(cfg: EnvConfig, npcs: Array, ego: Array, key: Array) -> Array:
    """NPCs hold lane/speed; respawn ahead once far behind the ego."""
    x = npcs[:, 0] + npcs[:, 3] * cfg.dt
    rel = x - ego[0]
    behind = rel < BEHIND_CUTOFF
    kx, kl, kv = jax.random.split(key, 3)
    n = npcs.shape[0]
    new_x = ego[0] + jax.random.uniform(kx, (n,), minval=SPAWN_AHEAD_MIN,
                                        maxval=SPAWN_AHEAD_MAX)
    new_lane = jax.random.randint(kl, (n,), 0, cfg.num_lanes)
    new_y = _lane_centers(cfg)[new_lane]
    new_v = jax.random.uniform(kv, (n,), minval=NPC_V_MIN, maxval=NPC_V_MAX)
    x = jnp.where(behind, new_x, x)
    y = jnp.where(behind, new_y, npcs[:, 1])
    v = jnp.where(behind, new_v, npcs[:, 3])
    return jnp.stack([x, y, jnp.zeros_like(x), v], axis=-1)


def _collision(ego: Array, npcs: Array) -> Array:
    dx = jnp.abs(npcs[:, 0] - ego[0])
    dy = jnp.abs(npcs[:, 1] - ego[1])
    hit = (dx < 2 * CAR_HALF_LEN) & (dy < 2 * CAR_HALF_WID)
    return jnp.any(hit)


# ---------------------------------------------------------------- sensors --

def render_camera(cfg: EnvConfig, state: EnvState) -> Array:
    """Ego-centric top-down RGB. View: x in [0, 48m] ahead, y in [-12, 12]."""
    h, w = cfg.image_hw
    half_w = _road_half_width(cfg)
    # Pixel centers in ego-relative world coords (row 0 = farthest ahead).
    xs = jnp.linspace(48.0, 0.0, h).reshape(h, 1)
    ys = jnp.linspace(-12.0, 12.0, w).reshape(1, w)
    rel_y = ys - state.ego[1]          # lateral offset from ego
    # Road surface (dark gray) where |world y| <= half width.
    on_road = (jnp.abs(ys) <= half_w).astype(jnp.float32) * jnp.ones((h, 1))
    img = 0.25 * on_road[..., None] * jnp.ones((h, w, 3))
    img = img + 0.55 * (1 - on_road[..., None]) * jnp.array([0.1, 0.35, 0.1])
    # Lane markings (white dashes) at lane boundaries.
    bounds = _lane_centers(cfg)[:-1] + cfg.lane_width / 2.0
    dist = jnp.min(jnp.abs(ys[..., None] - bounds.reshape(1, 1, -1)), axis=-1)
    world_x = xs + state.ego[0]
    dash = (jnp.mod(world_x, 4.0) < 2.0).astype(jnp.float32)
    marking = ((dist < 0.3).astype(jnp.float32) * dash)
    img = jnp.clip(img + marking[..., None] * 0.6, 0.0, 1.0)
    # NPC boxes (red), smooth edges.
    rel_npc_x = state.npcs[:, 0] - state.ego[0]       # (N,)
    npc_y = state.npcs[:, 1]
    inx = jax.nn.sigmoid((CAR_HALF_LEN - jnp.abs(
        xs[..., None] - rel_npc_x.reshape(1, 1, -1))) * 4.0)
    iny = jax.nn.sigmoid((CAR_HALF_WID - jnp.abs(
        ys[..., None] - npc_y.reshape(1, 1, -1))) * 4.0)
    npc_mask = jnp.clip(jnp.sum(inx * iny, axis=-1), 0.0, 1.0)
    img = img * (1 - npc_mask[..., None]) + npc_mask[..., None] * jnp.array(
        [0.85, 0.1, 0.1])
    # Ego marker (green) at x=0, ego lateral position.
    ego_x = jax.nn.sigmoid((CAR_HALF_LEN - jnp.abs(xs - 0.0)) * 4.0)
    ego_y = jax.nn.sigmoid((CAR_HALF_WID - jnp.abs(rel_y - 0.0)) * 4.0)
    ego_mask = jnp.clip(ego_x * ego_y, 0.0, 1.0)
    img = img * (1 - ego_mask[..., None]) + ego_mask[..., None] * jnp.array(
        [0.1, 0.85, 0.1])
    return img.astype(jnp.float32)


def render_camera_front(cfg: EnvConfig, state: EnvState) -> Array:
    """Perspective pinhole front camera at the ego (CARLA-style view).

    Camera at height 1.5 m looking along +x (ego frame); ground-plane
    intersection colors road/lanes/grass, NPC boxes are projected and drawn
    as smooth billboards with nearer cars occluding the ground. Static
    shapes, pure VPU math — vmap/jit friendly.
    """
    h, w = cfg.image_hw
    f = 1.2                      # focal (normalized image plane)
    cam_h = 1.5
    half_w = _road_half_width(cfg)

    u = jnp.linspace(-1.0, 1.0, w).reshape(1, w)      # right positive
    v = jnp.linspace(1.0, -1.0, h).reshape(h, 1)      # top row = +1

    # Ground-plane intersection (pixels below the horizon v<0):
    below = v < -1e-3
    depth = jnp.where(below, f * cam_h / jnp.maximum(-v, 1e-3), 1e6)  # (h,1)
    depth2d = jnp.broadcast_to(depth, (h, w))
    lat = u * depth2d / f                              # lateral (left neg)
    world_y = state.ego[1] - lat                       # y left-positive
    world_x = state.ego[0] + depth2d

    on_road = (jnp.abs(world_y) <= half_w) & below
    grass = below & ~on_road
    sky = ~below

    img = (sky[..., None] * jnp.array([0.45, 0.62, 0.85])
           + grass[..., None] * jnp.array([0.12, 0.35, 0.12])
           + on_road[..., None] * jnp.array([0.25, 0.25, 0.27]))

    # Lane markings: distance to nearest boundary < 0.15 m, dashed by x.
    bounds = _lane_centers(cfg)[:-1] + cfg.lane_width / 2.0
    dist = jnp.min(jnp.abs(world_y[..., None] - bounds.reshape(1, 1, -1)),
                   axis=-1)
    dash = (jnp.mod(world_x, 4.0) < 2.0)
    marking = (dist < 0.15) & dash & on_road
    img = jnp.where(marking[..., None], jnp.array([0.85, 0.85, 0.85]), img)

    # NPC billboards: project rel (dx, dy) into (u, v); nearer occlude.
    rel_x = state.npcs[:, 0] - state.ego[0]            # (N,) forward
    rel_y = state.npcs[:, 1] - state.ego[1]            # left positive
    visible = rel_x > 1.0
    xz = jnp.maximum(rel_x, 1.0)
    u_c = -f * rel_y / xz                              # (N,)
    u_half = f * (2 * CAR_HALF_WID) / xz
    v_bot = -f * cam_h / xz
    v_top = -f * (cam_h - 1.6) / xz                    # car height 1.6 m
    inu = jax.nn.sigmoid(
        (u_half.reshape(1, 1, -1)
         - jnp.abs(u[..., None] - u_c.reshape(1, 1, -1))) * 40.0)
    inv_ = jax.nn.sigmoid((v[..., None] - v_bot.reshape(1, 1, -1)) * 40.0) \
        * jax.nn.sigmoid((v_top.reshape(1, 1, -1) - v[..., None]) * 40.0)
    npc_m = inu * inv_ * visible.reshape(1, 1, -1)
    # Nearest (largest on screen) wins: weight by 1/x.
    weight = npc_m * (1.0 / xz).reshape(1, 1, -1)
    total = jnp.clip(jnp.sum(npc_m, axis=-1), 0.0, 1.0)
    # Shade by distance: near cars brighter red.
    shade = jnp.sum(weight, axis=-1) / (jnp.sum(npc_m, axis=-1) + 1e-6)
    car_col = jnp.stack([0.6 + 8.0 * shade, 0.1 + 0.0 * shade,
                         0.1 + 0.0 * shade], axis=-1)
    img = img * (1 - total[..., None]) + jnp.clip(car_col, 0, 1) \
        * total[..., None]
    return jnp.clip(img, 0.0, 1.0).astype(jnp.float32)


def lidar_scan(cfg: EnvConfig, state: EnvState) -> Tuple[Array, Array]:
    """Fixed ray fan vs NPC circles. Returns (points (R,4), mask (R,)).

    Points are in the ego frame (x ahead, y left), z = 0.5, intensity 1.
    """
    r = cfg.lidar_rays
    angles = jnp.linspace(-jnp.pi / 2, jnp.pi / 2, r) + state.ego[2]
    dx = jnp.cos(angles)          # (R,)
    dy = jnp.sin(angles)
    # NPC centers relative to ego.
    cx = state.npcs[:, 0] - state.ego[0]     # (N,)
    cy = state.npcs[:, 1] - state.ego[1]
    # Ray-circle: t = b - sqrt(b^2 - c), b = d.c, c = |c|^2 - r^2
    b = dx[:, None] * cx[None, :] + dy[:, None] * cy[None, :]   # (R, N)
    c = (cx ** 2 + cy ** 2)[None, :] - NPC_RADIUS ** 2
    disc = b * b - c
    hit = (disc > 0) & (b > 0)
    t = b - jnp.sqrt(jnp.maximum(disc, 0.0))
    t = jnp.where(hit & (t > 0), t, LIDAR_MAX_RANGE + 1.0)
    t_min = jnp.min(t, axis=1)                                   # (R,)
    mask = t_min <= LIDAR_MAX_RANGE
    t_safe = jnp.where(mask, t_min, 0.0)
    # Back to ego frame (undo heading): hit point in world-rel, rotate -psi.
    px_w = t_safe * dx
    py_w = t_safe * dy
    cpsi, spsi = jnp.cos(-state.ego[2]), jnp.sin(-state.ego[2])
    px = px_w * cpsi - py_w * spsi
    py = px_w * spsi + py_w * cpsi
    pts = jnp.stack(
        [px, py, jnp.full((r,), 0.5), jnp.ones((r,))], axis=-1
    ).astype(jnp.float32)
    pts = pts * mask[:, None]
    return pts, mask


def observe(cfg: EnvConfig, state: EnvState) -> Tuple[Array, Array, Array]:
    if cfg.camera_mode == "front":
        img = render_camera_front(cfg, state)
    else:
        img = render_camera(cfg, state)
    pts, mask = lidar_scan(cfg, state)
    return img, pts, mask


# ------------------------------------------------------------------- step --

def step(cfg: EnvConfig, state: EnvState, action: Array) -> Tuple[EnvState, TimeStep]:
    """One env step with auto-reset; action is an int in [0, 9)."""
    steers, accels = action_table()
    steer = steers[action]
    accel = accels[action]

    key, k_npc, k_reset = jax.random.split(state.key, 3)
    ego = _dynamics(cfg, state.ego, steer, accel)
    npcs = _advance_npcs(cfg, state.npcs, ego, k_npc)

    progress = ego[3] * jnp.cos(ego[2]) * cfg.dt
    collided = _collision(ego, npcs)
    off_road = jnp.abs(ego[1]) > _road_half_width(cfg) - CAR_HALF_WID * 0.5
    lane_d = jnp.min(jnp.abs(ego[1] - _lane_centers(cfg)))
    reward = (
        progress
        - 10.0 * collided.astype(jnp.float32)
        - 5.0 * off_road.astype(jnp.float32)
        - 0.05 * lane_d
        - 0.01 * jnp.abs(ego[2])
    )

    t = state.t + 1
    done = collided | off_road | (t >= cfg.max_steps)

    next_state = EnvState(ego=ego, npcs=npcs, t=t, key=key)
    fresh = reset(cfg, k_reset)
    next_state = jax.tree_util.tree_map(
        lambda a, b: jnp.where(done, a, b), fresh, next_state)

    img, pts, mask = observe(cfg, next_state)
    ts = TimeStep(image=img, points=pts, mask=mask,
                  reward=reward.astype(jnp.float32), done=done,
                  info={"speed": ego[3], "progress": progress})
    return next_state, ts


def reset_batch(cfg: EnvConfig, key: Array, num_envs: int) -> EnvState:
    return jax.vmap(lambda k: reset(cfg, k))(jax.random.split(key, num_envs))


def step_batch(cfg: EnvConfig, states: EnvState, actions: Array):
    return jax.vmap(lambda s, a: step(cfg, s, a))(states, actions)


def observe_batch(cfg: EnvConfig, states: EnvState):
    return jax.vmap(lambda s: observe(cfg, s))(states)
