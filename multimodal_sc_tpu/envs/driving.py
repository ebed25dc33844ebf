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
  * Scene (v2, VERDICT r1 item 4): a CURVED multi-lane road defined by an
    analytic curvature profile kappa(s) (two random sinusoids per episode).
    The ego runs kinematic-bicycle dynamics in road (Frenet) coordinates
    (s along the road, d lateral, mu heading relative to the tangent) —
    closed-form, no path integrals, fully static. Driving straight leaves
    the road within a curve wavelength, so progress reward cannot be maxed
    without steering.
  * NPC traffic: NPCs follow the road, CHANGE LANES stochastically (smooth
    lateral slew to a target lane) and car-follow (brake behind a slower
    leader, including the ego), forcing overtakes/braking.
  * Collision is a heading-aware OBB-vs-OBB separating-axis test (the r1
    axis-aligned box ignored ego heading).
  * Camera obs: ego-centric top-down RGB; road curvature is rendered via
    the standard clothoid-style lane polynomial y_c(x) = -d - mu x +
    1/2 kappa x^2 + 1/6 kappa' x^3, so upcoming curves are VISIBLE to the
    agent (pure VPU math, no gathers).
  * LiDAR obs: fixed ray fan in the ego frame vs NPC collision circles.
  * Auto-reset on done inside ``step`` keeps scan shapes static.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

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
LANE_CHANGE_PROB = 0.012  # per NPC per step when settled in a lane
LAT_RATE = 1.5            # NPC lane-change lateral speed (m/s)
FOLLOW_GAP = 9.0          # car-following headway (m)
NPC_BRAKE = 3.0           # follower decel / cruise accel (m/s^2)

# Road curvature profile bounds: kappa(s) = a1 sin(w1 s + p1) + a2 sin(...).
CURV_A1 = (0.004, 0.014)          # primary amplitude (1/m): R ~ 70-250 m
CURV_LAM1 = (80.0, 160.0)         # primary wavelength (m)
CURV_A2 = (0.001, 0.005)          # secondary ripple
CURV_LAM2 = (30.0, 70.0)

STEERS = jnp.array([-0.25, 0.0, 0.25])
ACCELS = jnp.array([-4.0, 0.0, 3.0])


class EnvState(NamedTuple):
    ego: Array        # (4,) s, d, mu, v  (Frenet: arc pos, lateral, rel-heading)
    npcs: Array       # (N, 5) s, d, v, d_target, v_cruise
    road: Array       # (6,) a1, w1, p1, a2, w2, p2  curvature profile
    t: Array          # () int32 step counter
    key: Array        # PRNG key for respawns / lane changes / auto-reset
    fog: Array        # () f32 ego sensor visibility limit (m); <= 0 = clear.
    # A RUNTIME scalar (seeded from cfg.fog_range at reset, carried through
    # step/auto-reset) so every fog variant of a config shares ONE compiled
    # graph — r3's c4_fog arm spent 708 s of its 1210 s wall recompiling
    # because the fog range was a trace-time constant (VERDICT r3 item 5).


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


def curvature(road: Array, s: Array) -> Array:
    """Road curvature kappa(s) from the episode's analytic profile."""
    a1, w1, p1, a2, w2, p2 = (road[i] for i in range(6))
    return a1 * jnp.sin(w1 * s + p1) + a2 * jnp.sin(w2 * s + p2)


def curvature_rate(road: Array, s: Array) -> Array:
    """d kappa / d s (for the cubic lane-polynomial rendering term)."""
    a1, w1, p1, a2, w2, p2 = (road[i] for i in range(6))
    return a1 * w1 * jnp.cos(w1 * s + p1) + a2 * w2 * jnp.cos(w2 * s + p2)


def _sample_road(key: Array) -> Array:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    two_pi = 2.0 * jnp.pi
    a1 = jax.random.uniform(k1, (), minval=CURV_A1[0], maxval=CURV_A1[1])
    lam1 = jax.random.uniform(k2, (), minval=CURV_LAM1[0], maxval=CURV_LAM1[1])
    a2 = jax.random.uniform(k3, (), minval=CURV_A2[0], maxval=CURV_A2[1])
    lam2 = jax.random.uniform(jax.random.fold_in(k3, 1), (),
                              minval=CURV_LAM2[0], maxval=CURV_LAM2[1])
    p1 = jax.random.uniform(k4, (), minval=0.0, maxval=two_pi)
    p2 = jax.random.uniform(jax.random.fold_in(k4, 1), (),
                            minval=0.0, maxval=two_pi)
    return jnp.stack([a1, two_pi / lam1, p1, a2, two_pi / lam2, p2])


def reset(cfg: EnvConfig, key: Array, fog: Optional[Array] = None) -> EnvState:
    """``fog`` (runtime scalar) overrides ``cfg.fog_range``; ``step`` passes
    the live state's value through auto-reset so the compiled graph never
    bakes the fog range in."""
    k_road, k_lane, k_v, k_npc, k_state = jax.random.split(key, 5)
    lanes = _lane_centers(cfg)
    ego_lane = jax.random.randint(k_lane, (), 0, cfg.num_lanes)
    ego = jnp.array([0.0, 0.0, 0.0, 0.0], jnp.float32)
    ego = ego.at[1].set(lanes[ego_lane])
    ego = ego.at[3].set(jax.random.uniform(k_v, (), minval=3.0, maxval=8.0))

    ks, kl, kv = jax.random.split(k_npc, 3)
    n = cfg.num_npcs
    npc_s = jax.random.uniform(ks, (n,), minval=SPAWN_AHEAD_MIN,
                               maxval=SPAWN_AHEAD_MAX)
    npc_lane = jax.random.randint(kl, (n,), 0, cfg.num_lanes)
    npc_d = lanes[npc_lane]
    npc_v = jax.random.uniform(kv, (n,), minval=NPC_V_MIN, maxval=NPC_V_MAX)
    npcs = jnp.stack([npc_s, npc_d, npc_v, npc_d, npc_v], axis=-1)
    if fog is None:
        fog = jnp.float32(cfg.fog_range)
    return EnvState(ego=ego, npcs=npcs, road=_sample_road(k_road),
                    t=jnp.int32(0), key=k_state,
                    fog=jnp.asarray(fog, jnp.float32))


def _dynamics(cfg: EnvConfig, road: Array, ego: Array, steer: Array,
              accel: Array) -> Tuple[Array, Array]:
    """Frenet-frame bicycle step. Returns (new ego, s_dot) — s_dot is the
    road-aligned progress rate the reward pays for."""
    s, d, mu, v = ego[0], ego[1], ego[2], ego[3]
    kap = curvature(road, s)
    # Guard the Frenet singularity 1 - d*kappa -> 0 (never reached on-road:
    # |d| <= 6, |kappa| <= 0.02 -> factor >= 0.88).
    denom = jnp.maximum(1.0 - d * kap, 0.3)
    s_dot = v * jnp.cos(mu) / denom
    s = s + s_dot * cfg.dt
    d = d + v * jnp.sin(mu) * cfg.dt
    mu = mu + (v / WHEELBASE * jnp.tan(steer) - kap * s_dot) * cfg.dt
    mu = jnp.clip(mu, -1.0, 1.0)
    v = jnp.clip(v + accel * cfg.dt, 0.0, V_MAX)
    return jnp.stack([s, d, mu, v]), s_dot


def _advance_npcs(cfg: EnvConfig, npcs: Array, ego: Array, key: Array) -> Array:
    """Traffic model: car-following + stochastic lane changes + respawn.

    NPCs track the road exactly (their heading relative to the tangent is
    just the lane-change slew). Each NPC brakes behind a slower leader
    (nearest vehicle ahead within half a lane — NPC or the ego), otherwise
    relaxes to its cruise speed; settled NPCs start a lane change to an
    adjacent lane with prob LANE_CHANGE_PROB per step.
    """
    s, d, v, d_tgt, v_cruise = (npcs[:, i] for i in range(5))
    n = npcs.shape[0]
    k_chg, k_dir, k_sp = jax.random.split(key, 3)

    # --- car following (leader = nearest ahead in the same lane corridor).
    all_s = jnp.concatenate([s, ego[0:1]])
    all_d = jnp.concatenate([d, ego[1:2]])
    all_v = jnp.concatenate([v, ego[3:4]])
    gap = all_s[None, :] - s[:, None]                    # (n, n+1)
    same_lane = jnp.abs(all_d[None, :] - d[:, None]) < cfg.lane_width * 0.5
    ahead = (gap > 0.1) & same_lane
    gap_masked = jnp.where(ahead, gap, 1e6)
    leader = jnp.argmin(gap_masked, axis=1)              # (n,)
    leader_gap = jnp.take_along_axis(gap_masked, leader[:, None], 1)[:, 0]
    leader_v = all_v[leader]
    too_close = (leader_gap < FOLLOW_GAP) & (leader_v < v)
    dv = jnp.where(too_close, -NPC_BRAKE,
                   jnp.clip(v_cruise - v, -NPC_BRAKE, NPC_BRAKE))
    v = jnp.clip(v + dv * cfg.dt, 0.0, NPC_V_MAX)

    # --- lane changes: settled NPCs occasionally pick an adjacent lane.
    lanes = _lane_centers(cfg)
    settled = jnp.abs(d - d_tgt) < 0.05
    start = settled & (jax.random.uniform(k_chg, (n,)) < LANE_CHANGE_PROB)
    cur_lane = jnp.argmin(jnp.abs(d_tgt[:, None] - lanes[None, :]), axis=1)
    direction = jnp.where(jax.random.uniform(k_dir, (n,)) < 0.5, -1, 1)
    new_lane = jnp.clip(cur_lane + direction, 0, cfg.num_lanes - 1)
    d_tgt = jnp.where(start, lanes[new_lane], d_tgt)
    d = d + jnp.clip(d_tgt - d, -LAT_RATE * cfg.dt, LAT_RATE * cfg.dt)

    # --- advance along the road, respawn once far behind the ego.
    s = s + v * cfg.dt
    rel = s - ego[0]
    behind = rel < BEHIND_CUTOFF
    ks_, kl_, kv_ = jax.random.split(k_sp, 3)
    new_s = ego[0] + jax.random.uniform(ks_, (n,), minval=SPAWN_AHEAD_MIN,
                                        maxval=SPAWN_AHEAD_MAX)
    sp_lane = jax.random.randint(kl_, (n,), 0, cfg.num_lanes)
    new_d = lanes[sp_lane]
    new_v = jax.random.uniform(kv_, (n,), minval=NPC_V_MIN, maxval=NPC_V_MAX)
    s = jnp.where(behind, new_s, s)
    d = jnp.where(behind, new_d, d)
    v = jnp.where(behind, new_v, v)
    d_tgt = jnp.where(behind, new_d, d_tgt)
    v_cruise = jnp.where(behind, new_v, v_cruise)
    return jnp.stack([s, d, v, d_tgt, v_cruise], axis=-1)


def _npc_heading(npcs: Array) -> Array:
    """NPC heading relative to the road tangent (lane-change slew angle)."""
    lat_rate = jnp.clip(npcs[:, 3] - npcs[:, 1], -LAT_RATE, LAT_RATE)
    return jnp.arctan2(lat_rate, jnp.maximum(npcs[:, 2], 1.0))


def _collision(ego: Array, npcs: Array) -> Array:
    """Heading-aware OBB-vs-OBB separating-axis test in local road coords.

    Nearby geometry (|ds| < ~5 m) is metrically flat in Frenet coordinates,
    so the rectangles live in the (s, d) plane: ego at (0, 0) rotated by mu,
    NPCs at (ds, dd) rotated by their lane-change slew angle. Two OBBs
    overlap iff no separating axis exists among the 4 face normals.
    """
    mu = ego[2]
    ds = npcs[:, 0] - ego[0]                    # (N,)
    dd = npcs[:, 1] - ego[1]
    phi = _npc_heading(npcs)                    # (N,)

    def axes(theta):
        c, s_ = jnp.cos(theta), jnp.sin(theta)
        return jnp.stack([c, s_], -1), jnp.stack([-s_, c], -1)  # long, lat

    ea1, ea2 = axes(mu)                         # (2,) each
    na1, na2 = axes(phi)                        # (N, 2) each
    delta = jnp.stack([ds, dd], -1)             # (N, 2)

    def sep(axis, a1, a2, b1, b2):
        # axis (N,2); project half-extents of both boxes onto it.
        ra = (CAR_HALF_LEN * jnp.abs(jnp.sum(axis * a1, -1))
              + CAR_HALF_WID * jnp.abs(jnp.sum(axis * a2, -1)))
        rb = (CAR_HALF_LEN * jnp.abs(jnp.sum(axis * b1, -1))
              + CAR_HALF_WID * jnp.abs(jnp.sum(axis * b2, -1)))
        return jnp.abs(jnp.sum(delta * axis, -1)) > ra + rb

    e1 = jnp.broadcast_to(ea1, na1.shape)
    e2 = jnp.broadcast_to(ea2, na2.shape)
    separated = (sep(e1, e1, e2, na1, na2) | sep(e2, e1, e2, na1, na2)
                 | sep(na1, e1, e2, na1, na2) | sep(na2, e1, e2, na1, na2))
    return jnp.any(~separated)


# ---------------------------------------------------------------- sensors --

def _lane_poly(road: Array, ego: Array, x: Array) -> Array:
    """Ego-frame lateral position of the ROAD CENTERLINE at lookahead x.

    Standard clothoid lane model: y_c(x) = -d - mu*x + 1/2 kappa x^2 +
    1/6 kappa' x^3 (y left-positive). This is what makes curves visible in
    the rendered views and maps pixels to road-lateral offsets.
    """
    s, d, mu = ego[0], ego[1], ego[2]
    kap = curvature(road, s)
    kap_r = curvature_rate(road, s)
    return -d - mu * x + 0.5 * kap * x * x + (1.0 / 6.0) * kap_r * x ** 3


def _npc_ego_frame(road: Array, ego: Array, npcs: Array
                   ) -> Tuple[Array, Array]:
    """NPC centers in the ego frame (x ahead, y left), bending the road-
    relative gap by the same lane polynomial used for rendering."""
    ds = npcs[:, 0] - ego[0]
    x = ds * jnp.cos(ego[2])
    y = npcs[:, 1] + _lane_poly(road, ego, ds)
    return x, y


def render_camera(cfg: EnvConfig, state: EnvState) -> Array:
    """Ego-centric top-down RGB. View: x in [0, 48m] ahead, y in [-12, 12].

    The road band curves across the image according to the episode's
    curvature profile (lane polynomial); NPC boxes are drawn at their
    ego-frame positions with smooth edges (pure VPU, no gathers).
    """
    h, w = cfg.image_hw
    half_w = _road_half_width(cfg)
    xs = jnp.linspace(48.0, 0.0, h).reshape(h, 1)     # row 0 = farthest
    ys = jnp.linspace(-12.0, 12.0, w).reshape(1, w)   # y left-positive
    yc = _lane_poly(state.road, state.ego, xs)        # (h, 1) centerline
    lat = ys - yc                                     # road-lateral offset
    on_road = (jnp.abs(lat) <= half_w).astype(jnp.float32)
    img = 0.25 * on_road[..., None] * jnp.ones((h, w, 3))
    img = img + 0.55 * (1 - on_road[..., None]) * jnp.array([0.1, 0.35, 0.1])
    # Lane markings (white dashes) at lane boundaries, dashed by arc length.
    bounds = _lane_centers(cfg)[:-1] + cfg.lane_width / 2.0
    dist = jnp.min(jnp.abs(lat[..., None] - bounds.reshape(1, 1, -1)), axis=-1)
    world_s = xs + state.ego[0]
    dash = (jnp.mod(world_s, 4.0) < 2.0).astype(jnp.float32)
    marking = (dist < 0.3).astype(jnp.float32) * dash
    img = jnp.clip(img + marking[..., None] * 0.6, 0.0, 1.0)
    # NPC boxes (red) at ego-frame positions, smooth edges.
    nx, ny = _npc_ego_frame(state.road, state.ego, state.npcs)
    inx = jax.nn.sigmoid((CAR_HALF_LEN - jnp.abs(
        xs[..., None] - nx.reshape(1, 1, -1))) * 4.0)
    iny = jax.nn.sigmoid((CAR_HALF_WID - jnp.abs(
        ys[..., None] - ny.reshape(1, 1, -1))) * 4.0)
    npc_mask = jnp.clip(jnp.sum(inx * iny, axis=-1), 0.0, 1.0)
    img = img * (1 - npc_mask[..., None]) + npc_mask[..., None] * jnp.array(
        [0.85, 0.1, 0.1])
    # Ego marker (green) at the origin.
    ego_x = jax.nn.sigmoid((CAR_HALF_LEN - jnp.abs(xs - 0.0)) * 4.0)
    ego_y = jax.nn.sigmoid((CAR_HALF_WID - jnp.abs(ys - 0.0)) * 4.0)
    ego_mask = jnp.clip(ego_x * ego_y, 0.0, 1.0)
    img = img * (1 - ego_mask[..., None]) + ego_mask[..., None] * jnp.array(
        [0.1, 0.85, 0.1])
    img = _apply_fog(state.fog, img, jnp.broadcast_to(xs, (h, w)))
    return img.astype(jnp.float32)


FOG_COLOR = jnp.array([0.55, 0.55, 0.58])


def _apply_fog(fog: Array, img: Array, dist: Array) -> Array:
    """Blend pixels toward fog gray past the runtime ``fog`` range scalar
    (per-pixel distance map ``dist``, same (h, w) as the image). Smooth
    ~2 m edge so the boundary is VPU-friendly. ``fog <= 0`` = clear sky:
    the effective range snaps to 1e9 m, where the sigmoid saturates to
    exactly 1.0 in f32 and the blend is a bit-exact identity — so fogged
    and clear deployments share one compiled graph."""
    eff = jnp.where(fog > 0.0, fog, jnp.float32(1e9))
    vis = jax.nn.sigmoid((eff - dist) * 2.0)[..., None]
    return img * vis + FOG_COLOR * (1.0 - vis)


def render_camera_front(cfg: EnvConfig, state: EnvState) -> Array:
    """Perspective pinhole front camera at the ego (CARLA-style view).

    Camera at height 1.5 m looking along the ego heading; ground-plane
    intersection colors road/lanes/grass with the road band bent by the
    lane polynomial, NPC boxes projected as smooth billboards. Static
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
    lat = -u * depth2d / f                            # lateral, left-positive
    # Road-lateral offset of each ground pixel (lane polynomial).
    yc = _lane_poly(state.road, state.ego, depth2d)
    road_lat = lat - yc

    on_road = (jnp.abs(road_lat) <= half_w) & below
    grass = below & ~on_road
    sky = ~below

    img = (sky[..., None] * jnp.array([0.45, 0.62, 0.85])
           + grass[..., None] * jnp.array([0.12, 0.35, 0.12])
           + on_road[..., None] * jnp.array([0.25, 0.25, 0.27]))

    # Lane markings: distance to nearest boundary < 0.15 m, dashed by arc.
    bounds = _lane_centers(cfg)[:-1] + cfg.lane_width / 2.0
    dist = jnp.min(jnp.abs(road_lat[..., None] - bounds.reshape(1, 1, -1)),
                   axis=-1)
    dash = (jnp.mod(state.ego[0] + depth2d, 4.0) < 2.0)
    marking = (dist < 0.15) & dash & on_road
    img = jnp.where(marking[..., None], jnp.array([0.85, 0.85, 0.85]), img)

    # NPC billboards at ego-frame positions; nearer occlude.
    nx, ny = _npc_ego_frame(state.road, state.ego, state.npcs)
    visible = nx > 1.0
    xz = jnp.maximum(nx, 1.0)
    u_c = -f * ny / xz                                 # (N,)
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
    # Fog by ground-plane depth (sky pixels sit at the fog color too —
    # depth 1e6 — matching the real washed-out horizon).
    img = _apply_fog(state.fog, img, depth2d)
    return jnp.clip(img, 0.0, 1.0).astype(jnp.float32)


# Curb ray-march: samples per ray (static; ~2 m spacing to 50 m) and point
# attributes that let the pillar encoder tell curbs from vehicles.
_CURB_SAMPLES = 24
_CURB_Z = 0.15
_CURB_INTENSITY = 0.4
_NPC_Z = 0.5
_NPC_INTENSITY = 1.0


def _curb_distance(cfg: EnvConfig, state: EnvState, dx: Array, dy: Array
                   ) -> Array:
    """First road-boundary (curb) crossing along each ego-frame ray.

    The road edge in the ego frame is the curve |y - y_c(x)| = half_width
    with y_c the same clothoid lane polynomial the renderers use, so
    camera and LiDAR see the SAME curve geometry (VERDICT r2 item 5 — the
    point cloud now encodes upcoming curvature and lane position, not just
    NPC obstacles). Closed-form roots of the cubic are branch-heavy, so
    march M static samples per ray and linearly interpolate the first
    on-road -> off-road sign change — pure VPU math, static shapes.
    Returns t (R,) with LIDAR_MAX_RANGE+1 where a ray never leaves the
    road within range.
    """
    m = _CURB_SAMPLES
    ts = jnp.linspace(0.0, LIDAR_MAX_RANGE, m + 1)               # (M+1,)
    x = ts[None, :] * dx[:, None]                                # (R, M+1)
    y = ts[None, :] * dy[:, None]
    lat = y - _lane_poly(state.road, state.ego, x)
    off = jnp.abs(lat) - _road_half_width(cfg)                   # >0 off-road
    sample = jax.lax.broadcasted_iota(jnp.int32, off.shape, 1)
    # t=0 is the ego itself: on-road in every live episode; exclude it so a
    # (transient) off-road ego doesn't make every ray "hit" at t=0.
    crossed = (off > 0.0) & (sample > 0)
    # First-crossing extraction WITHOUT argmax/take gathers (gathers are
    # slow on the TPU VPU; one-hot mask + sum picks the exact elements):
    first = crossed & (jnp.cumsum(crossed, axis=1) == 1)         # one-hot
    hit = jnp.any(first, axis=1)
    i = jnp.sum(jnp.where(first, sample, 0), axis=1)             # (R,)
    off_hi = jnp.sum(jnp.where(first, off, 0.0), axis=1)
    prev = jnp.pad(first[:, 1:], ((0, 0), (0, 1)))               # one left
    off_lo = jnp.sum(jnp.where(prev, off, 0.0), axis=1)
    denom = off_hi - off_lo
    frac = jnp.clip(-off_lo / jnp.where(denom == 0.0, 1.0, denom), 0.0, 1.0)
    dt = ts[1] - ts[0]
    t_hit = (i.astype(jnp.float32) - 1.0 + frac) * dt
    return jnp.where(hit, t_hit, LIDAR_MAX_RANGE + 1.0)


def lidar_scan(cfg: EnvConfig, state: EnvState, rays: int = 0,
               max_range=0.0) -> Tuple[Array, Array]:
    """Fixed ray fan vs NPC circles + road boundaries (curbs).

    Returns (points (R,4), mask (R,)). Rays are cast in the EGO frame
    directly (x ahead, y left); NPC centers are mapped into the ego frame
    with the same bend as the renderers, so camera and LiDAR agree. Hits
    carry (z, intensity) = (0.5, 1.0) for vehicles and (0.15, 0.4) for
    curbs — separable channels for the pillar encoder. ``cfg.lidar_road``
    gates the curb returns (the pre-r3 NPC-only scan when off).

    ``rays`` overrides ``cfg.lidar_rays`` (the V2X RSU fan); ``max_range``
    > 0 drops returns beyond it (ego fog) — a RUNTIME scalar (Python float
    or traced array, ``state.fog`` from ``observe``), so fog on/off/range
    never changes the compiled graph.
    """
    r = rays or cfg.lidar_rays
    angles = jnp.linspace(-jnp.pi / 2, jnp.pi / 2, r)
    dx = jnp.cos(angles)          # (R,)
    dy = jnp.sin(angles)
    cx, cy = _npc_ego_frame(state.road, state.ego, state.npcs)   # (N,)
    # Ray-circle: t = b - sqrt(b^2 - c), b = d.c, c = |c|^2 - r^2
    b = dx[:, None] * cx[None, :] + dy[:, None] * cy[None, :]   # (R, N)
    c = (cx ** 2 + cy ** 2)[None, :] - NPC_RADIUS ** 2
    disc = b * b - c
    hit = (disc > 0) & (b > 0)
    t = b - jnp.sqrt(jnp.maximum(disc, 0.0))
    t = jnp.where(hit & (t > 0), t, LIDAR_MAX_RANGE + 1.0)
    t_npc = jnp.min(t, axis=1)                                   # (R,)
    if cfg.lidar_road:
        t_curb = _curb_distance(cfg, state, dx, dy)
        is_npc = t_npc <= t_curb
        t_min = jnp.where(is_npc, t_npc, t_curb)
        z = jnp.where(is_npc, _NPC_Z, _CURB_Z)
        inten = jnp.where(is_npc, _NPC_INTENSITY, _CURB_INTENSITY)
    else:
        t_min = t_npc
        z = jnp.full((r,), _NPC_Z)
        inten = jnp.ones((r,))
    mr = jnp.asarray(max_range, jnp.float32)
    reach = jnp.where(mr > 0.0, jnp.minimum(jnp.float32(LIDAR_MAX_RANGE), mr),
                      jnp.float32(LIDAR_MAX_RANGE))
    mask = t_min <= reach
    t_safe = jnp.where(mask, t_min, 0.0)
    pts = jnp.stack([t_safe * dx, t_safe * dy, z, inten],
                    axis=-1).astype(jnp.float32)
    pts = pts * mask[:, None]
    return pts, mask


def v2x_scan(cfg: EnvConfig, state: EnvState) -> Tuple[Array, Array]:
    """RSU cooperative-perception scan (``cfg.v2x_rays`` > 0).

    A roadside unit ``cfg.v2x_lookahead`` meters ahead of the ego (arc
    position, road center, facing along the road) runs the same ray-fan
    scan from ITS frame — the virtual EnvState reuses all the ego scan
    geometry. Points stay in the RSU frame (the RSU encodes locally and
    transmits tokens; the agent knows the static lookahead and learns the
    geometry through the fusion transformer's V2X modality embedding).
    Not fog-limited: the RSU mast sits above the fog layer."""
    rsu = jnp.stack([state.ego[0] + cfg.v2x_lookahead,
                     jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0)])
    virtual = state._replace(ego=rsu)
    return lidar_scan(cfg, virtual, rays=cfg.v2x_rays)


def observe(cfg: EnvConfig, state: EnvState) -> Tuple[Array, Array, Array]:
    if cfg.camera_mode == "front":
        img = render_camera_front(cfg, state)
    else:
        img = render_camera(cfg, state)
    pts, mask = lidar_scan(cfg, state, max_range=state.fog)
    if cfg.v2x_rays > 0:
        # RSU points appended after the ego rays: every downstream
        # consumer (replay, n-step window, obs carry, PPO rollouts) sees
        # one (lidar_rays + v2x_rays, 4) array; the perception trunk
        # splits at the static cfg.env.lidar_rays boundary.
        v_pts, v_mask = v2x_scan(cfg, state)
        pts = jnp.concatenate([pts, v_pts], axis=0)
        mask = jnp.concatenate([mask, v_mask], axis=0)
    return img, pts, mask


# ------------------------------------------------------------------- step --

def step(cfg: EnvConfig, state: EnvState, action: Array) -> Tuple[EnvState, TimeStep]:
    """One env step with auto-reset; action is an int in [0, 9)."""
    steers, accels = action_table()
    steer = steers[action]
    accel = accels[action]

    key, k_npc, k_reset = jax.random.split(state.key, 3)
    ego, s_dot = _dynamics(cfg, state.road, state.ego, steer, accel)
    npcs = _advance_npcs(cfg, state.npcs, ego, k_npc)

    # Road-aligned progress: pays for following the road, not for speed in
    # a straight line (driving straight through a curve exits the road).
    progress = s_dot * cfg.dt
    collided = _collision(ego, npcs)
    off_road = jnp.abs(ego[1]) > _road_half_width(cfg) - CAR_HALF_WID * 0.5
    lane_d = jnp.min(jnp.abs(ego[1] - _lane_centers(cfg)))
    reward = (
        progress
        - 10.0 * collided.astype(jnp.float32)
        - 5.0 * off_road.astype(jnp.float32)
        - 0.05 * lane_d
        - 0.05 * jnp.abs(ego[2])
    )

    t = state.t + 1
    done = collided | off_road | (t >= cfg.max_steps)

    next_state = EnvState(ego=ego, npcs=npcs, road=state.road, t=t, key=key,
                          fog=state.fog)
    fresh = reset(cfg, k_reset, fog=state.fog)
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
