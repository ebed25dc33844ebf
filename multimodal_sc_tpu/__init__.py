"""multimodal_sc_tpu — TPU-native semantic multimodal RL framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities named by
SongTao-110/Multimodal_SC ("Semantic-Aware Multi-Modal Reinforcement
Learning for Autonomous Driving"). The reference snapshot is a title-only
README (``/root/reference/README.md:1-2``); the capability contract is
BASELINE.json and the blueprint is SURVEY.md.

Public API (BASELINE.json:5): ``encode / channel / decode / act /
train_step``, re-exported here. ``encode``/``decode`` are codec methods
bound per model; the module-level helpers here dispatch through a model
apply-fn so the whole path stays inside one jitted graph.
"""

from multimodal_sc_tpu.version import __version__
from multimodal_sc_tpu.channel import (
    awgn,
    channel,
    ofdm,
    power_normalize,
    rayleigh,
    rician,
)
from multimodal_sc_tpu.config.configs import ExperimentConfig
from multimodal_sc_tpu.config.presets import PRESETS, get_preset
from multimodal_sc_tpu import api

__all__ = [
    "__version__",
    "awgn",
    "channel",
    "ofdm",
    "power_normalize",
    "rayleigh",
    "rician",
    "ExperimentConfig",
    "PRESETS",
    "get_preset",
    "api",
    "encode",
    "decode",
    "act",
    "make_train_step",
    "train_step",
]


def encode(model, params, obs, snr_db=None):
    """Encode an observation into channel symbols with the given codec."""
    return model.apply({"params": params}, obs, snr_db, method="encode")


def decode(model, params, z_hat, snr_db=None):
    """Decode (possibly noisy) channel symbols back to the signal domain."""
    return model.apply({"params": params}, z_hat, snr_db, method="decode")


def act(cfg, params, image, points, mask, key, **kw):
    """Select an action for a batch of observations (BASELINE.json:5 verb).

    Dispatches on cfg.rl.algo: DQN returns actions (int32 (B,), pass
    ``epsilon=`` for exploration); PPO returns (actions, logp, value).
    """
    if cfg.rl.algo == "ppo":
        from multimodal_sc_tpu.rl import ppo as _ppo

        return _ppo.act(cfg, params, image, points, mask, key, **kw)
    from multimodal_sc_tpu.rl import dqn as _dqn

    return _dqn.act(cfg, params, image, points, mask, key, **kw)


def make_train_step(cfg, *args, **kw):
    """The jitted train_step for cfg's task (BASELINE.json:5 verb).

    jscc: make_train_step(cfg, model) -> step(state, img, seg, key);
    jscc_fusion: step(state, img, pts, mask, cls, key) — cls is the
    per-point class array (semantic BEV target; pass zeros when
    lidar.seg_classes <= 1);
    dqn: the fused actor+learner iteration(state);
    ppo: the rollout+GAE+update train_step(state).
    """
    task = cfg.train.task
    if task == "jscc":
        from multimodal_sc_tpu.train import jscc as _jscc

        model = args[0] if args else _jscc.build_model(cfg)
        return _jscc.make_train_step(cfg, model)
    if task == "jscc_fusion":
        from multimodal_sc_tpu.train import fusion_jscc as _fj

        return _fj.make_train_step(cfg)
    if task == "dqn":
        from multimodal_sc_tpu.rl import dqn as _dqn

        return _dqn.make_iteration(cfg, **kw)
    if task == "ppo":
        from multimodal_sc_tpu.rl import ppo as _ppo

        return _ppo.make_train_step(cfg)
    raise ValueError(f"unknown task {task!r}")


def train_step(cfg, state, *args, **kw):
    """One optimization step: builds (and caches) the jitted step for cfg
    and applies it. Returns (new_state, metrics)."""
    step = _train_step_cache.get(cfg)
    if step is None:
        step = make_train_step(cfg)
        _train_step_cache[cfg] = step
    return step(state, *args, **kw)


_train_step_cache = {}
