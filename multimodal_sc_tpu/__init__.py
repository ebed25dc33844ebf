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
    power_normalize,
    rayleigh,
)
from multimodal_sc_tpu.config.configs import ExperimentConfig
from multimodal_sc_tpu.config.presets import PRESETS, get_preset
from multimodal_sc_tpu import api

__all__ = [
    "__version__",
    "awgn",
    "channel",
    "power_normalize",
    "rayleigh",
    "ExperimentConfig",
    "PRESETS",
    "get_preset",
    "api",
    "encode",
    "decode",
    "act",
    "train_step",
]


def encode(model, params, obs, snr_db=None):
    """Encode an observation into channel symbols with the given codec."""
    return model.apply({"params": params}, obs, snr_db, method="encode")


def decode(model, params, z_hat, snr_db=None):
    """Decode (possibly noisy) channel symbols back to the signal domain."""
    return model.apply({"params": params}, z_hat, snr_db, method="decode")


def act(agent, params, obs, key, **kw):
    """Select an action with an RL agent (DQN/PPO). See rl subpackage."""
    return agent.act(params, obs, key, **kw)


def train_step(trainer_state, *args, **kw):
    """One jitted optimization step; dispatches on the bound trainer.

    Each task driver (train.jscc / rl.dqn / rl.ppo) exposes a
    ``make_train_step(cfg, ...)`` factory returning the jitted step; this
    top-level verb forwards to a step already bound on the state object.
    """
    return trainer_state.train_step(trainer_state, *args, **kw)
