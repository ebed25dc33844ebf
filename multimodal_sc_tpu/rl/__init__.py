from multimodal_sc_tpu.rl import dqn, gae, perception, ppo, replay
from multimodal_sc_tpu.rl.gae import gae as compute_gae
from multimodal_sc_tpu.rl.perception import (
    ActorCritic,
    QNetwork,
    SemanticPerception,
)
