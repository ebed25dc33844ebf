from multimodal_sc_tpu.config.configs import (
    CameraCodecConfig,
    ChannelConfig,
    EnvConfig,
    ExperimentConfig,
    FusionConfig,
    LidarCodecConfig,
    MeshConfig,
    RLConfig,
    TrainConfig,
)
from multimodal_sc_tpu.config.presets import PRESETS, get_preset
