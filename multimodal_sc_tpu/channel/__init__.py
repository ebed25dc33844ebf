from multimodal_sc_tpu.channel.modulation import (
    qam_levels,
    qam_modulate,
    symbol_error_rate,
)
from multimodal_sc_tpu.channel.layer import (
    CHANNEL_KINDS,
    awgn,
    channel,
    power_normalize,
    rayleigh,
    rician,
)

__all__ = [
    "CHANNEL_KINDS",
    "awgn",
    "channel",
    "power_normalize",
    "rayleigh",
    "rician",
    "qam_levels",
    "qam_modulate",
    "symbol_error_rate",
]
