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
]
