from multimodal_sc_tpu.channel.modulation import (
    qam_levels,
    qam_modulate,
    symbol_error_rate,
)
from multimodal_sc_tpu.channel.layer import (
    CHANNEL_KINDS,
    awgn,
    channel,
    channel_kwargs,
    exp_power_delay_profile,
    ofdm,
    ofdm_freq_response,
    power_normalize,
    power_normalize_masked,
    rate_mask,
    rayleigh,
    rician,
)

__all__ = [
    "CHANNEL_KINDS",
    "awgn",
    "channel",
    "channel_kwargs",
    "exp_power_delay_profile",
    "ofdm",
    "ofdm_freq_response",
    "power_normalize",
    "power_normalize_masked",
    "rate_mask",
    "rayleigh",
    "rician",
    "qam_levels",
    "qam_modulate",
    "symbol_error_rate",
]
