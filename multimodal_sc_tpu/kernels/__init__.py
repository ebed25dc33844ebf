from multimodal_sc_tpu.kernels.attention import (
    attention,
    attention_reference,
    flash_attention,
)
from multimodal_sc_tpu.kernels.conv_block import (
    FusedConvPReLU,
    conv_prelu,
    conv_prelu_reference,
)
from multimodal_sc_tpu.kernels.pillar_scatter import (
    scatter_max,
    scatter_max_pallas,
    scatter_max_reference,
)
from multimodal_sc_tpu.kernels.ring_attention import (
    ring_attention,
    shard_sequence,
    ulysses_attention,
)
