from multimodal_sc_tpu.runtime.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    local_batch_size,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from multimodal_sc_tpu.runtime.prefetch import prefetch_to_device
from multimodal_sc_tpu.runtime.tp import apply_tp, tp_param_shardings
from multimodal_sc_tpu.runtime.cache import enable_compilation_cache
