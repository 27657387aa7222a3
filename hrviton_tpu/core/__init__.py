from hrviton_tpu.core.mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding,
                                   init_distributed, make_mesh, replicated,
                                   shard_batch, shard_eval_batch)
from hrviton_tpu.core.precision import bf16_params, cast_floating, f32_params

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "batch_sharding", "init_distributed",
    "make_mesh", "replicated", "shard_batch", "shard_eval_batch",
    "bf16_params", "cast_floating", "f32_params",
]
