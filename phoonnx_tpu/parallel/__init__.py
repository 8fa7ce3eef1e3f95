"""Device mesh + sharding for multi-chip TPU training/serving."""

from phoonnx_tpu.parallel import multihost  # noqa: F401
from phoonnx_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    shard_params_tp,
    shard_train_state,
)
