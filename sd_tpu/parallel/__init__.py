from sd_tpu.parallel.mesh import (
    make_mesh,
    replicated,
    shard_batch,
    infer_param_sharding,
    TP_RULES_UNET,
    make_parallel_train_step,
    zero_state_sharding,
    fsdp_state_sharding,
    gan_state_sharding,
)
from sd_tpu.parallel import multihost
