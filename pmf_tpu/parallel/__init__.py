from pmf_tpu.parallel.mesh import (
    make_mesh,
    shard_ratings,
    shard_eval_set,
    replicate,
    DATA_AXIS,
)
