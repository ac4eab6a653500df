from pmf_tpu.parallel.mesh import (
    make_mesh,
    shard_ratings,
    shard_eval_set,
    shard_state_rows,
    replicate,
    DATA_AXIS,
)
