from pmf_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    shard_ratings,
    shard_eval_set,
    shard_state_rows,
    replicate,
    DATA_AXIS,
    MODEL_AXIS,
)
