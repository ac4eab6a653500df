from pmf_tpu.eval.metrics import (
    rmse,
    mae,
    macro_mae,
    gaussian_log_predictive_likelihood,
    poisson_log_predictive_likelihood,
    masked_rmse,
    masked_macro_mae,
)
from pmf_tpu.eval.recommend import (
    build_exclusion_index,
    exclusion_index_from_coo,
    recommend,
    recommend_sharded,
)
