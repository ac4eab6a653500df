from pmf_tpu.data.coo import RatingsCOO, EvalSet, build_ratings, build_eval_set
