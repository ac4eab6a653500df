from pmf_tpu.tune.multi_seed import multi_seed_fit
