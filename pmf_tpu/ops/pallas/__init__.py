from pmf_tpu.ops.pallas.cavi_edge import poisson_edge_stats
