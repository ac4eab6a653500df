from pmf_tpu.ops.segment import sorted_segment_sum, edge_dot, gather_rows
from pmf_tpu.ops.solve import batched_psd_solve, batched_psd_inverse
