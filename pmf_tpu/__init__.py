"""pmf_tpu — TPU-native probabilistic matrix factorization framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
rogeliolopezcamara/prob-matrix-factorization (reference mounted at
/root/reference): four probabilistic matrix-factorization model families
(Gaussian MF CAVI with optional biases, Poisson MF CAVI with optional
extended user/item activity factors, Hierarchical Poisson Factorization
via CAVI and via MAP/SGD), the data pipeline around them, and the
experiment/tune/compare/train/analysis surface.

Design (TPU-first, not a port):
  * Ragged per-user/per-item observation sets become flat padded COO
    shards, kept twice (sorted by user and by item) so every CAVI
    coordinate block is one gather + fused elementwise + sorted
    segment-sum (`pmf_tpu.ops.segment`).
  * The Gaussian model's per-row K x K posterior solves run as one
    batched Cholesky solve over all rows at once (`pmf_tpu.ops.solve`).
  * One CAVI iteration == one jitted `sweep` function per model; early
    stopping runs on host between jitted sweeps (`pmf_tpu.infer.cavi`).
  * Multi-chip scaling shards COO edges across a `jax.sharding.Mesh`
    data axis with psum-combined partial segment statistics
    (`pmf_tpu.parallel`).
"""

from pmf_tpu.utils.platform import setup_cache as _setup_cache

_setup_cache()  # persistent compile cache: tunnel compiles are expensive

from pmf_tpu import config as config
from pmf_tpu.models.gaussian_mf import GaussianMF, GaussianMFConfig
from pmf_tpu.models.poisson_mf import PoissonMF, PoissonMFConfig
from pmf_tpu.models.hpf import HPF, HPFConfig
from pmf_tpu.models.hpf_map import HPFMap, HPFMapConfig

__version__ = "0.1.0"

__all__ = [
    "GaussianMF",
    "GaussianMFConfig",
    "PoissonMF",
    "PoissonMFConfig",
    "HPF",
    "HPFConfig",
    "HPFMap",
    "HPFMapConfig",
    "config",
]
