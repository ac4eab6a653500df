from pmf_tpu.models.gaussian_mf import GaussianMF, GaussianMFConfig
from pmf_tpu.models.poisson_mf import PoissonMF, PoissonMFConfig
from pmf_tpu.models.hpf import HPF, HPFConfig
from pmf_tpu.models.hpf_map import HPFMap, HPFMapConfig
