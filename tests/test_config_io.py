"""best_hyperparams.txt artifact compatibility — including parsing the
reference repo's own committed artifact when available."""

import os

import pytest

from pmf_tpu import config as cfg_io
from pmf_tpu.models import HPFConfig, HPFMapConfig, GaussianMFConfig, PoissonMFConfig


def test_roundtrip(tmp_path):
    path = str(tmp_path / "best_hyperparams.txt")
    configs = {
        cfg_io.GAUSSIAN_KEY: GaussianMFConfig(n_factors=30, sigma2=0.3, tol=1e-3),
        cfg_io.POISSON_KEY: PoissonMFConfig(n_factors=40, a0=0.1, b0=0.5, tol=None),
        cfg_io.HPF_CAVI_KEY: HPFConfig(n_factors=20, a_prime=5.0),
        cfg_io.HPF_MAP_KEY: HPFMapConfig(n_factors=10, lr=5e-4, epochs=50),
    }
    cfg_io.write_best_hyperparams(configs, path)
    loaded = cfg_io.load_best_hyperparams(path)
    assert set(loaded) == set(configs)
    assert loaded[cfg_io.POISSON_KEY]["tol"] is None
    assert loaded[cfg_io.GAUSSIAN_KEY]["sigma2"] == 0.3

    # Drift-tolerant reconstruction.
    raw = dict(loaded[cfg_io.HPF_CAVI_KEY])
    raw["mystery_future_key"] = 123
    cfg = HPFConfig(**cfg_io.filter_config_kwargs(HPFConfig, raw))
    assert cfg.a_prime == 5.0


REF_ARTIFACT = "/root/reference/best_hyperparams.txt"


@pytest.mark.skipif(not os.path.exists(REF_ARTIFACT), reason="reference not mounted")
def test_parses_reference_artifact():
    """The reference repo's committed best_hyperparams.txt must load and
    reconstruct valid configs for all four models."""
    loaded = cfg_io.load_best_hyperparams(REF_ARTIFACT)
    assert set(loaded) >= {
        cfg_io.GAUSSIAN_KEY, cfg_io.POISSON_KEY, cfg_io.HPF_CAVI_KEY, cfg_io.HPF_MAP_KEY,
    }
    g = GaussianMFConfig(
        **cfg_io.filter_config_kwargs(GaussianMFConfig, loaded[cfg_io.GAUSSIAN_KEY])
    )
    assert g.n_factors == 30 and g.sigma2 == 0.3 and g.eta_bias2 == 1.0
    p = PoissonMFConfig(
        **cfg_io.filter_config_kwargs(PoissonMFConfig, loaded[cfg_io.POISSON_KEY])
    )
    assert p.n_factors == 40 and p.tol is None
    h = HPFConfig(
        **cfg_io.filter_config_kwargs(HPFConfig, loaded[cfg_io.HPF_CAVI_KEY])
    )
    assert h.a_prime == 5.0 and h.d_prime == 5.0
    m = HPFMapConfig(
        **cfg_io.filter_config_kwargs(HPFMapConfig, loaded[cfg_io.HPF_MAP_KEY])
    )
    assert m.lr == 0.0005 and m.epochs == 50