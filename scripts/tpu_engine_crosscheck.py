"""Numeric engine cross-check ON THE REAL TPU (the pytest engine gates run
the Pallas kernels in interpret mode on CPU; this validates the actual
Mosaic lowering): flat vs blocked states after a few sweeps for HPF,
plain/extended Poisson, and full/diag Gaussian."""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check(name, a, b, rtol, atol=1e-4):
    ok = True
    for k in a:
        x, y = np.asarray(a[k]), np.asarray(b[k])
        err = np.max(np.abs(x - y) / (np.abs(y) * rtol + atol))
        if err > 1.0:
            print(f"  {name}.{k}: MISMATCH rel-norm {err:.2f}")
            ok = False
    print(f"{name}: {'OK' if ok else 'FAILED'}")
    return ok


def main():
    from pmf_tpu.utils.platform import setup_cache

    setup_cache()
    from pmf_tpu.data.synthetic import synth_ratings
    from pmf_tpu.models.gaussian_mf import GaussianMF, GaussianMFConfig
    from pmf_tpu.models.hpf import HPF, HPFConfig
    from pmf_tpu.models.poisson_mf import PoissonMF, PoissonMFConfig

    u, i, x = synth_ratings(3000, 1500, 400_000, seed=9)
    ok = True

    base = dict(n_factors=12, max_iter=3, tol=None, verbose=False)
    flat = HPF(HPFConfig(engine="flat", **base)).fit((u, i, x + 1))
    blk = HPF(HPFConfig(engine="blocked_high", **base)).fit((u, i, x + 1))
    ok &= check("hpf", flat.state, blk.state, 5e-4)

    flat = PoissonMF(PoissonMFConfig(engine="flat", **base)).fit((u, i, x))
    blk = PoissonMF(PoissonMFConfig(engine="blocked_high", **base)).fit((u, i, x))
    ok &= check("poisson", flat.state, blk.state, 5e-4)

    flat = PoissonMF(PoissonMFConfig(engine="flat", extended=True, **base)).fit((u, i, x))
    blk = PoissonMF(PoissonMFConfig(engine="blocked_high", extended=True, **base)).fit((u, i, x))
    ok &= check("poisson_ext", flat.state, blk.state, 5e-4)

    xc = x - x.mean()
    gbase = dict(n_factors=12, sigma2=0.8, max_iter=3, tol=None, verbose=False)
    flat = GaussianMF(GaussianMFConfig(engine="flat", **gbase)).fit((u, i, xc))
    blk = GaussianMF(GaussianMFConfig(engine="blocked_high", **gbase)).fit((u, i, xc))
    ok &= check("gaussian_full", flat.state, blk.state, 5e-3)

    flat = GaussianMF(GaussianMFConfig(engine="flat", covariance="diag", **gbase)).fit((u, i, xc))
    blk = GaussianMF(GaussianMFConfig(engine="blocked_high", covariance="diag", **gbase)).fit((u, i, xc))
    ok &= check("gaussian_diag", flat.state, blk.state, 5e-3)

    print("ALL OK" if ok else "FAILURES PRESENT")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
