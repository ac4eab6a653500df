"""Shared model machinery: the host-side fit loop around jitted CAVI sweeps.

The reference runs Python-loop CAVI iterations with per-iteration validation
RMSE and model-specific early-stopping rules
(`/root/reference/src/models/gaussian_mf_cavi.py:183-198`,
`/root/reference/src/models/poisson_mf_cavi.py:202-217`).  Here each CAVI
iteration is ONE jitted sweep over the whole COO shard; the early-stop
decision stays on host between sweeps (data-dependent control flow does not
belong inside jit).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pmf_tpu.data.coo import EvalSet, RatingsCOO, build_eval_set, build_ratings
from pmf_tpu.eval.metrics import masked_macro_mae, masked_rmse


def as_triples(data) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Accept a pandas DataFrame with columns u/i/rating, a dict, or a
    (u, i, x) tuple of arrays; return numpy triples."""
    if isinstance(data, tuple) and len(data) == 3:
        u, i, x = data
    elif hasattr(data, "columns"):  # pandas DataFrame
        u = data["u"].to_numpy()
        i = data["i"].to_numpy()
        x = data["rating"].to_numpy()
    elif isinstance(data, dict):
        u, i, x = data["u"], data["i"], data["rating"]
    else:
        raise TypeError(f"Unsupported ratings container: {type(data)!r}")
    return (
        np.asarray(u, dtype=np.int64),
        np.asarray(i, dtype=np.int64),
        np.asarray(x, dtype=np.float64),
    )


class FitLoop:
    """Drives jitted sweeps with host-side early stopping.

    ``stop_rule(prev_rmse, rmse, tol) -> bool`` encodes the per-model rule:
      * Gaussian: stop iff 0 <= improvement < tol
        (`gaussian_mf_cavi.py:193`)
      * Poisson/HPF: stop iff tol is not None and improvement < tol —
        including regressions (`poisson_mf_cavi.py:213`).
    """

    def __init__(
        self,
        sweep_fn: Callable,
        eval_fn: Optional[Callable],
        max_iter: int,
        tol,
        stop_rule: Callable,
        verbose: bool = False,
        name: str = "CAVI",
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 10,
        profile_dir: Optional[str] = None,
        edge_visits_per_iter: Optional[int] = None,
        elbo_fn: Optional[Callable] = None,
        elbo_every: int = 1,
        elbo_monotone: Optional[float] = None,
    ):
        self.sweep_fn = sweep_fn
        self.eval_fn = eval_fn
        self.max_iter = max_iter
        self.tol = tol
        self.stop_rule = stop_rule
        self.verbose = verbose
        self.name = name
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        self.profile_dir = profile_dir
        # Optional convergence diagnostic (beyond the reference, which
        # never computes its objective): ``elbo_fn(state) -> scalar`` is
        # evaluated every ``elbo_every`` iterations and recorded in
        # history as ``elbo``.  ``elbo_monotone`` (a relative tolerance)
        # enforces non-decrease — valid for the Gaussian family, whose
        # sweep is exact coordinate ascent on this ELBO; the tolerance
        # absorbs the engine's statistic rounding (1e-6 flat/f64,
        # looser for bf16-decomposed blocked statistics).
        self.elbo_fn = elbo_fn
        self.elbo_every = max(int(elbo_every), 1)
        self.elbo_monotone = elbo_monotone
        self._prev_elbo: Optional[float] = None
        # Ratings touched per iteration (nnz x number of edge passes); when
        # set, each history record carries ``updates_per_sec`` (SURVEY §5.1:
        # the reference only ever logged wall-clock).
        self.edge_visits_per_iter = edge_visits_per_iter
        self.history: list[dict] = []

    def _maybe_checkpoint(self, state, it: int) -> None:
        if self.checkpoint_dir and it % self.checkpoint_every == 0:
            from pmf_tpu.utils.checkpoint import save_state

            save_state(self.checkpoint_dir, state, {"iteration": it, "name": self.name})

    def _maybe_elbo(self, state, it: int, record: dict) -> None:
        if self.elbo_fn is None or it % self.elbo_every:
            return
        elbo = float(self.elbo_fn(state))
        record["elbo"] = elbo
        prev = self._prev_elbo
        if (
            self.elbo_monotone is not None
            and prev is not None
            and elbo < prev - self.elbo_monotone * (1.0 + abs(prev))
        ):
            raise RuntimeError(
                f"{self.name}: ELBO decreased at iteration {it} "
                f"({prev!r} -> {elbo!r}) — the sweep is coordinate ascent on "
                "this objective, so a decrease beyond rounding indicates a "
                "bug (or mismatched train data passed to elbo_every)"
            )
        self._prev_elbo = elbo

    def run(self, state, data: RatingsCOO, val: Optional[EvalSet]):
        """Drive sweeps with host-side early stopping.  Iteration wall time
        lands in history as ``iter_seconds`` (meaningful when a validation
        eval forces a device sync); with ``profile_dir`` the whole loop is
        captured as a jax.profiler trace (view with TensorBoard)."""
        import contextlib
        import time as _time

        ctx = (
            jax.profiler.trace(self.profile_dir)
            if self.profile_dir
            else contextlib.nullcontext()
        )
        with ctx:
            return self._run(state, data, val, _time)

    def _run(self, state, data: RatingsCOO, val: Optional[EvalSet], _time):
        """Pipelined driver: the NEXT sweep is dispatched speculatively
        before the host synchronizes this iteration's validation scalar, so
        the device keeps working through the host round-trip (~26 ms/iter
        on the axon tunnel; any nonzero latency on real hosts).  Early-stop
        semantics are IDENTICAL to the sequential loop — the returned state
        is the one the stop decision was made on; at most one speculative
        sweep's compute is discarded when stopping."""
        if self.max_iter <= 0:
            return state
        prev_val_rmse = None
        with jax.profiler.StepTraceAnnotation(self.name, step_num=1):
            state = self.sweep_fn(state, data)  # iteration 1 dispatch
        t0 = _time.perf_counter()
        for it in range(1, self.max_iter + 1):
            cur = state
            self._maybe_checkpoint(cur, it)
            record = {"iteration": it, "iter_seconds": None}
            if val is not None and self.eval_fn is not None:
                val_rmse, val_macro = self.eval_fn(cur, val)
                if it < self.max_iter:
                    # Speculative dispatch: runs on-device while the host
                    # waits for the eval scalar below.
                    with jax.profiler.StepTraceAnnotation(self.name,
                                                          step_num=it + 1):
                        state = self.sweep_fn(cur, data)
                val_rmse = float(val_rmse)  # device sync point
                record.update(
                    val_rmse=val_rmse,
                    val_macro_mae=float(val_macro),
                    iter_seconds=_time.perf_counter() - t0,
                )
                t0 = _time.perf_counter()
                if self.edge_visits_per_iter:
                    record["updates_per_sec"] = (
                        self.edge_visits_per_iter / record["iter_seconds"]
                    )
                self._maybe_elbo(cur, it, record)
                if "elbo" in record:
                    t0 = _time.perf_counter()  # ELBO time is not sweep time
                if self.verbose:
                    ups = record.get("updates_per_sec")
                    print(
                        f"{self.name} iter {it}/{self.max_iter} | "
                        f"val RMSE {val_rmse:.4f} | macro-MAE {float(val_macro):.4f} | "
                        f"{record['iter_seconds']:.3f}s"
                        + (f" | {ups/1e6:.1f}M updates/s" if ups else "")
                        + (f" | ELBO {record['elbo']:.6g}"
                           if "elbo" in record else ""),
                        flush=True,
                    )
                self.history.append(record)
                if prev_val_rmse is not None and self.stop_rule(
                    prev_val_rmse, val_rmse, self.tol
                ):
                    if self.verbose:
                        print("Early stopping on validation improvement.", flush=True)
                    # The speculative sweep past the stop point is discarded.
                    return cur
                prev_val_rmse = val_rmse
            else:
                if it < self.max_iter:
                    with jax.profiler.StepTraceAnnotation(self.name,
                                                          step_num=it + 1):
                        state = self.sweep_fn(cur, data)
                # No eval forces a sync here; wait for this iteration's
                # sweep so iter_seconds/updates_per_sec measure compute,
                # not async dispatch (sweeps are chained, so cur completes
                # exactly when sweep `it` does).
                jax.block_until_ready(cur)
                record["iter_seconds"] = _time.perf_counter() - t0
                t0 = _time.perf_counter()
                if self.edge_visits_per_iter:
                    record["updates_per_sec"] = (
                        self.edge_visits_per_iter / record["iter_seconds"]
                    )
                self._maybe_elbo(cur, it, record)
                if "elbo" in record:
                    t0 = _time.perf_counter()
                self.history.append(record)
        return state


def resolve_engine(engine: str, n_users=None, n_items=None, nnz=None) -> str:
    """"auto" -> the Pallas blocked engine on accelerators, XLA flat on CPU
    or for small data (where compile + layout-build time dominates).

    Round 1 also fell back to flat for sparse-tile shapes (Food.com-density
    700k edges over 25k x 178k rows padded 3-12x at fixed 128-edge chunks);
    `pmf_tpu.data.blocked.auto_tiles` now shrinks the chunk size for those
    shapes and the blocked engine WINS there (measured 1.7x HPF / 3.9x
    Gaussian over flat at the reference's own shape — docs/PERFORMANCE.md).

    The 300k cutover is MEASURED (round 3, v5e, K=20, warm cache): the
    hybrid wins per-iteration at every scale (100k edges: 1.1 vs 4.1 ms,
    3.8x; 300k: 4.8 vs 13.6 ms; 1M: 20.7 vs 46.0 ms), but its ~0.5 s
    layout build only amortizes within a <=100-iteration fit above
    roughly 300k edges — below that, flat's zero setup wins wall-clock."""
    if engine != "auto":
        return engine
    import jax

    if jax.default_backend() == "cpu":
        return "flat"
    if nnz is not None and nnz < 300_000:
        return "flat"
    return "blocked_high"


def gaussian_stop_rule(prev: float, cur: float, tol) -> bool:
    improvement = prev - cur
    return tol is not None and 0.0 <= improvement < tol


def poisson_stop_rule(prev: float, cur: float, tol) -> bool:
    improvement = prev - cur
    return tol is not None and improvement < tol


class FactorModel:
    """Base for the CAVI models: boundary conversion, prediction, metrics."""

    def __init__(self, config):
        self.config = config
        self.n_users: Optional[int] = None
        self.n_items: Optional[int] = None
        self.state = None
        self.fit_history: list[dict] = []

    # -- to be provided by subclasses ------------------------------------
    def _point_estimates(self) -> Tuple[jax.Array, jax.Array]:
        """Return (user_factors, item_factors) point estimates (means)."""
        raise NotImplementedError

    def _predict_valid(self, theta_rows, beta_rows, u, i):
        """Prediction for in-range rows given gathered factor rows."""
        return jnp.sum(theta_rows * beta_rows, axis=-1)

    # -- shared plumbing ---------------------------------------------------
    def _initial_state(self, default_state: dict, resume_from: Optional[str]) -> dict:
        """Use a checkpointed state instead of the fresh init when resuming."""
        if resume_from is None:
            return default_state
        import jax.numpy as jnp

        from pmf_tpu.utils.checkpoint import load_state

        state, _ = load_state(resume_from)
        restored = {k: jnp.asarray(v) for k, v in state.items()}
        for k, v in default_state.items():
            if k not in restored or restored[k].shape != v.shape:
                have = k in restored and restored[k].shape
                hint = ""
                # TP checkpoints store MESH-PADDED row counts; a leading-
                # dim-only mismatch almost always means a cross-mode resume
                # (TP checkpoint into a flat fit, or a different tp degree)
                # — name that instead of leaving an opaque shape error
                # (ADVICE r3).
                if (
                    have
                    and restored[k].shape[1:] == v.shape[1:]
                    and restored[k].shape[0] != v.shape[0]
                ):
                    hint = (
                        " — the leading (row) dimension differs; TP "
                        "(state_sharding='rows') checkpoints store mesh-"
                        "padded row counts, so resume them with the same "
                        "state_sharding mode and tp degree as the fit that "
                        "saved them"
                    )
                raise ValueError(
                    f"checkpoint at {resume_from} does not match model state "
                    f"(key {k}: {have} vs {v.shape}){hint}"
                )
        return restored

    @property
    def _dtype(self):
        return np.dtype(getattr(self.config, "dtype", "float32"))

    def _build_train(self, train) -> RatingsCOO:
        u, i, x = as_triples(train)
        return build_ratings(u, i, x, dtype=self._dtype)

    def _build_eval(self, df) -> EvalSet:
        u, i, x = as_triples(df)
        return build_eval_set(u, i, x, self.n_users, self.n_items, dtype=self._dtype)

    def _mesh_place(self, data: RatingsCOO, state: dict, val: Optional[EvalSet], mesh):
        """Multi-chip placement for a full fit: training edges and eval rows
        shard contiguously over the mesh "data" axis, the (small) factor
        state replicates.  GSPMD then partitions every jitted sweep/eval and
        inserts the psum of partial segment statistics over ICI — exact
        equivalence with single-device execution is tested on the 8-virtual-
        device CPU mesh (`tests/test_mesh_fit.py`)."""
        if mesh is None:
            return data, state, val
        from pmf_tpu.parallel import replicate, shard_eval_set, shard_ratings

        data = shard_ratings(data, mesh)
        state = replicate(state, mesh)
        if val is not None:
            val = shard_eval_set(val, mesh)
        return data, state, val

    def _score_offsets(self):
        """(user_bias, item_bias, mean) additive score terms for serving.
        Models whose predict() is not a pure dot product (the Gaussian bias
        variant) override this so recommend() ranks by the same score."""
        return None, None, 0.0

    def recommend(self, user_ids, k: int = 10, train=None, batch: int = 1024,
                  train_index=None, mesh=None):
        """Top-k unseen-item recommendations per user (the serving path —
        beyond the reference, which only scores explicit pairs).  ``train``:
        optional ratings container whose (u, i) pairs are excluded from the
        candidates; for repeated serving calls pass ``train_index`` from
        `pmf_tpu.eval.recommend.build_exclusion_index` instead (sorts the
        pairs once, not per request).  ``mesh``: optional 1-D
        `jax.sharding.Mesh` — users shard across devices
        (`recommend_sharded`, zero collectives).  Returns (items, scores),
        each (len(user_ids), k)."""
        from pmf_tpu.eval.recommend import (
            build_exclusion_index,
            recommend as _rec,
            recommend_sharded as _rec_sharded,
        )

        theta, beta = self._point_estimates()
        user_bias, item_bias, mean = self._score_offsets()
        tu = ti = None
        if train is not None:
            tu, ti, _ = as_triples(train)
        if mesh is not None:
            if train_index is None and tu is not None and len(tu):
                train_index = build_exclusion_index(
                    tu, ti, n_users=theta.shape[0])
            return _rec_sharded(theta, beta, user_ids, k=k,
                                train_index=train_index, mesh=mesh,
                                item_bias=item_bias, user_bias=user_bias,
                                mean=mean, batch=batch)
        return _rec(theta, beta, user_ids, k=k, train_u=tu, train_i=ti,
                    batch=batch, item_bias=item_bias, user_bias=user_bias,
                    mean=mean, train_index=train_index)

    def predict(self, user_ids, item_ids) -> np.ndarray:
        """Out-of-range (unseen) pairs predict 0, matching the reference
        (`/root/reference/src/models/poisson_mf_cavi.py:221-241`)."""
        u = np.asarray(user_ids, dtype=np.int64)
        i = np.asarray(item_ids, dtype=np.int64)
        valid = (u < self.n_users) & (i < self.n_items) & (u >= 0) & (i >= 0)
        theta, beta = self._point_estimates()
        theta = np.asarray(theta)
        beta = np.asarray(beta)
        preds = np.zeros(len(u), dtype=np.float64)
        if valid.any():
            rows_t = theta[u[valid]]
            rows_b = beta[i[valid]]
            preds[valid] = np.asarray(
                self._predict_valid(rows_t, rows_b, u[valid], i[valid])
            ).astype(np.float64)
        return preds
