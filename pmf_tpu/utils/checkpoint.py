"""Checkpoint / resume.

The reference has no mid-training persistence at all — its only "checkpoint"
is the terminal CSV export of embeddings (SURVEY.md §5.4,
`/root/reference/src/experiments/train_gaussian_full.py:71-135`).  Here
model state (variational parameters / MAP parameters) checkpoints via
orbax when available (np.savez fallback), with a JSON sidecar carrying the
config and dimensions, and fit loops can save every N iterations and
resume from a saved state.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np


def _to_host(state: dict) -> dict:
    return {k: np.asarray(v) for k, v in state.items()}


def save_state(path: str, state: dict, meta: dict | None = None) -> None:
    """Save a state dict (+ JSON meta).  ``path`` is a directory."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    host_state = _to_host(state)
    ckpt_path = os.path.join(path, "state.orbax")
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(ckpt_path, host_state, force=True)
    except Exception:
        # A partially written state.orbax would shadow the npz fallback at
        # load time (load_state prefers orbax) — remove it first (ADVICE r1).
        if os.path.isdir(ckpt_path):
            import shutil

            shutil.rmtree(ckpt_path, ignore_errors=True)
        np.savez(os.path.join(path, "state.npz"), **host_state)
    if meta is not None:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=1, default=str)


def load_state(path: str) -> tuple[dict, dict]:
    """Load (state, meta) saved by :func:`save_state`."""
    path = os.path.abspath(path)
    orbax_path = os.path.join(path, "state.orbax")
    npz_path = os.path.join(path, "state.npz")
    if os.path.exists(orbax_path):
        import orbax.checkpoint as ocp

        state = ocp.PyTreeCheckpointer().restore(orbax_path)
    elif os.path.exists(npz_path):
        with np.load(npz_path) as z:
            state = {k: z[k] for k in z.files}
    else:
        raise FileNotFoundError(f"No checkpoint under {path}")
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def save_model(model, path: str) -> None:
    """Checkpoint a fitted FactorModel facade (state + config + dims)."""
    meta = {
        "model_class": type(model).__name__,
        "config": dataclasses.asdict(model.config),
        "n_users": model.n_users,
        "n_items": model.n_items,
        "global_mean": getattr(model, "global_mean", None),
    }
    save_state(path, model.state, meta)


def load_model(path: str):
    """Rebuild a fitted model facade from a checkpoint."""
    import jax.numpy as jnp

    from pmf_tpu import models as M

    state, meta = load_state(path)
    cls = getattr(M, meta["model_class"])
    # Resolve the config class from the model's module (<Name>Config).
    import importlib

    mod = importlib.import_module(cls.__module__)
    config_cls = getattr(mod, meta["model_class"] + "Config")
    from pmf_tpu.config import filter_config_kwargs

    config = config_cls(**filter_config_kwargs(config_cls, meta["config"]))
    model = cls(config)
    model.n_users = meta["n_users"]
    model.n_items = meta["n_items"]
    if meta.get("global_mean") is not None:
        model.global_mean = float(meta["global_mean"])
    model.state = {k: jnp.asarray(v) for k, v in state.items()}
    return model
