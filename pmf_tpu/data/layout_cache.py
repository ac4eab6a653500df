"""Persistent disk cache for blocked / TP layouts.

A blocked layout (`pmf_tpu.data.blocked.BlockedCOO`) or TP bucket layout
(`pmf_tpu.parallel.tp_blocked.TPBlockedLayout`) is a PURE FUNCTION of
(edge data, geometry parameters), yet every large fit used to rebuild it
from scratch — 27 s single-chip and minutes for the TP build at 25M
edges, against sweeps of ~0.2 s/iter (VERDICT r4 weak #2: build wall was
96% of a converged fast-Gaussian fit).  This module persists built
layouts keyed by a sha1 of the edge arrays plus every geometry argument,
so repeat fits (converged runs, parity reruns, benches, notebooks) pay
one npz read instead of the host build.

What is stored
--------------
* Edge-pass arrays (``loc``/``x``/chunk block ids/segment metadata) are
  saved VERBATIM as host numpy — byte-identical layouts on reload.
* Dense-head tiers are saved as their SCATTER TRIPLES (flat cell index +
  rating per edge), NOT as dense cells: the cell arrays can reach the
  multi-GiB head byte budget and live on device, so round-tripping them
  through the host (d2h at save, h2d at load) would cost more than the
  rebuild.  Reload re-runs the same device scatter as the fresh build —
  identical arrays, and only the triples (8 B/edge) cross the tunnel.

Keying and invalidation: the key hashes the raw (u, i, x) arrays, every
geometry kwarg, and ``LAYOUT_CACHE_VERSION``; bump the version whenever
the layout FORMAT changes.  Entries are self-contained ``.npz`` files
written atomically (tmp + rename), safe for concurrent readers.

Enabled by passing ``cache_dir=`` to the builders or by setting the
``PMF_TPU_LAYOUT_CACHE`` environment variable (the converged / parity
scripts do); unset means no caching, exactly the old behavior.

Reference analogue: none — the reference rebuilds its Python index lists
every fit (`/root/reference/src/models/gaussian_mf_cavi.py:69-86`); this
subsystem exists because the TPU layouts are expensive enough to be
worth persisting.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

import numpy as np

LAYOUT_CACHE_VERSION = 1


def resolve_cache_dir(cache_dir: str | None) -> str | None:
    """Explicit argument wins; else the PMF_TPU_LAYOUT_CACHE env var;
    else None (caching disabled)."""
    if cache_dir is not None:
        return cache_dir or None
    return os.environ.get("PMF_TPU_LAYOUT_CACHE") or None


def data_fingerprint(*arrays) -> str:
    """sha1 over the raw bytes + dtype/shape of each array (order
    matters).  ~1 GB/s, so ~0.6 s for 25M (u, i, x) triples — negligible
    against the builds it gates."""
    h = hashlib.sha1()
    for a in arrays:
        a = np.ascontiguousarray(a)
        h.update(str((a.dtype.str, a.shape)).encode())
        h.update(a.view(np.uint8).data)
    return h.hexdigest()


def make_key(kind: str, fingerprint: str, params: dict) -> str:
    """Cache key: layout kind + data fingerprint + every geometry param
    (json-normalized, sorted keys) + module version."""
    blob = json.dumps(
        {"kind": kind, "fp": fingerprint, "params": params,
         "version": LAYOUT_CACHE_VERSION},
        sort_keys=True, default=repr,
    )
    return hashlib.sha1(blob.encode()).hexdigest()


def entry_path(cache_dir: str, kind: str, key: str) -> str:
    return os.path.join(cache_dir, f"{kind}_{key}.npz")


def save_entry(path: str, arrays: dict, meta: dict) -> None:
    """Atomic uncompressed npz write (tmp + rename): concurrent readers
    never see a partial file; a crashed writer leaves only a tmp.  Save
    failures are non-fatal (the built layout is already in hand)."""
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path),
                                   suffix=".npz.tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                np.savez(f, __meta__=np.frombuffer(
                    json.dumps(meta).encode(), dtype=np.uint8), **arrays)
            os.replace(tmp, path)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
    except Exception as e:  # noqa: BLE001 — cache is best-effort
        import warnings

        warnings.warn(f"layout cache save failed ({path}): {e}")


def load_entry(path: str):
    """Returns (arrays: dict of numpy, meta: dict) or None on miss /
    unreadable entry (unreadable entries are treated as misses so a
    corrupt file degrades to a rebuild, never an error)."""
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            meta = json.loads(bytes(z["__meta__"]).decode())
            arrays = {k: z[k] for k in z.files if k != "__meta__"}
        return arrays, meta
    except Exception as e:  # noqa: BLE001
        import warnings

        warnings.warn(f"layout cache entry unreadable ({path}): {e}")
        return None


# ---------------------------------------------------------------------------
# BlockedCOO (single-chip / DP hybrid layout)
# ---------------------------------------------------------------------------

_PASS_DATA = ("loc", "x", "chunk_self_block", "chunk_other_block",
              "self_old_of_new", "other_old_of_new", "self_new_of_old")
_PASS_META = ("n_chunks", "chunk_size", "bs_self", "bs_other", "n_self",
              "n_other", "n_self_blocks", "n_other_blocks", "nnz",
              "seg_chunks", "seg_first_block", "seg_n_blocks", "reordered",
              "group")


def pack_pass(p, prefix: str, arrays: dict) -> dict:
    """Host-side BlockedPass -> (arrays entries, meta dict)."""
    for name in _PASS_DATA:
        arrays[f"{prefix}.{name}"] = np.asarray(getattr(p, name))
    return {name: getattr(p, name) for name in _PASS_META}


def unpack_pass(prefix: str, arrays: dict, meta: dict, device: bool):
    from pmf_tpu.data.blocked import BlockedPass

    if device:
        import jax.numpy as jnp

        arr = jnp.asarray
    else:
        arr = np.asarray
    meta = dict(meta)
    meta["seg_first_block"] = tuple(meta["seg_first_block"])
    meta["seg_n_blocks"] = tuple(meta["seg_n_blocks"])
    return BlockedPass(
        **{name: arr(arrays[f"{prefix}.{name}"]) for name in _PASS_DATA},
        **meta,
    )


def pack_blocked(by_user, by_item, head_triples, arrays: dict) -> dict:
    """``head_triples``: list of (idx int32, x f32, tier_meta dict) per
    dense-head tier (tier_meta: hu, hi, r0, row_start)."""
    meta = {
        "by_user": pack_pass(by_user, "bu", arrays),
        "by_item": pack_pass(by_item, "bi", arrays),
        "tiers": [],
    }
    for t, (idx, xs, tm) in enumerate(head_triples):
        arrays[f"t{t}.idx"] = np.asarray(idx, np.int32)
        arrays[f"t{t}.x"] = np.asarray(xs, np.float32)
        meta["tiers"].append(tm)
    return meta


def unpack_blocked(arrays: dict, meta: dict):
    """-> BlockedCOO with device arrays (heads re-scattered on device,
    exactly as the fresh build)."""
    from pmf_tpu.data.blocked import BlockedCOO, _scatter_head

    by_user = unpack_pass("bu", arrays, meta["by_user"], device=True)
    by_item = unpack_pass("bi", arrays, meta["by_item"], device=True)
    heads = []
    for t, tm in enumerate(meta["tiers"]):
        heads.append(_scatter_head(
            arrays[f"t{t}.idx"], arrays[f"t{t}.x"],
            hu=tm["hu"], hi=tm["hi"], r0=tm["r0"],
            row_start=tm["row_start"]))
    return BlockedCOO(by_user=by_user, by_item=by_item,
                      head=tuple(heads) if heads else None)


# ---------------------------------------------------------------------------
# TPBlockedLayout
# ---------------------------------------------------------------------------

_TPDIR_DATA = ("sb", "ob", "loc", "x", "seg_row0", "seg_nrows")
_TPDIR_META = ("bs_self", "bs_other", "chunk_size", "group", "seg_chunks",
               "n_segments", "out_rows", "n_self_blocks", "n_other_blocks")
_TPLAYOUT_META = ("n_users", "n_items", "n_users_pad", "n_items_pad",
                  "users_per", "items_per", "n_devices", "nnz", "n_dp")


def pack_tp(layout, head_triples_user, head_triples_item,
            arrays: dict) -> dict:
    """``head_triples_*``: per tier, (per-device idx list, per-device x
    list, tier_meta) — the exact `_scatter_head_stack` inputs."""
    meta = {"dirs": {}, "layout": {}, "head_user": [], "head_item": []}
    for prefix, d in (("bu", layout.by_user), ("bi", layout.by_item)):
        for name in _TPDIR_DATA:
            arrays[f"{prefix}.{name}"] = np.asarray(getattr(d, name))
        meta["dirs"][prefix] = {n: getattr(d, n) for n in _TPDIR_META}
    for name, a in (("u_old_of_new", layout.u_old_of_new),
                    ("u_new_of_old", layout.u_new_of_old),
                    ("i_old_of_new", layout.i_old_of_new),
                    ("i_new_of_old", layout.i_new_of_old),
                    ("user_counts", layout.user_counts),
                    ("item_counts", layout.item_counts),
                    ("x_sum_user", layout.x_sum_user),
                    ("x_sum_item", layout.x_sum_item)):
        arrays[name] = np.asarray(a)
    meta["layout"] = {n: getattr(layout, n) for n in _TPLAYOUT_META}
    for side, triples in (("hu", head_triples_user),
                          ("hi", head_triples_item)):
        for t, (idx_per_dev, x_per_dev, tm) in enumerate(triples):
            for d, (idx, xs) in enumerate(zip(idx_per_dev, x_per_dev)):
                arrays[f"{side}{t}.d{d}.idx"] = np.asarray(idx, np.int32)
                arrays[f"{side}{t}.d{d}.x"] = np.asarray(xs, np.float32)
            meta[{"hu": "head_user", "hi": "head_item"}[side]].append(tm)
    return meta


def unpack_tp(arrays: dict, meta: dict):
    from pmf_tpu.parallel.tp_blocked import (
        TPBlockedDir,
        TPBlockedLayout,
        TPHeadTier,
        _scatter_head_stack_from,
    )

    dirs = {}
    for prefix in ("bu", "bi"):
        dirs[prefix] = TPBlockedDir(
            **{n: arrays[f"{prefix}.{n}"] for n in _TPDIR_DATA},
            **meta["dirs"][prefix],
        )
    lm = meta["layout"]
    D, dp = lm["n_devices"], lm["n_dp"]

    def heads(side, key):
        tiers = []
        for t, tm in enumerate(meta[key]):
            idx_per_dev = [arrays[f"{side}{t}.d{d}.idx"] for d in range(D)]
            x_per_dev = [arrays[f"{side}{t}.d{d}.x"] for d in range(D)]
            hu_r = tm["hu"] // dp
            x_hi, x_lo, m = _scatter_head_stack_from(
                idx_per_dev, x_per_dev, D, dp, hu_r, tm["hip"])
            tiers.append(TPHeadTier(x_hi=x_hi, x_lo=x_lo, m=m,
                                    row_start=tm["row_start"], hu=tm["hu"],
                                    hi=tm["hi"], hip=tm["hip"],
                                    r0=tm["r0"]))
        return tuple(tiers)

    return TPBlockedLayout(
        by_user=dirs["bu"], by_item=dirs["bi"],
        u_old_of_new=arrays["u_old_of_new"],
        u_new_of_old=arrays["u_new_of_old"],
        i_old_of_new=arrays["i_old_of_new"],
        i_new_of_old=arrays["i_new_of_old"],
        user_counts=arrays["user_counts"],
        item_counts=arrays["item_counts"],
        x_sum_user=arrays["x_sum_user"],
        x_sum_item=arrays["x_sum_item"],
        head_user=heads("hu", "head_user"),
        head_item=heads("hi", "head_item"),
        **lm,
    )
