"""Batch recommendation CLI — the serving surface.

    python -m pmf_tpu.cli.recommend --checkpoint CKPT_DIR [--users 0 1 2]
        [--k 10] [--train data/processed/interactions_train.csv]
        [--out recommendations.csv]

Loads a fitted model checkpoint (`pmf_tpu.utils.checkpoint.save_model`),
scores all items for the requested users on the device (dense MXU matmuls
+ top-k), excludes each user's own training items when a training CSV is
given, and writes one (u, rank, i, score) row per recommendation.

The reference has no serving path at all — its predict() only scores
explicit (u, i) pairs (`/root/reference/src/models/hpf_cavi.py:215-230`).
"""

from __future__ import annotations

import argparse

import numpy as np
import pandas as pd


def main(argv=None):
    from pmf_tpu.cli.common import setup_runtime
    setup_runtime()
    parser = argparse.ArgumentParser(description="Top-k recommendations")
    parser.add_argument("--checkpoint", required=True,
                        help="directory written by checkpoint.save_model")
    parser.add_argument("--users", type=int, nargs="*", default=None,
                        help="user ids (default: all users)")
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--train", default=None,
                        help="training interactions CSV (u,i,rating) whose "
                             "items are excluded per user")
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--mesh_devices", type=int, default=0,
                        help="shard the queried users over an N-device "
                             "mesh (recommend_sharded; 0 = single device)")
    parser.add_argument("--out", default="recommendations.csv")
    args = parser.parse_args(argv)

    from pmf_tpu.utils.checkpoint import load_model

    model = load_model(args.checkpoint)
    users = (np.asarray(args.users, dtype=np.int64) if args.users
             else np.arange(model.n_users, dtype=np.int64))

    train = None
    if args.train:
        from pmf_tpu.data.native import parse_interactions_csv

        tu, ti, tx = parse_interactions_csv(args.train)
        train = (tu, ti, tx)

    mesh = None
    if args.mesh_devices:
        from pmf_tpu.parallel import make_mesh

        mesh = make_mesh(args.mesh_devices)
    items, scores = model.recommend(users, k=args.k, train=train,
                                    batch=args.batch, mesh=mesh)
    rows = pd.DataFrame({
        "u": np.repeat(users, args.k),
        "rank": np.tile(np.arange(1, args.k + 1), len(users)),
        "i": items.reshape(-1),
        "score": scores.reshape(-1),
    })
    rows.to_csv(args.out, index=False)
    print(f"Wrote {len(rows)} recommendations for {len(users)} users -> {args.out}")
    return rows


if __name__ == "__main__":
    main()
