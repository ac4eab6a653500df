"""HPF by minibatch MAP/SGD — the TPU replacement for the reference's
PyTorch model (`/root/reference/src/models/hpf_pytorch.py`).

Same generative model as :mod:`pmf_tpu.models.hpf`, optimized by Adam on
softplus-constrained unconstrained parameters:

  * Poisson NLL  sum(lambda - x log lambda)  with lambda clamped >= 1e-6
    (`hpf_pytorch.py:78-83`).
  * Exact negative log-Gamma prior terms for theta|xi, beta|eta, xi, eta
    (`hpf_pytorch.py:145-180`).
  * Frequency-scaled priors: each batch occurrence of user u weighs its
    prior by 1/count(u), so the prior for every entity is applied exactly
    once per epoch (`hpf_pytorch.py:129-139`).

TPU formulation: one jitted `lax.scan` over the epoch's shuffled batches
(optax Adam), with the last partial batch padded + masked so every epoch
covers every rating exactly once and shapes stay static.  Batch sizes
should be much larger than the reference's 1024-4096 — the gathers and
VPU elementwise work saturate only with wide batches.

Fused parameter layout: the step is random-row gather/scatter LATENCY
bound (measured v5e: a (162k,) scalar gather costs MORE than a (162k, 20)
row gather — 1.13 vs 0.75 ms per 65k batch; scatter-adds 1.0-1.35 ms
either way), so the scalar entity parameters ride as an extra COLUMN of
the factor tables: params = {"user": (n_users, K+1) [theta | xi],
"item": (n_items, K+1) [beta | eta]}.  One gather and one scatter-add
per side instead of two each.  Adam is elementwise, so updates are
bit-identical to the per-leaf layout; init draws the same
default_rng(seed) values in the same order as the unfused layout.
(Checkpoints from the pre-fusion layout have different leaf shapes and
are rejected by the loader's shape check.)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pmf_tpu.data.coo import EvalSet
from pmf_tpu.eval.metrics import masked_macro_mae, masked_rmse
from pmf_tpu.models.base import FactorModel, as_triples
from pmf_tpu.ops.segment import edge_dot, gather_rows

LAMBDA_FLOOR = 1e-6


@dataclasses.dataclass
class HPFMapConfig:
    n_factors: int = 20
    a: float = 0.3
    a_prime: float = 1.0
    b_prime: float = 1.0
    c: float = 0.3
    c_prime: float = 1.0
    d_prime: float = 1.0
    lr: float = 0.001
    # Reference default is 1024 (`hpf_pytorch.py:19`).  On TPU, dense Adam
    # touches EVERY parameter each step, so small batches are dominated by
    # optimizer traffic (measured ~2x total time going 4096 -> 65536 at
    # 25M ratings); use >= 2^16 at scale.
    batch_size: int = 1024
    epochs: int = 20
    device: str = "tpu"  # kept for best_hyperparams.txt compatibility; unused
    verbose: bool = True
    random_state: int = 42
    dtype: str = "float32"
    # Step engine: "flat" = the reference-faithful uniformly-shuffled
    # batches (gather/scatter latency bound, ~10M edge-visits/s at 25M
    # edges); "blocked_fast"/"blocked_mid"/"blocked_high" = shuffled
    # BLOCK-TILE batches through the one-hot-MXU gradient kernel
    # (`pmf_tpu.ops.pallas.map_grad`) — each Adam step consumes one
    # blocked-layout segment (~batch_size edges in (512, 512) row tiles),
    # segment visit order reshuffled every epoch.  Same estimator family
    # (SGD over a random batch sequence covering every rating once per
    # epoch); batch COMPOSITION is a union of ``mix`` tile-band segments
    # instead of uniform, a documented deviation gated by the parity
    # pipeline's stochastic band and the converged-run val-RMSE
    # trajectory.  "auto" = flat: unlike the CAVI engines
    # (bit-compatible math, measured 3-13x), the blocked MAP step
    # changes batch composition, so it stays OPT-IN until measured
    # faster AND quality-neutral at scale on hardware (bench detail
    # `hpf_map`).
    engine: str = "auto"
    # Blocked engines only: segments (row-band batch shards of
    # ~batch_size/mix edges) accumulated per Adam step, drawn from the
    # epoch-wide shuffle.  mix=1 reproduces the round-4 one-band steps
    # whose correlated batches cost ~0.1 val RMSE at ML-25M epoch 40;
    # mix>=8 spreads every step across distant row bands.
    mix: int = 8


def init_params(n_users: int, n_items: int, cfg: HPFMapConfig) -> dict:
    """Gaussian(0, 0.1) init of the unconstrained parameters.  The reference
    uses torch.randn without an explicit seed (`hpf_pytorch.py:39-48`); here
    init is deterministic via numpy default_rng(random_state).  Draw order
    (theta, beta, xi, eta) matches the historical per-leaf layout; the
    scalar parameters are stored as the last column of each table."""
    rng = np.random.default_rng(cfg.random_state)
    K = cfg.n_factors
    dt = np.dtype(cfg.dtype)
    theta = (0.1 * rng.standard_normal((n_users, K))).astype(dt)
    beta = (0.1 * rng.standard_normal((n_items, K))).astype(dt)
    xi = (0.1 * rng.standard_normal(n_users)).astype(dt)
    eta = (0.1 * rng.standard_normal(n_items)).astype(dt)
    return {
        "user": jnp.asarray(np.concatenate([theta, xi[:, None]], axis=1)),
        "item": jnp.asarray(np.concatenate([beta, eta[:, None]], axis=1)),
    }


def batch_loss(params, u, i, x, mask, user_scale, item_scale, cfg_scalars):
    """Masked MAP loss of one batch; ``mask`` zeroes padded rows."""
    a, a_prime, b_prime, c, c_prime, d_prime = cfg_scalars
    urows = jax.nn.softplus(gather_rows(params["user"], u))
    irows = jax.nn.softplus(gather_rows(params["item"], i))
    theta, xi = urows[:, :-1], urows[:, -1]
    beta, eta = irows[:, :-1], irows[:, -1]
    m = mask.astype(theta.dtype)

    lam = jnp.maximum(edge_dot(theta, beta), LAMBDA_FLOOR)
    nll = jnp.sum(m * (lam - x * jnp.log(lam)))

    u_scale = gather_rows(user_scale, u) * m
    i_scale = gather_rows(item_scale, i) * m

    # -log Gamma(theta | a, xi) summed over K, terms involving theta and xi.
    lp_theta = jnp.sum(
        -a * jnp.log(xi)[:, None] + xi[:, None] * theta - (a - 1.0) * jnp.log(theta),
        axis=1,
    )
    lp_beta = jnp.sum(
        -c * jnp.log(eta)[:, None] + eta[:, None] * beta - (c - 1.0) * jnp.log(beta),
        axis=1,
    )
    lp_xi = -(a_prime - 1.0) * jnp.log(xi) + b_prime * xi
    lp_eta = -(c_prime - 1.0) * jnp.log(eta) + d_prime * eta

    prior = (
        jnp.sum(lp_theta * u_scale)
        + jnp.sum(lp_beta * i_scale)
        + jnp.sum(lp_xi * u_scale)
        + jnp.sum(lp_eta * i_scale)
    )
    return nll + prior


@partial(jax.jit, static_argnames=("optimizer", "batch_size"),
         donate_argnums=(0, 1))
def train_epoch(
    params,
    opt_state,
    key,
    ui_all,
    x_all,
    user_scale,
    item_scale,
    cfg_scalars,
    optimizer,
    batch_size,
):
    """One epoch: shuffle, batch, scan Adam steps.

    ``ui_all``: (n_pad, 2) int32 with columns [u-or-minus-one, i]; padding
    rows carry u == -1 (the batch mask).  Shuffle gathers are latency-
    bound per ROW, so packing (u, i, mask) into one 2-wide int32 row
    gather replaces three separate 25M-element permutation gathers (u, i,
    bool mask) with one; only x keeps its own gather (dtype-exact)."""
    n = ui_all.shape[0]
    n_batches = n // batch_size
    perm = jax.random.permutation(key, n)
    uib = ui_all[perm].reshape(n_batches, batch_size, 2)
    xb = x_all[perm].reshape(n_batches, batch_size)

    def step(carry, batch):
        p, s = carry
        rows, bx = batch
        bm = rows[:, 0] >= 0
        bu = jnp.maximum(rows[:, 0], 0)
        bi = rows[:, 1]
        loss, grads = jax.value_and_grad(batch_loss)(
            p, bu, bi, bx, bm, user_scale, item_scale, cfg_scalars
        )
        updates, s = optimizer.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), (uib, xb))
    return params, opt_state, jnp.sum(losses)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["sb", "ob", "loc", "x", "seg_row0", "seg_nrows",
                 "u_old_of_new", "u_new_of_old", "i_old_of_new",
                 "i_new_of_old"],
    meta_fields=["n_segments", "seg_chunks", "chunk_size", "group",
                 "bs_self", "bs_other", "n_self_blocks", "n_other_blocks",
                 "out_rows", "n_users", "n_items"],
)
@dataclasses.dataclass(frozen=True)
class MapBlockedLayout:
    """Blocked by_user layout reshaped for segment-per-Adam-step SGD.

    One direction serves both sides: the gradient kernel
    (`pmf_tpu.ops.pallas.map_grad`) emits user-side grads accumulated per
    block and item-side grads as per-chunk dense slabs.  Rows are in
    count-reordered (new) coordinates; params/scales/eval ids live
    permanently permuted during the fit (perms are the
    `pmf_tpu.data.blocked._build_pass` relabeling)."""

    sb: jax.Array  # (n_seg, SEG) chunk -> user block
    ob: jax.Array  # (n_seg, SEG) chunk -> item block
    loc: jax.Array  # (n_seg, SEG*C) packed local ids
    x: jax.Array  # (n_seg, SEG*C) f32 ratings
    seg_row0: jax.Array  # (n_seg,) first output row of the segment
    seg_nrows: jax.Array  # (n_seg,) real output rows (mask)
    u_old_of_new: jax.Array
    u_new_of_old: jax.Array
    i_old_of_new: jax.Array
    i_new_of_old: jax.Array
    n_segments: int
    seg_chunks: int
    chunk_size: int
    group: int
    bs_self: int
    bs_other: int
    n_self_blocks: int
    n_other_blocks: int
    out_rows: int
    n_users: int
    n_items: int


def build_map_layout(u, i, x, n_users: int, n_items: int,
                     batch_size: int, dtype=np.float32,
                     mix: int = 1) -> MapBlockedLayout:
    """Blocked tile layout for the SGD path: popularity-reordered
    (user_block, item_block) tiles, uniform DENSE segments (no block-
    boundary alignment — a user band's chunks may straddle segments,
    splitting its edges across Adam steps, and no dummy padding burns
    kernel time) of ~batch_size/mix edge slots.  Each Adam step consumes
    ``mix`` segments drawn from the epoch's segment shuffle, so a step's
    batch spans ``mix`` distant row bands instead of one — the batch
    decorrelation that makes the blocked engine quality-comparable to
    uniformly shuffled SGD (VERDICT r4 #2: one-segment steps reached val
    RMSE 0.782 vs flat's 0.677 at epoch 40 on ML-25M).  The segment
    count pads to a multiple of ``mix`` with all-padding dummy segments
    (zero contribution, masked rows)."""
    from pmf_tpu.data.blocked import _build_pass, auto_tiles

    t = auto_tiles(n_users, n_items, len(u))
    C, G = t["chunk_size"], t["group"]
    bs_u, bs_i = t["block_users"], t["block_items"]
    per_step = max(batch_size // max(mix, 1), C)
    seg = max(G, min(4096, (per_step // C) // G * G))
    p = _build_pass(
        np.asarray(u, np.int64), np.asarray(i, np.int64), np.asarray(x),
        n_users, n_items, bs_u, bs_i, C, dtype, reorder=True, group=G,
        seg_max_override=seg, seg_align_blocks=False, device=False,
    )
    n_seg = p.n_chunks // p.seg_chunks
    SEG = p.seg_chunks
    sb = np.asarray(p.chunk_self_block).reshape(n_seg, SEG)
    ob = np.asarray(p.chunk_other_block).reshape(n_seg, SEG)
    loc = np.asarray(p.loc).reshape(n_seg, SEG * p.chunk_size)
    xs = np.asarray(p.x, np.float32).reshape(n_seg, SEG * p.chunk_size)
    row0 = np.asarray(p.seg_first_block, np.int32) * p.bs_self
    nrows = np.asarray(p.seg_n_blocks, np.int32) * p.bs_self
    if n_seg % max(mix, 1):
        # Dummy segments: all-padding loc (one-hot matches nothing), zero
        # ratings, nrows == 0 masks the self window.
        extra = mix - n_seg % mix
        pad_packed = np.int32((p.bs_self << 16) | p.bs_other)
        sb = np.concatenate([sb, np.zeros((extra, SEG), np.int32)])
        ob = np.concatenate([ob, np.zeros((extra, SEG), np.int32)])
        loc = np.concatenate(
            [loc, np.full((extra, SEG * p.chunk_size), pad_packed, np.int32)])
        xs = np.concatenate(
            [xs, np.zeros((extra, SEG * p.chunk_size), np.float32)])
        row0 = np.concatenate([row0, np.zeros(extra, np.int32)])
        nrows = np.concatenate([nrows, np.zeros(extra, np.int32)])
        n_seg += extra
    i_new_of_old = jnp.zeros((n_items,), jnp.int32).at[
        jnp.asarray(p.other_old_of_new)].set(
            jnp.arange(n_items, dtype=jnp.int32))
    return MapBlockedLayout(
        sb=jnp.asarray(sb),
        ob=jnp.asarray(ob),
        loc=jnp.asarray(loc),
        x=jnp.asarray(xs),
        seg_row0=jnp.asarray(row0),
        seg_nrows=jnp.asarray(nrows),
        u_old_of_new=jnp.asarray(p.self_old_of_new),
        u_new_of_old=jnp.asarray(p.self_new_of_old),
        i_old_of_new=jnp.asarray(p.other_old_of_new),
        i_new_of_old=i_new_of_old,
        n_segments=n_seg, seg_chunks=SEG, chunk_size=p.chunk_size,
        group=p.group, bs_self=p.bs_self, bs_other=p.bs_other,
        n_self_blocks=p.n_self_blocks, n_other_blocks=p.n_other_blocks,
        out_rows=max(p.seg_n_blocks) * p.bs_self,
        n_users=n_users, n_items=n_items,
    )


@partial(jax.jit, static_argnames=("optimizer", "precision", "interpret",
                                   "mix"),
         donate_argnums=(0, 1))
def train_epoch_blocked(
    params,
    opt_state,
    key,
    lay: MapBlockedLayout,
    user_scale,
    item_scale,
    cfg_scalars,
    optimizer,
    precision: str = "mid",
    interpret: bool = False,
    mix: int = 1,
):
    """One epoch of shuffled block-tile SGD: `lax.scan` over the layout's
    segments in a fresh random order, one Adam step per ``mix`` segments
    (gradients accumulated across them before the update), gradients from
    the fused Pallas kernel (`pmf_tpu.ops.pallas.map_grad`).  With
    ``mix > 1`` each step's batch is the union of ``mix`` segments drawn
    from the epoch-wide shuffle — row bands from all over the matrix —
    instead of one contiguous tile band (see `build_map_layout`).

    params/scales are in PERMUTED (count-reordered) row coordinates."""
    from pmf_tpu.ops.pallas.cavi_edge import decompose_bf16
    from pmf_tpu.ops.pallas.map_grad import make_map_grad_call

    a, a_prime, b_prime, c, c_prime, d_prime = cfg_scalars
    parts = {"fast": 1, "mid": 2, "high": 3, "highest": 1}[precision]
    highest = precision == "highest"
    K = params["user"].shape[1] - 1
    SEG, C, G = lay.seg_chunks, lay.chunk_size, lay.group
    n_self_pad = lay.n_self_blocks * lay.bs_self
    n_other_pad = lay.n_other_blocks * lay.bs_other
    out_rows = lay.out_rows
    if lay.n_segments % mix:
        raise ValueError(
            f"layout n_segments={lay.n_segments} not a multiple of "
            f"mix={mix} (build_map_layout pads to the mix used at build)")
    n_steps = lay.n_segments // mix

    perm = jax.random.permutation(key, lay.n_segments)

    def shaped(a2):
        return a2[perm].reshape((n_steps, mix) + a2.shape[1:])

    xs = (shaped(lay.sb), shaped(lay.ob), shaped(lay.loc), shaped(lay.x),
          shaped(lay.seg_row0), shaped(lay.seg_nrows))

    def prep(table, n_pad):
        sp = jax.nn.softplus(table.astype(jnp.float32))
        t = sp if highest else decompose_bf16(sp, parts)
        return sp, jnp.pad(t, ((0, n_pad - t.shape[0]), (0, 0)))

    # Build the segment call once (static geometry).
    sp0, upad0 = prep(params["user"], n_self_pad)
    call = make_map_grad_call(
        bs_self=lay.bs_self, bs_other=lay.bs_other, chunk_size=C,
        KT=upad0.shape[1], K=K, parts=parts, highest=highest, group=G,
        seg_chunks=SEG, out_rows=out_rows, lam_floor=LAMBDA_FLOOR,
        interpret=interpret,
    )
    del sp0, upad0
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (out_rows, 1), 0)

    def step(carry, seg):
        p, s = carry
        sb, ob, loc, xv, r0, nr = seg
        u_sp, u_pad = prep(p["user"], n_self_pad)
        i_sp, i_pad = prep(p["item"], n_other_pad)
        theta, xi = u_sp[:, :K], u_sp[:, K]
        beta, eta = i_sp[:, :K], i_sp[:, K]

        # User-side windows ADD into one accumulator (mixed segments can
        # share or straddle blocks); item side scatter-adds chunk slabs.
        acc_u_full = jnp.zeros((n_self_pad + out_rows, K + 2), jnp.float32)
        acc_i_blocks = jnp.zeros(
            (lay.n_other_blocks, lay.bs_other, K + 1), jnp.float32)
        zero = jnp.zeros((), r0.dtype)
        for j in range(mix):
            self_g, other_g = call(
                sb[j], ob[j], loc[j].reshape(SEG * C, 1),
                xv[j].reshape(SEG * C, 1), u_pad, *([i_pad] * G))
            self_g = jnp.where(row_ids < nr[j], self_g, 0.0)
            region = jax.lax.dynamic_slice(
                acc_u_full, (r0[j], zero), (out_rows, K + 2))
            acc_u_full = jax.lax.dynamic_update_slice(
                acc_u_full, region + self_g, (r0[j], zero))
            acc_i_blocks = acc_i_blocks.at[ob[j]].add(
                other_g.reshape(SEG, lay.bs_other, K + 1))
        acc_u = acc_u_full[: lay.n_users]
        g_theta_nll, cnt_u, nll_rows = (
            acc_u[:, :K], acc_u[:, K], acc_u[:, K + 1])
        acc_i = acc_i_blocks.reshape(n_other_pad, K + 1)[: lay.n_items]
        g_beta_nll, cnt_i = acc_i[:, :K], acc_i[:, K]

        # Frequency-scaled prior gradients, dense and row-local
        # (`hpf_pytorch.py:129-180` via batch_loss): weight = batch count
        # times 1/count(entity).
        wu = cnt_u * user_scale
        wi = cnt_i * item_scale
        g_theta = g_theta_nll + wu[:, None] * (xi[:, None] - (a - 1.0) / theta)
        g_xi = wu * (-a * K / xi + theta.sum(1)
                     - (a_prime - 1.0) / xi + b_prime)
        g_beta = g_beta_nll + wi[:, None] * (eta[:, None] - (c - 1.0) / beta)
        g_eta = wi * (-c * K / eta + beta.sum(1)
                      - (c_prime - 1.0) / eta + d_prime)

        sig_u = jax.nn.sigmoid(p["user"].astype(jnp.float32))
        sig_i = jax.nn.sigmoid(p["item"].astype(jnp.float32))
        dt = p["user"].dtype
        grads = {
            "user": (jnp.concatenate([g_theta, g_xi[:, None]], 1)
                     * sig_u).astype(dt),
            "item": (jnp.concatenate([g_beta, g_eta[:, None]], 1)
                     * sig_i).astype(dt),
        }

        lp_theta = jnp.sum(-a * jnp.log(xi)[:, None] + xi[:, None] * theta
                           - (a - 1.0) * jnp.log(theta), axis=1)
        lp_beta = jnp.sum(-c * jnp.log(eta)[:, None] + eta[:, None] * beta
                          - (c - 1.0) * jnp.log(beta), axis=1)
        lp_xi = -(a_prime - 1.0) * jnp.log(xi) + b_prime * xi
        lp_eta = -(c_prime - 1.0) * jnp.log(eta) + d_prime * eta
        loss = (jnp.sum(nll_rows) + jnp.sum(wu * (lp_theta + lp_xi))
                + jnp.sum(wi * (lp_beta + lp_eta)))

        updates, s = optimizer.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), xs)
    return params, opt_state, jnp.sum(losses)


@jax.jit
def eval_metrics(params: dict, ev: EvalSet):
    theta = jax.nn.softplus(params["user"][:, :-1])
    beta = jax.nn.softplus(params["item"][:, :-1])
    pred = edge_dot(gather_rows(theta, ev.u), gather_rows(beta, ev.i))
    pred = jnp.where(ev.valid, pred, 0.0)
    r = masked_rmse(ev.x, pred, ev.real)
    mm = masked_macro_mae(ev.x, pred, ev.real, ev.class_id, ev.n_classes)
    return r, mm


def _permute_rows(params, opt_state, u_perm, i_perm):
    """Apply row permutations to the parameter tables AND the Adam moments
    (elementwise optimizer state rides with its parameter row, so the
    update trajectory is invariant to the relabeling)."""
    def f(t):
        return {"user": jnp.take(t["user"], u_perm, axis=0),
                "item": jnp.take(t["item"], i_perm, axis=0)}

    new_state = tuple(
        s._replace(mu=f(s.mu), nu=f(s.nu))
        if hasattr(s, "mu") and hasattr(s, "nu") else s
        for s in opt_state
    )
    return f(params), new_state


def _pack_ckpt(params, opt_state, key, epoch) -> dict:
    """Flatten (params, Adam state, RNG key, epoch) into a flat array dict
    for `pmf_tpu.utils.checkpoint.save_state`.  Leaves are enumerated in
    tree order; the tree structure is reproducible from a fresh
    ``optimizer.init(params)`` template at load time."""
    leaves = jax.tree_util.tree_leaves((params, opt_state))
    out = {f"leaf_{n}": leaf for n, leaf in enumerate(leaves)}
    out["rng_key_data"] = jax.random.key_data(key)
    out["epoch"] = jnp.asarray(epoch, jnp.int32)
    return out


def _unpack_ckpt(flat: dict, params_template, optimizer):
    """Inverse of :func:`_pack_ckpt` given a params template of matching
    shapes (the optimizer state tree is rebuilt from ``optimizer.init``)."""
    template = (params_template, optimizer.init(params_template))
    treedef = jax.tree_util.tree_structure(template)
    n_leaves = treedef.num_leaves
    t_leaves = jax.tree_util.tree_leaves(template)
    leaves = []
    for n in range(n_leaves):
        if f"leaf_{n}" not in flat:
            raise ValueError(
                f"checkpoint is missing leaf_{n} (have {n_leaves} expected "
                "leaves) — saved by an incompatible model/optimizer?"
            )
        leaf = jnp.asarray(flat[f"leaf_{n}"])
        if leaf.shape != t_leaves[n].shape:
            raise ValueError(
                f"checkpoint leaf_{n} shape {leaf.shape} does not match the "
                f"model/optimizer state ({t_leaves[n].shape})"
            )
        leaves.append(leaf.astype(t_leaves[n].dtype))
    params, opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    key = jax.random.wrap_key_data(jnp.asarray(flat["rng_key_data"]))
    epoch = int(flat["epoch"])
    return params, opt_state, key, epoch


class HPFMap(FactorModel):
    """Reference-compatible facade for the MAP/SGD HPF path.

    Unlike the reference, which restarts MAP training from scratch every
    run (`/root/reference/src/experiments/train_hpf_pytorch_full.py:96-108`),
    ``fit`` supports exact mid-training checkpoint/resume including the
    Adam moments and the epoch RNG key (SURVEY §5.4)."""

    def fit(self, train_df, val_df=None, resume_from=None,
            checkpoint_dir=None, checkpoint_every=5, mesh=None,
            profile_dir=None):
        """``mesh``: optional `jax.sharding.Mesh` — data-parallel SGD: the
        epoch's rating arrays shard on the batch-element axis ("data"),
        params/Adam state replicate, and GSPMD psums the per-shard gradient
        scatter contributions over ICI each step."""
        cfg = self.config
        u, i, x = as_triples(train_df)
        self.n_users = int(u.max()) + 1
        self.n_items = int(i.max()) + 1
        if cfg.verbose:
            print(f"Inferred n_users={self.n_users}, n_items={self.n_items}", flush=True)

        dt = self._dtype
        nnz = len(u)
        B = cfg.batch_size

        # 1/count scaling with the reference's 1e-6 guard (`hpf_pytorch.py:33-35`).
        user_counts = np.bincount(u, minlength=self.n_users)
        item_counts = np.bincount(i, minlength=self.n_items)
        user_scale = jnp.asarray(1.0 / (user_counts + 1e-6), dtype=dt)
        item_scale = jnp.asarray(1.0 / (item_counts + 1e-6), dtype=dt)

        cfg_scalars = tuple(
            float(v)
            for v in (cfg.a, cfg.a_prime, cfg.b_prime, cfg.c, cfg.c_prime, cfg.d_prime)
        )

        from pmf_tpu.models.base import resolve_engine

        # "auto" stays flat for the MAP path (see HPFMapConfig.engine):
        # blocked tile batches change SGD batch composition, so they are
        # opt-in rather than a silent default.
        engine = ("flat" if cfg.engine == "auto"
                  else resolve_engine(cfg.engine, self.n_users,
                                      self.n_items, nnz))
        blocked = engine.startswith("blocked") and mesh is None
        if engine.startswith("blocked") and mesh is not None and cfg.verbose:
            print("HPFMap: blocked engine has no mesh path yet; using flat "
                  "DP batches", flush=True)
        # Record what actually runs (the mesh fallback above overrides a
        # blocked request).
        self.engine_used = engine if blocked else "flat"

        params = init_params(self.n_users, self.n_items, cfg)
        optimizer = optax.adam(cfg.lr)
        opt_state = optimizer.init(params)
        key = jax.random.key(cfg.random_state)
        start_epoch = 1
        if resume_from is not None:
            from pmf_tpu.utils.checkpoint import load_state

            flat, _ = load_state(resume_from)
            params, opt_state, key, done_epoch = _unpack_ckpt(flat, params, optimizer)
            start_epoch = done_epoch + 1
            if cfg.verbose:
                print(f"Resumed from {resume_from} after epoch {done_epoch}", flush=True)

        val = self._build_eval(val_df) if val_df is not None else None
        export_fn = lambda p, s: (p, s)  # noqa: E731
        if blocked:
            # Shuffled block-tile SGD (see HPFMapConfig.engine): params,
            # Adam moments, scales, and eval ids live in count-reordered
            # row coordinates for the whole fit; checkpoints and the final
            # state export unpermute.
            lay = build_map_layout(u, i, x, self.n_users, self.n_items,
                                   B, dtype=dt, mix=cfg.mix)
            precision = {"blocked_fast": "fast", "blocked_mid": "mid",
                         "blocked_high": "high"}.get(engine, "high")
            interpret = jax.default_backend() == "cpu"
            u_o2n, i_o2n = lay.u_old_of_new, lay.i_old_of_new
            u_n2o, i_n2o = lay.u_new_of_old, lay.i_new_of_old
            params, opt_state = _permute_rows(params, opt_state, u_o2n, i_o2n)
            user_scale = user_scale[u_o2n]
            item_scale = item_scale[i_o2n]
            if val is not None:
                val = dataclasses.replace(
                    val,
                    u=u_n2o[jnp.clip(val.u, 0, self.n_users - 1)],
                    i=i_n2o[jnp.clip(val.i, 0, self.n_items - 1)],
                )
            if cfg.verbose:
                print(f"HPFMap engine={engine}: "
                      f"{lay.n_segments // cfg.mix} steps/epoch of "
                      f"mix={cfg.mix} segments x "
                      f"{lay.seg_chunks * lay.chunk_size} edge slots",
                      flush=True)

            def epoch_fn(p, s, k):
                return train_epoch_blocked(
                    p, s, k, lay, user_scale, item_scale, cfg_scalars,
                    optimizer, precision=precision, interpret=interpret,
                    mix=cfg.mix)

            def export_fn(p, s):  # noqa: F811
                return _permute_rows(p, s, u_n2o, i_n2o)
        else:
            n_batches = max((nnz + B - 1) // B, 1)
            n_pad = n_batches * B
            # Packed (n_pad, 2) int32 [u | i]; padding rows carry u == -1 so
            # the mask needs no separate array/gather (see train_epoch).
            ui = np.full((n_pad, 2), -1, dtype=np.int32)
            ui[:nnz, 0] = u
            ui[:nnz, 1] = i
            ui[nnz:, 1] = 0
            ui_all = jnp.asarray(ui)
            x_pad = np.zeros((n_pad,), dtype=dt)
            x_pad[:nnz] = x
            x_all = jnp.asarray(x_pad)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                from pmf_tpu.parallel import DATA_AXIS, replicate, shard_eval_set

                n_dev = mesh.devices.size
                if B % n_dev != 0:
                    raise ValueError(
                        f"batch_size={B} not divisible by {n_dev} mesh devices"
                    )
                edge = NamedSharding(mesh, P(DATA_AXIS))
                ui_all = jax.device_put(ui_all, NamedSharding(mesh, P(DATA_AXIS, None)))
                x_all = jax.device_put(x_all, edge)
                params = replicate(params, mesh)
                opt_state = replicate(opt_state, mesh)
                user_scale = jax.device_put(user_scale, NamedSharding(mesh, P()))
                item_scale = jax.device_put(item_scale, NamedSharding(mesh, P()))
                if val is not None:
                    val = shard_eval_set(val, mesh)

            def epoch_fn(p, s, k):
                return train_epoch(p, s, k, ui_all, x_all, user_scale,
                                   item_scale, cfg_scalars, optimizer,
                                   cfg.batch_size)

        self.fit_history = []
        self.best_val_rmse = float("inf")
        import contextlib
        import time as _time

        prof = (
            jax.profiler.trace(profile_dir) if profile_dir
            else contextlib.nullcontext()
        )
        with prof:
            self._run_epochs(
                cfg, start_epoch, key, params, opt_state, nnz, epoch_fn,
                val, checkpoint_dir, checkpoint_every, _time, export_fn,
            )
        return self

    def _run_epochs(self, cfg, start_epoch, key, params, opt_state, nnz,
                    epoch_fn, val, checkpoint_dir, checkpoint_every, _time,
                    export_fn):
        for epoch in range(start_epoch, cfg.epochs + 1):
            t0 = _time.perf_counter()
            key, sub = jax.random.split(key)
            params, opt_state, loss = epoch_fn(params, opt_state, sub)
            record = {"epoch": epoch, "train_loss": float(loss)}
            record["epoch_seconds"] = _time.perf_counter() - t0
            record["updates_per_sec"] = nnz / record["epoch_seconds"]
            if val is not None:
                val_rmse, val_macro = eval_metrics(params, val)
                record.update(val_rmse=float(val_rmse), val_macro_mae=float(val_macro))
                self.best_val_rmse = min(self.best_val_rmse, float(val_rmse))
                if cfg.verbose:
                    print(
                        f"HPFMap epoch {epoch}/{cfg.epochs} | loss {float(loss):.1f} | "
                        f"val RMSE {float(val_rmse):.4f}",
                        flush=True,
                    )
            elif cfg.verbose:
                print(f"HPFMap epoch {epoch}/{cfg.epochs} | loss {float(loss):.1f}", flush=True)
            self.fit_history.append(record)
            if checkpoint_dir and epoch % checkpoint_every == 0:
                from pmf_tpu.utils.checkpoint import save_state

                # Checkpoints always store ORIGINAL row order (export_fn
                # unpermutes blocked-engine state), so resume works across
                # engines.
                cp, cs = export_fn(params, opt_state)
                save_state(
                    checkpoint_dir,
                    _pack_ckpt(cp, cs, key, epoch),
                    {"epoch": epoch, "name": "HPFMap"},
                )

        self.state, _ = export_fn(params, opt_state)
        return self

    def _point_estimates(self):
        return (
            jax.nn.softplus(self.state["user"][:, :-1]),
            jax.nn.softplus(self.state["item"][:, :-1]),
        )

    def predict(self, user_ids, item_ids) -> np.ndarray:
        return super().predict(user_ids, item_ids)

    def evaluate_rmse(self, df) -> float:
        from pmf_tpu.eval.metrics import rmse

        u, i, x = as_triples(df)
        return rmse(x, self.predict(u, i))

    def evaluate_macro_mae(self, df) -> float:
        from pmf_tpu.eval.metrics import macro_mae

        u, i, x = as_triples(df)
        return macro_mae(x, self.predict(u, i))
