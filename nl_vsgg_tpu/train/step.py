"""Jit-compiled train/eval steps over batched Entry pytrees.

The reference steps on one video at a time (cuda_collate_fn,
dataloader/wk_action_genome.py:622-627). Here a *batch of videos* is the unit:
Entries are stacked on a leading axis and the per-video model is `vmap`ed, so
the same compiled step serves batch=1 (reference semantics) and data-parallel
batches sharded over the mesh's 'data' axis (parallel/mesh.py). Gradients
average over videos; with the batch sharded, XLA inserts the cross-chip
all-reduce automatically.

BatchNorm note: the reference computes BN statistics per step over its single
video. Under vmap each video gets its own statistics (identical math), and the
running averages are updated with the across-video mean of the per-video
statistics — which for batch=1 is exactly the reference update. Both the loss
mean and the stats mean are weighted by a per-video validity flag
(box_mask.any()) so all-zero padded videos (mesh fill) contribute nothing.

The NaN/empty-video guard (lib/utils.py:3-12, applied per step in
tools/train_STTran.py:191) is a `lax.cond` around the optimizer apply:
invalid steps leave params/opt_state/batch_stats untouched and bump
`state.skipped`; valid steps pay no select pass over the state tree.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..data.entry import Entry
from ..models.losses import sttran_losses
from .state import TrainState


def stack_entries(entries: list[Entry]) -> Entry:
    """Stack same-bucket Entries into a leading batch axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *entries)


def place_entries(entries: list[Entry], zero_union: bool = False,
                  cast_bf16: bool = False, rel_bf16: bool = False) -> Entry:
    """Device-ready batch from host Entries, transfer-count- and byte-aware.

    Two properties matter on latency-bound links (a tunneled chip pays
    ~30-45 ms PER transfer):

      * leaves are stacked on the HOST and uploaded as ONE transfer each
        (~17 transfers per batch) instead of per-video device_puts
        (~17 x batch transfers);
      * `zero_union=True` (no union-feature provider -> union_feat is
        all-zeros) ships a WIDTH-0 union_feat (B, R, 7, 7, 0): union_feat is
        ~95% of an Entry's bytes (38 MB/video at the production 96x7x7x2048
        shape), and the models' union_projection turns the absent channel
        into an exact bias broadcast (models/sttran.py) — no zeros are
        materialized anywhere and the union matmul disappears from the step.

    `cast_bf16` additionally uploads the three large float arrays
    (features / union_feat / spatial_masks) at bf16 width — for serving
    with a bf16-compute model, which casts them anyway.

    `rel_bf16` casts ONLY union_feat + spatial_masks: with a bf16-compute
    model these two arrays are consumed exclusively by bf16 submodules
    (union_func1 / SpatialMaskConv), so the cast is EXACTLY the model's own
    and the train-path math is bit-identical — but union_feat, the largest
    operand of the step, streams from HBM at half width in both fwd and
    wgrad (measured ~7.2 -> ~3.6 ms of the b64 step, tools/probe_trace.py).
    `features` stays fp32: the object classifier consumes it in fp32.
    """
    import numpy as np
    rel_bf16 = rel_bf16 or cast_bf16
    big = jnp.bfloat16 if rel_bf16 else jnp.float32
    uf_shape = (len(entries),) + tuple(np.shape(entries[0].union_feat))
    if zero_union:
        placeholder = np.zeros((1,), np.float32)
        entries = [e.replace(union_feat=placeholder) for e in entries]
    host = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                        *entries)
    if zero_union:
        host = host.replace(union_feat=jnp.zeros(uf_shape[:-1] + (0,), big))
    elif rel_bf16:
        host = host.replace(union_feat=jnp.asarray(host.union_feat, big))
    if rel_bf16:
        host = host.replace(spatial_masks=jnp.asarray(host.spatial_masks, big))
    if cast_bf16:
        host = host.replace(features=jnp.asarray(host.features, jnp.bfloat16))
    return jax.tree.map(jnp.asarray, host)


def make_train_step(model, tx, bce: bool = True) -> Callable:
    """Returns train_step(state, batch: Entry[B, ...], rng) -> (state, metrics)."""

    def train_step(state: TrainState, batch: Entry, rng: jax.Array):
        n_videos = batch.num_frames.shape[0]
        keys = jax.random.split(rng, n_videos)
        # per-video validity: all-zero padded videos (added by place_batch to
        # fill the data axis) carry no boxes; they must not dilute the batch
        # loss mean nor pull BatchNorm running stats toward zero
        vid_w = batch.box_mask.any(-1).astype(jnp.float32)
        denom = jnp.maximum(vid_w.sum(), 1.0)

        def wmean(x):
            w = vid_w.reshape((-1,) + (1,) * (x.ndim - 1))
            # where (not multiply): a NaN from a padded video must not poison
            # the sum (NaN * 0 == NaN); NaNs from real videos still propagate
            # into the valid-step guard below
            return jnp.where(w > 0, x * w, 0.0).sum(0) / denom

        def loss_fn(params):
            def per_video(entry: Entry, key: jax.Array):
                drop_rng, sample_rng = jax.random.split(key)
                pred, updates = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    entry, train=True, mutable=["batch_stats"],
                    rngs={"dropout": drop_rng})
                losses = sttran_losses(pred, entry, sample_rng, bce=bce)
                return losses, updates["batch_stats"]

            losses, new_stats = jax.vmap(per_video)(batch, keys)
            mean_losses = jax.tree.map(wmean, losses)
            new_stats = jax.tree.map(wmean, new_stats)
            return mean_losses["total"], (mean_losses, new_stats)

        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        # check_valid_iter (lib/utils.py:3-12): skip on NaN loss / empty labels
        finite = jnp.isfinite(total)
        for g in jax.tree.leaves(grads):
            finite &= jnp.isfinite(g).all()
        has_boxes = batch.box_mask.any()
        valid = finite & has_boxes

        # Branch (lax.cond), don't select: a tree-wide `where` over
        # params+m+v would stream ~3x the parameter bytes through HBM on
        # EVERY step to guard the rare invalid one (measured 3.8 ms of an
        # 86 ms b64 step, tools/probe_trace.py). The true branch only runs
        # on all-finite grads, so no NaN ever reaches the optimizer and the
        # skipped step leaves params/opt_state/batch_stats bit-identical —
        # the same semantics the reference gets by `continue` on
        # check_valid_iter failure.
        def do_update(grads, new_stats):
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
            return new_params, new_opt, new_stats

        def skip_update(grads, new_stats):
            return state.params, state.opt_state, state.batch_stats

        new_params, new_opt, kept_stats = jax.lax.cond(
            valid, do_update, skip_update, grads, new_stats)

        state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=kept_stats,
            opt_state=new_opt,
            skipped=state.skipped + jnp.where(valid, 0, 1).astype(jnp.int32),
        )
        metrics = dict(losses, valid=valid.astype(jnp.float32))
        return state, metrics

    return train_step


def make_eval_step(model) -> Callable:
    """Returns eval_step(state, batch: Entry[B, ...]) -> pred dict[B, ...]."""

    def eval_step(state: TrainState, batch: Entry):
        def per_video(entry: Entry):
            return model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                entry, train=False)

        return jax.vmap(per_video)(batch)

    return eval_step
