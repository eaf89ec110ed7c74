"""Train state, optimizer, and LR scheduling.

Optimizer parity: the reference uses a vendored torch-style AdamW
(lib/AdamW.py:33-43 — betas (0.9, 0.999), eps 1e-8, decoupled weight decay
1e-2 multiplied by lr) behind global-norm gradient clipping at 5.0
(tools/train_STTran.py:193). optax.adamw implements the identical update, so
the chain is clip_by_global_norm(5.0) -> adamw(lr, wd).

LR schedule parity: torch ReduceLROnPlateau(mode='max', patience=1,
factor=0.5, threshold=1e-4, threshold_mode='abs', min_lr=1e-7) stepped on the
epoch-mean R@20 (tools/train_STTran.py:117,232). Reproduced host-side as
`PlateauScheduler`; the live lr flows into the jitted step through
optax.inject_hyperparams.

NaN guard parity: the reference skips the optimizer step when the loss is NaN
or the video grounded zero boxes (lib/utils.py:3-12). Inside jit this becomes
a `lax.cond` around the optimizer apply (see step.py).
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import core, struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: core.FrozenDict[str, Any]
    batch_stats: core.FrozenDict[str, Any]
    opt_state: optax.OptState
    skipped: jax.Array  # cumulative NaN/empty-video skips (lib/utils.py:3-12)


def make_optimizer(lr: float = 1e-5, weight_decay: float = 1e-2,
                   grad_clip_norm: float = 5.0) -> optax.GradientTransformation:
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(grad_clip_norm),
            optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                        weight_decay=weight_decay),
        ))(learning_rate=lr)


def create_train_state(model, sample_entry, rng, lr: float = 1e-5,
                       weight_decay: float = 1e-2,
                       grad_clip_norm: float = 5.0,
                       tx: optax.GradientTransformation | None = None) -> tuple[TrainState, optax.GradientTransformation]:
    """Initialize params/batch_stats from one (unbatched) Entry."""
    variables = model.init({"params": rng, "dropout": rng}, sample_entry, train=False)
    tx = tx or make_optimizer(lr, weight_decay, grad_clip_norm)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", core.FrozenDict())
    state = TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        skipped=jax.numpy.zeros((), jax.numpy.int32),
    )
    return state, tx


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Write a new lr into the injected hyperparams (host-side scheduler).

    The new scalar keeps the OLD leaf's sharding: on a sharded/multi-host
    state a bare jnp.asarray would be a single-device host-local array,
    which Orbax refuses to serialize when the post-eval checkpoint saves it
    and which would force implicit transfers in the next jitted step."""
    opt_state = state.opt_state
    old = opt_state.hyperparams.get("learning_rate")
    new = jax.numpy.asarray(lr, jax.numpy.float32)
    if hasattr(old, "sharding"):
        new = jax.device_put(new, old.sharding)
    opt_state.hyperparams["learning_rate"] = new
    return state.replace(opt_state=opt_state)


class PlateauScheduler:
    """torch.optim.lr_scheduler.ReduceLROnPlateau, mode='max',
    threshold_mode='abs' (tools/train_STTran.py:117)."""

    def __init__(self, lr: float, patience: int = 1, factor: float = 0.5,
                 threshold: float = 1e-4, min_lr: float = 1e-7):
        self.lr = lr
        self.patience = patience
        self.factor = factor
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = float("-inf")
        self.num_bad = 0

    def step(self, score: float) -> float:
        """Feed the epoch score; returns the (possibly reduced) lr."""
        if score > self.best + self.threshold:
            self.best = score
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr

    def state_dict(self) -> dict:
        """Persistable plateau state — without it a resume would reset the
        decayed lr back to cfg.lr at the first post-resume epoch."""
        return {"lr": self.lr, "best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, d: dict) -> None:
        self.lr = float(d["lr"])
        self.best = float(d["best"])
        self.num_bad = int(d["num_bad"])
