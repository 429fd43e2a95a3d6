"""Motion-segmentation trainer: optax AdamW + class-balanced BCE + IoU eval.

Parity with the reference's single-GPU loop (/root/reference/motion_seg/train_seq.py):
Adam(lr=1e-4, weight_decay=1e-4) (train_seq.py:38), class-balanced weighted BCE
with positive weight #neg/#pos (train_seq.py:70-75, core/network/loss_func.py:21-25),
per-epoch cls_iou on the test split (core/utils/utils.py:178-186). The reference has
no DDP/AMP/scheduler; here the step is one jitted function whose batch shards
data-parallel over the device mesh (parallel/ wires the NamedSharding in), which is
the TPU-native replacement for torch DataLoader+cuda single-GPU training.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models.motionseg import TrajOADepth


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(
    model: TrajOADepth,
    key,
    sample_batch,
    learning_rate: float = 1e-4,
    weight_decay: float = 1e-4,
):
    variables = model.init(
        key, sample_batch["traj"], sample_batch["depth"], sample_batch["valid"], train=True
    )
    tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    params = variables["params"]
    return (
        TrainState(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        ),
        tx,
    )


def weighted_bce(logits, targets, valid):
    """Class-balanced BCE: positive examples weighted by #neg/#pos
    (train_seq.py:70-75). logits/targets/valid: [B, N]."""
    v = valid.astype(logits.dtype)
    pos = jnp.sum(targets * v)
    neg = jnp.sum((1.0 - targets) * v)
    pos_w = neg / jnp.maximum(pos, 1.0)
    w = jnp.where(targets > 0.5, pos_w, 1.0) * v
    per = optax.sigmoid_binary_cross_entropy(logits, targets)
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)


def cls_iou(logits, targets, valid, threshold: float = 0.5):
    """Per-batch IoU of predicted dynamic trajectories (utils.py:178-186)."""
    pred = (jax.nn.sigmoid(logits) > threshold) & valid
    gt = (targets > 0.5) & valid
    inter = jnp.sum((pred & gt).astype(jnp.float32))
    union = jnp.sum((pred | gt).astype(jnp.float32))
    return inter / jnp.maximum(union, 1.0)


@partial(jax.jit, static_argnames=("model", "tx"))
def train_step(model: TrajOADepth, tx, state: TrainState, batch):
    """batch: traj [B,N,L,2], depth [B,L,h,w], valid [B,N,L], label [B,N],
    traj_valid [B,N]."""

    def loss_fn(params):
        logits, updates = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["traj"], batch["depth"], batch["valid"],
            train=True, mutable=["batch_stats"],
        )
        loss = weighted_bce(logits, batch["label"], batch["traj_valid"])
        return loss, (logits, updates["batch_stats"])

    (loss, (logits, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = TrainState(params, new_stats, opt_state, state.step + 1)
    iou = cls_iou(logits, batch["label"], batch["traj_valid"])
    return new_state, {"loss": loss, "iou": iou}


@partial(jax.jit, static_argnames=("model",))
def eval_step(model: TrajOADepth, state: TrainState, batch):
    logits = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["traj"], batch["depth"], batch["valid"], train=False,
    )
    return {
        "loss": weighted_bce(logits, batch["label"], batch["traj_valid"]),
        "iou": cls_iou(logits, batch["label"], batch["traj_valid"]),
    }
