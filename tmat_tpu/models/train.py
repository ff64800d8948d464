"""Optax training harnesses: UNet segmentation + two-stage ResNet TL.

Parity targets:
- mean_iou_coef thresholded smooth-IoU metric (models_util.py:19-46)
- WarmupSchedule: linear warmup into a constant or wrapped schedule
  (models_util.py:117-176)
- two-stage transfer learning: frozen base fit -> restore best -> unfreeze
  -> recompile with fine-tune LR -> fit (models.py:321-395)
- UNetXceptionGridSearch: product(filter_counts x optimizer configs) with
  best-objective tracking and best_model_hps.json persistence
  (models.py:398-594)

TPU-first: steps are jitted with donated state; multi-chip training shards
the batch over a ('data', 'space') mesh — batch over data, image rows over
space — with XLA inserting the BatchNorm/grad collectives.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from itertools import product as iter_product
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import freeze, unfreeze

from tmat_tpu.models.params_io import save_params


# --------------------------------------------------------------------------
# Metrics & losses
# --------------------------------------------------------------------------


def mean_iou_coef(y, yhat, smooth=1.0, obs_axes=(1, 2, 3), thresh=0.5):
    """Thresholded smooth IoU (models_util.py:19-46)."""
    y = y.astype(jnp.float32)
    yhat = (jnp.clip(yhat, 0, 1) > thresh).astype(jnp.float32)
    intersection = jnp.sum(y * yhat, axis=obs_axes)
    union = jnp.sum(y, axis=obs_axes) + jnp.sum(yhat, axis=obs_axes) - intersection
    return jnp.mean((intersection + smooth) / (union + smooth), axis=0)


def weighted_bce(probs, labels, sample_weights=None, eps=1e-7):
    """Binary cross-entropy on probabilities (Keras BinaryCrossentropy)."""
    probs = jnp.clip(probs, eps, 1 - eps)
    losses = -(labels * jnp.log(probs) + (1 - labels) * jnp.log(1 - probs))
    if sample_weights is not None:
        weights = jnp.asarray(sample_weights)
        if weights.ndim and weights.ndim < losses.ndim:
            # per-SAMPLE weights (B,) against per-element losses (B, ...):
            # align on the batch axis (an outer-product broadcast here
            # silently inflated the loss by the batch size)
            weights = weights.reshape(
                weights.shape + (1,) * (losses.ndim - weights.ndim)
            )
        return jnp.sum(losses * weights) / jnp.maximum(jnp.sum(weights), eps)
    return jnp.mean(losses)


# --------------------------------------------------------------------------
# Schedules
# --------------------------------------------------------------------------


def warmup_schedule(warmup_steps: int, after_warmup_lr) -> Callable:
    """Linear warmup into a constant or another schedule
    (models_util.py:117-176)."""
    warmup_steps = int(warmup_steps)
    if callable(after_warmup_lr):
        after = after_warmup_lr
        init = float(after_warmup_lr(0))
    else:
        lr = float(after_warmup_lr)
        after = lambda step: lr
        init = lr

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = init * (step + 1) / max(warmup_steps, 1)
        return jnp.where(step < warmup_steps, warm, after((step + 1) - warmup_steps))

    return schedule


def cosine_decay_restarts(
    initial_lr: float,
    first_decay_steps: int,
    t_mul: float = 2.0,
    m_mul: float = 1.0,
    alpha: float = 0.0,
) -> Callable:
    """Keras CosineDecayRestarts (train_binary_segmentation.ipynb cell 31)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)

        def geometric(step):
            # i = number of completed cycles when t_mul != 1
            ratio = step / first_decay_steps
            i = jnp.floor(
                jnp.log1p(ratio * (t_mul - 1.0)) / jnp.log(t_mul)
            )
            sum_prev = (t_mul**i - 1.0) / (t_mul - 1.0)
            frac = (ratio - sum_prev) / (t_mul**i)
            return i, frac

        def linear(step):
            ratio = step / first_decay_steps
            i = jnp.floor(ratio)
            return i, ratio - i

        if t_mul == 1.0:
            i, frac = linear(step)
        else:
            i, frac = geometric(step)
        cosine = 0.5 * (1 + jnp.cos(jnp.pi * frac))
        decayed = (1 - alpha) * cosine + alpha
        return initial_lr * (m_mul**i) * decayed

    return schedule


# --------------------------------------------------------------------------
# Train state & steps
# --------------------------------------------------------------------------


import flax.struct


@flax.struct.dataclass
class TrainState:
    """Model variables + optimizer state (BatchNorm-aware pytree)."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: int = 0


def init_train_state(variables, tx) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(params, batch_stats, tx.init(params), 0)


def save_train_state(path, state: TrainState) -> None:
    """Full resumable checkpoint: params + BN stats + optimizer state + step.

    The reference only checkpoints best weights (ModelCheckpoint,
    models.py:342-348); this adds true mid-run resume (SURVEY §5
    checkpoint/resume gap)."""
    save_params(
        path,
        {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        },
    )


def load_train_state(path, template_state: TrainState) -> TrainState:
    from tmat_tpu.models.params_io import load_params

    template = {
        "params": template_state.params,
        "batch_stats": template_state.batch_stats,
        "opt_state": template_state.opt_state,
        "step": template_state.step,
    }
    loaded = load_params(path, template)
    return TrainState(
        loaded["params"], loaded["batch_stats"], loaded["opt_state"], loaded["step"]
    )


def make_unet_train_step(model, tx):
    """Jitted weighted-BCE training step for the UNet (updates BN stats)."""

    def step_fn(state: TrainState, x, y, sample_weights=None):
        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            loss = weighted_bce(out, y, sample_weights)
            return loss, (out, mutated["batch_stats"])

        (loss, (out, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        iou = mean_iou_coef(y, out)
        return (
            TrainState(new_params, new_stats, new_opt, state.step + 1),
            {"loss": loss, "mean_iou_coef": iou},
        )

    return jax.jit(step_fn)


def make_unet_eval_step(model):
    def eval_fn(state: TrainState, x, y):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x,
            train=False,
        )
        return {"loss": weighted_bce(out, y), "mean_iou_coef": mean_iou_coef(y, out)}

    return jax.jit(eval_fn)


def make_tl_optimizer(
    params,
    learning_rate,
    beta_1: float = 0.9,
    beta_2: float = 0.999,
    base_trainable: bool = False,
    base_name: str = "base_model",
):
    """Adam that only updates the head while the base is frozen
    (the reference toggles `trainable` + recompiles, models.py:383-388)."""
    adam = optax.adam(learning_rate, b1=beta_1, b2=beta_2)
    if base_trainable:
        return adam
    labels = {
        k: jax.tree.map(lambda _: "freeze" if k == base_name else "train", v)
        for k, v in params.items()
    }
    return optax.multi_transform(
        {"train": adam, "freeze": optax.set_to_zero()}, labels
    )


def make_classifier_train_step(model, tx):
    """BCE training step for the ResNet TL classifier (frozen-BN base)."""

    def step_fn(state: TrainState, x, y, sample_weights=None):
        def loss_fn(params):
            out = model.apply(
                {"params": params, "batch_stats": state.batch_stats}, x, train=True
            )
            return weighted_bce(out, y, sample_weights), out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        acc = jnp.mean((out > 0.5).astype(jnp.float32) == y)
        return (
            TrainState(new_params, state.batch_stats, new_opt, state.step + 1),
            {"loss": loss, "binary_accuracy": acc},
        )

    return jax.jit(step_fn)


# --------------------------------------------------------------------------
# Fit loops
# --------------------------------------------------------------------------


@dataclass
class FitResult:
    history: Dict[str, list] = field(default_factory=dict)
    best_metric: float = np.inf
    best_epoch: int = -1


def fit(
    state: TrainState,
    train_step,
    eval_step,
    train_batches: Callable[[], Any],
    val_batches: Optional[Callable[[], Any]] = None,
    epochs: int = 1,
    monitor: str = "loss",
    mode: str = "min",
    patience: Optional[int] = None,
    min_delta: float = 0.0,
    checkpoint_path: Optional[str] = None,
    model=None,
    verbose: bool = False,
) -> Tuple[TrainState, FitResult, Optional[TrainState]]:
    """Keras-style fit: epochs over batch generators, early stopping +
    save-best checkpointing (EarlyStopping/ModelCheckpoint semantics at
    models.py:335-355)."""
    sign = 1.0 if mode == "min" else -1.0
    result = FitResult(best_metric=np.inf)
    best_state = None
    wait = 0

    for epoch in range(epochs):
        # keep metrics as device arrays during the epoch — a float() per
        # step would sync the host and stop dispatch from running ahead of
        # the TPU; convert once at epoch end
        train_metrics = []
        for batch in train_batches():
            state, metrics = train_step(state, *batch)
            train_metrics.append(metrics)
        train_metrics = jax.device_get(train_metrics)
        epoch_metrics = {
            k: float(np.mean([m[k] for m in train_metrics]))
            for k in (train_metrics[0] if train_metrics else {})
        }
        if val_batches is not None:
            val_metrics = [
                eval_step(state, *batch[:2]) for batch in val_batches()
            ]
            val_metrics = jax.device_get(val_metrics)
            for k in val_metrics[0] if val_metrics else {}:
                epoch_metrics[f"val_{k}"] = float(np.mean([m[k] for m in val_metrics]))

        for k, v in epoch_metrics.items():
            result.history.setdefault(k, []).append(v)
        if verbose:
            print(f"epoch {epoch}: {epoch_metrics}", flush=True)

        raw = epoch_metrics.get(monitor)
        # absent monitor (e.g. empty validation set) must rank WORST, not
        # best: +inf after the sign convention regardless of mode
        current = sign * raw if raw is not None else np.inf
        if current < result.best_metric - min_delta:
            result.best_metric = current
            result.best_epoch = epoch
            best_state = state
            wait = 0
            if checkpoint_path is not None:
                save_params(
                    checkpoint_path,
                    {"params": state.params, "batch_stats": state.batch_stats},
                )
        else:
            wait += 1
            if patience is not None and wait > patience:
                break

    return state, result, best_state


def two_stage_tl_fit(
    model,
    variables,
    train_batches,
    val_batches,
    frozen_lr: float,
    fine_tune_lr: float,
    beta_1: float = 0.9,
    beta_2: float = 0.999,
    frozen_epochs: int = 1,
    fine_tune_epochs: int = 1,
    patience: Optional[int] = None,
    min_delta: float = 1e-4,
    checkpoint_dir: Optional[str] = None,
    verbose: bool = False,
):
    """Frozen fit -> restore best -> unfreeze -> fine-tune
    (models.py:374-395, compute_inv_depth two-stage recipe)."""
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    frozen_tx = make_tl_optimizer(params, frozen_lr, beta_1, beta_2, False)
    state = TrainState(params, batch_stats, frozen_tx.init(params), 0)
    step = make_classifier_train_step(model, frozen_tx)

    def eval_step(state, x, y):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, x, train=False
        )
        acc = jnp.mean((out > 0.5).astype(jnp.float32) == y)
        return {"loss": weighted_bce(out, y), "binary_accuracy": acc}

    eval_step = jax.jit(eval_step)

    monitor = "val_loss" if val_batches is not None else "loss"
    state, frozen_result, best_state = fit(
        state,
        step,
        eval_step,
        train_batches,
        val_batches,
        epochs=frozen_epochs,
        monitor=monitor,
        patience=patience,
        min_delta=min_delta,
        verbose=verbose,
    )
    if best_state is not None:
        state = best_state  # load best frozen weights (models.py:383-384)

    ft_tx = make_tl_optimizer(state.params, fine_tune_lr, beta_1, beta_2, True)
    state = TrainState(state.params, state.batch_stats, ft_tx.init(state.params), 0)
    ft_step = make_classifier_train_step(model, ft_tx)
    ckpt = (
        str(Path(checkpoint_dir) / "best_finetune.msgpack") if checkpoint_dir else None
    )
    state, ft_result, best_ft = fit(
        state,
        ft_step,
        eval_step,
        train_batches,
        val_batches,
        epochs=fine_tune_epochs,
        monitor=monitor,
        patience=patience,
        min_delta=min_delta,
        checkpoint_path=ckpt,
        verbose=verbose,
    )
    return (best_ft or state), frozen_result, ft_result


# --------------------------------------------------------------------------
# Grid search (UNetXceptionGridSearch parity, models.py:398-594)
# --------------------------------------------------------------------------


class UNetXceptionGridSearch:
    """Grid search over filter-count x optimizer configurations."""

    def __init__(
        self,
        save_dir: str,
        filter_counts_options: Sequence[Tuple[int, ...]],
        optimizer_factories: Sequence[Callable[[], optax.GradientTransformation]],
        n_outputs: int,
        img_shape: Tuple[int, int],
        channels: int = 1,
        output_act: str = "sigmoid",
        seed: int = 0,
        bn_momentum: float = 0.99,
    ):
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.filter_counts_options = filter_counts_options
        self.optimizer_factories = optimizer_factories
        self.n_outputs = n_outputs
        self.img_shape = img_shape
        self.channels = channels
        self.output_act = output_act
        self.seed = seed
        self.bn_momentum = bn_momentum
        self.best_score = np.nan
        self.best_filter_counts = None
        self.best_optimizer_idx = 0
        self.best_score_idx = 0
        self.histories = []

    def search(
        self,
        objective: str,
        comparison: str,
        train_batches,
        val_batches=None,
        epochs: int = 1,
    ):
        from tmat_tpu.models.unet import build_unet_xception

        assert comparison in ("min", "max")
        get_best = np.min if comparison == "min" else np.max
        better = (lambda a, b: a < b) if comparison == "min" else (lambda a, b: a > b)
        self.best_score = np.inf if comparison == "min" else -np.inf

        hp_gen = iter_product(
            self.filter_counts_options, range(len(self.optimizer_factories))
        )
        for i, (fc, opt_idx) in enumerate(hp_gen):
            model, variables = build_unet_xception(
                self.n_outputs,
                self.img_shape,
                channels=self.channels,
                filter_counts=fc,
                output_act=self.output_act,
                seed=self.seed,
                bn_momentum=self.bn_momentum,
            )
            tx = self.optimizer_factories[opt_idx]()
            state = init_train_state(variables, tx)
            step = make_unet_train_step(model, tx)
            eval_step = make_unet_eval_step(model)
            ckpt = self.save_dir / f"best_weights_config_{i}.msgpack"
            state, result, _ = fit(
                state,
                step,
                eval_step,
                train_batches,
                val_batches,
                epochs=epochs,
                monitor=objective,
                mode=comparison,
                checkpoint_path=str(ckpt),
            )
            self.histories.append(result.history)
            scores = result.history.get(objective, [])
            if not scores:
                continue
            cur_best = float(get_best(scores))
            if better(cur_best, self.best_score):
                self.best_score = cur_best
                self.best_filter_counts = tuple(fc)
                self.best_optimizer_idx = opt_idx
                self.best_score_idx = i
                with open(self.save_dir / "best_model_hps.json", "w") as fp:
                    json.dump(
                        {
                            "search_objective": objective,
                            "best_score": self.best_score,
                            "best_hps": {
                                "filter_counts": list(self.best_filter_counts),
                                "optimizer_idx": opt_idx,
                            },
                            "best_weights_file": str(ckpt),
                        },
                        fp,
                    )
        return self.best_filter_counts, self.best_score
