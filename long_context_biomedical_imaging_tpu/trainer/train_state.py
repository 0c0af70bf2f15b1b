"""Train state + compiled train/eval steps.

The reference's per-step runtime (autocast forward, scaled backward, DDP
all-reduce, clip, optimizer step; ref: trainer/trainer_base.py:154-189)
collapses into one jit-compiled `train_step(state, images, labels, lr, rng)`
over the device mesh: batches arrive sharded on the 'data' axis, params are
replicated, and XLA inserts the gradient all-reduce. bf16 autocast is a pure
cast of params+inputs inside the step (fp32 master weights; TPUs need no loss
scaler — bf16 keeps fp32's exponent range, unlike fp16+GradScaler,
ref: trainer_base.py:116,166-179).

Gradient accumulation runs as a `lax.scan` over a leading microbatch axis
(ref: iters_to_accumulate, trainer_base.py:169-179).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import flax
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(model, variables, transform) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=transform.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(model, loss_func: Callable, transform,
                    use_amp: bool = False, accum: int = 1,
                    metrics_fn: Callable | None = None,
                    return_output: bool = True,
                    grad_div: int | None = None):
    """Returns train_step(state, images, labels, lr, rng[, n_valid])
    -> (state, stats, output).

    images/labels: (accum, B, ...) when accum > 1 else (B, ...).
    stats is the scalar loss, or — when `metrics_fn` is given — the vector
    [loss, *train_metrics] computed on device (ref computes train metrics
    on-GPU via torchmetrics, metrics_base.py:150-183; fetching full outputs
    to the host every step is the expensive alternative).
    `return_output=False` skips materializing the model output as a step
    result (it is only needed host-side when metrics are computed there).
    `grad_div` overrides the gradient divisor (default `accum`): the epoch-end
    flush of a partial accumulation group divides by the FULL
    iters_to_accumulate like the reference (each micro-loss is pre-scaled by
    1/iters_to_accumulate before backward; trainer_base.py:169-179).
    """
    grad_div = accum if grad_div is None else grad_div
    has_bn = True  # mutable batch_stats collection may be empty; flax tolerates it

    def forward(params, batch_stats, images, labels, rng):
        p = params
        x = images  # stays fp32: the backbone casts after patchify (a bf16
        # cast of a low-channel full-res volume forces a 128-lane-padded
        # layout — 2GB for abct's 1-channel input)
        if use_amp:
            p = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, p)
        variables = {"params": p, "batch_stats": batch_stats}
        out, mutated = model.apply(
            variables, x, deterministic=False, use_running_average=False,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        out32 = out.astype(jnp.float32)
        loss = loss_func(out32, labels)
        return loss, (out32, mutated.get("batch_stats", batch_stats))

    def train_step(state: TrainState, images, labels, lr, rng, n_valid=None):
        if jnp.issubdtype(labels.dtype, jnp.integer) \
                and labels.dtype != jnp.int32:
            # labels may arrive uint8 (H2D compression, trainer._put)
            labels = labels.astype(jnp.int32)
        grad_fn = jax.value_and_grad(forward, has_aux=True)

        if accum > 1:
            def micro(carry, xs):
                grads_acc, bs, loss_acc, rng = carry
                im, lb = xs
                rng, sub = jax.random.split(rng)
                (loss, (out, bs)), grads = grad_fn(state.params, bs, im, lb, sub)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                return (grads_acc, bs, loss_acc + loss, rng), out

            zero = jax.tree.map(jnp.zeros_like, state.params)
            (grads, new_bs, loss_sum, _), outs = jax.lax.scan(
                micro, (zero, state.batch_stats, 0.0, rng), (images, labels))
            grads = jax.tree.map(lambda g: g / grad_div, grads)
            loss = loss_sum / accum
            output = outs.reshape((-1,) + outs.shape[2:])
            labels_flat = labels.reshape((-1,) + labels.shape[2:])
        else:
            (loss, (output, new_bs)), grads = grad_fn(
                state.params, state.batch_stats, images, labels, rng)
            if grad_div != 1:
                grads = jax.tree.map(lambda g: g / grad_div, grads)
            labels_flat = labels

        grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        updates, new_opt = transform.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, batch_stats=new_bs,
                                  opt_state=new_opt, step=state.step + 1)

        if metrics_fn is not None:
            nv = output.shape[0] if n_valid is None else n_valid
            # trailing element: global grad norm (wandb.watch-equivalent
            # observability; ref trainer_base.py:108)
            stats = jnp.concatenate([
                jnp.reshape(loss, (1,)).astype(jnp.float32),
                metrics_fn(output, labels_flat, nv).astype(jnp.float32),
                jnp.reshape(optax.global_norm(grads), (1,)).astype(jnp.float32)])
        else:
            stats = loss
        return new_state, stats, (output if return_output else None)

    return train_step


def make_eval_step(model, loss_func: Callable, use_amp: bool = False):
    """eval_step(state, images, labels[, n_valid]) -> (loss, output).

    The loader pads ragged final batches to the static batch size; the loss is
    averaged over per-sample losses weighted by validity so padding rows never
    distort it (every loss in `losses/` reduces by per-sample means, so the
    vmap decomposition is exact for full batches).

    `n_valid` is either a count (first n rows valid — single-host, where the
    padding sits at the end of the batch) or a per-row (B,) bool/0-1 mask
    (multi-host, where each process's padding sits at the end of its own
    block of the global batch axis).
    """

    def eval_step(state: TrainState, images, labels, n_valid=None):
        if jnp.issubdtype(labels.dtype, jnp.integer) \
                and labels.dtype != jnp.int32:
            labels = labels.astype(jnp.int32)   # uint8 H2D compression
        p = state.params
        x = images  # fp32; backbone casts post-patchify
        if use_amp:
            p = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, p)
        variables = {"params": p, "batch_stats": state.batch_stats}
        out = model.apply(variables, x, deterministic=True,
                          use_running_average=True)
        out32 = out.astype(jnp.float32)
        per_sample = jax.vmap(
            lambda o, t: loss_func(o[None], t[None]))(out32, labels)
        from ..metrics.device import valid_mask
        w = valid_mask(out32.shape[0], n_valid)
        loss = jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)
        return loss, out32

    return eval_step
