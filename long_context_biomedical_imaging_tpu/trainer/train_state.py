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
                    use_amp: bool = False, accum: int = 1):
    """Returns train_step(state, images, labels, lr, rng) -> (state, loss, output).

    images/labels: (accum, B, ...) when accum > 1 else (B, ...).
    """
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

    def train_step(state: TrainState, images, labels, lr, rng):
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
            grads = jax.tree.map(lambda g: g / accum, grads)
            loss = loss_sum / accum
            output = outs.reshape((-1,) + outs.shape[2:])
        else:
            (loss, (output, new_bs)), grads = grad_fn(
                state.params, state.batch_stats, images, labels, rng)

        grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        updates, new_opt = transform.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=params, batch_stats=new_bs,
                                  opt_state=new_opt, step=state.step + 1)
        return new_state, loss, output

    return train_step


def make_eval_step(model, loss_func: Callable, use_amp: bool = False):
    def eval_step(state: TrainState, images, labels):
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
        return loss_func(out32, labels), out32

    return eval_step
