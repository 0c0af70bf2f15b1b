"""Loss registry (ref: loss/loss_base.py:15-32).

Loss functions take channels-last model outputs and targets:
  * class:   outputs (B, num_classes) logits, targets (B,) int labels
  * seg:     outputs (B, T, H, W, C) logits, targets (B, T, H, W) int masks
  * enhance: outputs/targets (B, T, H, W, C) float images
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .enhancement_losses import combined_enhance_loss


def cross_entropy_loss(outputs, targets):
    """torch nn.CrossEntropyLoss equivalent (mean over all positions).

    The label pick is a lane-wise one-hot select, NOT take_along_axis:
    optax's integer-label CE gathers logits[i, label[i]], and XLA lowers
    that row gather at near-scalar speed on TPU — measured 118 ms of the
    665 ms abct step (8.4M tokens x 10 classes at 1 GB/s). The masked-sum
    form is a pure VPU select+reduce over the class lanes (~1 ms)."""
    logits = outputs.astype(jnp.float32)
    if logits.ndim > 2:
        c = logits.shape[-1]
        logits = logits.reshape(-1, c)
        targets = targets.reshape(-1)
    n, c = logits.shape
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    cls = jax.lax.broadcasted_iota(jnp.int32, (n, c), 1)
    picked = jnp.sum(jnp.where(cls == targets.astype(jnp.int32)[:, None],
                               logits, 0.0), axis=-1)
    return jnp.mean(lse - picked)


def mse_loss_fn(outputs, targets):
    from .enhancement_losses import mse_loss
    return mse_loss(outputs, targets)


def get_loss_func(name: str):
    """'CrossEntropy' | 'MSE' | 'CombinationEnhance' (ref: loss_base.py:15-32)."""
    if name == "CrossEntropy":
        return cross_entropy_loss
    if name == "MSE":
        return mse_loss_fn
    if name == "CombinationEnhance":
        return combined_enhance_loss
    raise NotImplementedError(f"Unknown loss function: {name}")
