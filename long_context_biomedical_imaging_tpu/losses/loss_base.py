"""Loss registry (ref: loss/loss_base.py:15-32).

Loss functions take channels-last model outputs and targets:
  * class:   outputs (B, num_classes) logits, targets (B,) int labels
  * seg:     outputs (B, T, H, W, C) logits, targets (B, T, H, W) int masks
  * enhance: outputs/targets (B, T, H, W, C) float images
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from .enhancement_losses import combined_enhance_loss


def cross_entropy_loss(outputs, targets):
    """torch nn.CrossEntropyLoss equivalent (mean over all positions)."""
    logits = outputs.astype(jnp.float32)
    if logits.ndim > 2:
        c = logits.shape[-1]
        logits = logits.reshape(-1, c)
        targets = targets.reshape(-1)
    losses = optax.softmax_cross_entropy_with_integer_labels(
        logits, targets.astype(jnp.int32))
    return jnp.mean(losses)


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
