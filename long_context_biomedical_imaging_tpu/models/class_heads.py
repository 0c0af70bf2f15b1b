"""Classification heads (ref: model/models/class_heads.py:13-79).

Both heads consume the backbone hidden-state list and return (B, num_classes).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import TorchDense


class ViTLinear(nn.Module):
    """cls-token (attention) or token mean-pool (hyena/mamba) -> Linear+Tanh
    (ref: class_heads.py:13-49)."""

    num_classes: int
    use_cls_token: bool = True

    @nn.compact
    def __call__(self, hidden_states, deterministic: bool = True):
        x = hidden_states[-1]  # (B, L, C)
        x = x[:, 0] if self.use_cls_token else x.mean(axis=1)
        return jnp.tanh(TorchDense(self.num_classes, name="classification_head")(x))


class SwinLinear(nn.Module):
    """Global average pool over (D, H, W) -> Linear+Tanh (ref: class_heads.py:52-79)."""

    num_classes: int

    @nn.compact
    def __call__(self, hidden_states, deterministic: bool = True):
        x = hidden_states[-1]  # (B, D, H, W, C)
        x = x.mean(axis=(1, 2, 3))
        return jnp.tanh(TorchDense(self.num_classes, name="classification_head")(x))
