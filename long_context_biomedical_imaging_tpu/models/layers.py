"""Shared model blocks: patch embeddings, MLP, DropPath, initializers.

Native reimplementations of the MONAI blocks the reference depends on
(PatchEmbeddingBlock ref: backbone_vit.py:351-361; PatchEmbed ref:
backbone_swin.py:800-806; MLPBlock ref: backbone_vit.py:250; DropPath), built
as flax.linen modules on channels-last layouts (TPU convs prefer NHWC/NDHWC).

Initializers mimic torch defaults (kaiming-uniform Linear/Conv with
U(+-1/sqrt(fan_in)) bias) so training dynamics match the reference.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear weight default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).

    flax Dense kernels are (fan_in, fan_out)."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch ConvNd weight default on flax (spatial..., in, out) kernels."""
    receptive = int(np.prod(shape[:-2]))
    fan_in = shape[-2] * receptive
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def fan_in_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def trunc_normal_init(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


class TorchDense(nn.Module):
    """Dense layer with torch nn.Linear default initialization.

    Flattens leading dims to 2D for the matmul: XLA lowers Dense gradients
    over >2D operands to HBM-bound contractions ~6x slower than the identical
    2D matmul (measured on v5e); the reshapes are layout-free (C stays minor).
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        lead = x.shape[:-1]
        x2 = x.reshape(-1, fan_in) if x.ndim > 2 else x
        y = nn.Dense(self.features, use_bias=self.use_bias,
                     kernel_init=torch_linear_kernel_init,
                     bias_init=fan_in_bias_init(fan_in), dtype=self.dtype)(x2)
        return y.reshape(*lead, self.features) if x.ndim > 2 else y


class DropPath(nn.Module):
    """Stochastic depth — drops the whole residual branch per sample.

    (ref: monai DropPath used at backbone_swin.py:532,536; rate is 0.0 in all
    reference configs, kept for config-surface completeness.)"""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class MLPBlock(nn.Module):
    """Transformer MLP: Dense -> GELU -> drop -> Dense -> drop (MONAI MLPBlock).

    Params are declared directly (torch nn.Linear defaults) so the fused
    Pallas path (ops/fused_mlp.py — hidden activation stays in VMEM, backward
    recomputes it; the workloads are HBM-bound) and the composed path share
    one param tree. Dropout is 0.0 in every reference config; the composed
    path keeps it for surface completeness."""

    hidden_size: int
    mlp_dim: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        w1 = self.param("fc1_kernel", torch_linear_kernel_init,
                        (self.hidden_size, self.mlp_dim))
        b1 = self.param("fc1_bias", fan_in_bias_init(self.hidden_size),
                        (self.mlp_dim,))
        w2 = self.param("fc2_kernel", torch_linear_kernel_init,
                        (self.mlp_dim, self.hidden_size))
        b2 = self.param("fc2_bias", fan_in_bias_init(self.mlp_dim),
                        (self.hidden_size,))

        if self.dropout_rate == 0.0 or deterministic:
            from ..ops.fused_mlp import fused_mlp
            return fused_mlp(x, w1, b1, w2, b2)

        lead = x.shape[:-1]
        h = (x.reshape(-1, self.hidden_size) @ w1.astype(x.dtype)
             + b1.astype(x.dtype))
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        out = h @ w2.astype(x.dtype) + b2.astype(x.dtype)
        out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)
        return out.reshape(*lead, self.hidden_size)


class LNMLPResidual(nn.Module):
    """x + MLP(LayerNorm(x)) — the pre-LN transformer second half, fused.

    Declares the LN affine and both Linear params itself so the whole chain
    runs in one Pallas kernel (ops/fused_mlp.py:fused_ln_mlp_residual): the LN
    stats, GELU hidden, and residual add all live on a VMEM token tile, vs ~6
    extra C-wide HBM passes for the composed LN -> MLP -> add chain (measured
    ~45 ms of the 237 ms ptx step; the flagships are HBM-bound, BASELINE.md).

    LN follows flax nn.LayerNorm semantics (eps 1e-6, fp32 stats) to match the
    composed path it replaces. Dropout (0.0 in every reference config; ref
    MLPBlock at backbone_vit.py:250) falls back to the composed ops on the
    same param tree.
    """

    hidden_size: int
    mlp_dim: int
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        ln_scale = self.param("ln_scale", nn.initializers.ones,
                              (self.hidden_size,))
        ln_bias = self.param("ln_bias", nn.initializers.zeros,
                             (self.hidden_size,))
        w1 = self.param("fc1_kernel", torch_linear_kernel_init,
                        (self.hidden_size, self.mlp_dim))
        b1 = self.param("fc1_bias", fan_in_bias_init(self.hidden_size),
                        (self.mlp_dim,))
        w2 = self.param("fc2_kernel", torch_linear_kernel_init,
                        (self.mlp_dim, self.hidden_size))
        b2 = self.param("fc2_bias", fan_in_bias_init(self.mlp_dim),
                        (self.hidden_size,))

        from ..parallel.mesh import model_axis_size
        if (self.dropout_rate == 0.0 or deterministic) \
                and model_axis_size() == 1:
            # pallas_call does not SPMD-partition: under token-axis sharding
            # ('model' axis > 1) the fused kernel would force an all-gather of
            # the full sequence, so the composed row-parallel path runs instead
            from ..ops.fused_mlp import fused_ln_mlp_residual
            return fused_ln_mlp_residual(x, ln_scale, ln_bias, w1, b1, w2, b2)

        from ..ops.fused_mlp import fast_layernorm
        lead = x.shape[:-1]
        cp = x.shape[-1]           # may be lane-padded past hidden_size
        x2 = x.reshape(-1, cp)
        y = fast_layernorm(x2[:, :self.hidden_size], ln_scale, ln_bias)
        h = y @ w1.astype(x.dtype) + b1.astype(x.dtype)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        out = h @ w2.astype(x.dtype) + b2.astype(x.dtype)
        out = nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)
        if cp != self.hidden_size:
            out = jnp.pad(out, ((0, 0), (0, cp - self.hidden_size)))
        return x + out.reshape(*lead, cp)


def extract_patches(x, patch_size):
    """(B, *spatial, C) -> (B, *spatial/p, prod(p)*C) via reshape/transpose.

    TPU-idiomatic patchify: a stride=kernel conv on a low-channel full-res
    image forces XLA into a 128-lane-padded layout of the whole input (a 1-ch
    256^2x64 volume ballooned to 2GB in bf16); folding patches into channels
    first makes the projection a plain matmul on a well-shaped tensor.
    """
    b = x.shape[0]
    spatial = x.shape[1:-1]
    c = x.shape[-1]
    assert len(spatial) == len(patch_size)
    new_shape = [b]
    for s, p in zip(spatial, patch_size):
        if s % p != 0:
            raise ValueError(f"spatial {spatial} not divisible by patch {patch_size}")
        new_shape += [s // p, p]
    x = x.reshape(*new_shape, c)
    rank = len(spatial)
    # (B, s0', p0, s1', p1, ..., C) -> (B, s0', s1', ..., p0, p1, ..., C)
    perm = ([0] + [1 + 2 * i for i in range(rank)]
            + [2 + 2 * i for i in range(rank)] + [1 + 2 * rank])
    x = x.transpose(*perm)
    feat = c
    for p in patch_size:
        feat *= p
    return x.reshape(b, *[s // p for s, p in zip(spatial, patch_size)], feat)


class PatchEmbeddingBlock(nn.Module):
    """ViT patchify: patch projection + optional learnable pos-embed.

    Input (B, *spatial, C) -> tokens (B, L, hidden). Position embeddings are
    disabled when the mixer is hyena/mamba (ref: backbone_vit.py:349).
    `dtype` is the compute dtype (bf16 under AMP): the cast happens after
    patch extraction, where the channel axis is wide enough to tile cleanly.
    """

    img_size: Sequence[int]
    patch_size: Sequence[int]
    hidden_size: int
    pos_embed_type: str = "learnable"  # 'learnable' | 'none'
    dropout_rate: float = 0.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n_patches = 1
        for i, p in zip(self.img_size, self.patch_size):
            if i % p != 0:
                raise ValueError(f"img_size {self.img_size} not divisible by patch {self.patch_size}")
            n_patches *= i // p
        x = extract_patches(x, tuple(self.patch_size))
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Dense(self.hidden_size, kernel_init=torch_conv_kernel_init,
                     bias_init=nn.initializers.zeros)(x)
        x = x.reshape(x.shape[0], -1, self.hidden_size)  # row-major (T',H',W')
        if self.pos_embed_type == "learnable":
            pos = self.param("position_embeddings", trunc_normal_init(0.02),
                             (1, n_patches, self.hidden_size))
            x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        return x


class PatchEmbed(nn.Module):
    """Swin patchify: patch projection, stays on the spatial grid
    (B,*s,C)->(B,*s',E). See PatchEmbeddingBlock for the reshape-based design."""

    patch_size: Sequence[int]
    embed_dim: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = extract_patches(x, tuple(self.patch_size))
        if self.dtype is not None:
            x = x.astype(self.dtype)
        return nn.Dense(self.embed_dim, kernel_init=torch_conv_kernel_init,
                        bias_init=nn.initializers.zeros)(x)


def parameterless_layer_norm(x, eps: float = 1e-5):
    """F.layer_norm over the channel axis with no learned affine
    (ref: backbone_swin.py:866-879 proj_out)."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=-1, keepdims=True)
    var = x32.var(axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class LayerNormAmp(nn.Module):
    """nn.LayerNorm-equivalent (same scale/bias param tree, same eps
    default) whose INPUT STREAM stays in the arrival dtype. The statistics
    and normalization math run in fp32, but every fp32 intermediate fuses
    into reduces / elementwise chains, so nothing fp32 materializes in HBM
    — flax nn.LayerNorm's eager f32 convert was getting hoisted into the
    patch-merge's windowed->spatial transpose, turning an 805 MB bf16
    layout pass into a 1.61 GB fp32 one (6.5 ms per stage transition on
    emb, r5 profile)."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mu = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        y = (x32 - mu) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(x.dtype)
