"""UNETR building blocks (native reimplementation of the MONAI blocks used by
the reference enhance heads: UnetrBasicBlock / UnetrUpBlock / UnetrPrUpBlock /
UnetOutBlock with instance norm + leaky-relu, ref: enhance_heads.py:25-356).

Channels-last (B, *spatial, C); spatial rank 2 or 3 is inferred from input.
"""

from __future__ import annotations

import os as _os
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import fan_in_bias_init, torch_conv_kernel_init


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over spatial dims (affine)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        axes = tuple(range(1, x.ndim - 1))
        # Stats in fp32 (fused square-reduce — no fp32 full-res temporary: a
        # materialized x.astype(f32) at the UNETR decoders' full-resolution
        # shapes was the dominant HBM liveset, 2.02GB per buffer on the
        # 1024^2 ViTUNETR config), normalize as a per-(sample, channel)
        # scale+shift in the input dtype.
        x32 = x.astype(jnp.float32)
        mean = x32.mean(axis=axes, keepdims=True)
        var = jnp.maximum(jnp.square(x32).mean(axis=axes, keepdims=True)
                          - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        # Scale+shift arithmetic stays fp32 (the shift carries -mean*inv*scale,
        # which would catastrophically cancel against x*w in bf16 when
        # |mean| >> std); XLA fuses the chain reading bf16 x and writing bf16
        # output, so no fp32 full-res tensor materializes.
        w = scale * inv
        b = bias - mean * inv * scale
        return (x32 * w + b).astype(x.dtype)


class ConvNd(nn.Module):
    """Rank-agnostic conv with torch-style init ('same'-style explicit padding)."""

    features: int
    kernel_size: int = 3
    stride: int | Sequence[int] = 1
    use_bias: bool = True
    transpose: bool = False

    @nn.compact
    def __call__(self, x):
        rank = x.ndim - 2
        k = (self.kernel_size,) * rank if isinstance(self.kernel_size, int) \
            else tuple(self.kernel_size)
        s = (self.stride,) * rank if isinstance(self.stride, int) else tuple(self.stride)
        receptive = 1
        for kk in k:
            receptive *= kk
        bias_init = fan_in_bias_init(x.shape[-1] * receptive)
        if self.transpose:
            return nn.ConvTranspose(
                self.features, kernel_size=k, strides=s, padding="VALID",
                use_bias=self.use_bias, kernel_init=torch_conv_kernel_init,
                bias_init=bias_init)(x)
        pad = tuple(((kk - 1) // 2, kk // 2) for kk in k)
        if (rank == 3 and k == (3, 3, 3) and s == (1, 1, 1)
                and _os.environ.get("LCBI_CONV3D_ZDEC", "1") != "0"):
            # depth-decomposed 3D conv: 3 depth-shifted 3x3 2D convs on the
            # (B*D, H, W, C) layout. XLA's 5D conv (and especially its
            # gradients) at the UperNet3D decoder shapes gets a batch-in-
            # sublanes layout (T(2,128) at B=2 — 2 of 8 sublanes used; the
            # abct fusion.3873/3874 grads ran at 15 GB/s / ~19% MXU, r5
            # profile); the 4D form tiles (B*D) rows into full sublanes.
            # Same params tree as the nn.Conv branch (Conv_0/{kernel,bias}).
            cin = x.shape[-1]
            feats = self.features

            class _Params(nn.Module):
                @nn.compact
                def __call__(s_):
                    kern = s_.param("kernel", torch_conv_kernel_init,
                                    (*k, cin, feats))
                    b = (s_.param("bias", bias_init, (feats,))
                         if self.use_bias else None)
                    return kern, b

            kernel, bias = _Params(name="Conv_0")()
            dt = jnp.promote_types(x.dtype, kernel.dtype)
            xk = x.astype(dt)
            kk_ = kernel.astype(dt)
            B, D, H, W, _ = x.shape
            xp = jnp.pad(xk, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
            dn2 = jax.lax.conv_dimension_numbers(
                (B * D, H, W, cin), (3, 3, cin, feats),
                ("NHWC", "HWIO", "NHWC"))
            y = None
            for dz in range(3):
                xs = xp[:, dz:dz + D].reshape(B * D, H, W, cin)
                t = jax.lax.conv_general_dilated(
                    xs, kk_[dz], (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=dn2).astype(jnp.float32)
                y = t if y is None else y + t
            if bias is not None:
                y = y + bias.astype(jnp.float32)
            return y.astype(dt).reshape(B, D, H, W, feats)
        return nn.Conv(self.features, kernel_size=k, strides=s, padding=pad,
                       use_bias=self.use_bias, kernel_init=torch_conv_kernel_init,
                       bias_init=bias_init)(x)


class UnetResBlock(nn.Module):
    """conv-norm-lrelu x2 with a (projected) residual (MONAI UnetResBlock)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = ConvNd(self.out_channels, self.kernel_size, self.stride,
                   use_bias=False, name="conv1")(x)
        y = InstanceNorm(name="norm1")(y)
        y = nn.leaky_relu(y, negative_slope=0.01)
        y = ConvNd(self.out_channels, self.kernel_size, 1,
                   use_bias=False, name="conv2")(y)
        y = InstanceNorm(name="norm2")(y)
        if x.shape[-1] != self.out_channels or self.stride != 1:
            residual = ConvNd(self.out_channels, 1, self.stride,
                              use_bias=False, name="conv3")(x)
            residual = InstanceNorm(name="norm3")(residual)
        return nn.leaky_relu(y + residual, negative_slope=0.01)


class UnetrBasicBlock(nn.Module):
    out_channels: int
    kernel_size: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        return UnetResBlock(self.out_channels, self.kernel_size, self.stride,
                            name="layer")(x)


class UnetrUpBlock(nn.Module):
    """Transposed-conv upsample, concat skip, residual conv block."""

    out_channels: int
    kernel_size: int = 3
    upsample_kernel_size: int | Sequence[int] = 2

    @nn.compact
    def __call__(self, x, skip):
        x = ConvNd(self.out_channels, self.upsample_kernel_size,
                   self.upsample_kernel_size, use_bias=False, transpose=True,
                   name="transp_conv")(x)
        x = jnp.concatenate([x, skip], axis=-1)
        return UnetResBlock(self.out_channels, self.kernel_size, 1,
                            name="conv_block")(x)


class UnetrPrUpBlock(nn.Module):
    """Progressive upsampler: initial transp conv + num_layer x (transp conv +
    res block)."""

    out_channels: int
    num_layer: int
    kernel_size: int = 3
    upsample_kernel_size: int | Sequence[int] = 2

    @nn.compact
    def __call__(self, x):
        x = ConvNd(self.out_channels, self.upsample_kernel_size,
                   self.upsample_kernel_size, use_bias=False, transpose=True,
                   name="transp_conv_init")(x)
        for i in range(self.num_layer):
            x = ConvNd(self.out_channels, self.upsample_kernel_size,
                       self.upsample_kernel_size, use_bias=False, transpose=True,
                       name=f"transp_{i}")(x)
            x = UnetResBlock(self.out_channels, self.kernel_size, 1,
                             name=f"res_{i}")(x)
        return x


class UnetOutBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        return ConvNd(self.out_channels, 1, 1, use_bias=True, name="conv")(x)
