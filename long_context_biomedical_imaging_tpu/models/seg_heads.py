"""UperNet segmentation heads (ref: model/models/seg_heads.py:18-278).

One rank-agnostic implementation covers UperNet2D and UperNet3D: PSP pooling
on the deepest feature, FPN top-down fusion, 3x3 conv head, resize to the
input resolution. All tensors are channels-last.

Reference quirks preserved:
  * PSP bottleneck is a 1x1 conv with padding=1 — it grows each spatial dim
    by 2 (ref: seg_heads.py:28-30,159-161); downstream resizes absorb it.
  * the FPN smooth convs share one set of weights ([conv]*3 in a ModuleList
    shares the instance, ref: seg_heads.py:52-54,190-192).
  * PSP/FPN use BatchNorm (batch_stats collection) and align_corners=True
    interpolation; the final resize uses align_corners=False.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import fan_in_bias_init
from .resize import adaptive_avg_pool, linear_resize, resize_conv
from .unetr_blocks import ConvNd, torch_conv_kernel_init


class _ResizeConvHead(nn.Module):
    """linear_resize(align_corners=False) -> 3^r conv head, composed exactly
    into coarse-grid matmuls (resize.resize_conv). Parameters live under
    Conv_0/{kernel,bias} with ConvNd's torch-style init, so the tree is
    identical to the ConvNd head this replaces."""

    features: int
    kernel_size: int
    out_sizes: Sequence[int]

    @nn.compact
    def __call__(self, x):
        rank = x.ndim - 2
        k = (self.kernel_size,) * rank
        receptive = self.kernel_size ** rank
        cin = x.shape[-1]

        class _Params(nn.Module):
            features: int

            @nn.compact
            def __call__(s):
                kernel = s.param("kernel", torch_conv_kernel_init,
                                 (*k, cin, s.features))
                bias = s.param("bias", fan_in_bias_init(cin * receptive),
                               (s.features,))
                return kernel, bias

        kernel, bias = _Params(self.features, name="Conv_0")()
        return resize_conv(x, kernel, bias, tuple(self.out_sizes),
                           align_corners=False)


class _ConvBNRelu(nn.Module):
    features: int
    kernel_size: int = 1
    pad_quirk: int = 0  # extra symmetric padding (the 1x1-with-padding quirk)

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        rank = x.ndim - 2
        if self.pad_quirk:
            pad = ((0, 0),) + ((self.pad_quirk, self.pad_quirk),) * rank + ((0, 0),)
            x = jnp.pad(x, pad)
        x = ConvNd(self.features, self.kernel_size, 1, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=use_running_average, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        return nn.relu(x)


class PSPModule(nn.Module):
    """Pyramid pooling (bins 1/2/4/6) + bottleneck (ref: seg_heads.py:18-47)."""

    in_channels: int
    bin_sizes: Sequence[int] = (1, 2, 4, 6)

    @nn.compact
    def __call__(self, x, use_running_average: bool = True, deterministic: bool = True):
        rank = x.ndim - 2
        spatial = x.shape[1:-1]
        out_ch = self.in_channels // len(self.bin_sizes)
        pyramids = [x]
        for i, b in enumerate(self.bin_sizes):
            p = adaptive_avg_pool(x, (b,) * rank)
            p = _ConvBNRelu(out_ch, 1, name=f"stage_{i}")(p, use_running_average)
            pyramids.append(linear_resize(p, spatial, align_corners=True))
        y = jnp.concatenate(pyramids, axis=-1)
        y = _ConvBNRelu(self.in_channels, 1, pad_quirk=1, name="bottleneck")(
            y, use_running_average)
        return nn.Dropout(0.1)(y, deterministic=deterministic)


class _FusedConcatResizeConvBN(nn.Module):
    """conv_fusion(concat([P0] + [resize(Pi)])) with the conv split along its
    input channels and composed onto each upsampled branch's COARSE grid
    (conv(concat(Pi)) == sum_i conv_i(Pi) exactly; conv_i(resize(Pi)) folds
    via resize.resize_conv). At abct geometry the concat form is a 3^3
    768->192 conv over the full (16,64,64) fusion grid — 1.04e12 FLOPs and
    ~42 ms fwd+bwd of the 190 ms step even at XLA's measured ~100 TF/s;
    per-branch coarse-grid convs cost (1 + 1/8 + 1/64 + 1/512)x the 192-wide
    branch conv instead (~3.5x fewer FLOPs) and never materialize the
    upsampled maps or the 768-wide concat. Parameters keep the exact
    _ConvBNRelu tree (conv/kernel (*k, sum_ci, F), bn) so checkpoints are
    interchangeable with the concat form. (Ref op: seg_heads.py:71-77.)"""

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, branches, target, use_running_average: bool = True):
        import jax
        rank = branches[0].ndim - 2
        k = (self.kernel_size,) * rank
        cin = sum(int(b.shape[-1]) for b in branches)
        feat = self.features

        class _Kernel(nn.Module):
            @nn.compact
            def __call__(s):
                return s.param("kernel", torch_conv_kernel_init,
                               (*k, cin, feat))

        kernel = _Kernel(name="conv")()
        dn = (("NHWC", "HWIO", "NHWC") if rank == 2
              else ("NDHWC", "DHWIO", "NDHWC"))
        pad = [((kk - 1) // 2, kk // 2) for kk in k]
        y = None
        ofs = 0
        for b in branches:
            ci = int(b.shape[-1])
            wi = jax.lax.slice_in_dim(kernel, ofs, ofs + ci, axis=rank)
            ofs += ci
            if tuple(b.shape[1:-1]) == tuple(target):
                # no preferred_element_type: f32 accumulation of bf16 operands
                # has no conv transpose rule (the cotangent arrives f32 against
                # a bf16 kernel); TPU convs accumulate f32 internally anyway
                t = jax.lax.conv_general_dilated(
                    b, wi.astype(b.dtype), (1,) * rank, pad,
                    dimension_numbers=dn).astype(jnp.float32)
            else:
                t = resize_conv(b, wi, None, target,
                                align_corners=True).astype(jnp.float32)
            y = t if y is None else y + t
        y = y.astype(branches[0].dtype)
        y = nn.BatchNorm(use_running_average=use_running_average, momentum=0.9,
                         epsilon=1e-5, name="bn")(y)
        return nn.relu(y)


class FPNFuse(nn.Module):
    """Top-down FPN fusion (ref: seg_heads.py:52-77)."""

    feature_channels: Sequence[int]

    @nn.compact
    def __call__(self, features, use_running_average: bool = True):
        fpn_out = self.feature_channels[0]
        feats = list(features)
        for i in range(1, len(feats)):
            feats[i] = ConvNd(fpn_out, 1, 1, use_bias=True, name=f"conv1x1_{i-1}")(feats[i])
        # top-down: upsample deeper feature to the shallower grid and add
        P = []
        for i in reversed(range(1, len(feats))):
            up = linear_resize(feats[i], feats[i - 1].shape[1:-1], align_corners=True)
            P.append(up + feats[i - 1])
        # one shared smooth conv (reference weight-sharing quirk)
        smooth = ConvNd(fpn_out, 3, 1, use_bias=True, name="smooth_conv")
        P = [smooth(p) for p in P]
        P = list(reversed(P))
        P.append(feats[-1])
        target = P[0].shape[1:-1]
        # fusion conv split per branch, composed onto the coarse grids —
        # replaces resize -> concat -> _ConvBNRelu(conv_fusion) exactly
        return _FusedConcatResizeConvBN(fpn_out, 3, name="conv_fusion")(
            P, target, use_running_average)


class UperNet(nn.Module):
    """Unified UperNet head; `spatial_dims` 2 or 3 selects the reference
    UperNet2D / UperNet3D behavior (ref: seg_heads.py:79-147, 211-278)."""

    num_classes: int
    encoder_name: str                 # 'Swin' | 'ViT'
    feature_channels: Sequence[int]   # backbone output_feature_channels
    output_size: Sequence[int]        # (H, W) or (T, H, W)
    spatial_dims: int = 2
    vit_grid: Sequence[int] | None = None  # token grid for ViT reshape

    @nn.compact
    def __call__(self, hidden_states, use_running_average: bool = True,
                 deterministic: bool = True):
        taps = [-4, -3, -2, -1] if self.encoder_name == "Swin" else [4, 7, 10, -1]
        feats = [hidden_states[i] for i in taps]
        chans = [self.feature_channels[i] for i in taps]

        if self.encoder_name == "ViT":
            g = tuple(self.vit_grid)
            feats = [f.reshape(f.shape[0], *g, f.shape[-1]) for f in feats]
            if self.spatial_dims == 2 and len(g) == 3:
                feats = [f[:, 0] for f in feats]
        else:
            if self.spatial_dims == 2:
                feats = [f[:, 0] for f in feats]  # drop depth dim (D == 1)

        feats[-1] = PSPModule(chans[-1], name="PPN")(feats[-1], use_running_average,
                                                     deterministic)
        x = FPNFuse(chans, name="FPN")(feats, use_running_average)
        # resize-then-conv (ref order: seg_heads.py:271-274) composed into
        # coarse-grid matmuls — see resize.resize_conv
        x = _ResizeConvHead(self.num_classes, 3, self.output_size,
                            name="head")(x)
        if self.spatial_dims == 2:
            x = x[:, None]  # add back time dim -> (B, 1, H, W, C)
        return x
