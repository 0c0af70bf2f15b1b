"""Swin backbone with swappable window mixer (attention / Hyena / Mamba).

Reimplements the reference Swin path (ref: model/models/backbone_swin.py:44-911)
TPU-first. Internal layout is channels-last (B, D, H, W, C) for both 2D and 3D
models (2D keeps D == 1; patch/window/merge depth factors are 1, which makes
the 3D relative-position/mask formulas reduce exactly to the 2D ones).

Contract preserved from the reference:
  * 4 stages of SwinTransformerBlocks; window shift on odd blocks, shift
    disabled entirely for hyena/mamba (ref: :674)
  * hyena/mamba run per-window on window-volume-length sequences (ref: :361-365)
  * PatchMergingV2 downsample at the end of every stage (ref: :540-585)
  * returns [input, x0_out..x4_out] with channels [e, 2e, 4e, 8e, 16e], each
    proj_out'd through a parameterless layer norm (ref: :866-911)
  * windows auto-shrink to the input grid (ref: :200-224)
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (compute_shift_regions, get_window_size,
                   pad_to_window_multiple, relative_position_index,
                   window_partition, window_reverse, windowed_attention_proj)
from .hyena import HyenaOperator
from .layers import (LayerNormAmp, LNMLPResidual, PatchEmbed, TorchDense,
                     fan_in_bias_init, parameterless_layer_norm,
                     torch_linear_kernel_init, trunc_normal_init)
from .mamba import MambaVisionMixer

HYENA_L_MAX = 66000  # ref: backbone_swin.py:317


class WindowAttention(nn.Module):
    """Windowed MHA with relative position bias, or hyena/mamba per window
    (ref: backbone_swin.py:227-367). Input (B*nW, V, C)."""

    dim: int
    num_heads: int
    window_size: Sequence[int]       # effective (possibly shrunk) window
    qkv_bias: bool = True
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, *, use_hyena=False, use_mamba=False,
                 deterministic: bool = True, ln_params=None):
        if use_hyena:
            return HyenaOperator(d_model=self.dim, l_max=HYENA_L_MAX,
                                 filter_order=64, num_heads=self.num_heads,
                                 short_filter_order=5, name="hyena")(
                x, deterministic=deterministic, ln_params=ln_params)
        if use_mamba:
            return MambaVisionMixer(d_model=self.dim, d_state=8, d_conv=3,
                                    expand=1, name="mamba")(
                x, deterministic=deterministic, ln_params=ln_params)
        assert ln_params is None  # in-kernel pre-LN is hyena/mamba-only

        b, n, c = x.shape
        head_dim = self.dim // self.num_heads
        wd, wh, ww = self.window_size
        table = self.param(
            "relative_position_bias_table", trunc_normal_init(0.02),
            ((2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1), self.num_heads))
        index = relative_position_index(tuple(self.window_size))  # (V, V) static

        rel = table[index.reshape(-1)].reshape(n, n, self.num_heads)
        rel = rel.transpose(2, 0, 1)                      # (H, V, V)

        # qkv/out projection params declared directly (torch nn.Linear
        # defaults): the fused kernel computes both projections in VMEM —
        # keeping them outside left 4x-padded (T, 32) qkv tensors and
        # 128x-padded (T, 1) softmax stats in the gradient residual set,
        # which OOM'd HBM at the 1024^2 ptx geometry.
        wqkv = self.param("qkv_kernel", torch_linear_kernel_init,
                          (self.dim, 3 * self.dim))
        bqkv = self.param("qkv_bias_p", fan_in_bias_init(self.dim),
                          (3 * self.dim,)) if self.qkv_bias else None
        wout = self.param("proj_kernel", torch_linear_kernel_init,
                          (self.dim, self.dim))
        bout = self.param("proj_bias", fan_in_bias_init(self.dim), (self.dim,))
        if mask is not None:
            # mask carries per-token pre-shift region ids (nW, V);
            # window_partition flattens batch as (B, nW) windows-fastest
            # (ref: backbone_swin.py:349-352)
            rid = jnp.tile(mask, (b // mask.shape[0], 1))
        else:
            rid = None
        out = windowed_attention_proj(x, wqkv, bqkv, wout, bout, rel,
                                      heads=self.num_heads, rid=rid)
        return nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)


class PatchMergingV2(nn.Module):
    """2x downsample, channels x2 (ref: backbone_swin.py:540-585).

    Merges (2,2,2) neighborhoods for 3D models and (1,2,2) for 2D (depth kept).
    """

    dim: int
    spatial_dims: int = 3

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        md = 2 if self.spatial_dims == 3 else 1
        pad_d, pad_h, pad_w = d % md, h % 2, w % 2
        if pad_d or pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w), (0, 0)))
        dp, hp, wp = d + pad_d, h + pad_h, w + pad_w
        # Reshape/transpose formulation of the strided-slice concat
        # concat_{i,j,k}(x[:, i::md, j::2, k::2, :]): XLA lowers the slice
        # concat's backward to 2^dims chained scatter fusions (~20 ms/step on
        # ptx); the transpose form is a single layout pass each way.
        x = x.reshape(b, dp // md, md, hp // 2, 2, wp // 2, 2, c)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        x = x.reshape(b, dp // md, hp // 2, wp // 2, md * 4 * c)
        # LayerNormAmp, not nn.LayerNorm: keeps the big transpose above in
        # the stream dtype under AMP (see layers.LayerNormAmp)
        x = LayerNormAmp(name="norm")(x)
        return TorchDense(2 * self.dim, use_bias=False)(x)


class SwinTransformerBlock(nn.Module):
    """One Swin block: windowed mixer + MLP, with optional cyclic shift
    (ref: backbone_swin.py:370-537)."""

    dim: int
    num_heads: int
    window_size: Sequence[int]
    shift_size: Sequence[int]
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_hyena: bool = False
    use_mamba: bool = False
    dropout_rate: float = 0.0
    windowed: bool = False   # input already partitioned to (B*nW, V, C)

    @nn.compact
    def __call__(self, x, attn_mask, deterministic: bool = True):
        if self.windowed:
            # Stage-level windowed layout (hyena/mamba: shift is disabled, so
            # every block in a stage shares the identical partition — the
            # partition/reverse layout copies that XLA materializes per block
            # were ~15% of the ptx step; see BasicLayer).
            bw, v, c = x.shape   # c may be lane-padded past self.dim
            # BasicLayer only routes hyena/mamba stages through the windowed
            # layout (attention keeps the shift schedule, so its partition
            # changes per block).
            assert self.use_hyena or self.use_mamba
            # pre-LN + residual fold into the fused mixer kernel (or its
            # composed fallback): 2 fewer HBM passes over the stage tensor
            # each way. Params declared here to keep one tree either way.
            s = self.param("norm1_scale", nn.initializers.ones, (self.dim,))
            bln = self.param("norm1_bias", nn.initializers.zeros, (self.dim,))
            x = WindowAttention(
                dim=self.dim, num_heads=self.num_heads,
                window_size=self.window_size, qkv_bias=self.qkv_bias,
                dropout_rate=self.dropout_rate,
                name="attn")(x, None, use_hyena=self.use_hyena,
                             use_mamba=self.use_mamba,
                             deterministic=deterministic,
                             ln_params=(s, bln))
            flat = LNMLPResidual(self.dim, int(self.dim * self.mlp_ratio),
                                 self.dropout_rate, name="mlp")(
                x.reshape(-1, c), deterministic)
            return flat.reshape(bw, v, c)

        b, d, h, w, c = x.shape
        window_size, shift_size = get_window_size((d, h, w), self.window_size,
                                                  self.shift_size)
        shortcut = x
        x = nn.LayerNorm(name="norm1")(x)

        pad_d = (-d) % window_size[0]
        pad_h = (-h) % window_size[1]
        pad_w = (-w) % window_size[2]
        if pad_d or pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w), (0, 0)))
        dp, hp, wp = d + pad_d, h + pad_h, w + pad_w

        shifted = any(s > 0 for s in shift_size)
        if shifted:
            x = jnp.roll(x, shift=tuple(-s for s in shift_size), axis=(1, 2, 3))
            mask = attn_mask
        else:
            mask = None

        x_windows = window_partition(x, window_size)      # (B*nW, V, C)
        attn_windows = WindowAttention(
            dim=self.dim, num_heads=self.num_heads, window_size=window_size,
            qkv_bias=self.qkv_bias, dropout_rate=self.dropout_rate,
            name="attn")(x_windows, mask, use_hyena=self.use_hyena,
                         use_mamba=self.use_mamba, deterministic=deterministic)
        x = window_reverse(attn_windows, window_size, (b, dp, hp, wp))

        if shifted:
            x = jnp.roll(x, shift=tuple(shift_size), axis=(1, 2, 3))
        if pad_d or pad_h or pad_w:
            x = x[:, :d, :h, :w, :]

        x = shortcut + x
        # run LN+MLP on flattened tokens: Dense grads over a 5D operand lower
        # to ~6x-slower HBM-bound contractions than the same matmul on 2D
        flat = LNMLPResidual(self.dim, int(self.dim * self.mlp_ratio),
                             self.dropout_rate, name="mlp")(
            x.reshape(-1, c), deterministic)
        return flat.reshape(b, d, h, w, c)


class BasicLayer(nn.Module):
    """One Swin stage: `depth` blocks + PatchMergingV2 (ref: backbone_swin.py:630-733)."""

    dim: int
    depth: int
    num_heads: int
    window_size: Sequence[int]
    spatial_dims: int = 3
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_hyena: bool = False
    use_mamba: bool = False
    use_checkpoint: bool = False
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, d, h, w, c = x.shape
        no_shift = (0, 0, 0)
        base_shift = (no_shift if (self.use_hyena or self.use_mamba)
                      else tuple(s // 2 for s in self.window_size))
        window_size, shift_size = get_window_size((d, h, w), self.window_size,
                                                  base_shift)
        pad_dims = tuple(-(-dim_ // ws) * ws for dim_, ws in
                         zip((d, h, w), window_size))
        # Factored shift mask: per-token region ids (nW, V); the fused kernel
        # rebuilds the additive -100 mask in VMEM (ops/window_attention.py).
        attn_mask = (compute_shift_regions(pad_dims, window_size, shift_size)
                     if any(s > 0 for s in shift_size) else None)

        block_cls = SwinTransformerBlock
        if self.use_checkpoint:
            # args after self: (x=0, attn_mask=1, deterministic=2)
            block_cls = nn.remat(SwinTransformerBlock, static_argnums=(2,))

        # The stage-level windowed layout requires the (shrunk) window to
        # divide every spatial dim: with padding, pad tokens would live in the
        # stream across blocks — LayerNormed as data (LN(0-row) = ln_bias) and
        # leaking into real tokens through the causal window convs — where the
        # reference re-zeroes them after every block's norm1. Non-multiple
        # geometries take the per-block path below, which pads the LN'd
        # tensor with exact zeros per block (matching the reference); all six
        # flagship geometries divide evenly and keep the fast path.
        divisible = all(dim_ % ws == 0 for dim_, ws in
                        zip((d, h, w), window_size))
        if (self.use_hyena or self.use_mamba) and divisible:
            # Shift is disabled for hyena/mamba (ref: backbone_swin.py:674),
            # so every block shares the identical partition: partition once,
            # run the whole stage in (B*nW, V, C) windowed layout, reverse
            # once. Per-block partition/reverse cost ~15% of the ptx step in
            # materialized layout copies.
            xp, (dp, hp, wp) = pad_to_window_multiple(x, window_size)
            xw = window_partition(xp, window_size)
            # Lane-pad the stage stream to a 128 multiple (96->128, 192->256)
            # — measured and OFF by default. Pallas block DMAs at
            # non-128-multiple lane widths run ~180 GB/s vs 500-650 for
            # 128-multiples on v5e (scripts/probe_copy_bw.py), but the fused
            # mixer/MLP kernels pipeline their block DMA behind compute, so
            # padding left the ptx step unchanged (184.9 vs 181.1 ms, kernel
            # buckets 95.96/43.76 vs 97.2/42.2 ms) while paying ~2 ms of
            # pad/slice passes and +33% stage-activation memory (a real cost
            # for the remat'd workloads near the HBM line). The pad-aware
            # kernel path stays (exact math: zero-padded projections, LN over
            # the real C) for kernels that become DMA-bound later; enable
            # with LCBI_LANE_PAD=1.
            import os as _os
            c_pad = ((-c) % 128 if _os.environ.get("LCBI_LANE_PAD") == "1"
                     else 0)
            if c_pad:
                xw = jnp.pad(xw, ((0, 0), (0, 0), (0, c_pad)))
            for i in range(self.depth):
                xw = block_cls(
                    dim=self.dim, num_heads=self.num_heads,
                    window_size=window_size, shift_size=no_shift,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    use_hyena=self.use_hyena, use_mamba=self.use_mamba,
                    dropout_rate=self.dropout_rate, windowed=True,
                    name=f"block_{i}")(xw, None, deterministic)
            if c_pad:
                xw = xw[..., :c]
            x = window_reverse(xw, window_size, (b, dp, hp, wp))
            if (dp, hp, wp) != (d, h, w):
                x = x[:, :d, :h, :w, :]
        else:
            for i in range(self.depth):
                x = block_cls(
                    dim=self.dim, num_heads=self.num_heads,
                    window_size=self.window_size,
                    shift_size=no_shift if i % 2 == 0 else base_shift,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    use_hyena=self.use_hyena, use_mamba=self.use_mamba,
                    dropout_rate=self.dropout_rate,
                    name=f"block_{i}")(x, attn_mask, deterministic)
        x = PatchMergingV2(dim=self.dim, spatial_dims=self.spatial_dims,
                           name="downsample")(x)
        return x


class SwinBackbone(nn.Module):
    """Full Swin encoder returning [input, x0_out..x4_out]
    (ref: backbone_swin.py:735-911)."""

    patch_size: Sequence[int]       # (pt, ph, pw) or (ph, pw)
    window_size: Sequence[int]      # same rank as patch_size
    in_channels: int
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_hyena: bool = False
    use_mamba: bool = False
    use_checkpoint: bool = False
    dropout_rate: float = 0.0
    embed_dtype: jnp.dtype | None = None  # bf16 under AMP; cast post-patchify

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, T, H, W, C). Returns 6 channels-last tensors with a depth axis."""
        spatial_dims = 2 if len(self.patch_size) == 2 else 3
        patch = ((1,) + tuple(self.patch_size)) if spatial_dims == 2 else tuple(self.patch_size)
        window = ((1,) + tuple(self.window_size)) if spatial_dims == 2 else tuple(self.window_size)

        hidden_states = [x]
        x = PatchEmbed(patch_size=patch, embed_dim=self.embed_dim,
                       dtype=self.embed_dtype, name="patch_embed")(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
        hidden_states.append(parameterless_layer_norm(x))
        for i, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            x = BasicLayer(
                dim=int(self.embed_dim * 2 ** i), depth=depth, num_heads=heads,
                window_size=window, spatial_dims=spatial_dims,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                use_hyena=self.use_hyena, use_mamba=self.use_mamba,
                use_checkpoint=self.use_checkpoint,
                dropout_rate=self.dropout_rate,
                name=f"layer_{i}")(x, deterministic)
            hidden_states.append(parameterless_layer_norm(x))
        return hidden_states


def swin_size_presets(size: str, cfg=None):
    """Size presets (ref: backbone_swin.py:56-102)."""
    presets = {
        "unetr": dict(embed_dim=48, depths=[2, 2, 2, 2], num_heads=[3, 6, 12, 24]),
        "tiny": dict(embed_dim=96, depths=[2, 2, 6, 2], num_heads=[3, 6, 12, 24]),
        "small": dict(embed_dim=96, depths=[2, 2, 18, 2], num_heads=[3, 6, 12, 24]),
        "base": dict(embed_dim=128, depths=[2, 2, 18, 2], num_heads=[4, 8, 16, 32]),
        "large": dict(embed_dim=192, depths=[2, 2, 18, 2], num_heads=[6, 12, 24, 48]),
    }
    if size in presets:
        return presets[size]
    if size == "custom":
        return dict(embed_dim=cfg.embed_dim, depths=list(cfg.depths),
                    num_heads=list(cfg.num_heads))
    raise ValueError(f"Unknown Swin size {size}")


def build_swin(config, input_feature_channels: int):
    """Config -> (module, output_feature_channels) (ref: backbone_swin.py:44-131)."""
    preset = swin_size_presets(config.Swin.size, config.Swin)
    config.Swin.embed_dim = preset["embed_dim"]
    config.Swin.depths = list(preset["depths"])
    config.Swin.num_heads = list(preset["num_heads"])

    if config.time == 1:
        patch = config.Swin.patch_size
        window = config.Swin.window_size
        patch = patch[1:] if len(patch) == 3 else patch
        window = window[1:] if len(window) == 3 else window
    else:
        patch = config.Swin.patch_size
        window = config.Swin.window_size

    model = SwinBackbone(
        patch_size=tuple(patch), window_size=tuple(window),
        in_channels=input_feature_channels,
        embed_dim=preset["embed_dim"], depths=tuple(preset["depths"]),
        num_heads=tuple(preset["num_heads"]),
        use_hyena=config.Swin.use_hyena, use_mamba=config.Swin.use_mamba,
        use_checkpoint=bool(config.Swin.get("use_checkpoint", False)),
        embed_dtype=jnp.bfloat16 if config.get("use_amp") else None)

    e, nl = preset["embed_dim"], len(preset["depths"])
    out_channels = [e * 2 ** (nl - i) for i in range(nl, 0, -1)] + [e * 2 ** nl]
    return model, out_channels
