"""UNETR enhancement heads (ref: model/models/enhance_heads.py:30-356).

SwinUNETR: 5 residual encoders over the input + 4 Swin scales, 5 up-blocks
with skip concatenation, 1x1 out conv. ViTUNETR: progressive upsamplers over
ViT hidden states 4/7/10 (full-list indices) + final norm, patch-size-dependent
upsample schedule. Channels-last; 2D models squeeze/re-add the depth axis.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from .unetr_blocks import (UnetOutBlock, UnetrBasicBlock, UnetrPrUpBlock,
                           UnetrUpBlock)


def _unetr_blocks(use_checkpoint: bool):
    """UNETR block classes, optionally remat-wrapped: the full-resolution conv
    activations dominate the gradient residual set (57GB HBM measured for
    ViT+ViTUNETR at 1024^2 b4 — 3.6x one v5e chip); rematerializing inside
    each block keeps only block-boundary tensors live."""
    if use_checkpoint:
        return (nn.remat(UnetrBasicBlock), nn.remat(UnetrUpBlock),
                nn.remat(UnetrPrUpBlock))
    return UnetrBasicBlock, UnetrUpBlock, UnetrPrUpBlock


class SwinUNETR(nn.Module):
    """(ref: enhance_heads.py:30-184)."""

    out_channels: int
    feature_channels: Sequence[int]   # [e, 2e, 4e, 8e, 16e]
    patch_size: Sequence[int]         # (ph, pw) or (pt, ph, pw)
    spatial_dims: int = 2
    use_checkpoint: bool = False

    @nn.compact
    def __call__(self, hidden_states, deterministic: bool = True):
        fc = list(self.feature_channels)
        if fc[0] % 12 != 0:
            raise ValueError("Features should be divisible by 12 to use current UNETR config.")
        if self.spatial_dims == 2:
            hidden_states = [h[:, 0] for h in hidden_states]
        x_in, feats = hidden_states[0], hidden_states[1:]
        BasicBlock, UpBlock, _ = _unetr_blocks(self.use_checkpoint)

        enc0 = BasicBlock(fc[0], name="encoder1")(x_in)
        enc1 = BasicBlock(fc[0], name="encoder2")(feats[0])
        enc2 = BasicBlock(fc[1], name="encoder3")(feats[1])
        enc3 = BasicBlock(fc[2], name="encoder4")(feats[2])
        dec4 = BasicBlock(fc[4], name="encoder10")(feats[4])

        dec3 = UpBlock(fc[3], upsample_kernel_size=2, name="decoder5")(dec4, feats[3])
        dec2 = UpBlock(fc[2], upsample_kernel_size=2, name="decoder4")(dec3, enc3)
        dec1 = UpBlock(fc[1], upsample_kernel_size=2, name="decoder3")(dec2, enc2)
        dec0 = UpBlock(fc[0], upsample_kernel_size=2, name="decoder2")(dec1, enc1)
        out = UpBlock(fc[0], upsample_kernel_size=tuple(self.patch_size),
                      name="decoder1")(dec0, enc0)
        out = UnetOutBlock(self.out_channels, name="out")(out)
        if self.spatial_dims == 2:
            out = out[:, None]
        return out


# Patch-size-dependent upsample schedule (ref: enhance_heads.py:220-242):
# (n_us2, n_us3, n_us4, enc_us, dec_us1, dec_us2, dec_us3, dec_us4)
_VIT_UNETR_SCHEDULE = {
    2: (0, 0, 0, 2, 1, 1, 1, 2),
    4: (1, 1, 0, 2, 1, 1, 2, 2),
    8: (2, 1, 0, 2, 1, 2, 2, 2),
    16: (2, 1, 0, 2, 2, 2, 2, 2),
    32: (2, 1, 0, 2, 4, 2, 2, 2),
}


class ViTUNETR(nn.Module):
    """(ref: enhance_heads.py:187-356)."""

    out_channels: int
    hidden_size: int
    patch_size: Sequence[int]          # (ph, pw) or (pt, ph, pw)
    grid: Sequence[int]                # token grid (feat_size)
    spatial_dims: int = 2
    feature_size: int = 32
    use_checkpoint: bool = False

    @nn.compact
    def __call__(self, hidden_states, deterministic: bool = True):
        p = self.patch_size[-1]
        if p not in _VIT_UNETR_SCHEDULE:
            raise ValueError(f"ViT UNETR patch size {self.patch_size} not yet supported")
        n2, n3, n4, enc_us, d1, d2, d3, d4 = _VIT_UNETR_SCHEDULE[p]
        fs = self.feature_size
        BasicBlock, UpBlock, PrUpBlock = _unetr_blocks(self.use_checkpoint)

        def proj(t):  # (B, L, C) -> (B, *grid, C)
            return t.reshape(t.shape[0], *self.grid, t.shape[-1])

        x_in = hidden_states[0]
        if self.spatial_dims == 2 and x_in.ndim == 5:
            x_in = x_in[:, 0]

        enc1 = BasicBlock(fs, name="encoder1")(x_in)
        enc2 = PrUpBlock(fs * 2, num_layer=n2, upsample_kernel_size=enc_us,
                         name="encoder2")(proj(hidden_states[4]))
        enc3 = PrUpBlock(fs * 4, num_layer=n3, upsample_kernel_size=enc_us,
                         name="encoder3")(proj(hidden_states[7]))
        enc4 = PrUpBlock(fs * 8, num_layer=n4, upsample_kernel_size=enc_us,
                         name="encoder4")(proj(hidden_states[10]))
        dec4 = proj(hidden_states[-1])
        dec3 = UpBlock(fs * 8, upsample_kernel_size=d4, name="decoder5")(dec4, enc4)
        dec2 = UpBlock(fs * 4, upsample_kernel_size=d3, name="decoder4")(dec3, enc3)
        dec1 = UpBlock(fs * 2, upsample_kernel_size=d2, name="decoder3")(dec2, enc2)
        out = UpBlock(fs, upsample_kernel_size=d1, name="decoder2")(dec1, enc1)
        out = UnetOutBlock(self.out_channels, name="out")(out)
        if self.spatial_dims == 2:
            out = out[:, None]
        return out
