"""Encoder-decoder composition from config (ref: model/model_base.py:18-83).

`build_model(config)` resolves the encoder/decoder registries and returns a
single flax module whose __call__ is `decoder(encoder(x))` on channels-last
(B, T, H, W, C) input. Heads that contain BatchNorm (UperNet) thread a
`use_running_average` flag; callers mutate the 'batch_stats' collection during
training.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn

from .class_heads import SwinLinear, ViTLinear
from .enhance_heads import SwinUNETR, ViTUNETR
from .identity import IdentityDecoder, IdentityEncoder
from .seg_heads import UperNet
from .swin import build_swin
from .vit import build_vit

ENCODERS = ("Identity", "ViT", "Swin")
DECODERS = ("Identity", "ViTLinear", "SwinLinear", "UperNet2D", "UperNet3D",
            "SwinUNETR", "ViTUNETR")


class EncoderDecoderModel(nn.Module):
    encoder: nn.Module
    decoder: nn.Module
    decoder_takes_norm_flag: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 use_running_average: bool | None = None):
        if use_running_average is None:
            use_running_average = deterministic
        hidden_states = self.encoder(x, deterministic=deterministic)
        if self.decoder_takes_norm_flag:
            return self.decoder(hidden_states, use_running_average=use_running_average,
                                deterministic=deterministic)
        return self.decoder(hidden_states, deterministic=deterministic)


def build_model(config) -> EncoderDecoderModel:
    """Resolve encoder/decoder registries from config (ref: model_base.py:23-83)."""
    in_ch = config.no_in_channel
    out_ch = config.no_out_channel

    if config.encoder_name == "Identity":
        encoder, feature_channels = IdentityEncoder(), [in_ch]
    elif config.encoder_name == "ViT":
        encoder, feature_channels = build_vit(config, in_ch)
    elif config.encoder_name == "Swin":
        encoder, feature_channels = build_swin(config, in_ch)
    else:
        raise ValueError(f"Unknown encoder {config.encoder_name}")

    spatial_dims = 2 if config.time == 1 else 3
    takes_norm_flag = False

    if config.decoder_name == "Identity":
        decoder = IdentityDecoder()
    elif config.decoder_name == "ViTLinear":
        if config.encoder_name != "ViT":
            raise ValueError("ViTLinear head requires the ViT encoder")
        use_cls = not (config.ViT.use_hyena or config.ViT.use_mamba)
        decoder = ViTLinear(num_classes=out_ch, use_cls_token=use_cls)
    elif config.decoder_name == "SwinLinear":
        decoder = SwinLinear(num_classes=out_ch)
    elif config.decoder_name in ("UperNet2D", "UperNet3D"):
        up_dims = 2 if config.decoder_name == "UperNet2D" else 3
        out_size = ((config.height, config.width) if up_dims == 2
                    else (config.time, config.height, config.width))
        vit_grid = None
        if config.encoder_name == "ViT":
            vit_grid = _vit_token_grid(config)
        decoder = UperNet(num_classes=out_ch, encoder_name=config.encoder_name,
                          feature_channels=tuple(feature_channels),
                          output_size=out_size, spatial_dims=up_dims,
                          vit_grid=vit_grid)
        takes_norm_flag = True
    elif config.decoder_name == "SwinUNETR":
        if config.encoder_name != "Swin":
            raise ValueError("SwinUNETR head requires the Swin encoder")
        patch = config.Swin.patch_size
        patch = patch[1:] if (config.time == 1 and len(patch) == 3) else patch
        decoder = SwinUNETR(out_channels=out_ch,
                            feature_channels=tuple(feature_channels),
                            patch_size=tuple(patch), spatial_dims=spatial_dims,
                            use_checkpoint=getattr(config, "decoder_checkpoint",
                                                   False))
    elif config.decoder_name == "ViTUNETR":
        if config.encoder_name != "ViT":
            raise ValueError("ViTUNETR head requires the ViT encoder")
        patch = config.ViT.patch_size
        patch = patch[1:] if (config.time == 1 and len(patch) == 3) else patch
        decoder = ViTUNETR(out_channels=out_ch, hidden_size=config.ViT.hidden_size,
                           patch_size=tuple(patch), grid=_vit_token_grid(config),
                           spatial_dims=spatial_dims,
                           use_checkpoint=getattr(config, "decoder_checkpoint",
                                                  False))
    else:
        raise ValueError(f"Unknown decoder {config.decoder_name}")

    return EncoderDecoderModel(encoder=encoder, decoder=decoder,
                               decoder_takes_norm_flag=takes_norm_flag)


def _vit_token_grid(config):
    patch = config.ViT.patch_size
    if config.time == 1:
        p = patch[1:] if len(patch) == 3 else patch
        return (config.height // p[0], config.width // p[1])
    return (config.time // patch[0], config.height // patch[1],
            config.width // patch[2])


def example_input_shape(config, batch: int = 2):
    return (batch, config.time, config.height, config.width, config.no_in_channel)
