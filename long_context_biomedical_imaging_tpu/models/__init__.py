from .class_heads import SwinLinear, ViTLinear
from .enhance_heads import SwinUNETR, ViTUNETR
from .hyena import HyenaFilter, HyenaOperator
from .identity import IdentityDecoder, IdentityEncoder
from .layers import (DropPath, MLPBlock, PatchEmbed, PatchEmbeddingBlock,
                     TorchDense, parameterless_layer_norm)
from .mamba import MambaVisionMixer
from .model_base import EncoderDecoderModel, build_model, example_input_shape
from .resize import adaptive_avg_pool, linear_resize
from .seg_heads import UperNet
from .swin import SwinBackbone, build_swin
from .unetr_blocks import (InstanceNorm, UnetOutBlock, UnetResBlock,
                           UnetrBasicBlock, UnetrPrUpBlock, UnetrUpBlock)
from .vit import ViTBackbone, build_vit

__all__ = [
    "build_model", "EncoderDecoderModel", "example_input_shape", "ViTBackbone",
    "SwinBackbone", "build_vit", "build_swin", "HyenaOperator", "HyenaFilter",
    "MambaVisionMixer", "ViTLinear", "SwinLinear", "UperNet", "SwinUNETR",
    "ViTUNETR", "IdentityEncoder", "IdentityDecoder", "MLPBlock", "DropPath",
    "PatchEmbed", "PatchEmbeddingBlock", "TorchDense", "parameterless_layer_norm",
    "InstanceNorm", "UnetResBlock", "UnetrBasicBlock", "UnetrUpBlock",
    "UnetrPrUpBlock", "UnetOutBlock", "linear_resize", "adaptive_avg_pool",
]
