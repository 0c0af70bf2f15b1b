"""ViT backbone with swappable token mixer (attention / Hyena / Mamba).

Reimplements the reference ViT path (ref: model/models/backbone_vit.py:45-397)
TPU-first: channels-last input (B, T, H, W, C), pre-LN transformer blocks whose
mixer is full-sequence softmax attention (Pallas flash kernel for long
sequences), HyenaOperator, or MambaVisionMixer. Returns the reference's
hidden-state-list contract: [input, h1..hN, final_norm] (N+2 tensors).

Reference behavioral contract preserved:
  * size presets small(384/1536/12/6) / base(768/3072/12/12) / custom
    (ref: backbone_vit.py:56-89)
  * pos-embed disabled and no cls token for hyena/mamba (ref: :349,369-370)
  * cls token prepended only for attention + classification (ref: :384-386)
  * output_feature_channels = [hidden]*(num_layers+1)
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import multi_head_attention
from .hyena import HyenaOperator
from .layers import LNMLPResidual, PatchEmbeddingBlock, TorchDense
from .mamba import MambaVisionMixer

HYENA_L_MAX = 66000  # ref: backbone_vit.py:172


class SABlock(nn.Module):
    """Token mixer: softmax MHA or hyena or mamba (ref: backbone_vit.py:120-211)."""

    hidden_size: int
    num_heads: int
    use_hyena: bool = False
    use_mamba: bool = False
    dropout_rate: float = 0.0
    qkv_bias: bool = False
    kv_len: int | None = None  # real token count when the stream is SP-padded

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.use_hyena:
            return HyenaOperator(d_model=self.hidden_size, l_max=HYENA_L_MAX,
                                 filter_order=64, num_heads=self.num_heads,
                                 short_filter_order=5, dropout=self.dropout_rate,
                                 name="hyena")(x, deterministic=deterministic)
        if self.use_mamba:
            return MambaVisionMixer(d_model=self.hidden_size, d_state=8, d_conv=3,
                                    expand=1, name="mamba")(x, deterministic=deterministic)

        b, l, _ = x.shape
        head_dim = self.hidden_size // self.num_heads
        qkv = TorchDense(3 * self.hidden_size, use_bias=self.qkv_bias)(x)
        qkv = qkv.reshape(b, l, 3, self.num_heads, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        if self.kv_len is not None and self.kv_len != l:
            # SP cls-token geometry: the residual stream carries pad rows so
            # the token axis divides the mesh; pad rows may ride along as
            # (discarded) queries but must NOT act as keys/values — slicing
            # here keeps softmax exactly over the real tokens.
            k = k[:, :, :self.kv_len]
            v = v[:, :, :self.kv_len]
        out = multi_head_attention(q, k, v)                # (b, h, l, hd)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, self.hidden_size)
        out = TorchDense(self.hidden_size)(out)
        return nn.Dropout(self.dropout_rate)(out, deterministic=deterministic)


class TransformerBlock(nn.Module):
    """Pre-LN block: x += mixer(LN(x)); x += MLP(LN(x)) (ref: backbone_vit.py:216-263)."""

    hidden_size: int
    mlp_dim: int
    num_heads: int
    use_hyena: bool = False
    use_mamba: bool = False
    dropout_rate: float = 0.0
    qkv_bias: bool = False
    kv_len: int | None = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x + SABlock(self.hidden_size, self.num_heads, self.use_hyena,
                        self.use_mamba, self.dropout_rate, self.qkv_bias,
                        kv_len=self.kv_len,
                        name="attn")(nn.LayerNorm(name="norm1")(x), deterministic)
        b, l, c = x.shape
        x = LNMLPResidual(self.hidden_size, self.mlp_dim, self.dropout_rate,
                          name="mlp")(x.reshape(-1, c), deterministic)
        return x.reshape(b, l, c)


class ViTBackbone(nn.Module):
    """Full ViT encoder returning the hidden-state list (ref: backbone_vit.py:266-397)."""

    img_size: Sequence[int]       # (T, H, W) or (H, W)
    patch_size: Sequence[int]     # matching rank
    in_channels: int
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    use_hyena: bool = False
    use_mamba: bool = False
    classification: bool = False
    dropout_rate: float = 0.0
    qkv_bias: bool = False
    embed_dtype: jnp.dtype | None = None  # bf16 under AMP; cast post-patchify

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, T, H, W, C); for 2D models T == 1 and is squeezed internally."""
        spatial_2d = len(self.img_size) == 2
        if spatial_2d:
            x = x[:, 0]  # (B, H, W, C)
        hidden_states = [x]

        use_alt = self.use_hyena or self.use_mamba
        tokens = PatchEmbeddingBlock(
            img_size=self.img_size, patch_size=self.patch_size,
            hidden_size=self.hidden_size,
            pos_embed_type="none" if use_alt else "learnable",
            dropout_rate=self.dropout_rate, dtype=self.embed_dtype,
            name="patch_embedding",
        )(x, deterministic=deterministic)

        if self.classification and not use_alt:
            cls = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, self.hidden_size))
            tokens = jnp.concatenate(
                [jnp.broadcast_to(cls, (tokens.shape[0], 1, self.hidden_size)),
                 tokens], axis=1)

        # Sequence parallelism for beyond-HBM contexts: pin the token axis to
        # the mesh 'model' axis at block boundaries (no-op on a model=1
        # mesh). Hyena: every op is token-local except the depthwise long
        # conv, which re-shards to channel-parallel around it (models/hyena).
        # Attention: LN/qkv/MLP are token-local and the flash kernel runs
        # per query shard under shard_map — ring attention when tokens
        # divide, gathered-k/v otherwise (ops/attention.sp_flash_attention).
        # Mamba: tokens shard only when the SP scan path will actually
        # engage (ops/selective_scan_sp.sp_scan_applicable — full-sequence
        # regime, divisible tokens); otherwise the recurrence would run on
        # sharded tokens OUTSIDE shard_map and GSPMD would silently gather
        # them around the scan in every block.
        from ..ops.selective_scan_sp import sp_scan_applicable
        from ..parallel.mesh import model_axis_size, shard_tokens
        kv_len = None
        ways = model_axis_size()
        if (self.classification and not use_alt and ways > 1
                and tokens.shape[1] % ways):
            # cls-token geometry (L = tokens+1 never divides the mesh axis,
            # ref backbone_vit.py:369-370,384-386): pad the residual stream
            # to a ways multiple so EVERY inter-block activation shards —
            # without this the stream replicates O(L) per chip and the
            # beyond-HBM claim fails exactly for attention+classification
            # ViTs (VERDICT r4 #6). Pad rows are row-local garbage through
            # LN/MLP; attention slices k/v back to kv_len so they never act
            # as keys; the cls head reads row 0 only. Safe only because the
            # classification head is cls-token-based here (use_alt would
            # mean-pool over pad rows — but use_alt geometries carry no cls
            # token and divide naturally).
            kv_len = tokens.shape[1]
            lp = ways * (-(-kv_len // ways))
            tokens = jnp.pad(tokens, ((0, 0), (0, lp - kv_len), (0, 0)))
        sp = (not self.use_mamba) or sp_scan_applicable(tokens.shape[1])
        if sp:
            tokens = shard_tokens(tokens)
        for i in range(self.num_layers):
            tokens = TransformerBlock(
                self.hidden_size, self.mlp_dim, self.num_heads, self.use_hyena,
                self.use_mamba, self.dropout_rate, self.qkv_bias,
                kv_len=kv_len, name=f"block_{i}")(tokens, deterministic)
            if sp:
                tokens = shard_tokens(tokens)
            hidden_states.append(tokens)
        tokens = nn.LayerNorm(name="norm")(tokens)
        hidden_states.append(tokens)
        return hidden_states


def vit_size_presets(size: str, cfg=None):
    """Size presets (ref: backbone_vit.py:56-89)."""
    if size == "small":
        return dict(hidden_size=384, mlp_dim=1536, num_layers=12, num_heads=6)
    if size == "base":
        return dict(hidden_size=768, mlp_dim=3072, num_layers=12, num_heads=12)
    if size == "custom":
        return dict(hidden_size=cfg.hidden_size, mlp_dim=cfg.mlp_dim,
                    num_layers=cfg.num_layers, num_heads=cfg.num_heads)
    raise ValueError(f"Unknown ViT size {size}")


def build_vit(config, input_feature_channels: int):
    """Config -> (module, output_feature_channels) (ref: backbone_vit.py:45-116)."""
    preset = vit_size_presets(config.ViT.size, config.ViT)
    config.ViT.hidden_size = preset["hidden_size"]
    config.ViT.mlp_dim = preset["mlp_dim"]
    config.ViT.num_layers = preset["num_layers"]
    config.ViT.num_heads = preset["num_heads"]

    if config.time == 1:
        img_size = [config.height, config.width]
        patch = config.ViT.patch_size
        patch = patch[1:] if len(patch) == 3 else patch
    else:
        img_size = [config.time, config.height, config.width]
        patch = config.ViT.patch_size

    model = ViTBackbone(
        img_size=tuple(img_size), patch_size=tuple(patch),
        in_channels=input_feature_channels,
        use_hyena=config.ViT.use_hyena, use_mamba=config.ViT.use_mamba,
        classification=config.task_type == "class",
        embed_dtype=jnp.bfloat16 if config.get("use_amp") else None, **preset)
    return model, [preset["hidden_size"]] * (preset["num_layers"] + 1)
