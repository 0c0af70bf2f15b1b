"""Softmax multi-head attention: XLA baseline + flash-kernel dispatch.

The XLA path expresses the reference's attention einsums
(ref: model/models/backbone_vit.py:191-203, backbone_swin.py:339-357) as
`dot_general`s that XLA tiles onto the MXU and fuses with the softmax; it
supports the additive bias needed by shifted-window attention (relative
position bias + shift mask). The Pallas flash kernel takes over for long
bias-free sequences (full-sequence ViT), where materializing the (L, L) score
matrix would blow HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .flash_attention import flash_attention

# Below this many query tokens the (L, L) score matrix fits comfortably in
# VMEM/HBM and plain XLA attention (fully fused) is faster than paying the
# flash kernel's scratch bookkeeping.
_FLASH_MIN_SEQ = 1024


def attention_reference(q, k, v, bias=None, scale=None):
    """Plain O(L^2) attention. q, k, v: (..., H, L, D); bias broadcastable to
    (..., H, L, L). Softmax statistics in fp32 regardless of input dtype."""
    d = q.shape[-1]
    if scale is None:
        scale = d ** -0.5
    s = jnp.einsum("...hqd,...hkd->...hqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("...hqk,...hkd->...hqd", p.astype(v.dtype), v)


def multi_head_attention(q, k, v, bias=None, scale=None, use_flash: str = "auto"):
    """Dispatching attention entry point.

    use_flash: 'auto' (flash for long bias-free sequences), 'always', 'never'.
    """
    l = q.shape[-2]
    if use_flash == "always" or (use_flash == "auto" and bias is None
                                 and l >= _FLASH_MIN_SEQ):
        if bias is not None:
            raise NotImplementedError("flash path does not take additive bias yet")
        lead = q.shape[:-3]
        b = 1
        for s in lead:
            b *= s
        out = flash_attention(q.reshape(b, *q.shape[-3:]),
                              k.reshape(b, *k.shape[-3:]),
                              v.reshape(b, *v.shape[-3:]), scale=scale)
        return out.reshape(*lead, *out.shape[-3:])
    return attention_reference(q, k, v, bias=bias, scale=scale)
