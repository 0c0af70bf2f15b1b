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


def sp_flash_attention(q, k, v, scale=None):
    """Sequence-parallel flash attention over the mesh 'model' axis.

    q, k, v: (B, H, L, D). Two regimes (a pallas_call cannot be
    SPMD-partitioned by GSPMD, so both wrap the kernel in shard_map —
    without it XLA would gather everything and serialize on one chip):

    * L divides the model axis -> **ring attention**
      (ops/ring_attention.py): q AND k/v shard; k/v chunks rotate around
      the ring via ppermute while each chip's flash kernel consumes them.
      Per-chip memory is O(L/n) for every tensor — the beyond-HBM path.
    * Lkv = ways*c + r with c >= 1 (the +1 cls-token attention-classification
      geometry, ref backbone_vit.py:369-370,384-386) -> **ring + tail**:
      the first ways*c kv tokens ring exactly as above; the r < ways
      remainder tokens replicate as a tiny tail chunk merged by the same
      blockwise-lse algebra (ops/ring_attention.ring_flash_attention_tail).
      q pads to a ways multiple (junk pad rows are sliced off). Per-chip
      memory stays O(L/n) — no O(L) gathered k/v.
    * Lkv < ways: the query shard is padded to divide, k/v replicate per
      chip (XLA inserts the all-gather), and each chip runs flash over its
      query shard against the full sequence; the gradient path psums the
      per-shard dk/dv partials.

    Lq and Lkv may differ: the ViT pads its residual stream to a ways
    multiple for the cls-token geometry (so inter-block activations shard,
    VERDICT r4 #6) while attention keys/values are sliced back to the real
    token count — q then arrives ways-divisible with Lkv = Lq - pad.
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import active_mesh
    mesh = active_mesh()
    ways = int(mesh.shape["model"])
    dp = int(mesh.shape["data"])
    b, h, lq, d = q.shape
    lkv = k.shape[2]
    if scale is None:
        scale = d ** -0.5
    # batch stays sharded over 'data' (the trainer guarantees divisibility);
    # an unmentioned batch axis would all-gather the batch onto every chip
    bspec = "data" if b % dp == 0 else None
    tok = P(bspec, None, "model", None)

    if lq % ways == 0 and lkv % ways == 0:
        from .flash_attention import BLOCK_K, BLOCK_Q
        from .ring_attention import ring_flash_attention

        def local(qq, kk, vv):
            bl, lqs, lks = qq.shape[0], qq.shape[2], kk.shape[2]
            out = ring_flash_attention(
                qq.reshape(bl * h, lqs, d), kk.reshape(bl * h, lks, d),
                vv.reshape(bl * h, lks, d), float(scale), ways, "model",
                BLOCK_Q, BLOCK_K)
            return out.reshape(bl, h, lqs, d)

        f = jax.shard_map(local, mesh=mesh, in_specs=(tok,) * 3,
                          out_specs=tok, check_vma=False)
        return f(q, k, v)

    c, r = divmod(lkv, ways)
    if c >= 1:
        from .flash_attention import BLOCK_K, BLOCK_Q
        from .ring_attention import ring_flash_attention_tail

        lq_pad = ways * (-(-lq // ways))
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, lq_pad - lq), (0, 0))) \
            if lq_pad != lq else q
        k_ring, k_tail = k[:, :, :ways * c], k[:, :, ways * c:]
        v_ring, v_tail = v[:, :, :ways * c], v[:, :, ways * c:]

        def local(qq, kk, vv, kt, vt):
            bl, lqs, lks = qq.shape[0], qq.shape[2], kk.shape[2]
            out = ring_flash_attention_tail(
                qq.reshape(bl * h, lqs, d), kk.reshape(bl * h, lks, d),
                vv.reshape(bl * h, lks, d), kt.reshape(bl * h, r, d),
                vt.reshape(bl * h, r, d), float(scale), ways, "model",
                BLOCK_Q, BLOCK_K)
            return out.reshape(bl, h, lqs, d)

        f = jax.shard_map(local, mesh=mesh,
                          in_specs=(tok, tok, tok, P(bspec), P(bspec)),
                          out_specs=tok, check_vma=False)
        out = f(qp, k_ring, v_ring, k_tail, v_tail)
        return out[:, :, :lq] if lq_pad != lq else out

    pad = (-lq) % ways
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))

    f = jax.shard_map(
        lambda qq, kk, vv: flash_attention(qq, kk, vv, scale=scale),
        mesh=mesh,
        in_specs=(tok, P(bspec), P(bspec)),
        out_specs=tok,
        check_vma=False,  # custom_vjp inside; varying-axes checking rejects it
    )
    out = f(q, k, v)
    return out[:, :, :lq] if pad else out


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
        qf = q.reshape(b, *q.shape[-3:])
        kf = k.reshape(b, *k.shape[-3:])
        vf = v.reshape(b, *v.shape[-3:])
        from ..parallel.mesh import model_axis_size
        if model_axis_size() > 1:
            out = sp_flash_attention(qf, kf, vf, scale=scale)
        else:
            out = flash_attention(qf, kf, vf, scale=scale)
        return out.reshape(*lead, *out.shape[-3:])
    return attention_reference(q, k, v, bias=bias, scale=scale)
