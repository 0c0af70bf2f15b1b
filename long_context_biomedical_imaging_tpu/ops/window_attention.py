"""Fused Pallas windowed attention with relative-position bias + shift mask.

The Swin hot op (ref: model/models/backbone_swin.py:227-367): thousands of
tiny V-token windows (V = 16..512) attend independently with a per-head
relative-position bias and, on shifted blocks, an additive region mask.

TPU-first design (replaces the round-1 grouped XLA path, which materialized
(G*V)^2 fp32 score and block-diagonal bias tensors in HBM every layer):

  * G consecutive windows fuse into one G*V-token sequence so the score
    matmul runs on MXU-sized tiles; cross-window positions are killed by a
    block-diagonal bias. G*V <= 512 fits one VMEM block, so softmax is a
    single-block reduction — no online statistics, no HBM score traffic.
  * One qkv transpose to (bs, 3, H, T, Dh) and one output transpose at the
    XLA level — Mosaic only supports leading-dim ref slicing, so (T, Dh) must
    be the trailing dims of every block. All heads live in one cell (Pallas
    requires full-size last-two block dims) and the kernel unrolls over
    (sequence, head); no q/k/v splits, score or bias HBM tensors remain.
  * Each grid cell processes `seq_block` sequences, sized against a VMEM
    budget: the per-invocation Pallas overhead (~1 us) otherwise dominates
    these tiny matmuls (measured: 29k cells x 1.2 us ≈ 35 ms/step).
  * The relative-position bias is passed ONCE as an (H, G*V, G*V)
    block-diagonal tile with a constant index map — Pallas keeps it
    VMEM-resident across the whole grid sweep.
  * The shift mask is NOT materialized per window. Each token carries an int32
    pre-shift region id (ops/window.py:compute_shift_regions); the kernel
    rebuilds the mask as `rid_q != rid_k ? -100 : 0` with a broadcast compare
    (two rid layouts avoid an in-kernel transpose). mask_value -100 matches
    the reference (backbone_swin.py:591-628).
  * Backward is ONE kernel per sequence-block: recompute p from the saved
    logsumexp, then dq/dk/dv (written back in qkv layout) plus the bias
    gradient, accumulated in the VMEM-resident drel output block.

Grouping needs no divisibility from the model: any consecutive windows (even
across images) can share a sequence, and the window batch is padded to a
multiple of G*seq_block with rows that are sliced away afterwards.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
_LOG2E = math.log2(math.e)
MAX_TOKENS = 512     # single-block ceiling; larger windows take the XLA path
_LANES = 128
_VMEM_BUDGET = 12 * 1024 * 1024   # qkv/do/out/dqkv block bytes per cell
_MAX_UNROLL = 32                  # seq_block * H unrolled iterations cap


def _compiler_params():
    """Mosaic allocates each unrolled iteration's score/softmax temporaries in
    a separate VMEM stack slot (~1MB per iteration at T=256); the default 16MB
    scoped-vmem limit trips first, so raise it (v5e has 128MB VMEM). Lazy:
    jax.default_backend() at import time would initialize the XLA backend
    before jax.distributed.initialize can run."""
    if jax.default_backend() == "cpu":
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pick_group(v: int) -> int:
    """Largest power-of-2 G with G*V <= 256 (one or two 128-lane tiles)."""
    g = 1
    while g * 2 * v <= 256:
        g *= 2
    return g


def pick_seq_block(t: int, h: int, d: int, itemsize: int) -> int:
    """Sequences per grid cell: amortize the ~1us invocation overhead without
    blowing VMEM (4 qkv-sized blocks per cell in the backward) or the unroll."""
    if _interpret():
        return 1          # unrolled loops are pure overhead in interpret mode
    per_seq = 4 * t * 3 * h * d * itemsize
    sb = 1
    while (sb * 2 * per_seq <= _VMEM_BUDGET and sb * 2 * h <= _MAX_UNROLL):
        sb *= 2
    return sb


# --------------------------------------------------------------------------- #
# Kernels.  Blocks: qkv (S, 3, H, T, D) | out/do (S, H, T, D) |
#           rel/drel (H, T, T) | ridq (S, T, 1) | ridk (S, 1, T) |
#           lse/delta (S, H, T, 1).  Refs are sliced on LEADING dims only —
#           middle-dim slicing forces vector shape casts Mosaic rejects.
# --------------------------------------------------------------------------- #

def _fwd_kernel(qkv_ref, rel_ref, ridq_ref, ridk_ref, o_ref, lse_ref, *,
                scale: float, mask_value: float, use_rid: bool,
                seq_block: int, heads: int):
    # base-2 softmax: rel/mask arrive pre-scaled by log2(e), scale*log2(e)
    # folds into the (T, D) q tile — the (T, T) score tile pays one exp2 and
    # no separate scale multiply (the kernels are VPU-bound at head_dim 32).
    scale2 = scale * _LOG2E
    for i in range(seq_block):
        rmask = (jnp.where(ridq_ref[i] != ridk_ref[i], mask_value * _LOG2E, 0.0)
                 if use_rid else None)
        for h in range(heads):
            q = (qkv_ref[i, 0, h].astype(jnp.float32) * scale2)  # (T, D)
            k = qkv_ref[i, 1, h]
            v = qkv_ref[i, 2, h]
            s = jax.lax.dot_general(q.astype(k.dtype), k,
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s + rel_ref[h]
            if rmask is not None:
                s = s + rmask
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot_general((p / l).astype(v.dtype), v,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[i, h] = o.astype(o_ref.dtype)
            lse_ref[i, h] = m + jnp.log2(l)           # (T, 1), base-2 units


def _bwd_kernel(qkv_ref, rel_ref, ridq_ref, ridk_ref, do_ref, lse_ref,
                delta_ref, dqkv_ref, drel_ref, *, scale: float,
                mask_value: float, use_rid: bool, seq_block: int, heads: int):
    ib = pl.program_id(0)

    @pl.when(ib == 0)
    def _init():
        drel_ref[...] = jnp.zeros_like(drel_ref)

    scale2 = scale * _LOG2E
    for i in range(seq_block):
        rmask = (jnp.where(ridq_ref[i] != ridk_ref[i], mask_value * _LOG2E, 0.0)
                 if use_rid else None)
        for h in range(heads):
            q = qkv_ref[i, 0, h]
            k = qkv_ref[i, 1, h]
            v = qkv_ref[i, 2, h]
            q2 = (q.astype(jnp.float32) * scale2).astype(k.dtype)
            s = jax.lax.dot_general(q2, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s + rel_ref[h]
            if rmask is not None:
                s = s + rmask
            p = jnp.exp2(s - lse_ref[i, h])           # lse block is (T, 1)

            do = do_ref[i, h]                          # (T, D)
            dv = jax.lax.dot_general(p.astype(do.dtype), do,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            ds = p * (dp - delta_ref[i, h])            # delta block is (T, 1)
            dq = jax.lax.dot_general(ds.astype(k.dtype), k,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(ds.astype(q.dtype), q,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale
            dqkv_ref[i, 0, h] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[i, 1, h] = dk.astype(dqkv_ref.dtype)
            dqkv_ref[i, 2, h] = dv.astype(dqkv_ref.dtype)
            # d(bias) = ds, summed over every sequence; the drel block stays
            # VMEM-resident across the whole grid sweep.
            drel_ref[h] += ds


# --------------------------------------------------------------------------- #
# pallas_call wrappers (inputs already grouped/padded: T = padded G*V)
# --------------------------------------------------------------------------- #

def _specs(t, d, h, sb):
    qkv_spec = pl.BlockSpec((sb, 3, h, t, d), lambda ib: (ib, 0, 0, 0, 0))
    out_spec = pl.BlockSpec((sb, h, t, d), lambda ib: (ib, 0, 0, 0))
    rel_spec = pl.BlockSpec((h, t, t), lambda ib: (0, 0, 0))
    ridq_spec = pl.BlockSpec((sb, t, 1), lambda ib: (ib, 0, 0))
    ridk_spec = pl.BlockSpec((sb, 1, t), lambda ib: (ib, 0, 0))
    lse_spec = pl.BlockSpec((sb, h, t, 1), lambda ib: (ib, 0, 0, 0))
    return qkv_spec, out_spec, rel_spec, ridq_spec, ridk_spec, lse_spec


def _call_fwd(qkv, rel, ridq, ridk, scale, mask_value, use_rid, sb):
    bs, _, h, t, d = qkv.shape
    rel = rel * _LOG2E        # kernels run a base-2 softmax; bias pre-scaled
    kernel = functools.partial(_fwd_kernel, scale=scale, mask_value=mask_value,
                               use_rid=use_rid, seq_block=sb, heads=h)
    qkv_s, out_s, rel_s, ridq_s, ridk_s, lse_s = _specs(t, d, h, sb)
    out, lse = pl.pallas_call(
        kernel,
        grid=(bs // sb,),
        in_specs=[qkv_s, rel_s, ridq_s, ridk_s],
        out_specs=[out_s, lse_s],
        out_shape=[
            jax.ShapeDtypeStruct((bs, h, t, d), qkv.dtype),
            jax.ShapeDtypeStruct((bs, h, t, 1), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(qkv, rel, ridq, ridk)
    return out, lse


def _call_bwd(qkv, rel, ridq, ridk, do, lse, delta, scale, mask_value,
              use_rid, sb):
    bs, _, h, t, d = qkv.shape
    rel = rel * _LOG2E        # base-2 scores; drel output stays natural (= ds)
    kernel = functools.partial(_bwd_kernel, scale=scale, mask_value=mask_value,
                               use_rid=use_rid, seq_block=sb, heads=h)
    qkv_s, out_s, rel_s, ridq_s, ridk_s, lse_s = _specs(t, d, h, sb)
    dqkv, drel = pl.pallas_call(
        kernel,
        grid=(bs // sb,),
        in_specs=[qkv_s, rel_s, ridq_s, ridk_s, out_s, lse_s, lse_s],
        out_specs=[qkv_s, rel_s],
        out_shape=[
            jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
            jax.ShapeDtypeStruct((h, t, t), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(qkv, rel, ridq, ridk, do, lse, delta)
    return dqkv, drel


# --------------------------------------------------------------------------- #
# custom VJP over the grouped/padded core
# --------------------------------------------------------------------------- #

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _core(qkv, rel, ridq, ridk, scale, mask_value, use_rid, sb):
    out, _ = _call_fwd(qkv, rel, ridq, ridk, scale, mask_value, use_rid, sb)
    return out


def _core_fwd(qkv, rel, ridq, ridk, scale, mask_value, use_rid, sb):
    out, lse = _call_fwd(qkv, rel, ridq, ridk, scale, mask_value, use_rid, sb)
    return out, (qkv, rel, ridq, ridk, out, lse)


def _core_bwd(scale, mask_value, use_rid, sb, res, do):
    qkv, rel, ridq, ridk, out, lse = res
    # do/out are already (bs, h, t, d)
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)           # (bs, h, t, 1)
    dqkv, drel = _call_bwd(qkv, rel, ridq, ridk, do, lse, delta,
                           scale, mask_value, use_rid, sb)
    zq = np.zeros(ridq.shape, jax.dtypes.float0)
    zk = np.zeros(ridk.shape, jax.dtypes.float0)
    return dqkv, drel, zq, zk


_core.defvjp(_core_fwd, _core_bwd)


# --------------------------------------------------------------------------- #
# Public API
# --------------------------------------------------------------------------- #

def windowed_attention_qkv(qkv, rel, rid=None, mask_value: float = -100.0,
                           scale: float | None = None, group: int | None = None):
    """Per-window attention, qkv in the Dense-projection layout.

    Args:
      qkv: (BW, V, 3, H, D) — window batch, window volume, q/k/v, heads, head
        dim (i.e. the qkv Dense output reshaped, no transposes).
      rel: (H, V, V) fp32 relative-position bias (trainable; gradient flows).
      rid: optional (BW, V) int32 pre-shift region ids; tokens in different
        regions get `mask_value` added to their score (the Swin shift mask,
        ref backbone_swin.py:591-628).
      group: windows fused per kernel sequence (default: pick_group(V)).

    Returns (BW, V, H, D) in qkv.dtype. Falls back to the XLA path when the
    fused sequence would exceed the single-block ceiling.
    """
    bw, v_len, _, h, d = qkv.shape
    if scale is None:
        scale = d ** -0.5
    g = group if group is not None else pick_group(v_len)
    t = _round_up(g * v_len, _LANES)
    if t > MAX_TOKENS:
        return _xla_fallback_qkv(qkv, rel, rid, mask_value, scale)
    sb = pick_seq_block(t, h, d, qkv.dtype.itemsize)

    bw_pad = _round_up(bw, g * sb)
    bs = bw_pad // g

    x = qkv
    if bw_pad != bw:
        x = jnp.pad(x, ((0, bw_pad - bw),) + ((0, 0),) * 4)
    x = x.reshape(bs, g * v_len, 3, h, d)             # consecutive windows
    if t != g * v_len:
        x = jnp.pad(x, ((0, 0), (0, t - g * v_len)) + ((0, 0),) * 3)
    x = x.transpose(0, 2, 3, 1, 4)                    # (bs, 3, H, T, D)

    # Block-diagonal bias tile: rel on the diagonal, NEG_INF elsewhere and in
    # the lane padding. Built in XLA (differentiable -> dtable flows through).
    eye = np.kron(np.eye(g, dtype=bool), np.ones((v_len, v_len), dtype=bool))
    rel_bd = jnp.where(jnp.asarray(eye),
                       jnp.tile(rel.astype(jnp.float32), (1, g, g)), NEG_INF)
    if t != g * v_len:
        pad = t - g * v_len
        rel_bd = jnp.pad(rel_bd, ((0, 0), (0, pad), (0, pad)),
                         constant_values=NEG_INF)

    use_rid = rid is not None
    if use_rid:
        ridg = jnp.pad(rid.astype(jnp.int32),
                       ((0, bw_pad - bw), (0, 0))).reshape(bs, g * v_len)
        if t != g * v_len:
            ridg = jnp.pad(ridg, ((0, 0), (0, t - g * v_len)))
    else:
        ridg = jnp.zeros((bs, t), jnp.int32)
    ridq = ridg[:, :, None]                           # (bs, T, 1)
    ridk = ridg[:, None, :]                           # (bs, 1, T)

    out = _core(x, rel_bd, ridq, ridk, float(scale), float(mask_value),
                use_rid, sb)                           # (bs, H, T, D)
    out = out.transpose(0, 2, 1, 3)                    # (bs, T, H, D)
    out = out[:, :g * v_len].reshape(bw_pad, v_len, h, d)
    return out[:bw]


def windowed_attention(q, k, v, rel, rid=None, mask_value: float = -100.0,
                       scale: float | None = None, group: int | None = None):
    """(BW, H, V, D)-layout wrapper around :func:`windowed_attention_qkv`."""
    qkv = jnp.stack([q, k, v], axis=2).transpose(0, 3, 2, 1, 4)
    out = windowed_attention_qkv(qkv, rel, rid=rid, mask_value=mask_value,
                                 scale=scale, group=group)
    return out.transpose(0, 2, 1, 3)                   # (BW, H, V, D)


def _xla_fallback_qkv(qkv, rel, rid, mask_value, scale):
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    out = _xla_fallback(q, k, v, rel, rid, mask_value, scale)
    return out.transpose(0, 2, 1, 3)


def _xla_fallback(q, k, v, rel, rid, mask_value, scale):
    """O(V^2) XLA windowed attention (oversized windows / reference check)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = s + rel.astype(jnp.float32)[None]
    if rid is not None:
        m = jnp.where(rid[:, None, :, None] != rid[:, None, None, :],
                      mask_value, 0.0)
        s = s + m
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
