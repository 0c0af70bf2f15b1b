"""Fused Pallas windowed attention with in-kernel qkv/out projections.

The Swin hot op (ref: model/models/backbone_swin.py:227-367): thousands of
tiny V-token windows (V = 16..512) attend independently with a per-head
relative-position bias and, on shifted blocks, an additive region mask.

TPU-first design, round 3 of this kernel. Round 1 materialized (G*V)^2 score
tensors in HBM; round 2 fused the attention math but kept the qkv projection
outside — and its (S, 3, H, T, 32) operand layout padded 4x on the 32-wide
head dim, the (S, H, T, 1) lse/delta residuals padded 128x, and the gradient
residual set OOM'd HBM at the ptx 1024^2 geometry. This version folds the qkv
and output projections INTO the kernel:

  * kernel input is the windowed token tensor x (S, T, C) — dense lanes, no
    head-dim padding anywhere in HBM; the only residuals are x and out.
  * qkv = x @ Wqkv + b is computed per sequence block in VMEM; per-head
    (T, D) tiles are lane slices of the VMEM value.
  * out = sum_h o_h @ Wout[hD:(h+1)D, :] + b accumulates the output
    projection in-kernel — no concat, no (T, D)-layout output.
  * softmax statistics are NOT saved: T <= 512 fits one block, so the
    backward recomputes s -> m, l exactly (base-2 softmax; bias pre-scaled).
  * the shift mask is rebuilt in-kernel from per-token region ids passed
    ONLY in the dense (S, 1, T) layout; the (T, T) same-region matrix comes
    from a one-hot MXU matmul (region ids are small ints; R = 32 covers the
    3^3 shift regions), so no (S, T, 1) 128x-padded operand exists.
  * G consecutive windows fuse into one G*V-token sequence via a
    block-diagonal bias (rel on the diagonal, NEG_INF off it) — grouping
    needs no divisibility; padded rows are sliced away.
  * weight/bias/rel gradients accumulate across the sequential grid in
    VMEM-resident output blocks.
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
_RID_RANGE = 32      # one-hot width for region ids (3 regions per axis -> 27)
_VMEM_BUDGET = 10 * 1024 * 1024
_MAX_UNROLL = 32                  # seq_block * H unrolled iterations cap


def _compiler_params():
    """Per-iteration softmax temporaries overflow the default 16MB scoped
    VMEM; raise the cap (v5e has 128MB). Lazy: jax.default_backend() at
    import time would initialize the XLA backend before
    jax.distributed.initialize can run."""
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


def pick_seq_block(t: int, c: int, h: int, itemsize: int) -> int:
    """Sequences per grid cell: amortize the ~1us invocation overhead without
    blowing VMEM (x/out blocks + the fp32 qkv/score working set) or the
    per-head unroll."""
    if _interpret():
        return 1          # unrolled loops are pure overhead in interpret mode
    per_seq = t * (3 * c + 2 * c) * 4 + 3 * t * t * 4
    sb = 1
    while (sb * 2 * per_seq <= _VMEM_BUDGET and sb * 2 * h <= _MAX_UNROLL):
        sb *= 2
    return sb


def _rmask2(rid_row, t: int, mask_value: float):
    """(T, T) additive region mask (base-2 pre-scaled) from a (1, T) id row.

    same[q, k] = any_r (rid[q]==r and rid[k]==r), via a one-hot MXU matmul —
    avoids a (T, 1)-layout operand (128x lane padding in HBM) and an
    in-kernel transpose."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (_RID_RANGE, t), 0)
    oh = (iota == rid_row).astype(jnp.bfloat16)            # (R, T)
    same = jax.lax.dot_general(oh, oh, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    return jnp.where(same > 0.5, 0.0, mask_value * _LOG2E)


# --------------------------------------------------------------------------- #
# Kernels.  Blocks: x/out/do (S, T, C) | rel/drel (H, T, T) | rid (S, 1, T) |
#           wqkv (C, 3C) | bqkv (1, 3C) | wout (C, C) | bout (1, C).
# --------------------------------------------------------------------------- #

def _qkv_head(qkv2, h, D, C):
    q = qkv2[:, h * D:(h + 1) * D]
    k = qkv2[:, C + h * D:C + (h + 1) * D]
    v = qkv2[:, 2 * C + h * D:2 * C + (h + 1) * D]
    return q, k, v


def _fwd_kernel(x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, rel_ref,
                rid_ref, o_ref, *, scale: float, mask_value: float,
                use_rid: bool, seq_block: int, heads: int):
    # base-2 softmax: rel/mask are pre-scaled by log2(e); scale*log2(e) folds
    # into the q tile so the (T, T) score tile pays one exp2 only.
    scale2 = scale * _LOG2E
    T, C = x_ref.shape[1], x_ref.shape[2]
    D = C // heads
    dt = x_ref.dtype
    for i in range(seq_block):
        x = x_ref[i]                                       # (T, C)
        qkv2 = jax.lax.dot_general(x, wqkv_ref[...].astype(dt),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32) \
            + bqkv_ref[0][None, :]
        rmask = _rmask2(rid_ref[i], T, mask_value) if use_rid else None
        acc = bout_ref[0][None, :] * jnp.ones((T, 1), jnp.float32)
        for h in range(heads):
            q, k, v = _qkv_head(qkv2, h, D, C)
            s = jax.lax.dot_general((q * scale2).astype(dt), k.astype(dt),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s + rel_ref[h]
            if rmask is not None:
                s = s + rmask
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot_general((p / l).astype(dt), v.astype(dt),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            # fold the output projection: out += o_h @ Wout[hD:(h+1)D, :]
            acc = acc + jax.lax.dot_general(
                o.astype(dt), wout_ref[h * D:(h + 1) * D, :].astype(dt),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        o_ref[i] = acc.astype(o_ref.dtype)


def _bwd_kernel(x_ref, wqkv_ref, bqkv_ref, wout_ref, rel_ref, rid_ref, g_ref,
                dx_ref, dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref, drel_ref,
                *, scale: float, mask_value: float, use_rid: bool,
                seq_block: int, heads: int):
    ib = pl.program_id(0)

    @pl.when(ib == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dbout_ref[...] = jnp.zeros_like(dbout_ref)
        drel_ref[...] = jnp.zeros_like(drel_ref)

    scale2 = scale * _LOG2E
    T, C = x_ref.shape[1], x_ref.shape[2]
    D = C // heads
    dt = x_ref.dtype
    for i in range(seq_block):
        x = x_ref[i]
        qkv2 = jax.lax.dot_general(x, wqkv_ref[...].astype(dt),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32) \
            + bqkv_ref[0][None, :]
        rmask = _rmask2(rid_ref[i], T, mask_value) if use_rid else None
        dout = g_ref[i].astype(jnp.float32)                # (T, C)
        dbout_ref[...] += jnp.sum(dout, axis=0, keepdims=True)

        dparts = []
        for h in range(heads):
            q, k, v = _qkv_head(qkv2, h, D, C)
            s = jax.lax.dot_general((q * scale2).astype(dt), k.astype(dt),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s + rel_ref[h]
            if rmask is not None:
                s = s + rmask
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp2(s - m)
            pn = e / jnp.sum(e, axis=1, keepdims=True)     # softmax (T, T)

            o = jax.lax.dot_general(pn.astype(dt), v.astype(dt),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            wo_h = wout_ref[h * D:(h + 1) * D, :]
            dwout_ref[h * D:(h + 1) * D, :] += jax.lax.dot_general(
                o.astype(dt), dout.astype(dt), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            do = jax.lax.dot_general(dout.astype(dt), wo_h.astype(dt),
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)

            dv = jax.lax.dot_general(pn.astype(dt), do.astype(dt),
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(do.astype(dt), v.astype(dt),
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            delta = jnp.sum(dp * pn, axis=1, keepdims=True)
            ds = pn * (dp - delta)
            dq = jax.lax.dot_general(ds.astype(dt), k.astype(dt),
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale
            dk = jax.lax.dot_general(ds.astype(dt), q.astype(dt),
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) * scale
            drel_ref[h] += ds
            dparts.append((dq, dk, dv))

        dqkv2 = jnp.concatenate(
            [d[0] for d in dparts] + [d[1] for d in dparts]
            + [d[2] for d in dparts], axis=1)              # (T, 3C)
        dbqkv_ref[...] += jnp.sum(dqkv2, axis=0, keepdims=True)
        dwqkv_ref[...] += jax.lax.dot_general(
            x.astype(dt), dqkv2.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dx_ref[i] = jax.lax.dot_general(
            dqkv2.astype(dt), wqkv_ref[...].astype(dt),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dx_ref.dtype)


# --------------------------------------------------------------------------- #
# pallas_call wrappers (inputs already grouped/padded: T = padded G*V)
# --------------------------------------------------------------------------- #

def _specs(t, c, h, sb):
    x_spec = pl.BlockSpec((sb, t, c), lambda ib: (ib, 0, 0))
    rel_spec = pl.BlockSpec((h, t, t), lambda ib: (0, 0, 0))
    rid_spec = pl.BlockSpec((sb, 1, t), lambda ib: (ib, 0, 0))
    w3_spec = pl.BlockSpec((c, 3 * c), lambda ib: (0, 0))
    b3_spec = pl.BlockSpec((1, 3 * c), lambda ib: (0, 0))
    wo_spec = pl.BlockSpec((c, c), lambda ib: (0, 0))
    bo_spec = pl.BlockSpec((1, c), lambda ib: (0, 0))
    return x_spec, rel_spec, rid_spec, w3_spec, b3_spec, wo_spec, bo_spec


def _call_fwd(x, wqkv, bqkv, wout, bout, rel, rid, scale, mask_value,
              use_rid, heads, sb):
    bs, t, c = x.shape
    rel = rel * _LOG2E        # kernels run a base-2 softmax; bias pre-scaled
    kernel = functools.partial(_fwd_kernel, scale=scale, mask_value=mask_value,
                               use_rid=use_rid, seq_block=sb, heads=heads)
    x_s, rel_s, rid_s, w3_s, b3_s, wo_s, bo_s = _specs(t, c, heads, sb)
    return pl.pallas_call(
        kernel,
        grid=(bs // sb,),
        in_specs=[x_s, w3_s, b3_s, wo_s, bo_s, rel_s, rid_s],
        out_specs=x_s,
        out_shape=jax.ShapeDtypeStruct((bs, t, c), x.dtype),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(x, wqkv, bqkv, wout, bout, rel, rid)


def _call_bwd(x, wqkv, bqkv, wout, rel, rid, do, scale, mask_value,
              use_rid, heads, sb):
    bs, t, c = x.shape
    rel = rel * _LOG2E        # base-2 scores; drel output stays natural (= ds)
    kernel = functools.partial(_bwd_kernel, scale=scale, mask_value=mask_value,
                               use_rid=use_rid, seq_block=sb, heads=heads)
    x_s, rel_s, rid_s, w3_s, b3_s, wo_s, bo_s = _specs(t, c, heads, sb)
    return pl.pallas_call(
        kernel,
        grid=(bs // sb,),
        in_specs=[x_s, w3_s, b3_s, wo_s, rel_s, rid_s, x_s],
        out_specs=[x_s, w3_s, b3_s, wo_s, bo_s, rel_s],
        out_shape=[
            jax.ShapeDtypeStruct((bs, t, c), x.dtype),
            jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * c), jnp.float32),
            jax.ShapeDtypeStruct((c, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((heads, t, t), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(x, wqkv, bqkv, wout, rel, rid, do)


# --------------------------------------------------------------------------- #
# custom VJP over the grouped/padded core
# --------------------------------------------------------------------------- #

@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _core(x, wqkv, bqkv, wout, bout, rel, rid, scale, mask_value, use_rid,
          heads, sb):
    return _call_fwd(x, wqkv, bqkv, wout, bout, rel, rid, scale, mask_value,
                     use_rid, heads, sb)


def _core_fwd(x, wqkv, bqkv, wout, bout, rel, rid, scale, mask_value,
              use_rid, heads, sb):
    out = _call_fwd(x, wqkv, bqkv, wout, bout, rel, rid, scale, mask_value,
                    use_rid, heads, sb)
    return out, (x, wqkv, bqkv, wout, rel, rid)


def _core_bwd(scale, mask_value, use_rid, heads, sb, res, do):
    x, wqkv, bqkv, wout, rel, rid = res
    dx, dwqkv, dbqkv, dwout, dbout, drel = _call_bwd(
        x, wqkv, bqkv, wout, rel, rid, do, scale, mask_value, use_rid,
        heads, sb)
    zr = np.zeros(rid.shape, jax.dtypes.float0)
    # cotangent shapes must match the (1, .) primal bias layouts exactly
    return dx, dwqkv, dbqkv, dwout, dbout, drel, zr


_core.defvjp(_core_fwd, _core_bwd)


# --------------------------------------------------------------------------- #
# Public API
# --------------------------------------------------------------------------- #

def windowed_attention_proj(x, wqkv, bqkv, wout, bout, rel, heads: int,
                            rid=None, mask_value: float = -100.0,
                            scale: float | None = None,
                            group: int | None = None):
    """Per-window attention with fused qkv/out projections.

    Args:
      x: (BW, V, C) windowed tokens.
      wqkv: (C, 3C); bqkv: (3C,) or None; wout: (C, C); bout: (C,) or None.
      rel: (H, V, V) fp32 relative-position bias (trainable; gradient flows).
      heads: H (C % H == 0; head dim D = C/H).
      rid: optional (BW, V) int32 pre-shift region ids in [0, 32); tokens in
        different regions get `mask_value` added to their score (the Swin
        shift mask, ref backbone_swin.py:591-628).
      group: windows fused per kernel sequence (default: pick_group(V)).

    Returns (BW, V, C) in x.dtype. Falls back to the XLA path when the fused
    sequence would exceed the single-block ceiling.
    """
    bw, v_len, c = x.shape
    d = c // heads
    if scale is None:
        scale = d ** -0.5
    bqkv = jnp.zeros((3 * c,), jnp.float32) if bqkv is None else bqkv
    bout = jnp.zeros((c,), jnp.float32) if bout is None else bout
    g = group if group is not None else pick_group(v_len)
    t = _round_up(g * v_len, _LANES)
    if t > MAX_TOKENS:
        return _xla_fallback_proj(x, wqkv, bqkv, wout, bout, rel, heads, rid,
                                  mask_value, scale)
    sb = pick_seq_block(t, c, heads, x.dtype.itemsize)

    bw_pad = _round_up(bw, g * sb)
    bs = bw_pad // g

    xg = jnp.pad(x, ((0, bw_pad - bw), (0, 0), (0, 0))) if bw_pad != bw else x
    xg = xg.reshape(bs, g * v_len, c)                  # consecutive windows
    if t != g * v_len:
        xg = jnp.pad(xg, ((0, 0), (0, t - g * v_len), (0, 0)))

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
    ridk = ridg[:, None, :]                           # (bs, 1, T)

    out = _core(xg, wqkv, bqkv.astype(jnp.float32)[None, :], wout,
                bout.astype(jnp.float32)[None, :], rel_bd, ridk,
                float(scale), float(mask_value), use_rid, heads, sb)
    out = out[:, :g * v_len].reshape(bw_pad, v_len, c)
    return out[:bw]


def _xla_fallback_proj(x, wqkv, bqkv, wout, bout, rel, heads, rid,
                       mask_value, scale):
    """O(V^2) XLA windowed attention for oversized windows (V > 512)."""
    bw, v_len, c = x.shape
    d = c // heads
    qkv = (x.reshape(-1, c) @ wqkv.astype(x.dtype)
           + bqkv.astype(x.dtype)).reshape(bw, v_len, 3, heads, d)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    s = s + rel.astype(jnp.float32)[None]
    if rid is not None:
        m = jnp.where(rid[:, None, :, None] != rid[:, None, None, :],
                      mask_value, 0.0)
        s = s + m
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
    o = o.transpose(0, 2, 1, 3).reshape(bw, v_len, c)
    return (o.reshape(-1, c) @ wout.astype(x.dtype)
            + bout.astype(x.dtype)).reshape(bw, v_len, c)
