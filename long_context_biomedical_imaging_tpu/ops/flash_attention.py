"""Pallas flash attention for TPU (forward + custom VJP).

Blockwise online-softmax attention for full-sequence ViT mixing at 16k-66k
tokens (replaces the reference's O(L^2) cuDNN attention einsums,
ref: model/models/backbone_vit.py:189-203). The blockwise accumulation is the
single-chip analogue of ring attention: memory is O(block_q * L / block_k)
instead of O(L^2), and every inner product lands on the MXU.

Layout: q, k, v are (BH, L, D) with batch*heads collapsed. The grid iterates
(bh, q_block, k_block) with the k axis innermost; TPU grids execute
sequentially so fp32 running max / denominator / accumulator live in VMEM
scratch across the k sweep of each q block.

Backward follows the FlashAttention-2 recipe: save only (out, logsumexp),
recompute p per block; a dq kernel sweeps k-blocks innermost and a dkv kernel
sweeps q-blocks innermost.

VPU economics (the kernels are exp-bound, not MXU-bound, at d=64): the
softmax runs in base-2 — scale*log2(e) folds into the small q block once per
cell, p = exp2(s2 - m2), and the saved logsumexp is base-2 — so the (bq, bk)
score tile pays one transcendental and no separate scale multiply. The
in-bounds column mask is skipped entirely when L divides block_k. lse/delta
travel as 1-lane arrays ((BH, L, 1)) rather than 128-wide broadcasts.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LANES = 128
_LOG2E = math.log2(math.e)

# tile sizes tuned on v5e at 16k tokens, d=64; larger tiles crash the Mosaic
# compiler on this toolchain. Shared by flash_attention's defaults and the
# ring-attention per-chunk calls (ops/ring_attention.py).
BLOCK_Q = 512
BLOCK_K = 2048


def _interpret() -> bool:
    # Pallas on the CPU backend only runs in interpreter mode (used by the
    # 8-virtual-device CPU test mesh); compiled Mosaic kernels on TPU.
    return jax.default_backend() == "cpu"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


# --------------------------------------------------------------------------- #
# Forward
# --------------------------------------------------------------------------- #

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *,
                scale2: float, kv_len: int | None, block_k: int):
    ik = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # base-2 softmax: fold scale*log2e into the small q tile (bq x d muls)
    # instead of the bq x bk score tile.
    q = q_ref[0].astype(jnp.float32) * scale2             # (bq, d)
    k = k_ref[0]                                          # (bk, d)
    s = jax.lax.dot_general(q.astype(k_ref.dtype), k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

    if kv_len is not None:
        # mask keys beyond the true sequence length (ragged final block only)
        col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_scr[:, :1]                                   # (bq, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)               # (bq, 1)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)                         # (bq, 1)
    p = jnp.exp2(s - m_new)                                  # (bq, bk)

    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    pv = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc_scr[:] = acc_scr[:] * alpha + pv

    @pl.when(ik == n_k - 1)
    def _finish():
        l = l_scr[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        # base-2 logsumexp (consistent with the backward's exp2 recompute)
        lse_ref[0] = m_scr[:, :1] + jnp.log2(l_safe)


def _flash_fwd(q, k, v, scale, block_q, block_k):
    bh, q_len, d = q.shape
    kv_len = k.shape[1]
    block_q = min(block_q, _round_up(q_len, 8))
    block_k = min(block_k, _round_up(kv_len, 128))
    n_q = _cdiv(q_len, block_q)
    n_k = _cdiv(kv_len, block_k)
    q_pad = n_q * block_q - q_len
    k_pad = n_k * block_k - kv_len
    if q_pad:
        q = jnp.pad(q, ((0, 0), (0, q_pad), (0, 0)))
    if k_pad:
        k = jnp.pad(k, ((0, 0), (0, k_pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, k_pad), (0, 0)))

    kernel = functools.partial(_fwd_kernel, scale2=scale * _LOG2E,
                               kv_len=kv_len if k_pad else None,
                               block_k=block_k)
    out, lse = pl.pallas_call(
        kernel,
        grid=(bh, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, iq, ik: (b, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_q * block_q, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_q * block_q, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(q, k, v)
    return out[:, :q_len], lse[:, :q_len, 0]


# --------------------------------------------------------------------------- #
# Backward
# --------------------------------------------------------------------------- #

def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_scr, *,
               scale2: float, kv_len: int | None, block_k: int):
    ik = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q = q_ref[0].astype(jnp.float32) * scale2
    k = k_ref[0]
    s = jax.lax.dot_general(q.astype(k_ref.dtype), k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if kv_len is not None:
        col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp2(s - lse_ref[0])                             # (bq, bk)

    dp = jax.lax.dot_general(do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0])                              # (bq, bk)
    dq_scr[:] += jax.lax.dot_general(ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(ik == n_k - 1)
    def _finish():
        # fold the softmax scale once into the (bq, d) result
        dq_ref[0] = (dq_scr[:] * (scale2 / _LOG2E)).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
                dk_scr, dv_scr, *, scale2: float, kv_len: int | None,
                block_k: int):
    iq = pl.program_id(2)
    n_q = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0].astype(jnp.float32) * scale2
    k = k_ref[0]
    s = jax.lax.dot_general(q.astype(k_ref.dtype), k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if kv_len is not None:
        ik = pl.program_id(1)
        col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp2(s - lse_ref[0])                              # (bq, bk)

    dv_scr[:] += jax.lax.dot_general(p.astype(do_ref.dtype), do_ref[0],
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0])
    # contract against the UNSCALED q (q here carries scale2; divide at finish)
    dk_scr[:] += jax.lax.dot_general(ds.astype(q_ref.dtype), q_ref[0],
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    @pl.when(iq == n_q - 1)
    def _finish():
        dk_ref[0] = (dk_scr[:] * (scale2 / _LOG2E)).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                      dq_ref, dk_ref, dv_ref, dq_scr, dk_scr, dv_scr, *,
                      scale2: float, kv_len: int | None, block_k: int,
                      block_q: int):
    """One sweep for dq+dk+dv: grid (bh, n_k, n_q), q innermost.

    The two-kernel FlashAttention-2 split pays for s = qk^T and dp = do v^T
    twice (7 matmuls + 2 exp2 recomputes per tile pair); this kernel computes
    the score tile once and contracts all three gradients from it (5 matmuls,
    1 exp2). dq needs k-innermost accumulation, which conflicts with the
    q-innermost grid, so the full dq plane for the current bh lives in a VMEM
    fp32 scratch (rows indexed by iq) and each row block is flushed to the
    output on its last k visit. Dispatched per q-row group sized by
    _fused_bwd_group_blocks so that plane fits scoped VMEM.
    """
    ik = pl.program_id(1)
    iq = pl.program_id(2)
    n_k = pl.num_programs(1)
    n_q = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init_kv():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0].astype(jnp.float32) * scale2
    k = k_ref[0]
    s = jax.lax.dot_general(q.astype(k_ref.dtype), k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if kv_len is not None:
        col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp2(s - lse_ref[0])                              # (bq, bk)

    dv_scr[:] += jax.lax.dot_general(p.astype(do_ref.dtype), do_ref[0],
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[0])                              # (bq, bk)
    dk_scr[:] += jax.lax.dot_general(ds.astype(q_ref.dtype), q_ref[0],
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    dq_c = jax.lax.dot_general(ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    rows = pl.dslice(iq * block_q, block_q)

    @pl.when(ik == 0)
    def _dq_store():
        dq_scr[rows, :] = dq_c

    @pl.when(ik > 0)
    def _dq_accum():
        dq_scr[rows, :] += dq_c

    @pl.when(ik == n_k - 1)
    def _dq_flush():
        dq_ref[0, rows, :] = (dq_scr[rows, :] * (scale2 / _LOG2E)).astype(dq_ref.dtype)

    @pl.when(iq == n_q - 1)
    def _kv_flush():
        dk_ref[0] = (dk_scr[:] * (scale2 / _LOG2E)).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


# Scoped-VMEM budget for one fused-backward call (v5e scoped limit is 16MB;
# leave elbow room for Mosaic spills). All tiles lane-pad d to 128.
_FUSED_BWD_VMEM_BUDGET = 14 * 1024 * 1024
# The fused kernel holds ~3 live fp32 (block_q, block_k) tiles (s/p, dp, ds)
# on the Mosaic stack — the dominant scoped-vmem term; a smaller k block than
# the two-sweep default keeps it in budget.
_FUSED_BWD_BLOCK_K = 1024


def _fused_bwd_group_blocks(d, block_q, block_k, itemsize) -> int:
    """Max q blocks whose dq plane fits one fused call; 0 = use two-sweep.

    The dq plane (fp32 scratch + double-buffered output block) scales with
    the q rows held per call; the score-tile temporaries and k/v buffers are
    fixed per call. Longer sequences run several fused calls over q-row
    groups; each group re-reads k/v once and emits fp32 dk/dv partials that
    are folded into a running sum (still cheaper than the two-sweep path's
    second full score recompute)."""
    dp = _round_up(d, _LANES)
    fixed = (3 * block_q * block_k * 4             # live fp32 score tiles
             + 2 * block_k * dp * 4                # dk/dv fp32 scratch
             + 2 * 2 * block_k * dp * 4           # dk/dv fp32 out blocks (dbuf)
             + 2 * 2 * block_k * dp * itemsize    # k/v in blocks (dbuf)
             + 2 * 2 * block_q * dp * itemsize    # q/do in blocks (dbuf)
             + 4 * block_q * _LANES * 4)          # lse/delta blocks
    per_row = dp * (4 + 2 * itemsize)             # dq scratch + dbuf out block
    rows = (_FUSED_BWD_VMEM_BUDGET - fixed) // per_row
    return max(int(rows) // block_q, 0)


def _flash_bwd(scale, block_q, block_k, res, do, delta=None):
    q, k, v, out, lse = res
    bh, q_len, d = q.shape
    kv_len = k.shape[1]
    block_q = min(block_q, _round_up(q_len, 8))
    block_k = min(block_k, _round_up(kv_len, 128))
    n_q = _cdiv(q_len, block_q)
    n_k = _cdiv(kv_len, block_k)
    q_pad = n_q * block_q - q_len
    k_pad = n_k * block_k - kv_len

    if delta is None:
        # delta_i = rowsum(do * o) — tiny elementwise reduce, XLA fuses it.
        # Callers that invoke this repeatedly with the same (do, out) — the
        # ring backward — precompute it once and pass it in.
        delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                        axis=-1)

    def pad_q(x):
        return jnp.pad(x, ((0, 0), (0, q_pad), (0, 0))) if q_pad else x

    def pad_k(x):
        return jnp.pad(x, ((0, 0), (0, k_pad), (0, 0))) if k_pad else x

    qp, dop = pad_q(q), pad_q(do)
    kp, vp = pad_k(k), pad_k(v)
    # lse defaults to 0 in padded q rows -> p = exp2(-1e30 - 0) = 0, harmless.
    lsep = jnp.pad(lse, ((0, 0), (0, q_pad)), constant_values=1.0) if q_pad else lse
    deltap = jnp.pad(delta, ((0, 0), (0, q_pad))) if q_pad else delta
    lsep = lsep[..., None]                                    # (bh, nq*bq, 1)
    deltap = deltap[..., None]

    kwargs = dict(scale2=scale * _LOG2E,
                  kv_len=kv_len if k_pad else None, block_k=block_k)

    # A smaller backward k block keeps the fused kernel's score-tile stack
    # in scoped VMEM, but it must DIVIDE block_k: the padded kv extent is
    # n_k*block_k, and a non-divisor bkf would floor n_kf and silently drop
    # the tail key blocks from all three gradients (found by review: dk/dv
    # came back short and dq wrong at kv_len=1536, where block_k=1536 is
    # not a multiple of 1024).
    bkf = min(block_k, _FUSED_BWD_BLOCK_K)
    if block_k % bkf:
        bkf = block_k
    gb = _fused_bwd_group_blocks(d, block_q, bkf, q.dtype.itemsize)
    if gb > 0:
        n_kf = (n_k * block_k) // bkf
        kwargs_f = dict(scale2=scale * _LOG2E, block_k=bkf,
                        kv_len=kv_len if n_kf * bkf != kv_len else None)
        dq_parts, dk_parts, dv_parts = [], [], []
        for g in range(_cdiv(n_q, gb)):
            q0 = g * gb * block_q
            rows = min(gb, n_q - g * gb) * block_q
            nqg = rows // block_q
            dqg, dkg, dvg = pl.pallas_call(
                functools.partial(_bwd_fused_kernel, block_q=block_q, **kwargs_f),
                grid=(bh, n_kf, nqg),
                in_specs=[
                    pl.BlockSpec((1, block_q, d), lambda b, ik, iq: (b, iq, 0)),
                    pl.BlockSpec((1, bkf, d), lambda b, ik, iq: (b, ik, 0)),
                    pl.BlockSpec((1, bkf, d), lambda b, ik, iq: (b, ik, 0)),
                    pl.BlockSpec((1, block_q, d), lambda b, ik, iq: (b, iq, 0)),
                    pl.BlockSpec((1, block_q, 1), lambda b, ik, iq: (b, iq, 0)),
                    pl.BlockSpec((1, block_q, 1), lambda b, ik, iq: (b, iq, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((1, rows, d), lambda b, ik, iq: (b, 0, 0)),
                    pl.BlockSpec((1, bkf, d), lambda b, ik, iq: (b, ik, 0)),
                    pl.BlockSpec((1, bkf, d), lambda b, ik, iq: (b, ik, 0)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((bh, rows, d), q.dtype),
                    jax.ShapeDtypeStruct((bh, n_kf * bkf, d), jnp.float32),
                    jax.ShapeDtypeStruct((bh, n_kf * bkf, d), jnp.float32),
                ],
                scratch_shapes=[
                    pltpu.VMEM((rows, d), jnp.float32),
                    pltpu.VMEM((bkf, d), jnp.float32),
                    pltpu.VMEM((bkf, d), jnp.float32),
                ],
                interpret=_interpret(),
            )(qp[:, q0:q0 + rows], kp, vp, dop[:, q0:q0 + rows],
              lsep[:, q0:q0 + rows], deltap[:, q0:q0 + rows])
            dq_parts.append(dqg)
            # running sums (not sum(parts) at the end): each fp32 partial
            # becomes dead as soon as it is folded in, instead of G of them
            # staying live until a final reduce tree
            dk_parts = [dk_parts[0] + dkg] if dk_parts else [dkg]
            dv_parts = [dv_parts[0] + dvg] if dv_parts else [dvg]
        dq = (dq_parts[0] if len(dq_parts) == 1
              else jnp.concatenate(dq_parts, axis=1))
        dk = dk_parts[0].astype(k.dtype)
        dv = dv_parts[0].astype(v.dtype)
        return dq[:, :q_len], dk[:, :kv_len], dv[:, :kv_len]

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, **kwargs),
        grid=(bh, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, iq, ik: (b, iq, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_q * block_q, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=_interpret(),
    )(qp, kp, vp, dop, lsep, deltap)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, **kwargs),
        grid=(bh, n_k, n_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, ik, iq: (b, iq, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_k * block_k, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n_k * block_k, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(qp, kp, vp, dop, lsep, deltap)

    return dq[:, :q_len], dk[:, :kv_len], dv[:, :kv_len]


# --------------------------------------------------------------------------- #
# Public API
# --------------------------------------------------------------------------- #

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention_bhld(q, k, v, scale, block_q, block_k):
    out, _ = _flash_fwd(q, k, v, scale, block_q, block_k)
    return out


def _fwd_rule(q, k, v, scale, block_q, block_k):
    out, lse = _flash_fwd(q, k, v, scale, block_q, block_k)
    return out, (q, k, v, out, lse)


_flash_attention_bhld.defvjp(_fwd_rule, _flash_bwd)


def flash_attention(q, k, v, scale: float | None = None,
                    block_q: int = BLOCK_Q, block_k: int = BLOCK_K):
    """Multi-head attention via the Pallas flash kernel.

    Args:
      q, k, v: (B, H, L, D) arrays (any float dtype; compute in fp32 on MXU).
      scale: softmax scale; defaults to D**-0.5.
      block_q/block_k: tile sizes. Defaults tuned on v5e at 16k tokens, d=64;
        larger tiles crash the Mosaic compiler on this toolchain.

    Returns (B, H, L, D) attention output in q.dtype.
    """
    b, h, lq, d = q.shape
    if scale is None:
        scale = d ** -0.5
    qf = q.reshape(b * h, lq, d)
    kf = k.reshape(b * h, k.shape[2], d)
    vf = v.reshape(b * h, v.shape[2], d)
    out = _flash_attention_bhld(qf, kf, vf, float(scale), block_q, block_k)
    return out.reshape(b, h, lq, d)
