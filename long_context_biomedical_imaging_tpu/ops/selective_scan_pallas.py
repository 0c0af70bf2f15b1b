"""Pallas TPU kernel for the windowed selective scan (forward + custom VJP).

Replaces the mamba-ssm CUDA `selective_scan_fn` for the Swin call sites
(ref: model/models/mamba.py:125-134 via backbone_swin.py:361-365): sequence
length is a window volume (16-64) and the window batch is huge, so the whole
recurrence fits in VMEM per block and the discretized (N x D) state never
touches HBM — the XLA formulations pay N x the HBM traffic.

Layout is channel-minor: u, delta (BW, L, D); B, C (BW, L, N); the state is a
(block, N*Dc) row tile with channels n-major on the 128 lanes. Per-step
broadcasts/reductions between (bb, N) and (bb, N*Dc) are expressed as matmuls
with constant 0/1 block matrices (MXU ops, no gathers):
  expand E (N, N*Dc):  X_rep = X @ E        X_rep[., n*Dc+d] = X[., n]
  reduce F (N*Dc, N):  S     = Y @ F        S[., n] = sum_d Y[., n*Dc+d]

Wide channel counts are CHUNKED over a second grid dimension: the recurrence
is independent per channel d, so grid cell (i, j) scans rows-block i over
channel chunk j (Dc channels, N*Dc lanes of state). B/C blocks are shared
across chunks (constant index in j); in the backward, dB/dC accumulate across
the j sweep inside their VMEM-resident output block. This removes the old
N*D <= 1024 ceiling (the Mosaic compiler crashed on N*D >= 3072 single-block
kernels), so all four Swin stages of the mamba workloads qualify.

Backward runs two in-kernel passes: recompute the h history into VMEM
scratch, then a reverse sweep producing du/ddelta/dB/dC plus per-grid dA
partials (summed in XLA). The D-skip and delta-bias terms live in the wrapper
where their grads are trivial.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2E = math.log2(math.e)


def _compiler_params():
    """The bwd kernel's h-history scratch wants more than the default 16MB
    scoped VMEM at L=64; raise the cap like ops/window_attention.py (v5e has
    128MB). Lazy: jax.default_backend() at import time would initialize the
    XLA backend before jax.distributed.initialize can run."""
    if jax.default_backend() == "cpu":
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pick_chunk(N: int, D: int) -> int:
    """Channels per grid chunk: keep the state row at <= 1024 lanes (8 tiles).

    Mosaic crashes on single-block kernels with N*D >= 3072, and narrower
    state rows give bigger row-blocks (better MXU M dims) anyway. Chunks are
    balanced (ceil(D / n_chunks)) so e.g. D=192 runs as 2x96, not 128+64pad."""
    dc_max = max(1, 1024 // N)
    n_j = -(-D // dc_max)
    return -(-D // n_j)


def _block_rows(L: int, nd: int) -> int:
    """Rows per grid block: keep the bwd h history under ~16MB of VMEM
    (in/out blocks are double-buffered on top; the kernels raise the scoped
    VMEM cap to 100MB)."""
    budget = 16 * 1024 * 1024
    per_row = (L * nd + 6 * nd) * 4
    rows = budget // max(per_row, 1)
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if cand <= rows:
            return cand
    return 8


def _expand_reduce(N: int, Dc: int):
    e = np.kron(np.eye(N, dtype=np.float32), np.ones((1, Dc), np.float32))
    return jnp.asarray(e), jnp.asarray(e.T)     # E (N, N*Dc), F (N*Dc, N)


def _dot(a, b):
    # HIGHEST: these matmuls carry state values; default MXU precision would
    # round f32 operands to bf16 (0/1 expanders are exact either way, but the
    # value operand is not)
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


# --------------------------------------------------------------------------- #
# Forward
# --------------------------------------------------------------------------- #

# NOTE on the y reduction: sum over n of h[., n*Dc+d] * C[., n] keeps the d
# axis, which the (N*Dc, N) reducer cannot produce; we need a (N*Dc, Dc) reducer.
def _reduce_over_n(N: int, Dc: int):
    f = np.kron(np.ones((N, 1), np.float32), np.eye(Dc, dtype=np.float32))
    return jnp.asarray(f)                                   # (N*Dc, Dc)


def _make_fwd_kernel(L, N, Dc, softplus):
    # chunked operands carry the chunk as a leading size-1 block axis: Mosaic
    # requires a block's last two dims be 8/128-divisible or equal to the
    # array dims, so the chunk axis cannot live next to the channels.
    def kernel(u_ref, d_ref, B_ref, C_ref, at_ref, e_ref, fn_ref, y_ref, h_scr):
        h_scr[:] = jnp.zeros_like(h_scr)
        a2_flat = at_ref[0, 0:1, :] * _LOG2E  # (1, nd) base-2 decay exponent
        E = e_ref[:]                                        # (N, N*Dc)
        Fn = fn_ref[:]                                      # (N*Dc, Dc)

        def body(t, _):
            u_t = u_ref[0, :, pl.ds(t, 1), :][:, 0, :].astype(jnp.float32)
            d_t = d_ref[0, :, pl.ds(t, 1), :][:, 0, :].astype(jnp.float32)
            if softplus:
                d_t = jax.nn.softplus(d_t)
            bu = d_t * u_t
            d_rep = pltpu.repeat(d_t, N, axis=1)
            bu_rep = pltpu.repeat(bu, N, axis=1)
            B_t = B_ref[:, pl.ds(t, 1), :][:, 0, :].astype(jnp.float32)
            C_t = C_ref[:, pl.ds(t, 1), :][:, 0, :].astype(jnp.float32)
            a_t = jnp.exp2(d_rep * a2_flat)
            h = a_t * h_scr[:] + bu_rep * _dot(B_t, E)
            h_scr[:] = h
            y = _dot(h * _dot(C_t, E), Fn)                  # (bb, Dc)
            y_ref[0, :, pl.ds(t, 1), :] = y.astype(y_ref.dtype)[:, None, :]
            return 0

        jax.lax.fori_loop(0, L, body, 0)

    return kernel


def _chunk_at(AT, Dc: int):
    """(N, D) -> (n_j, 8, N*Dc) with zero-padded channels, chunk-j n-major
    rows (broadcast over 8 sublanes — Mosaic block constraint on the chunk
    axis; one tile of constants per chunk)."""
    N, D = AT.shape
    n_j = -(-D // Dc)
    pad = n_j * Dc - D
    a = jnp.pad(AT.astype(jnp.float32), ((0, 0), (0, pad)))
    a = a.reshape(N, n_j, Dc).transpose(1, 0, 2).reshape(n_j, 1, N * Dc)
    return jnp.broadcast_to(a, (n_j, 8, N * Dc)), n_j, pad


def _to_chunked(x, n_j: int, Dc: int, d_pad: int):
    """(BW, L, D) -> (n_j, BW, L, Dc): channel chunks on a leading axis."""
    if d_pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, d_pad)))
    if n_j == 1:
        return x[None]
    bw, l, _ = x.shape
    return x.reshape(bw, l, n_j, Dc).transpose(2, 0, 1, 3)


def _from_chunked(y, D: int):
    """(n_j, BW, L, Dc) -> (BW, L, D)."""
    n_j, bw, l, dc = y.shape
    if n_j == 1:
        return y[0, :, :, :D]
    return y.transpose(1, 2, 0, 3).reshape(bw, l, n_j * dc)[:, :, :D]


def _fwd(u, delta, AT, B, C, softplus: bool):
    BW, L, D = u.shape
    N = AT.shape[0]
    Dc = _pick_chunk(N, D)
    at_chunks, n_j, d_pad = _chunk_at(AT, Dc)
    nd = N * Dc
    bb = _block_rows(L, nd)
    pad = (-BW) % bb
    if pad:
        u = jnp.pad(u, ((0, pad), (0, 0), (0, 0)))
        delta = jnp.pad(delta, ((0, pad), (0, 0), (0, 0)))
        B = jnp.pad(B, ((0, pad), (0, 0), (0, 0)))
        C = jnp.pad(C, ((0, pad), (0, 0), (0, 0)))
    uc = _to_chunked(u, n_j, Dc, d_pad)
    dc_ = _to_chunked(delta, n_j, Dc, d_pad)
    grid = ((BW + pad) // bb, n_j)
    E, _ = _expand_reduce(N, Dc)
    Fn = _reduce_over_n(N, Dc)

    y = pl.pallas_call(
        _make_fwd_kernel(L, N, Dc, softplus),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bb, L, Dc), lambda i, j: (j, i, 0, 0)),
            pl.BlockSpec((1, bb, L, Dc), lambda i, j: (j, i, 0, 0)),
            pl.BlockSpec((bb, L, N), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((bb, L, N), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 8, nd), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((N, nd), lambda i, j: (0, 0)),
            pl.BlockSpec((nd, Dc), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bb, L, Dc), lambda i, j: (j, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_j, BW + pad, L, Dc), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bb, nd), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(uc, dc_, B, C, at_chunks, E, Fn)
    return _from_chunked(y, D)[:BW]


# --------------------------------------------------------------------------- #
# Backward
# --------------------------------------------------------------------------- #

def _make_bwd_kernel(L, N, Dc, softplus):
    def kernel(u_ref, d_ref, B_ref, C_ref, at_ref, e_ref, fn_ref, fr_ref, g_ref,
               du_ref, dd_ref, dB_ref, dC_ref, dA_ref, hist_scr, dh_scr, dA_scr):
        j = pl.program_id(1)
        a_flat = at_ref[0, 0:1, :]          # (1, nd)
        a2_flat = a_flat * _LOG2E
        E = e_ref[:]                                        # (N, N*Dc)
        Fn = fn_ref[:]                                      # (N*Dc, Dc) sum over n
        Fr = fr_ref[:]                                      # (N*Dc, N) sum over d

        # dB/dC blocks are shared across the channel-chunk sweep (index map
        # constant in j): zero once per rows-block, accumulate below.
        @pl.when(j == 0)
        def _init_shared():
            dB_ref[...] = jnp.zeros_like(dB_ref)
            dC_ref[...] = jnp.zeros_like(dC_ref)

        # pass 1: recompute h history
        def fwd_body(t, h):
            u_t = u_ref[0, :, pl.ds(t, 1), :][:, 0, :].astype(jnp.float32)
            d_t = d_ref[0, :, pl.ds(t, 1), :][:, 0, :].astype(jnp.float32)
            if softplus:
                d_t = jax.nn.softplus(d_t)
            bu_rep = pltpu.repeat(d_t * u_t, N, axis=1)
            d_rep = pltpu.repeat(d_t, N, axis=1)
            B_t = B_ref[:, pl.ds(t, 1), :][:, 0, :].astype(jnp.float32)
            a_t = jnp.exp2(d_rep * a2_flat)
            h = a_t * h + bu_rep * _dot(B_t, E)
            hist_scr[:, pl.ds(t, 1), :] = h[:, None, :]
            return h

        bb = u_ref.shape[1]
        jax.lax.fori_loop(0, L, fwd_body, jnp.zeros((bb, N * Dc), jnp.float32))
        dh_scr[:] = jnp.zeros_like(dh_scr)
        dA_scr[:] = jnp.zeros_like(dA_scr)

        # pass 2: reverse sweep
        def bwd_body(i, _):
            t = L - 1 - i
            u_t = u_ref[0, :, pl.ds(t, 1), :][:, 0, :].astype(jnp.float32)
            raw_d = d_ref[0, :, pl.ds(t, 1), :][:, 0, :].astype(jnp.float32)
            d_t = jax.nn.softplus(raw_d) if softplus else raw_d
            bu = d_t * u_t
            d_rep = pltpu.repeat(d_t, N, axis=1)
            bu_rep = pltpu.repeat(bu, N, axis=1)
            B_t = B_ref[:, pl.ds(t, 1), :][:, 0, :].astype(jnp.float32)
            C_t = C_ref[:, pl.ds(t, 1), :][:, 0, :].astype(jnp.float32)
            a_t = jnp.exp2(d_rep * a2_flat)
            g_t = g_ref[0, :, pl.ds(t, 1), :][:, 0, :].astype(jnp.float32)

            h_t = hist_scr[:, pl.ds(t, 1), :][:, 0, :]
            h_prev = hist_scr[:, pl.ds(jnp.maximum(t - 1, 0), 1), :][:, 0, :]
            h_prev = jnp.where(t > 0, h_prev, jnp.zeros_like(h_prev))

            g_rep = pltpu.repeat(g_t, N, axis=1)
            dh = dh_scr[:] + _dot(C_t, E) * g_rep           # total dL/dh_t

            dC = _dot(h_t * g_rep, Fr)                      # (bb, N)
            da = dh * h_prev
            dA_scr[:] = dA_scr[:] + jnp.sum(da * a_t * d_rep, axis=0,
                                            keepdims=True)
            B_rep = _dot(B_t, E)
            db_full = dh                                     # d b_t (bb, N*Dc)
            du = d_t * _dot(db_full * B_rep, Fn)             # (bb, Dc)
            ddt = u_t * _dot(db_full * B_rep, Fn) \
                + _dot(da * a_t * a_flat, Fn)
            dB = _dot(db_full * bu_rep, Fr)                  # (bb, N)
            if softplus:
                ddt = ddt * jax.nn.sigmoid(raw_d)

            du_ref[0, :, pl.ds(t, 1), :] = du.astype(du_ref.dtype)[:, None, :]
            dd_ref[0, :, pl.ds(t, 1), :] = ddt.astype(dd_ref.dtype)[:, None, :]
            # chunk-partial dB/dC: accumulate across the j sweep in the
            # VMEM-resident shared output block
            dB_ref[:, pl.ds(t, 1), :] += dB.astype(dB_ref.dtype)[:, None, :]
            dC_ref[:, pl.ds(t, 1), :] += dC.astype(dC_ref.dtype)[:, None, :]

            dh_scr[:] = a_t * dh
            return 0

        jax.lax.fori_loop(0, L, bwd_body, 0)
        # Mosaic wants >=8 sublanes; pad the dA partial into an (8, nd) tile.
        dA_ref[0] = jnp.concatenate(
            [dA_scr[:], jnp.zeros((7, dA_scr.shape[1]), jnp.float32)], axis=0)

    return kernel


def _bwd(softplus, res, g):
    u, delta, AT, B, C = res
    BW, L, D = u.shape
    N = AT.shape[0]
    Dc = _pick_chunk(N, D)
    at_chunks, n_j, d_pad = _chunk_at(AT, Dc)
    nd = N * Dc
    bb = _block_rows(L, nd)
    pad = (-BW) % bb

    def padrow(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)) if pad else x

    uc = _to_chunked(padrow(u), n_j, Dc, d_pad)
    dc_ = _to_chunked(padrow(delta), n_j, Dc, d_pad)
    gc = _to_chunked(padrow(g), n_j, Dc, d_pad)
    Bp, Cp = padrow(B), padrow(C)
    n_i = (BW + pad) // bb
    grid = (n_i, n_j)
    E, Fr = _expand_reduce(N, Dc)
    Fn = _reduce_over_n(N, Dc)

    du, dd, dB, dC, dA_part = pl.pallas_call(
        _make_bwd_kernel(L, N, Dc, softplus),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bb, L, Dc), lambda i, j: (j, i, 0, 0)),
            pl.BlockSpec((1, bb, L, Dc), lambda i, j: (j, i, 0, 0)),
            pl.BlockSpec((bb, L, N), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((bb, L, N), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 8, nd), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((N, nd), lambda i, j: (0, 0)),
            pl.BlockSpec((nd, Dc), lambda i, j: (0, 0)),
            pl.BlockSpec((nd, N), lambda i, j: (0, 0)),
            pl.BlockSpec((1, bb, L, Dc), lambda i, j: (j, i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bb, L, Dc), lambda i, j: (j, i, 0, 0)),
            pl.BlockSpec((1, bb, L, Dc), lambda i, j: (j, i, 0, 0)),
            pl.BlockSpec((bb, L, N), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((bb, L, N), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 8, nd), lambda i, j: (i * n_j + j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_j, BW + pad, L, Dc), u.dtype),
            jax.ShapeDtypeStruct((n_j, BW + pad, L, Dc), delta.dtype),
            jax.ShapeDtypeStruct((BW + pad, L, N), B.dtype),
            jax.ShapeDtypeStruct((BW + pad, L, N), C.dtype),
            jax.ShapeDtypeStruct((n_i * n_j, 8, nd), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bb, L, nd), jnp.float32),
            pltpu.VMEM((bb, nd), jnp.float32),
            pltpu.VMEM((1, nd), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(uc, dc_, Bp, Cp, at_chunks, E, Fn, Fr, gc)

    # chunk partials -> (N, D): sum rows-blocks, then stitch channel chunks
    dA_part = dA_part.reshape(n_i, n_j, 8, nd).sum(axis=(0, 2))  # (n_j, nd)
    dAT = dA_part.reshape(n_j, N, Dc).transpose(1, 0, 2).reshape(N, n_j * Dc)
    dAT = dAT[:, :D]
    return (_from_chunked(du, D)[:BW], _from_chunked(dd, D)[:BW],
            dAT, dB[:BW], dC[:BW])


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _scan_core(u, delta, AT, B, C, softplus):
    return _fwd(u, delta, AT, B, C, softplus)


def _scan_fwd_rule(u, delta, AT, B, C, softplus):
    y = _fwd(u, delta, AT, B, C, softplus)
    return y, (u, delta, AT, B, C)


_scan_core.defvjp(_scan_fwd_rule, _bwd)

PALLAS_SCAN_MAX_LEN = 64
# Channel chunking (grid dim j) removes the old single-block N*D ceiling; the
# remaining guards are the VMEM-driven L bound and a batch floor below which
# the XLA scan wins (measured on v5e at the six workloads' stage shapes:
# Pallas 1.1-1.8x faster for window batches >= 4096, ~0.9x at 1024, so the
# crossover gate sits at 2048).
PALLAS_SCAN_MAX_ND = 8192
PALLAS_SCAN_MIN_BATCH = 2048


def pallas_scan_supported(L: int, n: int, d: int, batch: int | None = None) -> bool:
    ok = L <= PALLAS_SCAN_MAX_LEN and n * d <= PALLAS_SCAN_MAX_ND
    if batch is not None:
        ok = ok and batch >= PALLAS_SCAN_MIN_BATCH
    return ok


def selective_scan_pallas(u, delta, A, B, C, D=None, delta_bias=None,
                          delta_softplus=True):
    """Channel-minor selective scan on the Pallas kernel.

    u, delta: (BW, L, D); A: (D, N); B, C: (BW, L, N); D/delta_bias: (D,).
    Requires L <= PALLAS_SCAN_MAX_LEN (windowed regime). Returns (BW, L, D).
    """
    if u.shape[1] > PALLAS_SCAN_MAX_LEN:
        raise ValueError(f"selective_scan_pallas supports L<={PALLAS_SCAN_MAX_LEN}")
    AT = A.astype(jnp.float32).T                       # (N, D)
    # fp32 at the kernel boundary: Mosaic mishandles dynamic sublane slices on
    # bf16 blocks with non-128-multiple minor dims, and the recurrence wants
    # fp32 state anyway
    u32 = u.astype(jnp.float32)
    d32 = delta.astype(jnp.float32)
    if delta_bias is not None:
        d32 = d32 + delta_bias.astype(jnp.float32)[None, None, :]
    y = _scan_core(u32, d32, AT, B.astype(jnp.float32), C.astype(jnp.float32),
                   delta_softplus)
    if D is not None:
        y = y + u32 * D.astype(jnp.float32)[None, None, :]
    return y.astype(u.dtype)
