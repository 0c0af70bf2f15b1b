"""Pallas TPU selective scan for LONG sequences (16k-66k tokens, ViT mixing).

TPU-native replacement for the mamba-ssm CUDA `selective_scan_fn` at the
full-sequence call sites (ref: model/models/mamba.py:125-134 via
backbone_vit.py README sweep configs): the windowed kernel
(selective_scan_pallas.py) wants a huge row batch with L <= 64, while the
XLA chunked associative scan (selective_scan.py) materializes the N-expanded
(B, D, L, N) discretization in HBM — log-depth passes over ~N x the input
bytes each way.

Blocked-scan formulation instead: cut L into SEG-token segments and treat
the segments as VPU ROWS (sublane-parallel), exactly the shape the windowed
kernel is efficient at. The recurrence is linear in the carried state, so
cross-segment sequencing factors out:

  forward   h_t = a_t h_{t-1} + b_t  over a segment s with initial state H:
            h_last(s, H) = h_last(s, 0) + P_s H,  P_s = prod_t a_t
  backward  dh_t = a_{t+1} dh_{t+1} + C_t g_t  with tail carry T:
            dh_start(s, T) = dh_start(s, 0) + P_s T

so each direction runs as (1) one batch-parallel kernel pass with zero
carries emitting per-segment boundary values, (2) a tiny cross-segment
associative scan over (nseg, N*D) boundary tensors in XLA, and (3) one
batch-parallel kernel pass seeded with the true carries producing the
outputs. HBM traffic is x-in/y-out per pass; the (N x D)-expanded state only
ever lives in VMEM.

Layouts, channel chunking (grid dim j), and the 0/1 expander-matmul tricks
are shared with selective_scan_pallas.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .selective_scan_pallas import (_block_rows, _chunk_at, _compiler_params,
                                    _dot, _expand_reduce, _interpret,
                                    _pick_chunk, _reduce_over_n, _to_chunked)

_LOG2E = math.log2(math.e)

SEG = 64  # tokens per segment row (the windowed kernel's proven L)


# --------------------------------------------------------------------------- #
# Kernels: the windowed-scan bodies extended with carry in/out
# --------------------------------------------------------------------------- #

def _make_fwd_kernel(L, N, Dc, softplus, emit_y):
    def kernel(u_ref, d_ref, B_ref, C_ref, at_ref, e_ref, fn_ref, h0_ref,
               *out_refs):
        if emit_y:
            y_ref, hl_ref, ap_ref, h_scr, ap_scr = out_refs
        else:
            hl_ref, ap_ref, h_scr, ap_scr = out_refs
        h_scr[:] = h0_ref[0]
        ap_scr[:] = jnp.ones_like(ap_scr)
        a2_flat = at_ref[0, 0:1, :] * _LOG2E
        E = e_ref[:]
        Fn = fn_ref[:]

        def body(t, _):
            u_t = u_ref[0, :, pl.ds(t, 1), :][:, 0, :].astype(jnp.float32)
            d_t = d_ref[0, :, pl.ds(t, 1), :][:, 0, :].astype(jnp.float32)
            if softplus:
                d_t = jax.nn.softplus(d_t)
            bu_rep = pltpu.repeat(d_t * u_t, N, axis=1)
            d_rep = pltpu.repeat(d_t, N, axis=1)
            B_t = B_ref[:, pl.ds(t, 1), :][:, 0, :].astype(jnp.float32)
            a_t = jnp.exp2(d_rep * a2_flat)
            h = a_t * h_scr[:] + bu_rep * _dot(B_t, E)
            h_scr[:] = h
            ap_scr[:] = ap_scr[:] * a_t
            if emit_y:
                C_t = C_ref[:, pl.ds(t, 1), :][:, 0, :].astype(jnp.float32)
                y = _dot(h * _dot(C_t, E), Fn)
                y_ref[0, :, pl.ds(t, 1), :] = y.astype(y_ref.dtype)[:, None, :]
            return 0

        jax.lax.fori_loop(0, L, body, 0)
        hl_ref[0] = h_scr[:]
        ap_ref[0] = ap_scr[:]

    return kernel


def _make_carry_bwd_kernel(L, N, Dc, softplus):
    """dh_start(s, 0): reverse dh chain only — needs no u and no h history."""
    def kernel(d_ref, C_ref, g_ref, at_ref, e_ref, dh0_ref, dh_scr):
        a2_flat = at_ref[0, 0:1, :] * _LOG2E
        E = e_ref[:]
        dh_scr[:] = jnp.zeros_like(dh_scr)

        def body(i, _):
            t = L - 1 - i
            d_t = d_ref[0, :, pl.ds(t, 1), :][:, 0, :].astype(jnp.float32)
            if softplus:
                d_t = jax.nn.softplus(d_t)
            d_rep = pltpu.repeat(d_t, N, axis=1)
            a_t = jnp.exp2(d_rep * a2_flat)
            C_t = C_ref[:, pl.ds(t, 1), :][:, 0, :].astype(jnp.float32)
            g_t = g_ref[0, :, pl.ds(t, 1), :][:, 0, :].astype(jnp.float32)
            dh = dh_scr[:] + _dot(C_t, E) * pltpu.repeat(g_t, N, axis=1)
            dh_scr[:] = a_t * dh
            return 0

        jax.lax.fori_loop(0, L, body, 0)
        dh0_ref[0] = dh_scr[:]

    return kernel


def _make_bwd_kernel(L, N, Dc, softplus):
    """Full backward given true carries: h0 (fwd recompute seed) and dh_tail."""
    def kernel(u_ref, d_ref, B_ref, C_ref, at_ref, e_ref, fn_ref, fr_ref,
               g_ref, h0_ref, dht_ref,
               du_ref, dd_ref, dB_ref, dC_ref, dA_ref, dh0_ref,
               hist_scr, dh_scr, dA_scr):
        j = pl.program_id(1)
        a_flat = at_ref[0, 0:1, :]
        a2_flat = a_flat * _LOG2E
        E = e_ref[:]
        Fn = fn_ref[:]
        Fr = fr_ref[:]

        @pl.when(j == 0)
        def _init_shared():
            dB_ref[...] = jnp.zeros_like(dB_ref)
            dC_ref[...] = jnp.zeros_like(dC_ref)

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

        jax.lax.fori_loop(0, L, fwd_body, h0_ref[0])
        dh_scr[:] = dht_ref[0]
        dA_scr[:] = jnp.zeros_like(dA_scr)

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
            # the t==0 predecessor is the segment's initial carry, not zero
            h_prev = jnp.where(t > 0, h_prev, h0_ref[0])

            g_rep = pltpu.repeat(g_t, N, axis=1)
            dh = dh_scr[:] + _dot(C_t, E) * g_rep

            dC = _dot(h_t * g_rep, Fr)
            da = dh * h_prev
            dA_scr[:] = dA_scr[:] + jnp.sum(da * a_t * d_rep, axis=0,
                                            keepdims=True)
            B_rep = _dot(B_t, E)
            du = d_t * _dot(dh * B_rep, Fn)
            ddt = u_t * _dot(dh * B_rep, Fn) + _dot(da * a_t * a_flat, Fn)
            dB = _dot(dh * bu_rep, Fr)
            if softplus:
                ddt = ddt * jax.nn.sigmoid(raw_d)

            du_ref[0, :, pl.ds(t, 1), :] = du.astype(du_ref.dtype)[:, None, :]
            dd_ref[0, :, pl.ds(t, 1), :] = ddt.astype(dd_ref.dtype)[:, None, :]
            dB_ref[:, pl.ds(t, 1), :] += dB.astype(dB_ref.dtype)[:, None, :]
            dC_ref[:, pl.ds(t, 1), :] += dC.astype(dC_ref.dtype)[:, None, :]

            dh_scr[:] = a_t * dh
            return 0

        jax.lax.fori_loop(0, L, bwd_body, 0)
        dA_ref[0] = jnp.concatenate(
            [dA_scr[:], jnp.zeros((7, dA_scr.shape[1]), jnp.float32)], axis=0)
        dh0_ref[0] = dh_scr[:]   # dL/d(h0) of this segment — the stitch input

    return kernel


# --------------------------------------------------------------------------- #
# pallas_call plumbing
# --------------------------------------------------------------------------- #

def _seg_layout(u, delta, B, C, g=None):
    """(BW, L, D) operands -> chunked segment-row layout + geometry."""
    BW, L, D = u.shape
    N = B.shape[-1]
    Dc = _pick_chunk(N, D)
    nd = N * Dc
    bb = _block_rows(SEG, nd)
    pad = (-BW) % bb
    def padrow(x):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)) if pad else x
    _, n_j, d_pad = _chunk_at(jnp.zeros((N, D)), Dc)
    out = dict(BW=BW, L=L, D=D, N=N, Dc=Dc, nd=nd, bb=bb, pad=pad, n_j=n_j,
               d_pad=d_pad, n_i=(BW + pad) // bb)
    out["uc"] = _to_chunked(padrow(u), n_j, Dc, d_pad)
    out["dc"] = _to_chunked(padrow(delta), n_j, Dc, d_pad)
    out["B"] = padrow(B)
    out["C"] = padrow(C)
    if g is not None:
        out["gc"] = _to_chunked(padrow(g), n_j, Dc, d_pad)
    return out


def _fwd_call(u, delta, AT, B, C, h0, softplus: bool, emit_y: bool):
    """One forward kernel pass. h0: (n_j, BW, nd) carries (chunk layout)."""
    s = _seg_layout(u, delta, B, C)
    at_chunks, _, _ = _chunk_at(AT, s["Dc"])
    E, _ = _expand_reduce(s["N"], s["Dc"])
    Fn = _reduce_over_n(s["N"], s["Dc"])
    h0p = jnp.pad(h0, ((0, 0), (0, s["pad"]), (0, 0))) if s["pad"] else h0
    grid = (s["n_i"], s["n_j"])
    bb, nd, L, Dc, N = s["bb"], s["nd"], s["L"], s["Dc"], s["N"]

    out_specs = [
        pl.BlockSpec((1, bb, nd), lambda i, j: (j, i, 0)),
        pl.BlockSpec((1, bb, nd), lambda i, j: (j, i, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((s["n_j"], s["BW"] + s["pad"], nd), jnp.float32),
        jax.ShapeDtypeStruct((s["n_j"], s["BW"] + s["pad"], nd), jnp.float32),
    ]
    if emit_y:
        out_specs = [pl.BlockSpec((1, bb, L, Dc), lambda i, j: (j, i, 0, 0))] \
            + out_specs
        out_shape = [jax.ShapeDtypeStruct(
            (s["n_j"], s["BW"] + s["pad"], L, Dc), jnp.float32)] + out_shape

    outs = pl.pallas_call(
        _make_fwd_kernel(L, N, Dc, softplus, emit_y),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bb, L, Dc), lambda i, j: (j, i, 0, 0)),
            pl.BlockSpec((1, bb, L, Dc), lambda i, j: (j, i, 0, 0)),
            pl.BlockSpec((bb, L, N), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((bb, L, N), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 8, nd), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((N, nd), lambda i, j: (0, 0)),
            pl.BlockSpec((nd, Dc), lambda i, j: (0, 0)),
            pl.BlockSpec((1, bb, nd), lambda i, j: (j, i, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((bb, nd), jnp.float32),
                        pltpu.VMEM((bb, nd), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(s["uc"], s["dc"], s["B"], s["C"], at_chunks, E, Fn, h0p)
    if emit_y:
        y, hl, ap = outs
        return y[:, :s["BW"]], hl[:, :s["BW"]], ap[:, :s["BW"]], s
    hl, ap = outs
    return None, hl[:, :s["BW"]], ap[:, :s["BW"]], s


def _carry_bwd_call(delta, C, g, AT, softplus: bool):
    """dh_start(s, 0) per segment: (n_j, BW, nd)."""
    u_dummy = delta  # same shape; only delta/C/g are read
    s = _seg_layout(u_dummy, delta, C, C, g=g)
    at_chunks, _, _ = _chunk_at(AT, s["Dc"])
    E, _ = _expand_reduce(s["N"], s["Dc"])
    grid = (s["n_i"], s["n_j"])
    bb, nd, L, Dc, N = s["bb"], s["nd"], s["L"], s["Dc"], s["N"]

    dh0 = pl.pallas_call(
        _make_carry_bwd_kernel(L, N, Dc, softplus),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bb, L, Dc), lambda i, j: (j, i, 0, 0)),
            pl.BlockSpec((bb, L, N), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, bb, L, Dc), lambda i, j: (j, i, 0, 0)),
            pl.BlockSpec((1, 8, nd), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((N, nd), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bb, nd), lambda i, j: (j, i, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (s["n_j"], s["BW"] + s["pad"], nd), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bb, nd), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(s["dc"], s["C"], s["gc"], at_chunks, E)
    return dh0[:, :s["BW"]]


def _bwd_call(u, delta, AT, B, C, g, h0, dht, softplus: bool):
    s = _seg_layout(u, delta, B, C, g=g)
    at_chunks, _, _ = _chunk_at(AT, s["Dc"])
    E, Fr = _expand_reduce(s["N"], s["Dc"])
    Fn = _reduce_over_n(s["N"], s["Dc"])
    grid = (s["n_i"], s["n_j"])
    bb, nd, L, Dc, N = s["bb"], s["nd"], s["L"], s["Dc"], s["N"]
    pad = s["pad"]
    h0p = jnp.pad(h0, ((0, 0), (0, pad), (0, 0))) if pad else h0
    dhtp = jnp.pad(dht, ((0, 0), (0, pad), (0, 0))) if pad else dht

    du, dd, dB, dC, dA_part, _dh0 = pl.pallas_call(
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
            pl.BlockSpec((1, bb, nd), lambda i, j: (j, i, 0)),
            pl.BlockSpec((1, bb, nd), lambda i, j: (j, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bb, L, Dc), lambda i, j: (j, i, 0, 0)),
            pl.BlockSpec((1, bb, L, Dc), lambda i, j: (j, i, 0, 0)),
            pl.BlockSpec((bb, L, N), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((bb, L, N), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 8, nd), lambda i, j: (i * s["n_j"] + j, 0, 0)),
            pl.BlockSpec((1, bb, nd), lambda i, j: (j, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s["n_j"], s["BW"] + pad, L, Dc), jnp.float32),
            jax.ShapeDtypeStruct((s["n_j"], s["BW"] + pad, L, Dc), jnp.float32),
            jax.ShapeDtypeStruct((s["BW"] + pad, L, N), B.dtype),
            jax.ShapeDtypeStruct((s["BW"] + pad, L, N), C.dtype),
            jax.ShapeDtypeStruct((s["n_i"] * s["n_j"], 8, nd), jnp.float32),
            jax.ShapeDtypeStruct((s["n_j"], s["BW"] + pad, nd), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bb, L, nd), jnp.float32),
            pltpu.VMEM((bb, nd), jnp.float32),
            pltpu.VMEM((1, nd), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(s["uc"], s["dc"], s["B"], s["C"], at_chunks, E, Fn, Fr, s["gc"],
      h0p, dhtp)
    return du, dd, dB[:s["BW"]], dC[:s["BW"]], dA_part, s


# --------------------------------------------------------------------------- #
# Cross-segment stitching (tiny XLA scans over (b, nseg, n_j*nd))
# --------------------------------------------------------------------------- #

def _affine_combine(left, right):
    a_l, b_l = left
    a_r, b_r = right
    return a_l * a_r, a_r * b_l + b_r


def _stitch_fwd(hl, ap, b, nseg):
    """Per-segment zero-carry finals -> true initial carries Hstart.

    hl, ap: (n_j, b*nseg, nd). Hstart[s] = P_{s-1} Hstart[s-1] + hl_{s-1}."""
    n_j, _, nd = hl.shape
    hl = hl.reshape(n_j, b, nseg, nd)
    ap = ap.reshape(n_j, b, nseg, nd)
    cum_a, h_in = jax.lax.associative_scan(_affine_combine, (ap, hl), axis=2)
    del cum_a
    # inclusive scan gives the state AFTER segment s; Hstart is the shift
    hstart = jnp.concatenate(
        [jnp.zeros_like(h_in[:, :, :1]), h_in[:, :, :-1]], axis=2)
    return hstart.reshape(n_j, b * nseg, nd)


def _stitch_bwd(dh0, ap, b, nseg):
    """Zero-tail dh_starts -> true tail carries dh_tail (reverse stitch).

    dh_tail[s] = dh0_{s+1} + P_{s+1} dh_tail[s+1]."""
    n_j, _, nd = dh0.shape
    dh0 = dh0.reshape(n_j, b, nseg, nd)
    ap = ap.reshape(n_j, b, nseg, nd)
    cum_a, t_in = jax.lax.associative_scan(_affine_combine, (ap, dh0), axis=2,
                                           reverse=True)
    del cum_a
    dh_tail = jnp.concatenate(
        [t_in[:, :, 1:], jnp.zeros_like(t_in[:, :, :1])], axis=2)
    return dh_tail.reshape(n_j, b * nseg, nd)


# --------------------------------------------------------------------------- #
# Public op with custom VJP
# --------------------------------------------------------------------------- #

def _zero_carries(n_j, rows, nd):
    return jnp.zeros((n_j, rows, nd), jnp.float32)


def _segment(x, seg):
    """(b, L, k) -> (b*nseg, seg, k), zero-padded L."""
    b, L, k = x.shape
    padl = (-L) % seg
    if padl:
        x = jnp.pad(x, ((0, 0), (0, padl), (0, 0)))
    nseg = (L + padl) // seg
    return x.reshape(b * nseg, seg, k), nseg


def _unsegment(y, b, L):
    rows, seg, k = y.shape
    return y.reshape(b, -1, k)[:, :L]


def _fwd_impl(u, delta, AT, B, C, softplus):
    b, L, D = u.shape
    us, nseg = _segment(u, SEG)
    ds, _ = _segment(delta, SEG)
    Bs, _ = _segment(B, SEG)
    Cs, _ = _segment(C, SEG)
    N = AT.shape[0]
    Dc = _pick_chunk(N, D)
    _, n_j, _ = _chunk_at(AT, Dc)
    nd = N * Dc

    h00 = _zero_carries(n_j, b * nseg, nd)
    _, hl, ap, _ = _fwd_call(us, ds, AT, Bs, Cs, h00, softplus, emit_y=False)
    hstart = _stitch_fwd(hl, ap, b, nseg)
    y, _, _, s = _fwd_call(us, ds, AT, Bs, Cs, hstart, softplus, emit_y=True)
    # un-chunk channels, un-segment rows
    from .selective_scan_pallas import _from_chunked
    yf = _from_chunked(y, D)
    return _unsegment(yf, b, L), (hstart, ap)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _long_core(u, delta, AT, B, C, softplus):
    y, _ = _fwd_impl(u, delta, AT, B, C, softplus)
    return y


def _long_fwd_rule(u, delta, AT, B, C, softplus):
    y, (hstart, ap) = _fwd_impl(u, delta, AT, B, C, softplus)
    return y, (u, delta, AT, B, C, hstart, ap)


def _long_bwd_rule(softplus, res, g):
    u, delta, AT, B, C, hstart, ap = res
    b, L, D = u.shape
    us, nseg = _segment(u, SEG)
    ds, _ = _segment(delta, SEG)
    Bs, _ = _segment(B, SEG)
    Cs, _ = _segment(C, SEG)
    gs, _ = _segment(g.astype(jnp.float32), SEG)

    dh0 = _carry_bwd_call(ds, Cs, gs, AT, softplus)
    dh_tail = _stitch_bwd(dh0, ap, b, nseg)
    du, dd, dB, dC, dA_part, s = _bwd_call(us, ds, AT, Bs, Cs, gs,
                                           hstart, dh_tail, softplus)
    from .selective_scan_pallas import _from_chunked
    n_i, n_j, nd = s["n_i"], s["n_j"], s["nd"]
    N, Dc = s["N"], s["Dc"]
    dA_part = dA_part.reshape(n_i, n_j, 8, nd).sum(axis=(0, 2))
    dAT = dA_part.reshape(n_j, N, Dc).transpose(1, 0, 2).reshape(N, n_j * Dc)
    dAT = dAT[:, :D]
    duf = _unsegment(_from_chunked(du, D)[:b * nseg], b, L)
    ddf = _unsegment(_from_chunked(dd, D)[:b * nseg], b, L)
    dBf = _unsegment(dB[:b * nseg], b, L)
    dCf = _unsegment(dC[:b * nseg], b, L)
    return duf, ddf, dAT, dBf, dCf


_long_core.defvjp(_long_fwd_rule, _long_bwd_rule)


def long_scan_supported(L: int, n: int, d: int) -> bool:
    """Long-kernel dispatch gate for the full-sequence (ViT) call sites."""
    return L >= 2048 and n * d <= 8192


def use_long_scan(L: int, n: int, d: int) -> bool:
    """Runtime dispatch: the Pallas kernel on TPU, the chunked XLA scan on
    CPU (interpret-mode Pallas would crawl). The single source of truth for
    both the single-chip path (models/mamba.py) and the SP local scan
    (ops/selective_scan_sp.py); each imports it under its own module name so
    tests can monkeypatch one without the other."""
    return long_scan_supported(L, n, d) and jax.default_backend() != "cpu"


def selective_scan_long(u, delta, A, B, C, D=None, delta_bias=None,
                        delta_softplus=True):
    """Channel-minor long-sequence selective scan (blocked Pallas kernel).

    u, delta: (b, L, d); A: (d, N); B, C: (b, L, N); D/delta_bias: (d,).
    Returns (b, L, d) in u.dtype. Matches selective_scan_chunked /
    the mamba-ssm CUDA semantics (delta_bias added pre-softplus, D-skip).
    """
    AT = A.astype(jnp.float32).T
    u32 = u.astype(jnp.float32)
    d32 = delta.astype(jnp.float32)
    if delta_bias is not None:
        d32 = d32 + delta_bias.astype(jnp.float32)[None, None, :]
    y = _long_core(u32, d32, AT, B.astype(jnp.float32),
                   C.astype(jnp.float32), delta_softplus)
    if D is not None:
        y = y + u32 * D.astype(jnp.float32)[None, None, :]
    return y.astype(u.dtype)
