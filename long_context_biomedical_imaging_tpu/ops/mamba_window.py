"""Fused Pallas MambaVision window mixer (forward + custom VJP).

The whole MambaVisionMixer body for windowed call sites (ref:
model/models/mamba.py:108-139 invoked per-window from backbone_swin.py:361-365)
as ONE kernel per row block of windows:

  in_proj matmul -> depthwise 'same' conv (K=3, both branches concatenated,
  no bias — ref quirk) -> SiLU -> split x|z -> x_proj matmul (dt, B, C) ->
  dt_proj (+ double dt bias, ref quirk) -> selective scan (VMEM state,
  n-major 0/1-matrix expanders like ops/selective_scan_pallas.py) -> D skip
  -> concat [y|z] -> out_proj matmul.

Why: the mamba workloads are HBM-bound like the hyena ones (BASELINE.md
round-2 roofline; mamba ptx-geometry step 564 ms vs fused-hyena 291 ms). The
composed path streams xz / conv out / x / dt / B / C / y through HBM between
every stage — fused, HBM traffic is x_in once in and out once out.

Wide channel counts chunk the scan state IN-KERNEL (static loop over channel
chunks of <=1024 state lanes — the Mosaic single-block ceiling); x/dt/y live
in chunk-padded VMEM scratches so every chunk touches static lane slices.
The scan unrolls statically over t (V <= 64): value-row indexing stays
static, which Mosaic lowers cleanly (dynamic value indexing does not).

Backward is one kernel per row block: recompute the forward (conv scratch,
scan h history per chunk), then chain the transposed ops; per-row gradients
are written into scratches row-by-row (no value scatter — Mosaic crashes on
in-kernel pad/concat/DUS along the token axis), and weight gradients
accumulate across the sequential 1D grid in VMEM-resident output blocks.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import _ln_bwd, _ln_fwd

_LOG2E = math.log2(math.e)

MAMBA_WINDOW_MAX_LEN = 64


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _compiler_params():
    if jax.default_backend() == "cpu":
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def mamba_window_supported(v: int) -> bool:
    # V >= 16 so the conv scratch's 8-row zero margin fits inside 2V
    return 16 <= v <= MAMBA_WINDOW_MAX_LEN and v % 8 == 0


def _pick_chunk(N: int, Dh: int) -> int:
    dc_max = max(1, 1024 // N)
    n_j = -(-Dh // dc_max)
    return -(-Dh // n_j)


def _pick_bb(V: int, C: int, N: int, n_j: int, Dc: int, bwd: bool) -> int:
    """Rows (windows) per grid block. Large blocks matter: the scan's per-t
    ops are (bb, N*Dc) tiles, and at bb < 256 they are latency-bound (the
    standalone scan kernel runs bb=512). Live fp32 set: conv scratch
    (2V x C), ~8 (V x C) value tiles, scan scratches; bwd adds the
    (V, n_j*N*Dc) h history and the reverse sweep."""
    hist = V * N * Dc * 4 * (4 if bwd else 2)      # nd-wide scan scratches
    per_row = V * 4 * (16 * C if not bwd else 30 * C) + hist
    budget = (36 if bwd else 28) * 1024 * 1024
    rows = max(budget // max(per_row, 1), 8)
    bb = 8
    while bb * 2 <= rows and bb < 512:
        bb *= 2
    return bb


def _expand_reduce(N: int, Dc: int):
    e = np.kron(np.eye(N, dtype=np.float32), np.ones((1, Dc), np.float32))
    return jnp.asarray(e), jnp.asarray(e.T)     # E (N, N*Dc), Fr (N*Dc, N)


def _reduce_over_n(N: int, Dc: int):
    f = np.kron(np.ones((N, 1), np.float32), np.eye(Dc, dtype=np.float32))
    return jnp.asarray(f)                       # (N*Dc, Dc)


def _dot(a, b, dtype):
    return jax.lax.dot_general(a.astype(dtype), b.astype(dtype),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_t(a, b, dtype):
    return jax.lax.dot_general(a.astype(dtype), b.astype(dtype),
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_tt(a, b, dtype):
    return jax.lax.dot_general(a.astype(dtype), b.astype(dtype),
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _make_dot32(dt):
    """Per-step scan matmuls against the 0/1 expander matrices.

    Under bf16 AMP the value operands (B, C, h*C_rep, ...) are bf16-sourced
    anyway, so single-pass bf16 MXU ops lose nothing vs the composed path —
    while fp32 HIGHEST costs 6 MXU passes and made the scan latency-bound
    (measured 0.5% MXU on the mamba step). fp32 inputs keep exact fp32."""
    if dt == jnp.bfloat16:
        def dot32(a, b):
            return jax.lax.dot_general(a.astype(jnp.bfloat16),
                                       b.astype(jnp.bfloat16),
                                       (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        return dot32

    def dot32(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
    return dot32


def _silu(u):
    return u * jax.nn.sigmoid(u)


def _silu_grad(u):
    s = jax.nn.sigmoid(u)
    return s * (1.0 + u * (1.0 - s))


def _same_conv3(pad_ref, x, taps, V: int, transpose: bool = False):
    """K=3 depthwise 'same' conv: y[t] = sum_{j=0..2} taps[j] * x[t-1+j]
    (transpose flips the offsets). pad_ref: (bb, 2V, W) scratch; x sits at
    rows [8, 8+V) with zero margins (V >= 16 keeps 9+V <= 2V)."""
    pad_ref[:, :8, :] = jnp.zeros_like(x[:, :8, :])
    pad_ref[:, 8:8 + V, :] = x
    pad_ref[:, 8 + V:, :] = jnp.zeros_like(x[:, :V - 8, :])
    o0, o2 = (1, -1) if transpose else (-1, 1)
    y = x * taps[1][None, None, :]
    y = y + pad_ref[:, 8 + o0:8 + o0 + V, :] * taps[0][None, None, :]
    y = y + pad_ref[:, 8 + o2:8 + o2 + V, :] * taps[2][None, None, :]
    return y


def _conv3_tap_grads(pad_ref, dy, V: int):
    """d taps[j] = sum_{b,t} dy[b,t] * x[b,t-1+j]; pad_ref holds [0|x|0]."""
    rows = []
    for o in (-1, 0, 1):
        rows.append(jnp.sum(dy * pad_ref[:, 8 + o:8 + o + V, :],
                            axis=(0, 1))[None, :])
    return jnp.concatenate(rows, axis=0)        # (3, W)


# --------------------------------------------------------------------------- #
# Shared forward stage (pre-scan)
# --------------------------------------------------------------------------- #

def _pre_scan(x_in, wxz, wconv, wdbl, wdt, dtb2, pad_scr, V, C, Dh, R, N, dt):
    """in_proj -> conv+SiLU -> split -> x_dbl -> dt. pad_scr retains [0|xz|0]
    for the backward's conv tap grads."""
    bb, _, cp = x_in.shape
    xz = _dot(x_in.reshape(bb * V, cp), wxz, dt).reshape(bb, V, C)
    u = _same_conv3(pad_scr, xz, wconv, V)
    s = _silu(u)
    x = s[:, :, :Dh]
    z = s[:, :, Dh:]
    dbl = _dot(x.reshape(bb * V, Dh), wdbl, dt).reshape(bb, V, R + 2 * N)
    dt_part = dbl[:, :, :R]
    Bc = dbl[:, :, R:R + N]
    Cc = dbl[:, :, R + N:]
    dtv = _dot(dt_part.reshape(bb * V, R), wdt, dt).reshape(bb, V, Dh) \
        + dtb2[0][None, None, :]
    return xz, u, x, z, dt_part, dtv, Bc, Cc


def _fill_chunked(scr, val, Dh):
    """Write (bb, V, Dh) into a (bb, V, n_j*Dc) chunk-padded scratch."""
    if scr.shape[-1] > Dh:
        scr[...] = jnp.zeros_like(scr)
    scr[:, :, :Dh] = val


# --------------------------------------------------------------------------- #
# Forward kernel
# --------------------------------------------------------------------------- #

def _make_fwd_kernel(V, C, Dh, R, N, Dc, n_j, dt, ln: bool = False):
    nd = N * Dc
    _dot32 = _make_dot32(dt)

    def kernel(x_ref, *refs):
        if ln:
            (gln_ref, bln_ref, wxz_ref, wconv_ref, wdbl_ref, wdt_ref,
             dtb2_ref, at_ref, dskip_ref, wout_ref, e_ref, fn_ref, o_ref,
             pad_scr, x_scr, dtv_scr, y_scr, a_scr, c_scr) = refs
        else:
            (wxz_ref, wconv_ref, wdbl_ref, wdt_ref, dtb2_ref,
             at_ref, dskip_ref, wout_ref, e_ref, fn_ref, o_ref,
             pad_scr, x_scr, dtv_scr, y_scr, a_scr, c_scr) = refs
        bb = x_ref.shape[0]
        cp = x_ref.shape[-1]
        x32 = x_ref[...].astype(jnp.float32)
        if ln:
            x_in, _, _ = _ln_fwd(x32, gln_ref[0][None, None, :],
                                 bln_ref[0][None, None, :], n=C)
        else:
            x_in = x32
        xz, u, x, z, dt_part, dtv, Bc, Cc = _pre_scan(
            x_in, wxz_ref[...], wconv_ref[...], wdbl_ref[...], wdt_ref[...],
            dtb2_ref[...], pad_scr, V, C, Dh, R, N, dt)

        _fill_chunked(x_scr, x, Dh)
        _fill_chunked(dtv_scr, dtv, Dh)
        Bc2 = Bc.reshape(bb * V, N)
        Cc2 = Cc.reshape(bb * V, N)

        E = e_ref[...]
        Fn = fn_ref[...]
        for jc in range(n_j):
            a2row = at_ref[jc, 0:1, :] * _LOG2E        # (1, nd)
            lo = jc * Dc
            # batched precompute over all (bb, V) rows: the sequential part
            # below is 2 VPU ops per step (the per-t matmul/exp2/softplus
            # version ran latency-bound)
            d2 = jax.nn.softplus(
                dtv_scr[:, :, lo:lo + Dc].reshape(bb * V, Dc))
            x2 = x_scr[:, :, lo:lo + Dc].reshape(bb * V, Dc)
            d_rep2 = pltpu.repeat(d2, N, axis=1)
            a_scr[...] = jnp.exp2(d_rep2 * a2row).reshape(bb, V, nd)
            c2 = pltpu.repeat(d2 * x2, N, axis=1) * _dot32(Bc2, E)
            c_scr[...] = c2.reshape(bb, V, nd)

            h = jnp.zeros((bb, nd), jnp.float32)
            for t in range(V):
                h = a_scr[:, t, :] * h + c_scr[:, t, :]
                c_scr[:, t, :] = h                     # h history, in place

            H2 = c_scr[...].reshape(bb * V, nd)
            y2 = _dot32(H2 * _dot32(Cc2, E), Fn)       # (bb*V, Dc)
            y_scr[:, :, lo:lo + Dc] = y2.reshape(bb, V, Dc)

        y = y_scr[:, :, :Dh] + x * dskip_ref[0][None, None, :]
        yz2 = jnp.concatenate([y, z], axis=-1).reshape(bb * V, C)
        out = _dot(yz2, wout_ref[...], dt).reshape(bb, V, cp)
        if ln:
            out = out + x32
        o_ref[...] = out.astype(o_ref.dtype)

    return kernel


# --------------------------------------------------------------------------- #
# Backward kernel
# --------------------------------------------------------------------------- #

def _make_bwd_kernel(V, C, Dh, R, N, Dc, n_j, dt, ln: bool = False):
    nd = N * Dc
    _dot32 = _make_dot32(dt)

    def kernel(x_ref, *refs):
        if ln:
            (gln_ref, bln_ref, wxz_ref, wconv_ref, wdbl_ref, wdt_ref,
             dtb2_ref, at_ref, dskip_ref, wout_ref, e_ref, fn_ref, fr_ref,
             g_ref, dx_ref, dgln_ref, dbln_ref, dwxz_ref, dwconv_ref,
             dwdbl_ref, dwdt_ref, ddtb_ref, dat_ref, ddskip_ref, dwout_ref,
             pad_scr, x_scr, dtv_scr, y_scr, a_scr, h_scr, hp_scr, cg_scr,
             dxs_scr, ddt_scr, dB_scr, dC_scr) = refs
        else:
            (wxz_ref, wconv_ref, wdbl_ref, wdt_ref, dtb2_ref,
             at_ref, dskip_ref, wout_ref, e_ref, fn_ref, fr_ref, g_ref,
             dx_ref, dwxz_ref, dwconv_ref, dwdbl_ref, dwdt_ref, ddtb_ref,
             dat_ref, ddskip_ref, dwout_ref,
             pad_scr, x_scr, dtv_scr, y_scr, a_scr, h_scr, hp_scr, cg_scr,
             dxs_scr, ddt_scr, dB_scr, dC_scr) = refs
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            if ln:
                dgln_ref[...] = jnp.zeros_like(dgln_ref)
                dbln_ref[...] = jnp.zeros_like(dbln_ref)
            dwxz_ref[...] = jnp.zeros_like(dwxz_ref)
            dwconv_ref[...] = jnp.zeros_like(dwconv_ref)
            dwdbl_ref[...] = jnp.zeros_like(dwdbl_ref)
            dwdt_ref[...] = jnp.zeros_like(dwdt_ref)
            ddtb_ref[...] = jnp.zeros_like(ddtb_ref)
            dat_ref[...] = jnp.zeros_like(dat_ref)
            ddskip_ref[...] = jnp.zeros_like(ddskip_ref)
            dwout_ref[...] = jnp.zeros_like(dwout_ref)

        bb = x_ref.shape[0]
        cp = x_ref.shape[-1]
        x32 = x_ref[...].astype(jnp.float32)
        if ln:
            gln = gln_ref[0][None, None, :]
            x_in, xhat, rstd = _ln_fwd(x32, gln, bln_ref[0][None, None, :],
                                       n=C)
        else:
            x_in = x32
        xz, u, x, z, dt_part, dtv, Bc, Cc = _pre_scan(
            x_in, wxz_ref[...], wconv_ref[...], wdbl_ref[...], wdt_ref[...],
            dtb2_ref[...], pad_scr, V, C, Dh, R, N, dt)

        _fill_chunked(x_scr, x, Dh)
        _fill_chunked(dtv_scr, dtv, Dh)
        Bc2 = Bc.reshape(bb * V, N)
        Cc2 = Cc.reshape(bb * V, N)

        E = e_ref[...]
        Fn = fn_ref[...]
        Fr = fr_ref[...]

        # ---- recompute the forward scan per chunk (batched precompute +
        # 2-op recurrence; see the forward kernel) to rebuild y --------------
        def chunk_fwd(jc):
            a2row = at_ref[jc, 0:1, :] * _LOG2E
            lo = jc * Dc
            d2 = jax.nn.softplus(
                dtv_scr[:, :, lo:lo + Dc].reshape(bb * V, Dc))
            x2 = x_scr[:, :, lo:lo + Dc].reshape(bb * V, Dc)
            d_rep2 = pltpu.repeat(d2, N, axis=1)
            a_scr[...] = jnp.exp2(d_rep2 * a2row).reshape(bb, V, nd)
            c2 = pltpu.repeat(d2 * x2, N, axis=1) * _dot32(Bc2, E)
            cg_scr[...] = c2.reshape(bb, V, nd)
            h = jnp.zeros((bb, nd), jnp.float32)
            for t in range(V):
                h = a_scr[:, t, :] * h + cg_scr[:, t, :]
                h_scr[:, t, :] = h
            return d2, x2, d_rep2

        fwd_vals = None
        for jc in range(n_j):
            fwd_vals = chunk_fwd(jc)
            lo = jc * Dc
            H2 = h_scr[...].reshape(bb * V, nd)
            y2 = _dot32(H2 * _dot32(Cc2, E), Fn)
            y_scr[:, :, lo:lo + Dc] = y2.reshape(bb, V, Dc)

        # ---- out_proj / D-skip transpose ----------------------------------
        do = g_ref[...].astype(jnp.float32)
        do2 = do.reshape(bb * V, cp)
        y = y_scr[:, :, :Dh] + x * dskip_ref[0][None, None, :]
        yz2 = jnp.concatenate([y, z], axis=-1).reshape(bb * V, C)
        dwout_ref[...] += _dot_tt(yz2, do2, dt)
        dyz = _dot_t(do2, wout_ref[...], dt).reshape(bb, V, C)
        dy = dyz[:, :, :Dh]
        dz = dyz[:, :, Dh:]

        ddskip_ref[...] += jnp.sum(dy * x, axis=(0, 1))[None, :]
        # chunk-padded dy so the last chunk's lane slice stays in bounds
        # (y_scr's scan values are no longer needed past this point)
        _fill_chunked(y_scr, dy, Dh)

        # ---- scan backward per chunk: batched products around a 2-op
        # reverse recurrence ------------------------------------------------
        dB_scr[...] = jnp.zeros_like(dB_scr)
        dC_scr[...] = jnp.zeros_like(dC_scr)
        # Chunks are independent here (dB/dC accumulate across them), so run
        # the LAST chunk first: a_scr/h_scr still hold its scan from the
        # y-rebuild loop above (nothing between writes them; cg_scr's stale
        # c2 is overwritten before its first read below), skipping one full
        # redundant forward-scan recompute per call — the r5 anatomy priced
        # it at ~4 ms of the 17.5 ms stage-0 kernel where n_j == 1 (i.e. the
        # whole recompute), and one of n_j recomputes at C=192 (BASELINE.md).
        for jc in reversed(range(n_j)):
            a_flat = at_ref[jc, 0:1, :]
            lo = jc * Dc
            if jc == n_j - 1:
                d2, x2, d_rep2 = fwd_vals
            else:
                d2, x2, d_rep2 = chunk_fwd(jc)  # rebuild a_scr / h history
            raw2 = dtv_scr[:, :, lo:lo + Dc].reshape(bb * V, Dc)
            # h_{t-1} history (zeros at t=0)
            hp_scr[:, 0:1, :] = jnp.zeros((bb, 1, nd), jnp.float32)
            hp_scr[:, 1:, :] = h_scr[:, :V - 1, :]

            g2 = y_scr[:, :, lo:lo + Dc].reshape(bb * V, Dc)
            g_rep2 = pltpu.repeat(g2, N, axis=1)
            cg2 = _dot32(Cc2, E) * g_rep2
            cg_scr[...] = cg2.reshape(bb, V, nd)

            # dh_t = cg_t + a_{t+1} * dh_{t+1}, stored back in place
            dh = cg_scr[:, V - 1, :]
            for t in range(V - 2, -1, -1):
                dh = cg_scr[:, t, :] + a_scr[:, t + 1, :] * dh
                cg_scr[:, t, :] = dh

            H2 = h_scr[...].reshape(bb * V, nd)
            DH2 = cg_scr[...].reshape(bb * V, nd)
            HP2 = hp_scr[...].reshape(bb * V, nd)
            A2 = a_scr[...].reshape(bb * V, nd)

            dC_scr[...] += _dot32(H2 * g_rep2, Fr).reshape(bb, V, N)
            da_a = DH2 * HP2 * A2
            dat_ref[jc, 0:1, :] += jnp.sum(da_a * d_rep2, axis=0,
                                           keepdims=True)
            red2 = _dot32(DH2 * _dot32(Bc2, E), Fn)        # (bb*V, Dc)
            dxs_scr[:, :, lo:lo + Dc] = (d2 * red2).reshape(bb, V, Dc)
            ddt2 = jax.nn.sigmoid(raw2) * (
                x2 * red2 + _dot32(da_a * a_flat, Fn))
            ddt_scr[:, :, lo:lo + Dc] = ddt2.reshape(bb, V, Dc)
            dB_scr[...] += _dot32(
                DH2 * pltpu.repeat(d2 * x2, N, axis=1), Fr).reshape(bb, V, N)

        # ---- dt path -------------------------------------------------------
        ddtv = ddt_scr[:, :, :Dh]
        ddtv2 = ddtv.reshape(bb * V, Dh)
        # dtv = dt_part @ wdt + dtb2: the wrapper's 2*dt_bias transform carries
        # its own factor under autodiff — this is d/d(dtb2) only
        ddtb_ref[...] += jnp.sum(ddtv2, axis=0, keepdims=True)
        dwdt_ref[...] += _dot_tt(dt_part.reshape(bb * V, R), ddtv2, dt)
        ddt_part = _dot_t(ddtv2, wdt_ref[...], dt).reshape(bb, V, R)

        # ---- x_dbl path ----------------------------------------------------
        ddbl = jnp.concatenate([ddt_part, dB_scr[...], dC_scr[...]], axis=-1)
        ddbl2 = ddbl.reshape(bb * V, R + 2 * N)
        dwdbl_ref[...] += _dot_tt(x.reshape(bb * V, Dh), ddbl2, dt)
        dx_total = dy * dskip_ref[0][None, None, :] + dxs_scr[:, :, :Dh] \
            + _dot_t(ddbl2, wdbl_ref[...], dt).reshape(bb, V, Dh)

        # ---- SiLU + conv + in_proj transpose -------------------------------
        ds = jnp.concatenate([dx_total, dz], axis=-1)    # (bb, V, C)
        du_conv = ds * _silu_grad(u)
        # pad_scr still holds [0 | xz | 0] from _pre_scan's conv
        dwconv_ref[...] += _conv3_tap_grads(pad_scr, du_conv, V)
        dxz = _same_conv3(pad_scr, du_conv, wconv_ref[...], V, transpose=True)
        dxz2 = dxz.reshape(bb * V, C)
        dwxz_ref[...] += _dot_tt(x_in.reshape(bb * V, cp), dxz2, dt)
        dxin = _dot_t(dxz2, wxz_ref[...], dt).reshape(bb, V, cp)
        if ln:
            dx, dgln, dbln = _ln_bwd(dxin, xhat, rstd, gln[0], n=C)
            dgln_ref[...] += dgln
            dbln_ref[...] += dbln
            dx = dx + do               # residual branch
        else:
            dx = dxin
        dx_ref[...] = dx.astype(dx_ref.dtype)

    return kernel


# --------------------------------------------------------------------------- #
# Host wrappers
# --------------------------------------------------------------------------- #

def _chunk_at(AT, Dc: int, n_j: int):
    """(N, Dh) -> (n_j, 8, N*Dc), chunk-j n-major rows, broadcast sublanes."""
    N, Dh = AT.shape
    pad = n_j * Dc - Dh
    a = jnp.pad(AT.astype(jnp.float32), ((0, 0), (0, pad)))
    a = a.reshape(N, n_j, Dc).transpose(1, 0, 2).reshape(n_j, 1, N * Dc)
    return jnp.broadcast_to(a, (n_j, 8, N * Dc))


def _shapes(x, wxz, wdbl, N):
    BW, V, cp = x.shape
    C = wxz.shape[1]          # real width; x may be lane-padded (cp >= C)
    Dh = C // 2
    R = wdbl.shape[1] - 2 * N
    Dc = _pick_chunk(N, Dh)
    n_j = -(-Dh // Dc)
    return BW, V, C, cp, Dh, R, Dc, n_j


def _weight_specs(C, Dh, R, N, nd, n_j, cp=None):
    cp = cp or C
    return [
        pl.BlockSpec((cp, C), lambda i: (0, 0)),
        pl.BlockSpec((3, C), lambda i: (0, 0)),
        pl.BlockSpec((Dh, R + 2 * N), lambda i: (0, 0)),
        pl.BlockSpec((R, Dh), lambda i: (0, 0)),
        pl.BlockSpec((1, Dh), lambda i: (0, 0)),
        pl.BlockSpec((n_j, 8, nd), lambda i: (0, 0, 0)),
        pl.BlockSpec((1, Dh), lambda i: (0, 0)),
        pl.BlockSpec((C, cp), lambda i: (0, 0)),
    ]


def _fwd(x, wxz, wconv, wdbl, wdt, dtb2, at_chunks, dskip, wout, N, ln=None):
    BW, V, C, cp, Dh, R, Dc, n_j = _shapes(x, wxz, wdbl, N)
    nd = N * Dc
    dt = x.dtype
    bb = _pick_bb(V, cp, N, n_j, Dc, bwd=False)
    pad = (-BW) % bb
    xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0))) if pad else x
    E, _ = _expand_reduce(N, Dc)
    Fn = _reduce_over_n(N, Dc)
    ln_specs = [pl.BlockSpec((1, cp), lambda i: (0, 0))] * 2 if ln else []

    out = pl.pallas_call(
        _make_fwd_kernel(V, C, Dh, R, N, Dc, n_j, dt, ln=ln is not None),
        grid=((BW + pad) // bb,),
        in_specs=[pl.BlockSpec((bb, V, cp), lambda i: (i, 0, 0))]
        + ln_specs
        + _weight_specs(C, Dh, R, N, nd, n_j, cp)
        + [
            pl.BlockSpec((N, nd), lambda i: (0, 0)),
            pl.BlockSpec((nd, Dc), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, V, cp), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BW + pad, V, cp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bb, 2 * V, C), jnp.float32),
            pltpu.VMEM((bb, V, n_j * Dc), jnp.float32),
            pltpu.VMEM((bb, V, n_j * Dc), jnp.float32),
            pltpu.VMEM((bb, V, n_j * Dc), jnp.float32),
            pltpu.VMEM((bb, V, nd), jnp.float32),
            pltpu.VMEM((bb, V, nd), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(xp, *(tuple(ln) if ln else ()), wxz, wconv, wdbl, wdt, dtb2, at_chunks,
      dskip, wout, E, Fn)
    return out[:BW]


def _bwd_impl(N, res, do, ln: bool):
    if ln:
        x, gln, bln, wxz, wconv, wdbl, wdt, dtb2, at_chunks, dskip, wout = res
        ln_args = (gln, bln)
    else:
        x, wxz, wconv, wdbl, wdt, dtb2, at_chunks, dskip, wout = res
        ln_args = ()
    BW, V, C, cp, Dh, R, Dc, n_j = _shapes(x, wxz, wdbl, N)
    nd = N * Dc
    dt = x.dtype
    bb = _pick_bb(V, cp, N, n_j, Dc, bwd=True)
    pad = (-BW) % bb
    xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0))) if pad else x
    dop = jnp.pad(do, ((0, pad), (0, 0), (0, 0))) if pad else do
    E, Fr = _expand_reduce(N, Dc)
    Fn = _reduce_over_n(N, Dc)

    vec_c = pl.BlockSpec((1, cp), lambda i: (0, 0))
    ln_specs = [vec_c, vec_c] if ln else []
    ln_out_shapes = ([jax.ShapeDtypeStruct((1, cp), jnp.float32)] * 2
                     if ln else [])

    outs = pl.pallas_call(
        _make_bwd_kernel(V, C, Dh, R, N, Dc, n_j, dt, ln=ln),
        grid=((BW + pad) // bb,),
        in_specs=[pl.BlockSpec((bb, V, cp), lambda i: (i, 0, 0))]
        + ln_specs
        + _weight_specs(C, Dh, R, N, nd, n_j, cp)
        + [
            pl.BlockSpec((N, nd), lambda i: (0, 0)),
            pl.BlockSpec((nd, Dc), lambda i: (0, 0)),
            pl.BlockSpec((nd, N), lambda i: (0, 0)),
            pl.BlockSpec((bb, V, cp), lambda i: (i, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((bb, V, cp), lambda i: (i, 0, 0))]
        + ln_specs
        + [
            pl.BlockSpec((cp, C), lambda i: (0, 0)),
            pl.BlockSpec((3, C), lambda i: (0, 0)),
            pl.BlockSpec((Dh, R + 2 * N), lambda i: (0, 0)),
            pl.BlockSpec((R, Dh), lambda i: (0, 0)),
            pl.BlockSpec((1, Dh), lambda i: (0, 0)),
            pl.BlockSpec((n_j, 8, nd), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, Dh), lambda i: (0, 0)),
            pl.BlockSpec((C, cp), lambda i: (0, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((BW + pad, V, cp), x.dtype)]
        + ln_out_shapes
        + [
            jax.ShapeDtypeStruct((cp, C), jnp.float32),
            jax.ShapeDtypeStruct((3, C), jnp.float32),
            jax.ShapeDtypeStruct((Dh, R + 2 * N), jnp.float32),
            jax.ShapeDtypeStruct((R, Dh), jnp.float32),
            jax.ShapeDtypeStruct((1, Dh), jnp.float32),
            jax.ShapeDtypeStruct((n_j, 8, nd), jnp.float32),
            jax.ShapeDtypeStruct((1, Dh), jnp.float32),
            jax.ShapeDtypeStruct((C, cp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bb, 2 * V, C), jnp.float32),
            pltpu.VMEM((bb, V, n_j * Dc), jnp.float32),
            pltpu.VMEM((bb, V, n_j * Dc), jnp.float32),
            pltpu.VMEM((bb, V, n_j * Dc), jnp.float32),
            pltpu.VMEM((bb, V, nd), jnp.float32),
            pltpu.VMEM((bb, V, nd), jnp.float32),
            pltpu.VMEM((bb, V, nd), jnp.float32),
            pltpu.VMEM((bb, V, nd), jnp.float32),
            pltpu.VMEM((bb, V, n_j * Dc), jnp.float32),
            pltpu.VMEM((bb, V, n_j * Dc), jnp.float32),
            pltpu.VMEM((bb, V, N), jnp.float32),
            pltpu.VMEM((bb, V, N), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(xp, *ln_args, wxz, wconv, wdbl, wdt, dtb2, at_chunks, dskip, wout,
      E, Fn, Fr, dop)

    if ln:
        (dx, dgln, dbln, dwxz, dwconv, dwdbl, dwdt, ddtb, dat, ddskip,
         dwout) = outs
        return (dx[:BW], dgln, dbln, dwxz.astype(wxz.dtype), dwconv,
                dwdbl.astype(wdbl.dtype), dwdt.astype(wdt.dtype), ddtb, dat,
                ddskip, dwout.astype(wout.dtype))
    (dx, dwxz, dwconv, dwdbl, dwdt, ddtb, dat, ddskip, dwout) = outs
    return (dx[:BW], dwxz.astype(wxz.dtype), dwconv,
            dwdbl.astype(wdbl.dtype), dwdt.astype(wdt.dtype), ddtb, dat,
            ddskip, dwout.astype(wout.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _mixer_core(x, wxz, wconv, wdbl, wdt, dtb2, at_chunks, dskip, wout, N):
    return _fwd(x, wxz, wconv, wdbl, wdt, dtb2, at_chunks, dskip, wout, N)


def _fwd_rule(x, wxz, wconv, wdbl, wdt, dtb2, at_chunks, dskip, wout, N):
    out = _fwd(x, wxz, wconv, wdbl, wdt, dtb2, at_chunks, dskip, wout, N)
    return out, (x, wxz, wconv, wdbl, wdt, dtb2, at_chunks, dskip, wout)


_mixer_core.defvjp(_fwd_rule,
                   lambda N, res, do: _bwd_impl(N, res, do, ln=False))


@functools.partial(jax.custom_vjp, nondiff_argnums=(11,))
def _mixer_core_ln(x, gln, bln, wxz, wconv, wdbl, wdt, dtb2, at_chunks,
                   dskip, wout, N):
    return _fwd(x, wxz, wconv, wdbl, wdt, dtb2, at_chunks, dskip, wout, N,
                ln=(gln, bln))


def _fwd_rule_ln(x, gln, bln, wxz, wconv, wdbl, wdt, dtb2, at_chunks,
                 dskip, wout, N):
    out = _fwd(x, wxz, wconv, wdbl, wdt, dtb2, at_chunks, dskip, wout, N,
               ln=(gln, bln))
    return out, (x, gln, bln, wxz, wconv, wdbl, wdt, dtb2, at_chunks,
                 dskip, wout)


_mixer_core_ln.defvjp(_fwd_rule_ln,
                      lambda N, res, do: _bwd_impl(N, res, do, ln=True))


def mamba_window_mixer(x, w_xz, w_conv_x, w_conv_z, w_dbl, w_dt, dt_bias,
                       A, D, w_out, d_state: int,
                       ln_scale=None, ln_bias=None):
    """Fused MambaVision window mixer, optionally with in-kernel pre-LN +
    residual.

    Args:
      x: (BW, V, C) windowed tokens, 16 <= V <= 64, V % 8 == 0.
      w_xz: (C, C) in_proj (expand=1, no bias).
      w_conv_x / w_conv_z: (C/2, 3) depthwise 'same' conv branches (no bias).
      w_dbl: (C/2, R + 2*d_state) x_proj (no bias).
      w_dt: (R, C/2); dt_bias: (C/2,) — applied twice (ref quirk: dt_proj
        bias AND selective_scan delta_bias).
      A: (C/2, d_state) negative decay matrix; D: (C/2,) skip.
      w_out: (C, C) out_proj (no bias).
      ln_scale/ln_bias: optional (C,) LayerNorm params. When given, computes
        x + mixer(LN(x)) — the whole pre-LN mixer half of a Swin block in one
        kernel (the composed LN / residual were 2 extra HBM passes each way).

    Returns (BW, V, C) in x.dtype.
    """
    c = w_xz.shape[1]
    cp = x.shape[-1]
    if cp != c:
        # lane-padded stage pipeline (see hyena_window_mixer): zero pad rows
        # of in_proj / cols of out_proj / LN params keep pad lanes exact zero
        w_xz = jnp.pad(w_xz, ((0, cp - c), (0, 0)))
        w_out = jnp.pad(w_out, ((0, 0), (0, cp - c)))
        if ln_scale is not None:
            ln_scale = jnp.pad(ln_scale, ((0, cp - c),))
            ln_bias = jnp.pad(ln_bias, ((0, cp - c),))
    Dh = c // 2
    Dc = _pick_chunk(d_state, Dh)
    n_j = -(-Dh // Dc)
    # conv taps row-major (3, C): tap[j] applies to x[t-1+j]
    wconv = jnp.concatenate([w_conv_x, w_conv_z], axis=0).astype(jnp.float32).T
    at_chunks = _chunk_at(A.astype(jnp.float32).T, Dc, n_j)
    dtb2 = 2.0 * dt_bias.astype(jnp.float32)[None, :]
    if ln_scale is not None:
        return _mixer_core_ln(x, ln_scale.astype(jnp.float32)[None, :],
                              ln_bias.astype(jnp.float32)[None, :],
                              w_xz, wconv, w_dbl, w_dt, dtb2, at_chunks,
                              D.astype(jnp.float32)[None, :], w_out, d_state)
    return _mixer_core(x, w_xz, wconv, w_dbl, w_dt, dtb2, at_chunks,
                       D.astype(jnp.float32)[None, :], w_out, d_state)
