"""Fused Pallas hyena window mixer (forward + custom VJP).

The whole HyenaOperator body for windowed call sites (ref:
model/models/hyena.py:306-360 invoked per-window from backbone_swin.py:361-365)
as ONE kernel: in_proj matmul -> short causal depthwise conv -> pre-gate ->
causal long conv (V-tap implicit filter) -> post-gate -> out_proj.

Why: the ptx/micro-class workloads are HBM-bound (measured 76% of v5e HBM
bandwidth, 10% MXU, on the ptx train step). The composed XLA path streams the
3C-wide projection through HBM ~6 times per mixer (in_proj out, conv in/out,
gate operands, long-conv in/out); fused, the only HBM traffic is x once in and
out once out — everything else lives in VMEM for a block of windows. The
matmuls run on the MXU in the input dtype (bf16 under AMP); gates and conv
taps accumulate in fp32.

The short (K-tap) causal conv is a shift-and-MAC sweep over a zero-padded
(block, 2V, C) VMEM scratch: shifted-by-m reads are static slices of the
scratch (Mosaic crashes on in-kernel jnp.pad/concatenate along the token
axis, and single-token loops would waste 7/8 sublanes).

The long (V-tap) conv has two in-kernel forms:
  - V <= 64: the same shift-and-MAC sweep (V taps).
  - 64 < V <= 512, V % 64 == 0 (the cmr/emb 512-token windows): V taps of
    VPU MACs would be ~8x the kernel's matmul FLOPs, so the conv runs as
    chunk-blocked Toeplitz MXU matmuls instead. The causal Toeplitz operator
    T[t,s,c]=k[t-s,c] is block-Toeplitz with 64x64 Toeplitz blocks that
    depend only on the chunk distance d=q-q', so only n=V/64 distinct
    (C,64,64) blocks M[d] exist; they are built OUTSIDE the kernel from the
    implicit filter (differentiably — autodiff carries dM back to the filter
    params) and y_chunk[q] = sum_d x_chunk[q-d] @ M[d] per channel. The
    per-channel batched matmuls need channel-major layout, so chunks are
    transposed VMEM-locally into a (C, n*bb, 64) scratch (rows chunk-major,
    making every d-shifted read/write a contiguous static slice).

Backward is one kernel per row block: recompute the forward intermediates,
then chain the transposed ops. Weight gradients accumulate across the 1D grid
sweep inside their VMEM-resident output blocks (constant index maps; TPU
grids execute sequentially).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_mlp import _ln_bwd, _ln_fwd

HYENA_WINDOW_MAX_LEN = 64
# chunk-blocked Toeplitz path (V > 64): chunk edge, V ceiling, channel ceiling
# (the M/dM VMEM blocks scale with C*V*chunk — C>192 stages keep the composed
# Toeplitz-matmul path, which is fine: stage cost falls 4x per stage).
# LCBI_HYENA_CHUNK overrides for sweeps (64 and 128 are the lowerable sizes).
import os as _os
HYENA_CHUNK_MIN = 64
HYENA_CHUNKED_MAX_LEN = 512
HYENA_CHUNKED_MAX_CHANNELS = 192


def _pick_chunk(V: int) -> int:
    """Toeplitz block edge. 128 when V allows: the per-channel batched dots
    then have a full-MXU-width (128) contraction AND output instead of the
    64-wide half-MXU form — measured at the emb/cmr V=512 shapes (r4 sweep,
    fwd+bwd): C=96 58.9 -> 43.4 ms, C=192 47.1 -> 36.9 ms, despite 11% more
    FLOPs from the coarser causal banding."""
    env = _os.environ.get("LCBI_HYENA_CHUNK")
    if env:
        return int(env)
    return 128 if V % 128 == 0 else HYENA_CHUNK_MIN


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _dm_mode() -> str:
    """How the chunked backward produces the Toeplitz-block gradient dM and
    the conv input gradient dgT (r5 anatomy, VERDICT r4 #1 — the per-lag
    in-kernel matmuls are contraction/output-starved: dM contracts over only
    (n-d)*bb <= 32 rows of the 128-deep MXU, dgT emits <= (n-d)*bb-row
    outputs):
      inkernel — per-lag matmuls accumulated in a VMEM dm_ref (r4 shipped)
      wide     — ONE lag-stacked matmul each for dM and dgT (K or output
                 dim = n*chunk = 512) via a shared (C, n*bb, n*chunk) scratch
                 and a lag-stacked-transposed mt input (measured no better
                 than per-lag: fill/drain was not the binding cost)
      stream   — dM not computed in-kernel at all: the recomputed gT and
                 dvlT stream to HBM and dM is a full-depth XLA contraction
                 outside (K = BW*(n-d) rows instead of <= 32); dgT stays
                 per-lag (no mt input / wide scratch — at C=192 those cost
                 ~28 MB of scoped VMEM and blew the 110M cap)
    Default picked by the r5 chip measurement at the emb stage-0 shape
    (4096x512x96, bb=8): inkernel 31.5 ms, wide 30.7, stream 21.2 in-kernel
    + 5.0 outside = -16% per call with exact (0.0000) dM agreement — see
    BASELINE.md "chunked hyena backward ATTACK"."""
    return _os.environ.get("LCBI_HYENA_DM_MODE", "stream")


def _compiler_params():
    # unrolled shift-MAC temporaries blow the default 16MB scoped VMEM cap;
    # raise it (v5e has 128MB; 110MB leaves headroom for the grid DMA
    # double-buffers Mosaic adds outside the scoped accounting — the chunked
    # bwd kernel at C=192 sits at ~99M scoped even at bb=1).
    # Lazy — see window_attention.py.
    if jax.default_backend() == "cpu":
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)


def hyena_window_supported(v: int, c: int | None = None) -> bool:
    # sublane-aligned window volumes only (auto-shrunk windows in deep stages
    # of tiny inputs can reach V=1; the composed XLA path handles those)
    if 8 <= v <= HYENA_WINDOW_MAX_LEN and v % 8 == 0:
        return True
    if c is None:
        return False
    return (v % HYENA_CHUNK_MIN == 0 and v <= HYENA_CHUNKED_MAX_LEN
            and c <= HYENA_CHUNKED_MAX_CHANNELS)


def _cap_rows(bb: int, bw: int) -> int:
    """Never pick a block taller than the (pow2-rounded-up) row count: the
    call pads BW up to a bb multiple, so bb > BW is pure padding work — a
    13x slowdown for the small interpret-mode parity tests (BW=5 padded to
    the 64-row block, with the chunked transposes looping over every row)."""
    cap = 8
    while cap < bw and cap < bb:
        cap *= 2
    return min(bb, cap)


def _pick_bb(V: int, C: int, bwd: bool, bw: int = 1 << 30) -> int:
    """Rows (windows) per grid block: the live fp32 set is ~14 C-wide token
    tiles (z/zc/zpad are 3C-wide) in fwd and ~2x that in bwd.

    Swept at the ptx stage-0 shape (65536x16x96, scripts/bench_fused_blocks.py):
    bb 64/128/256 time within 2% of each other (fwd 8.85/8.70/8.71 ms) and a
    48MB budget OOMs scoped VMEM (real usage ~2.4x this estimate) — grid
    overhead is NOT what holds this kernel off its roofline; keep the safe
    10MB budget. LCBI_HYENA_BB[_BWD] env vars override for sweeps."""
    import os
    env = os.environ.get("LCBI_HYENA_BB_BWD" if bwd else "LCBI_HYENA_BB")
    if env:
        return int(env)
    per_row = V * C * 4 * (28 if bwd else 14)
    budget = 10 * 1024 * 1024
    rows = max(budget // per_row, 8)
    bb = 8
    while bb * 2 <= rows and bb < 1024:
        bb *= 2
    return _cap_rows(bb, bw)


def _pick_bb_chunked(V: int, cp: int, bwd: bool, chunk: int,
                     bw: int = 1 << 30, C: int | None = None,
                     mode: str = "inkernel") -> int:
    """Rows per grid block for the chunked (V>64) kernels. The fp32 live set
    per row is ~16 (fwd) / ~30 (bwd) V*cp token tiles (z/zc/dzc are 3C-wide,
    zpad is 6C-wide; cp is the lane-padded stream width). The M (bf16 in) /
    dM (fp32 out) Toeplitz blocks are bb-independent but NOT free:
    n*C*chunk^2 = C*V*chunk bytes each, scaling with the REAL channel count
    C, not cp — the r5 anatomy caught the fixed term being charged at cp
    (12.6 MB overestimate at C=96/cp=128), which silently dropped the picked
    bb from 8 to 4 and left the shipped emb/cmr backward ~30% off the r4
    sweep's bb=8 result (57.3 vs 43.4 ms at the emb stage-0 shape). Ignoring
    the fixed term entirely is also wrong: it pushed the bwd kernel's scoped
    allocation to 109.8M (over the then-100M cap) at bb=2 in some
    surrounding-HLO contexts (the cmr/emb no-remat compiles, round 4). The
    bwd budget is set from the r4 chip sweep at V=512/chunk=128: bb=8 at
    C=96 (43.4 ms vs 58.9 at the old bb=4/chunk=64) and bb=2 at C=192 (36.9
    vs 47.1) — under the 110M Mosaic cap with ~2MB of grid DMA
    double-buffers outside the accounting. Env overrides
    LCBI_HYENA_BB[_BWD] apply here too (sweeps)."""
    import os
    env = os.environ.get("LCBI_HYENA_BB_BWD" if bwd else "LCBI_HYENA_BB")
    if env:
        return int(env)
    # fixed bytes/element over n*C*chunk^2 elements: m in (dt=2 under AMP),
    # + mt in (2, wide only) + dm out (fp32 4, unless streamed)
    mult = 2 if not bwd else {"inkernel": 6, "wide": 8, "stream": 2}[mode]
    fixed = (C or cp) * V * chunk * mult
    per_row = V * cp * 4 * (30 if bwd else 16)
    if bwd and mode == "wide":
        per_row += V * (C or cp) * 4          # (C, bb*n, n*chunk) wide scratch
    if bwd and mode == "stream":
        per_row += 2 * V * (C or cp) * 4      # gs/ds streamed out blocks
    budget = (105 if bwd else 48) * 1024 * 1024
    rows = max((budget - fixed) // per_row, 1)
    bb = 1
    while bb * 2 <= rows and bb < 64:
        bb *= 2
    return _cap_rows(bb, bw)


def _build_chunk_toeplitz(kl, chunk: int):
    """(V, C) causal filter (tap 0 = skip-folded) -> (n, C, chunk, chunk)
    block-Toeplitz matrices M[d][c, j, r] = kl[chunk*d + r - j, c] (zero
    outside [0, V)). Built with differentiable ops so the filter gradient
    flows through automatically (same trick as fftconv._toeplitz_conv_cm)."""
    import numpy as np
    V = kl.shape[0]
    n = V // chunk
    d_ = np.arange(n)[:, None, None]
    j_ = np.arange(chunk)[None, :, None]
    r_ = np.arange(chunk)[None, None, :]
    t = chunk * d_ + r_ - j_
    mask = jnp.asarray((t >= 0) & (t < V))
    idx = jnp.asarray(np.clip(t, 0, V - 1))
    m = jnp.where(mask[..., None], kl[idx], 0.0)   # (n, chunk, chunk, C)
    return jnp.moveaxis(m, -1, 1)                  # (n, C, chunk, chunk)


def _transpose_chunks_in(x, scr, bb: int, chunk: int, n: int, C: int):
    """(bb, V, C) -> channel-major (C, n*bb, chunk) scratch, rows chunk-major
    (row = q*bb + b) so chunk-distance slices are contiguous.

    Mosaic cannot reshape across the lane dim ((C, bb*chunk) -> (C, bb, chunk)
    is an "unsupported shape cast"), so the move is a 2D vector transpose
    followed by per-row lane slices (both probe-verified on v5e —
    scripts/probe_mosaic_layouts.py)."""
    for q in range(n):
        t = x[:, q * chunk:(q + 1) * chunk, :].reshape(bb * chunk, C).T
        for b in range(bb):
            scr[:, q * bb + b, :] = t[:, b * chunk:(b + 1) * chunk]


def _transpose_chunk_out(scr, q: int, bb: int, chunk: int, C: int):
    """One chunk of a (C, n*bb, chunk) scratch back to (bb, chunk, C).

    Lane-concat of the per-row slices rebuilds (C, bb*chunk) without the
    unsupported sublane->lane reshape; the transpose back splits sublanes
    only (supported)."""
    t = jnp.concatenate([scr[:, q * bb + b, :] for b in range(bb)], axis=1)
    return t.T.reshape(bb, chunk, C)


def _chunk_long_conv(g, m_ref, gT_scr, vlT_scr, bb, C, chunk, n, dt):
    """Causal depthwise long conv via chunk-blocked Toeplitz matmuls:
    vlT[q] = sum_{d<=q} gT[q-d] @ M[d], per channel. Leaves gT_scr holding
    g^T (the backward's dM pass reuses it)."""
    _transpose_chunks_in(g, gT_scr, bb, chunk, n, C)
    vlT_scr[...] = jnp.zeros_like(vlT_scr)
    for d in range(n):
        rows = (n - d) * bb
        acc = jax.lax.dot_general(
            gT_scr[:, :rows, :].astype(dt), m_ref[d].astype(dt),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        vlT_scr[:, d * bb:, :] += acc


def _causal_mac(pad_ref, x, taps, V: int):
    """y[t] = sum_m taps[m] * x[t-m] via a zero-padded scratch.

    pad_ref: (bb, 2V, W) VMEM scratch; x: (bb, V, W); taps: (M, W)."""
    pad_ref[:, :V, :] = jnp.zeros_like(x)
    pad_ref[:, V:, :] = x
    y = x * taps[0][None, None, :]
    for m in range(1, taps.shape[0]):
        y = y + pad_ref[:, V - m:2 * V - m, :] * taps[m][None, None, :]
    return y


def _causal_mac_t(pad_ref, dy, taps, V: int):
    """Transpose: dx[t] = sum_m taps[m] * dy[t+m] (zeros past the end)."""
    pad_ref[:, :V, :] = dy
    pad_ref[:, V:, :] = jnp.zeros_like(dy)
    dx = dy * taps[0][None, None, :]
    for m in range(1, taps.shape[0]):
        dx = dx + pad_ref[:, m:V + m, :] * taps[m][None, None, :]
    return dx


def _tap_grads(pad_ref, dy, x, M: int, V: int):
    """d taps[m] = sum_{b,t} dy[b,t] * x[b,t-m] -> (M, W).

    pad_ref already holds [zeros | x] from the matching _causal_mac call."""
    rows = [jnp.sum(dy * x, axis=(0, 1))[None, :]]
    for m in range(1, M):
        rows.append(jnp.sum(dy * pad_ref[:, V - m:2 * V - m, :],
                            axis=(0, 1))[None, :])
    return jnp.concatenate(rows, axis=0)


def _dot(a, b, dtype):
    return jax.lax.dot_general(a.astype(dtype), b.astype(dtype),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_t(a, b, dtype):
    """a @ b.T"""
    return jax.lax.dot_general(a.astype(dtype), b.astype(dtype),
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_tt(a, b, dtype):
    """a.T @ b"""
    return jax.lax.dot_general(a.astype(dtype), b.astype(dtype),
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


# --------------------------------------------------------------------------- #
# Forward
# --------------------------------------------------------------------------- #

def _fwd_body(x, win, bin_, ws, bs, kl, zpad_ref, gpad_ref, V, C, dt):
    """Shared fwd math on a (bb, V, C) — or lane-padded (bb, V, Cp) — fp32
    tile; returns intermediates. Pad lanes of x are exact zeros and win has
    zero pad rows, so every intermediate is identical to the unpadded math
    (intermediates stay 3C/C-wide real)."""
    bb, _, cp = x.shape
    z = _dot(x.reshape(bb * V, cp), win, dt).reshape(bb, V, 3 * C)
    z = z + bin_[0][None, None, :]
    zc = _causal_mac(zpad_ref, z, ws, V) + bs[0][None, None, :]
    x1 = zc[:, :, :C]
    x2 = zc[:, :, C:2 * C]
    v = zc[:, :, 2 * C:]
    g = v * x1
    vl = _causal_mac(gpad_ref, g, kl, V)
    v2 = vl * x2
    return z, zc, x1, x2, v, g, vl, v2


def _make_fwd_kernel(V, C, dt, ln: bool = False):
    """Forward kernel; with ln=True the signature gains (g, b) LayerNorm
    params after x and computes out = x + mixer(LN(x)) — the whole pre-LN
    mixer half of a Swin block in one kernel (LN read/write + residual
    read/add were separate HBM passes over the stage-0 tensor)."""

    def kernel(x_ref, *refs):
        if ln:
            (g_ref, bln_ref, win_ref, bin_ref, ws_ref, bs_ref, kl_ref,
             wo_ref, bo_ref, o_ref, zpad_scr, gpad_scr) = refs
        else:
            (win_ref, bin_ref, ws_ref, bs_ref, kl_ref, wo_ref, bo_ref,
             o_ref, zpad_scr, gpad_scr) = refs
        bb = x_ref.shape[0]
        cp = x_ref.shape[-1]
        x32 = x_ref[...].astype(jnp.float32)
        if ln:
            y, _, _ = _ln_fwd(x32, g_ref[0][None, None, :],
                              bln_ref[0][None, None, :], n=C)
        else:
            y = x32
        *_, v2 = _fwd_body(y, win_ref[...], bin_ref[...], ws_ref[...],
                           bs_ref[...], kl_ref[...], zpad_scr, gpad_scr,
                           V, C, dt)
        out = _dot(v2.reshape(bb * V, C), wo_ref[...], dt) + bo_ref[0][None, :]
        out = out.reshape(bb, V, cp)
        if ln:
            out = out + x32
        o_ref[...] = out.astype(o_ref.dtype)

    return kernel


def _weight_specs(C, K, V, cp=None):
    cp = cp or C
    return [
        pl.BlockSpec((cp, 3 * C), lambda i: (0, 0)),
        pl.BlockSpec((1, 3 * C), lambda i: (0, 0)),
        pl.BlockSpec((K, 3 * C), lambda i: (0, 0)),
        pl.BlockSpec((1, 3 * C), lambda i: (0, 0)),
        pl.BlockSpec((V, C), lambda i: (0, 0)),
    ]


def _fwd(x, win, bin_, ws, bs, kl, wo, bo, ln=None):
    BW, V, cp = x.shape
    C = win.shape[1] // 3
    dt = x.dtype
    bb = _pick_bb(V, cp, bwd=False, bw=BW)
    pad = (-BW) % bb
    xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0))) if pad else x
    grid = ((BW + pad) // bb,)
    K = ws.shape[0]

    ln_specs = ([pl.BlockSpec((1, cp), lambda i: (0, 0))] * 2 if ln else [])
    ln_args = tuple(ln) if ln else ()
    out = pl.pallas_call(
        _make_fwd_kernel(V, C, dt, ln=ln is not None),
        grid=grid,
        in_specs=[pl.BlockSpec((bb, V, cp), lambda i: (i, 0, 0))]
        + ln_specs
        + _weight_specs(C, K, V, cp)
        + [
            pl.BlockSpec((C, cp), lambda i: (0, 0)),
            pl.BlockSpec((1, cp), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, V, cp), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BW + pad, V, cp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bb, 2 * V, 3 * C), jnp.float32),
            pltpu.VMEM((bb, 2 * V, C), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(xp, *ln_args, win, bin_, ws, bs, kl, wo, bo)
    return out[:BW]


# --------------------------------------------------------------------------- #
# Backward
# --------------------------------------------------------------------------- #

def _make_bwd_kernel(V, C, K, dt, ln: bool = False):
    def kernel(x_ref, *refs):
        if ln:
            (g_ref, bln_ref, win_ref, bin_ref, ws_ref, bs_ref, kl_ref,
             wo_ref, do_ref, dx_ref, dgln_ref, dbln_ref, dwin_ref, dbin_ref,
             dws_ref, dbs_ref, dkl_ref, dwo_ref, dbo_ref,
             zpad_scr, gpad_scr, tpad_scr) = refs
        else:
            (win_ref, bin_ref, ws_ref, bs_ref, kl_ref, wo_ref, do_ref,
             dx_ref, dwin_ref, dbin_ref, dws_ref, dbs_ref, dkl_ref,
             dwo_ref, dbo_ref, zpad_scr, gpad_scr, tpad_scr) = refs
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            if ln:
                dgln_ref[...] = jnp.zeros_like(dgln_ref)
                dbln_ref[...] = jnp.zeros_like(dbln_ref)
            dwin_ref[...] = jnp.zeros_like(dwin_ref)
            dbin_ref[...] = jnp.zeros_like(dbin_ref)
            dws_ref[...] = jnp.zeros_like(dws_ref)
            dbs_ref[...] = jnp.zeros_like(dbs_ref)
            dkl_ref[...] = jnp.zeros_like(dkl_ref)
            dwo_ref[...] = jnp.zeros_like(dwo_ref)
            dbo_ref[...] = jnp.zeros_like(dbo_ref)

        bb = x_ref.shape[0]
        cp = x_ref.shape[-1]
        x32 = x_ref[...].astype(jnp.float32)
        if ln:
            gln = g_ref[0][None, None, :]
            y, xhat, rstd = _ln_fwd(x32, gln, bln_ref[0][None, None, :], n=C)
        else:
            y = x32
        win, bin_, ws, bs, kl = (win_ref[...], bin_ref[...], ws_ref[...],
                                 bs_ref[...], kl_ref[...])
        # recompute; zpad_scr holds [0|z], gpad_scr holds [0|g] afterwards
        z, zc, x1, x2, v, g, vl, v2 = _fwd_body(
            y, win, bin_, ws, bs, kl, zpad_scr, gpad_scr, V, C, dt)

        do = do_ref[...].astype(jnp.float32)
        do2d = do.reshape(bb * V, cp)
        dwo_ref[...] += _dot_tt(v2.reshape(bb * V, C), do2d, dt)
        dbo_ref[...] += jnp.sum(do2d, axis=0, keepdims=True)
        dv2 = _dot_t(do2d, wo_ref[...], dt).reshape(bb, V, C)

        dvl = dv2 * x2
        dx2 = dv2 * vl
        # gpad_scr still holds [0|g] from the forward recompute
        dkl_ref[...] += _tap_grads(gpad_scr, dvl, g, V, V)
        dg = _causal_mac_t(tpad_scr, dvl, kl, V)

        dv = dg * x1
        dx1 = dg * v
        dzc = jnp.concatenate([dx1, dx2, dv], axis=-1)      # (bb, V, 3C)

        dbs_ref[...] += jnp.sum(dzc, axis=(0, 1))[None, :]
        # zpad_scr still holds [0|z]
        dws_ref[...] += _tap_grads(zpad_scr, dzc, z, K, V)
        dz = _causal_mac_t(zpad_scr, dzc, ws, V)   # overwrites zpad afterwards

        dz2d = dz.reshape(bb * V, 3 * C)
        dbin_ref[...] += jnp.sum(dz2d, axis=0, keepdims=True)
        dwin_ref[...] += _dot_tt(y.reshape(bb * V, cp), dz2d, dt)
        dy = _dot_t(dz2d, win, dt).reshape(bb, V, cp)
        if ln:
            dx, dgln, dbln2 = _ln_bwd(dy, xhat, rstd, gln[0], n=C)
            dgln_ref[...] += dgln
            dbln_ref[...] += dbln2
            dx = dx + do           # residual branch
        else:
            dx = dy
        dx_ref[...] = dx.astype(dx_ref.dtype)

    return kernel


def _bwd_impl(res, do, ln: bool):
    if ln:
        x, gln, bln, win, bin_, ws, bs, kl, wo = res
        ln_args = (gln, bln)
    else:
        x, win, bin_, ws, bs, kl, wo = res
    BW, V, cp = x.shape
    C = win.shape[1] // 3
    dt = x.dtype
    K = ws.shape[0]
    bb = _pick_bb(V, cp, bwd=True, bw=BW)
    pad = (-BW) % bb
    xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0))) if pad else x
    dop = jnp.pad(do, ((0, pad), (0, 0), (0, 0))) if pad else do
    grid = ((BW + pad) // bb,)

    vec_c = pl.BlockSpec((1, cp), lambda i: (0, 0))
    ln_in_specs = [vec_c, vec_c] if ln else []
    ln_out_specs = [vec_c, vec_c] if ln else []
    ln_out_shapes = ([jax.ShapeDtypeStruct((1, cp), jnp.float32)] * 2
                     if ln else [])

    outs = pl.pallas_call(
        _make_bwd_kernel(V, C, K, dt, ln=ln),
        grid=grid,
        in_specs=[pl.BlockSpec((bb, V, cp), lambda i: (i, 0, 0))]
        + ln_in_specs
        + _weight_specs(C, K, V, cp)
        + [
            pl.BlockSpec((C, cp), lambda i: (0, 0)),
            pl.BlockSpec((bb, V, cp), lambda i: (i, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((bb, V, cp), lambda i: (i, 0, 0))]
        + ln_out_specs
        + [
            pl.BlockSpec((cp, 3 * C), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * C), lambda i: (0, 0)),
            pl.BlockSpec((K, 3 * C), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * C), lambda i: (0, 0)),
            pl.BlockSpec((V, C), lambda i: (0, 0)),
            pl.BlockSpec((C, cp), lambda i: (0, 0)),
            pl.BlockSpec((1, cp), lambda i: (0, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((BW + pad, V, cp), x.dtype)]
        + ln_out_shapes
        + [
            jax.ShapeDtypeStruct((cp, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((K, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((V, C), jnp.float32),
            jax.ShapeDtypeStruct((C, cp), jnp.float32),
            jax.ShapeDtypeStruct((1, cp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bb, 2 * V, 3 * C), jnp.float32),
            pltpu.VMEM((bb, 2 * V, C), jnp.float32),
            pltpu.VMEM((bb, 2 * V, C), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(xp, *(ln_args if ln else ()), win, bin_, ws, bs, kl, wo, dop)

    if ln:
        dx, dgln, dbln, dwin, dbin, dws, dbs, dkl, dwo, dbo = outs
        return (dx[:BW], dgln, dbln, dwin.astype(win.dtype), dbin, dws, dbs,
                dkl, dwo.astype(wo.dtype), dbo)
    dx, dwin, dbin, dws, dbs, dkl, dwo, dbo = outs
    # cotangents match the args as passed to _mixer_core (the wrapper's
    # flip/transpose/fold transforms outside the custom_vjp carry their own
    # transposes): biases/taps travel as fp32, projections in param dtype.
    return (dx[:BW], dwin.astype(win.dtype), dbin, dws, dbs, dkl,
            dwo.astype(wo.dtype), dbo)


@jax.custom_vjp
def _mixer_core(x, win, bin_, ws, bs, kl, wo, bo):
    return _fwd(x, win, bin_, ws, bs, kl, wo, bo)


def _fwd_rule(x, win, bin_, ws, bs, kl, wo, bo):
    out = _fwd(x, win, bin_, ws, bs, kl, wo, bo)
    return out, (x, win, bin_, ws, bs, kl, wo)


_mixer_core.defvjp(_fwd_rule, lambda res, do: _bwd_impl(res, do, ln=False))


@jax.custom_vjp
def _mixer_core_ln(x, gln, bln, win, bin_, ws, bs, kl, wo, bo):
    return _fwd(x, win, bin_, ws, bs, kl, wo, bo, ln=(gln, bln))


def _fwd_rule_ln(x, gln, bln, win, bin_, ws, bs, kl, wo, bo):
    out = _fwd(x, win, bin_, ws, bs, kl, wo, bo, ln=(gln, bln))
    return out, (x, gln, bln, win, bin_, ws, bs, kl, wo)


_mixer_core_ln.defvjp(_fwd_rule_ln, lambda res, do: _bwd_impl(res, do, ln=True))


# --------------------------------------------------------------------------- #
# Chunked (V > 64) variants: long conv as block-Toeplitz MXU matmuls
# --------------------------------------------------------------------------- #

def _make_fwd_kernel_chunked(V, C, dt, chunk, ln: bool = False):
    n = V // chunk

    def kernel(x_ref, *refs):
        if ln:
            (g_ref, bln_ref, win_ref, bin_ref, ws_ref, bs_ref, m_ref,
             wo_ref, bo_ref, o_ref, zpad_scr, gT_scr, vlT_scr) = refs
        else:
            (win_ref, bin_ref, ws_ref, bs_ref, m_ref, wo_ref, bo_ref,
             o_ref, zpad_scr, gT_scr, vlT_scr) = refs
        bb = x_ref.shape[0]
        cp = x_ref.shape[-1]
        x32 = x_ref[...].astype(jnp.float32)
        if ln:
            y, _, _ = _ln_fwd(x32, g_ref[0][None, None, :],
                              bln_ref[0][None, None, :], n=C)
        else:
            y = x32
        z = _dot(y.reshape(bb * V, cp), win_ref[...], dt).reshape(bb, V, 3 * C)
        z = z + bin_ref[0][None, None, :]
        zc = _causal_mac(zpad_scr, z, ws_ref[...], V) + bs_ref[0][None, None, :]
        x1 = zc[:, :, :C]
        x2 = zc[:, :, C:2 * C]
        v = zc[:, :, 2 * C:]
        g = v * x1
        _chunk_long_conv(g, m_ref, gT_scr, vlT_scr, bb, C, chunk, n, dt)
        wo = wo_ref[...]
        bo = bo_ref[0][None, :]
        for q in range(n):
            vl_q = _transpose_chunk_out(vlT_scr, q, bb, chunk, C)
            v2_q = vl_q * x2[:, q * chunk:(q + 1) * chunk, :]
            out_q = _dot(v2_q.reshape(bb * chunk, C), wo, dt) + bo
            out_q = out_q.reshape(bb, chunk, cp)
            if ln:
                out_q = out_q + x32[:, q * chunk:(q + 1) * chunk, :]
            o_ref[:, q * chunk:(q + 1) * chunk, :] = out_q.astype(o_ref.dtype)

    return kernel


def _chunked_weight_specs(C, K, n, chunk, cp=None):
    cp = cp or C
    return [
        pl.BlockSpec((cp, 3 * C), lambda i: (0, 0)),
        pl.BlockSpec((1, 3 * C), lambda i: (0, 0)),
        pl.BlockSpec((K, 3 * C), lambda i: (0, 0)),
        pl.BlockSpec((1, 3 * C), lambda i: (0, 0)),
        pl.BlockSpec((n, C, chunk, chunk), lambda i: (0, 0, 0, 0)),
    ]


def _fwd_chunked(x, win, bin_, ws, bs, m, wo, bo, ln=None):
    BW, V, cp = x.shape
    C = win.shape[1] // 3
    dt = x.dtype
    chunk = m.shape[-1]
    n = V // chunk
    bb = _pick_bb_chunked(V, cp, bwd=False, chunk=chunk, bw=BW, C=C)
    pad = (-BW) % bb
    xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0))) if pad else x
    grid = ((BW + pad) // bb,)
    K = ws.shape[0]

    ln_specs = ([pl.BlockSpec((1, cp), lambda i: (0, 0))] * 2 if ln else [])
    ln_args = tuple(ln) if ln else ()
    out = pl.pallas_call(
        _make_fwd_kernel_chunked(V, C, dt, chunk, ln=ln is not None),
        grid=grid,
        in_specs=[pl.BlockSpec((bb, V, cp), lambda i: (i, 0, 0))]
        + ln_specs
        + _chunked_weight_specs(C, K, n, chunk, cp)
        + [
            pl.BlockSpec((C, cp), lambda i: (0, 0)),
            pl.BlockSpec((1, cp), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, V, cp), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BW + pad, V, cp), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bb, 2 * V, 3 * C), jnp.float32),
            pltpu.VMEM((C, n * bb, chunk), jnp.float32),
            pltpu.VMEM((C, n * bb, chunk), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(xp, *ln_args, win, bin_, ws, bs, m, wo, bo)
    return out[:BW]


def _make_bwd_kernel_chunked(V, C, K, dt, chunk, ln: bool = False,
                             mode: str = "inkernel"):
    n = V // chunk

    def kernel(x_ref, *refs):
        refs = list(refs)
        if ln:
            g_ref, bln_ref = refs[:2]
            del refs[:2]
        win_ref, bin_ref, ws_ref, bs_ref, m_ref = refs[:5]
        del refs[:5]
        mt_ref = refs.pop(0) if mode == "wide" else None
        wo_ref, do_ref, dx_ref = refs[:3]
        del refs[:3]
        if ln:
            dgln_ref, dbln_ref = refs[:2]
            del refs[:2]
        dwin_ref, dbin_ref, dws_ref, dbs_ref = refs[:4]
        del refs[:4]
        if mode == "stream":
            gs_ref, ds_ref = refs[:2]
            del refs[:2]
            dm_ref = None
        else:
            dm_ref = refs.pop(0)
        dwo_ref, dbo_ref = refs[:2]
        del refs[:2]
        zpad_scr, gT_scr, vlT_scr, dvlT_scr, dgT_scr, tok_scr = refs[:6]
        wide_scr = refs[6] if mode == "wide" else None
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            if ln:
                dgln_ref[...] = jnp.zeros_like(dgln_ref)
                dbln_ref[...] = jnp.zeros_like(dbln_ref)
            dwin_ref[...] = jnp.zeros_like(dwin_ref)
            dbin_ref[...] = jnp.zeros_like(dbin_ref)
            dws_ref[...] = jnp.zeros_like(dws_ref)
            dbs_ref[...] = jnp.zeros_like(dbs_ref)
            if dm_ref is not None:
                dm_ref[...] = jnp.zeros_like(dm_ref)
            dwo_ref[...] = jnp.zeros_like(dwo_ref)
            dbo_ref[...] = jnp.zeros_like(dbo_ref)

        bb = x_ref.shape[0]
        cp = x_ref.shape[-1]
        x32 = x_ref[...].astype(jnp.float32)
        if ln:
            gln = g_ref[0][None, None, :]
            y, xhat, rstd = _ln_fwd(x32, gln, bln_ref[0][None, None, :], n=C)
        else:
            y = x32
        win, bin_, ws, bs = (win_ref[...], bin_ref[...], ws_ref[...],
                             bs_ref[...])
        # recompute the forward; zpad_scr holds [0|z], gT_scr holds g^T after
        z = _dot(y.reshape(bb * V, cp), win, dt).reshape(bb, V, 3 * C)
        z = z + bin_[0][None, None, :]
        zc = _causal_mac(zpad_scr, z, ws, V) + bs[0][None, None, :]
        x1 = zc[:, :, :C]
        x2 = zc[:, :, C:2 * C]
        v = zc[:, :, 2 * C:]
        g = v * x1
        _chunk_long_conv(g, m_ref, gT_scr, vlT_scr, bb, C, chunk, n, dt)
        for q in range(n):
            tok_scr[:, q * chunk:(q + 1) * chunk, :] = \
                _transpose_chunk_out(vlT_scr, q, bb, chunk, C)
        vl = tok_scr[...]
        v2 = vl * x2

        do = do_ref[...].astype(jnp.float32)
        do2d = do.reshape(bb * V, cp)
        dwo_ref[...] += _dot_tt(v2.reshape(bb * V, C), do2d, dt)
        dbo_ref[...] += jnp.sum(do2d, axis=0, keepdims=True)
        dv2 = _dot_t(do2d, wo_ref[...], dt).reshape(bb, V, C)

        dvl = dv2 * x2
        dx2 = dv2 * vl
        _transpose_chunks_in(dvl, dvlT_scr, bb, chunk, n, C)
        if mode == "wide":
            # lag-stacked dvlT: wide[c, row, d*chunk+r] = dvlT[c, row+d*bb, r]
            # (zeros past the causal band) — shared by the wide dM and wide
            # dgT matmuls
            wide_scr[...] = jnp.zeros_like(wide_scr)
            for d in range(n):
                rows = (n - d) * bb
                wide_scr[:, :rows, d * chunk:(d + 1) * chunk] = \
                    dvlT_scr[:, d * bb:, :]
        if mode == "stream":
            # dM leaves the kernel: stream the operands, contract outside at
            # full depth (K = BW*(n-d) instead of <= n*bb). C-leading global
            # layout (C, G, rows, chunk): the XLA dots batch over C, so this
            # is their preferred operand order — the (G, C, ...) layout cost
            # ~13 ms/step of C-hoisting copies in the emb profile.
            gs_ref[:, 0] = gT_scr[...].astype(gs_ref.dtype)
            ds_ref[:, 0] = dvlT_scr[...].astype(ds_ref.dtype)
        elif mode == "wide":
            # ONE matmul for all lags; K = n*bb but a single fill/drain
            dmw = jax.lax.dot_general(
                gT_scr[...].astype(dt), wide_scr[...].astype(dt),
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            for d in range(n):
                dm_ref[d] += dmw[:, :, d * chunk:(d + 1) * chunk]
        else:
            for d in range(n):
                rows = (n - d) * bb
                # dM[d][c,j,r] = sum_rows gT[c,row,j] dvlT[c,row+d*bb,r]
                dm_ref[d] += jax.lax.dot_general(
                    gT_scr[:, :rows, :].astype(dt),
                    dvlT_scr[:, d * bb:, :].astype(dt),
                    (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
        if mode == "wide":
            # dgT = wide @ mt in ONE matmul: K = n*chunk = 512 (the per-lag
            # form emits <= (n-d)*bb-row outputs per call)
            dgT_scr[...] = jax.lax.dot_general(
                wide_scr[...].astype(dt), mt_ref[...].astype(dt),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
        else:
            dgT_scr[...] = jnp.zeros_like(dgT_scr)
            for d in range(n):
                rows = (n - d) * bb
                # dgT[c,row,j] += sum_r dvlT[c,row+d*bb,r] M[d][c,j,r]
                dgT_scr[:, :rows, :] += jax.lax.dot_general(
                    dvlT_scr[:, d * bb:, :].astype(dt), m_ref[d].astype(dt),
                    (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
        for q in range(n):
            tok_scr[:, q * chunk:(q + 1) * chunk, :] = \
                _transpose_chunk_out(dgT_scr, q, bb, chunk, C)
        dg = tok_scr[...]

        dv = dg * x1
        dx1 = dg * v
        dzc = jnp.concatenate([dx1, dx2, dv], axis=-1)      # (bb, V, 3C)

        dbs_ref[...] += jnp.sum(dzc, axis=(0, 1))[None, :]
        # zpad_scr still holds [0|z]
        dws_ref[...] += _tap_grads(zpad_scr, dzc, z, K, V)
        dz = _causal_mac_t(zpad_scr, dzc, ws, V)

        dz2d = dz.reshape(bb * V, 3 * C)
        dbin_ref[...] += jnp.sum(dz2d, axis=0, keepdims=True)
        dwin_ref[...] += _dot_tt(y.reshape(bb * V, cp), dz2d, dt)
        dy = _dot_t(dz2d, win, dt).reshape(bb, V, cp)
        if ln:
            dx, dgln, dbln2 = _ln_bwd(dy, xhat, rstd, gln[0], n=C)
            dgln_ref[...] += dgln
            dbln_ref[...] += dbln2
            dx = dx + do
        else:
            dx = dy
        dx_ref[...] = dx.astype(dx_ref.dtype)

    return kernel


def _dm_reduce_pallas(gs, ds, n: int, bb: int, chunk: int):
    """dM from the streamed gT/dvlT: dm[d][c,j,r] = sum over (block g, row
    r' < (n-d)*bb) of gs[c,g,r',j] * ds[c,g,r'+d*bb,r].

    The XLA dot on the sliced operands repacks 402 MB per lag at ~12 TF/s
    (~20 ms/step of dot fusions + copies in the emb r5 profile). Here gg
    grid-blocks sit in VMEM at once and per-lag contiguous packs give each
    dot K = gg*(n-d)*bb (up to 256) on the MXU, reading the streams once.
    """
    C, G, R, J = gs.shape
    dt = gs.dtype
    gg = 8
    while gg > 1 and G % gg:
        gg //= 2

    def kernel(gs_ref, ds_ref, dm_ref, lhs_scr, rhs_scr):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            dm_ref[...] = jnp.zeros_like(dm_ref)

        for d in range(n):
            rows = (n - d) * bb
            for g in range(gg):
                lhs_scr[:, g * rows:(g + 1) * rows, :] = gs_ref[:, g, :rows, :]
                rhs_scr[:, g * rows:(g + 1) * rows, :] = \
                    ds_ref[:, g, d * bb:, :]
            dm_ref[d] += jax.lax.dot_general(
                lhs_scr[:, :gg * rows, :], rhs_scr[:, :gg * rows, :],
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)

    return pl.pallas_call(
        kernel,
        grid=(G // gg,),
        in_specs=[pl.BlockSpec((C, gg, R, J), lambda i: (0, i, 0, 0))] * 2,
        out_specs=pl.BlockSpec((n, C, J, J), lambda i: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, C, J, J), jnp.float32),
        scratch_shapes=[pltpu.VMEM((C, gg * R, J), dt),
                        pltpu.VMEM((C, gg * R, J), dt)],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(gs, ds)


def _bwd_impl_chunked(res, do, ln: bool):
    if ln:
        x, gln, bln, win, bin_, ws, bs, m, wo = res
        ln_args = (gln, bln)
    else:
        x, win, bin_, ws, bs, m, wo = res
    BW, V, cp = x.shape
    C = win.shape[1] // 3
    dt = x.dtype
    K = ws.shape[0]
    chunk = m.shape[-1]
    n = V // chunk
    mode = _dm_mode()
    bb = _pick_bb_chunked(V, cp, bwd=True, chunk=chunk, bw=BW, C=C, mode=mode)
    pad = (-BW) % bb
    xp = jnp.pad(x, ((0, pad), (0, 0), (0, 0))) if pad else x
    dop = jnp.pad(do, ((0, pad), (0, 0), (0, 0))) if pad else do
    G = (BW + pad) // bb
    grid = (G,)

    vec_c = pl.BlockSpec((1, cp), lambda i: (0, 0))
    ln_in_specs = [vec_c, vec_c] if ln else []
    ln_out_specs = [vec_c, vec_c] if ln else []
    ln_out_shapes = ([jax.ShapeDtypeStruct((1, cp), jnp.float32)] * 2
                     if ln else [])

    if mode == "wide":
        # lag-stacked transpose of the Toeplitz blocks for the wide dgT
        # matmul: mt[c, d*chunk + r, j] = m[d][c, j, r]
        mt_args = (jnp.moveaxis(m, 0, 1).swapaxes(-1, -2)
                   .reshape(C, n * chunk, chunk),)
        mt_specs = [pl.BlockSpec((C, n * chunk, chunk), lambda i: (0, 0, 0))]
        wide_scr = [pltpu.VMEM((C, n * bb, n * chunk), jnp.float32)]
    else:
        mt_args, mt_specs, wide_scr = (), [], []

    if mode == "stream":
        mid_specs = [pl.BlockSpec((C, 1, n * bb, chunk),
                                  lambda i: (0, i, 0, 0))] * 2
        mid_shapes = [jax.ShapeDtypeStruct((C, G, n * bb, chunk), dt)] * 2
    else:
        mid_specs = [pl.BlockSpec((n, C, chunk, chunk),
                                  lambda i: (0, 0, 0, 0))]
        mid_shapes = [jax.ShapeDtypeStruct((n, C, chunk, chunk), jnp.float32)]

    outs = pl.pallas_call(
        _make_bwd_kernel_chunked(V, C, K, dt, chunk, ln=ln, mode=mode),
        grid=grid,
        in_specs=[pl.BlockSpec((bb, V, cp), lambda i: (i, 0, 0))]
        + ln_in_specs
        + _chunked_weight_specs(C, K, n, chunk, cp)
        + mt_specs
        + [
            pl.BlockSpec((C, cp), lambda i: (0, 0)),
            pl.BlockSpec((bb, V, cp), lambda i: (i, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((bb, V, cp), lambda i: (i, 0, 0))]
        + ln_out_specs
        + [
            pl.BlockSpec((cp, 3 * C), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * C), lambda i: (0, 0)),
            pl.BlockSpec((K, 3 * C), lambda i: (0, 0)),
            pl.BlockSpec((1, 3 * C), lambda i: (0, 0)),
        ]
        + mid_specs
        + [
            pl.BlockSpec((C, cp), lambda i: (0, 0)),
            pl.BlockSpec((1, cp), lambda i: (0, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((BW + pad, V, cp), x.dtype)]
        + ln_out_shapes
        + [
            jax.ShapeDtypeStruct((cp, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((K, 3 * C), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
        ]
        + mid_shapes
        + [
            jax.ShapeDtypeStruct((C, cp), jnp.float32),
            jax.ShapeDtypeStruct((1, cp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bb, 2 * V, 3 * C), jnp.float32),
            pltpu.VMEM((C, n * bb, chunk), jnp.float32),
            pltpu.VMEM((C, n * bb, chunk), jnp.float32),
            pltpu.VMEM((C, n * bb, chunk), jnp.float32),
            pltpu.VMEM((C, n * bb, chunk), jnp.float32),
            pltpu.VMEM((bb, V, C), jnp.float32),
        ] + wide_scr,
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(xp, *(ln_args if ln else ()), win, bin_, ws, bs, m, *mt_args, wo, dop)

    if ln:
        dx, dgln, dbln, dwin, dbin, dws, dbs, *mid, dwo, dbo = outs
    else:
        dx, dwin, dbin, dws, dbs, *mid, dwo, dbo = outs
    if mode == "stream":
        gs, ds = mid
        # full-depth dM outside the kernel: per lag d, contract the (grid,
        # rows) axes jointly — K = BW*(n-d) rows on the MXU. (A masked
        # full-length variant — C-leading transpose + zero-padded shifted
        # rhs, no row slices — measured WORSE in-step: emb 302.6 vs 281.9
        # ms/step, the per-lag 402 MB pad materializations cost more than
        # XLA's dot packing of the sliced operands.)
        if _os.environ.get("LCBI_HYENA_DM_REDUCER", "1") != "0":
            dm = _dm_reduce_pallas(gs, ds, n, bb, chunk)
        else:
            dm = jnp.stack([
                jax.lax.dot_general(
                    gs[:, :, :(n - d) * bb, :], ds[:, :, d * bb:, :],
                    (((1, 2), (1, 2)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                for d in range(n)])
    else:
        (dm,) = mid
    if ln:
        return (dx[:BW], dgln, dbln, dwin.astype(win.dtype), dbin, dws, dbs,
                dm.astype(m.dtype), dwo.astype(wo.dtype), dbo)
    return (dx[:BW], dwin.astype(win.dtype), dbin, dws, dbs,
            dm.astype(m.dtype), dwo.astype(wo.dtype), dbo)


@jax.custom_vjp
def _mixer_core_chunked(x, win, bin_, ws, bs, m, wo, bo):
    return _fwd_chunked(x, win, bin_, ws, bs, m, wo, bo)


def _fwd_rule_chunked(x, win, bin_, ws, bs, m, wo, bo):
    out = _fwd_chunked(x, win, bin_, ws, bs, m, wo, bo)
    return out, (x, win, bin_, ws, bs, m, wo)


_mixer_core_chunked.defvjp(
    _fwd_rule_chunked, lambda res, do: _bwd_impl_chunked(res, do, ln=False))


@jax.custom_vjp
def _mixer_core_chunked_ln(x, gln, bln, win, bin_, ws, bs, m, wo, bo):
    return _fwd_chunked(x, win, bin_, ws, bs, m, wo, bo, ln=(gln, bln))


def _fwd_rule_chunked_ln(x, gln, bln, win, bin_, ws, bs, m, wo, bo):
    out = _fwd_chunked(x, win, bin_, ws, bs, m, wo, bo, ln=(gln, bln))
    return out, (x, gln, bln, win, bin_, ws, bs, m, wo)


_mixer_core_chunked_ln.defvjp(
    _fwd_rule_chunked_ln, lambda res, do: _bwd_impl_chunked(res, do, ln=True))


def hyena_window_mixer(x, w_in, b_in, w_short, b_short, k_long, b_long,
                       w_out, b_out, ln_scale=None, ln_bias=None):
    """Fused hyena window mixer, optionally with in-kernel pre-LN + residual.

    Args:
      x: (BW, V, C) windowed tokens; V <= 64 runs the tap kernel, larger
        sublane-aligned V (<= 512, C <= 192) the chunked-Toeplitz kernel —
        gate call sites with hyena_window_supported(V, C).
      w_in: (C, 3C) in_proj kernel; b_in: (3C,).
      w_short: (3C, K) short depthwise causal filter; b_short: (3C,).
      k_long: (C, V) implicit long filter (channel-major like the composed
        path's k_full); b_long: (C,) fftconv skip weight.
      w_out: (C, C); b_out: (C,).
      ln_scale/ln_bias: optional (C,) LayerNorm params. When given, computes
        x + mixer(LN(x)) — the whole pre-LN mixer half of a Swin block in one
        kernel (the composed LN / residual were 2 extra HBM passes each way).

    Returns (BW, V, C) in x.dtype. Matches
    out_proj(postgate(L(pregate(conv(in_proj(x)))))) of the composed path
    (fp32 accumulation for convs/gates; matmuls in x.dtype on the MXU).

    Lane padding: x may arrive as (BW, V, Cp) with Cp a 128-multiple > C and
    exact zeros in the pad lanes (the Swin stage pipeline pads 96->128 /
    192->256 — Pallas block DMAs at non-128-multiple widths measured
    ~180 GB/s vs 500-650 on v5e, scripts/probe_copy_bw.py). The projections
    and LN params are zero-padded here, which keeps output pad lanes exact
    zeros; intermediates stay real-C-wide in VMEM.
    """
    cp = x.shape[-1]
    c = w_in.shape[0]
    if cp != c:
        w_in = jnp.pad(w_in, ((0, cp - c), (0, 0)))
        w_out = jnp.pad(w_out, ((0, 0), (0, cp - c)))
        b_out = jnp.pad(b_out, ((0, cp - c),))
        if ln_scale is not None:
            ln_scale = jnp.pad(ln_scale, ((0, cp - c),))
            ln_bias = jnp.pad(ln_bias, ((0, cp - c),))
    # causal MAC taps: tap[m] = w[:, K-1-m] (the composed op correlates with
    # the flipped kernel; conv.py:depthwise_conv1d_cm)
    ws = jnp.flip(w_short.astype(jnp.float32).T, axis=0)        # (K, 3C)
    # long conv taps are k rows; the skip term bias*u is the tau=0 tap
    kl = k_long.astype(jnp.float32).T                            # (V, C)
    kl = kl.at[0].add(b_long.astype(jnp.float32))
    V = x.shape[1]
    if V > HYENA_WINDOW_MAX_LEN:
        # block-Toeplitz operator in the matmul dtype (halves its VMEM
        # footprint under AMP; the kernel's dots run in x.dtype regardless)
        m = _build_chunk_toeplitz(kl, _pick_chunk(V)).astype(x.dtype)
        if ln_scale is not None:
            return _mixer_core_chunked_ln(
                x, ln_scale.astype(jnp.float32)[None, :],
                ln_bias.astype(jnp.float32)[None, :],
                w_in, b_in.astype(jnp.float32)[None, :],
                ws, b_short.astype(jnp.float32)[None, :], m,
                w_out, b_out.astype(jnp.float32)[None, :])
        return _mixer_core_chunked(
            x, w_in, b_in.astype(jnp.float32)[None, :],
            ws, b_short.astype(jnp.float32)[None, :], m,
            w_out, b_out.astype(jnp.float32)[None, :])
    if ln_scale is not None:
        return _mixer_core_ln(
            x, ln_scale.astype(jnp.float32)[None, :],
            ln_bias.astype(jnp.float32)[None, :],
            w_in, b_in.astype(jnp.float32)[None, :],
            ws, b_short.astype(jnp.float32)[None, :], kl,
            w_out, b_out.astype(jnp.float32)[None, :])
    return _mixer_core(x, w_in, b_in.astype(jnp.float32)[None, :],
                       ws, b_short.astype(jnp.float32)[None, :], kl,
                       w_out, b_out.astype(jnp.float32)[None, :])
