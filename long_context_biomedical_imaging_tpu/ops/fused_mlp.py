"""Fused Pallas transformer MLP (forward + custom VJP).

out = gelu_exact(x @ W1 + b1) @ W2 + b2 for the pre-LN transformer blocks
(ref: MONAI MLPBlock used at backbone_vit.py:250 / backbone_swin.py:489-490).

Why: the flagship workloads are HBM-bound (BASELINE.md round-2 roofline). The
composed path writes and re-reads the 4C-wide hidden activation in the
forward AND stores it for the backward — ~10 C-wide HBM passes per block.
Fused, the hidden lives in VMEM and the backward recomputes it from x: HBM
traffic is x in / out out (+ dx, do in the backward).

Matmuls run on the MXU in the input dtype (bf16 under AMP) with fp32
accumulation; GELU is exact-erf for fp32 and the tanh form for bf16 (see
_gelu — the difference is below the bf16 ULP of the value the kernel casts
the activation to, and erf's rational poly costs +2.8 ms per fwd call).
Weight gradients accumulate across the 1D grid sweep in their VMEM-resident
output blocks (TPU grids are sequential).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _compiler_params():
    if jax.default_backend() == "cpu":
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _pick_bn(C: int, H: int, bwd: bool) -> int:
    """Token rows per grid block: live fp32 set ~3 H-wide + ~3 C-wide tiles
    (double in bwd), plus the weight blocks.

    Swept at the Swin stage-0 shape (1M tokens, C=96; bench_fused_blocks.py):
    fwd 5.7/5.2/5.2/5.25/5.24 ms at bn 512..8192 and fwd+bwd flat 12.3-14 ms —
    block size is a ~5% lever at most. 16MB budget picks bn=2048 fwd /
    1024 bwd, near the measured best without risking scoped-VMEM OOM.
    LCBI_MLP_BN[_BWD] env vars override for sweeps."""
    import os
    env = os.environ.get("LCBI_MLP_BN_BWD" if bwd else "LCBI_MLP_BN")
    if env:
        return int(env)
    per_row = 4 * (3 * H + 3 * C) * (2 if bwd else 1)
    budget = 16 * 1024 * 1024
    rows = max(budget // per_row, 64)
    bn = 64
    while bn * 2 <= rows and bn < 8192:
        bn *= 2
    return bn


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


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs err 1.5e-7 — exact at
    fp32 granularity). Mosaic has no erf lowering, so it is built from exp."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


_TANH_C0 = math.sqrt(2.0 / math.pi)
_TANH_C1 = 0.044715


def _gelu(u, dt=jnp.bfloat16):
    """GELU on a fp32 tile.

    bf16 compute dtype uses the tanh form: its error vs exact erf (<=1e-3 abs,
    largest near |u|~2 where |gelu|~2) is below the bf16 ULP of the result the
    kernel immediately casts to for the second matmul — numerically
    indistinguishable at the output precision, and the erf rational poly
    (sign/abs/reciprocal/exp chain) measured +2.8 ms per fwd call at the Swin
    stage-0 volume vs ~0 for tanh (scripts/bench_kernel_anatomy.py --op mlp:
    matmuls 2.72 / tanh 2.64 / erf 5.51 ms). fp32 keeps the exact erf form,
    matching nn.gelu(approximate=False)."""
    if dt == jnp.float32:
        return 0.5 * u * (1.0 + _erf(u * _INV_SQRT2))
    inner = jnp.tanh(_TANH_C0 * (u + _TANH_C1 * u * u * u))
    return 0.5 * u * (1.0 + inner)


def _gelu_grad(u, dt=jnp.bfloat16):
    if dt == jnp.float32:
        cdf = 0.5 * (1.0 + _erf(u * _INV_SQRT2))
        pdf = _INV_SQRT2PI * jnp.exp(-0.5 * u * u)
        return cdf + u * pdf
    # analytic derivative of the tanh form
    th = jnp.tanh(_TANH_C0 * (u + _TANH_C1 * u * u * u))
    sech2 = 1.0 - th * th
    return 0.5 * (1.0 + th) + 0.5 * u * sech2 * _TANH_C0 * (
        1.0 + 3.0 * _TANH_C1 * u * u)


def _make_fwd_kernel(dt):
    def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
        x = x_ref[...]
        u = _dot(x, w1_ref[...], dt) + b1_ref[0][None, :]
        h = _gelu(u, dt)
        out = _dot(h, w2_ref[...], dt) + b2_ref[0][None, :]
        o_ref[...] = out.astype(o_ref.dtype)

    return kernel


_LN_EPS = 1e-6  # flax nn.LayerNorm default (the composed path this replaces)


def _ln_fwd(x32, g, b, n: int | None = None):
    """LayerNorm over the last axis in fp32 (fast-variance form, flax parity).

    n: real channel count when the lane axis is zero-padded past it (the
    lane-padded kernel pipeline: stage tensors pad 96->128 / 192->256 so the
    Pallas block DMAs ride the contiguous path — measured 180 vs 500-650 GB/s
    for 96/192-lane vs 128-multiple blocks on v5e). Pad lanes are exact zeros,
    so sums are unaffected; only the divisor must be the real count. Pad
    lanes of the OUTPUT are zeroed by the zero-padded g/b.

    Returns (y, xhat, rstd)."""
    if n is None:
        n = x32.shape[-1]
    inv = 1.0 / n
    mu = jnp.sum(x32, axis=-1, keepdims=True) * inv
    var = jnp.sum(x32 * x32, axis=-1, keepdims=True) * inv - mu * mu
    rstd = jax.lax.rsqrt(var + _LN_EPS)
    xhat = (x32 - mu) * rstd
    return xhat * g + b, xhat, rstd


def fast_layernorm(x, scale, bias):
    """LayerNorm over the last axis, fp32 stats, result in x.dtype.

    The ONE shared definition of the fast-variance LN the fused kernels use
    in-kernel (_ln_fwd): the composed mixer/MLP fallbacks
    (models/{hyena,mamba,layers}.py) call this so fused-vs-composed parity
    cannot drift if the eps or variance form ever changes."""
    y, _, _ = _ln_fwd(x.astype(jnp.float32), scale.astype(jnp.float32),
                      bias.astype(jnp.float32))
    return y.astype(x.dtype)


def _ln_bwd(dy, xhat, rstd, g, n: int | None = None):
    """dx of LayerNorm given upstream dy; also returns (dgamma, dbeta) summed
    over all leading axes.

    n: real channel count under lane padding (see _ln_fwd). dy pad lanes are
    exact zeros at every call site (they come through zero weight columns),
    so the sums are exact; dx pad lanes pick up the -m1 - xhat*m2 terms — a
    harmless nonzero that every downstream consumer kills via zero weight
    rows, and that the stage-entry pad's transpose finally slices off."""
    if n is None:
        n = dy.shape[-1]
    inv = 1.0 / n
    red = tuple(range(dy.ndim - 1))
    dg = jnp.sum(dy * xhat, axis=red)[None, :]
    db = jnp.sum(dy, axis=red)[None, :]
    dxhat = dy * g
    m1 = jnp.sum(dxhat, axis=-1, keepdims=True) * inv
    m2 = jnp.sum(dxhat * xhat, axis=-1, keepdims=True) * inv
    dx = rstd * (dxhat - m1 - xhat * m2)
    return dx, dg, db


def _make_ln_fwd_kernel(dt, c_real: int):
    def kernel(x_ref, g_ref, bln_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
        x32 = x_ref[...].astype(jnp.float32)
        y, _, _ = _ln_fwd(x32, g_ref[0][None, :], bln_ref[0][None, :],
                          n=c_real)
        u = _dot(y, w1_ref[...], dt) + b1_ref[0][None, :]
        h = _gelu(u, dt)
        out = _dot(h, w2_ref[...], dt) + b2_ref[0][None, :] + x32
        o_ref[...] = out.astype(o_ref.dtype)

    return kernel


def _make_ln_bwd_kernel(dt, c_real: int):
    def kernel(x_ref, g_ref, bln_ref, w1_ref, b1_ref, w2_ref, do_ref,
               dx_ref, dg_ref, dbln_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            dg_ref[...] = jnp.zeros_like(dg_ref)
            dbln_ref[...] = jnp.zeros_like(dbln_ref)
            dw1_ref[...] = jnp.zeros_like(dw1_ref)
            db1_ref[...] = jnp.zeros_like(db1_ref)
            dw2_ref[...] = jnp.zeros_like(dw2_ref)
            db2_ref[...] = jnp.zeros_like(db2_ref)

        x32 = x_ref[...].astype(jnp.float32)
        g = g_ref[0][None, :]
        y, xhat, rstd = _ln_fwd(x32, g, bln_ref[0][None, :], n=c_real)
        u = _dot(y, w1_ref[...], dt) + b1_ref[0][None, :]
        h = _gelu(u, dt)
        do = do_ref[...].astype(jnp.float32)
        dw2_ref[...] += _dot_tt(h, do, dt)
        db2_ref[...] += jnp.sum(do, axis=0, keepdims=True)
        dh = _dot_t(do, w2_ref[...], dt)
        du = dh * _gelu_grad(u, dt)
        dw1_ref[...] += _dot_tt(y, du, dt)
        db1_ref[...] += jnp.sum(du, axis=0, keepdims=True)
        dy = _dot_t(du, w1_ref[...], dt)
        dx_ln, dg, dbln = _ln_bwd(dy, xhat, rstd, g, n=c_real)
        dg_ref[...] += dg
        dbln_ref[...] += dbln
        dx_ref[...] = (dx_ln + do).astype(dx_ref.dtype)

    return kernel


def _make_bwd_kernel(dt):
    def kernel(x_ref, w1_ref, b1_ref, w2_ref, g_ref,
               dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            dw1_ref[...] = jnp.zeros_like(dw1_ref)
            db1_ref[...] = jnp.zeros_like(db1_ref)
            dw2_ref[...] = jnp.zeros_like(dw2_ref)
            db2_ref[...] = jnp.zeros_like(db2_ref)

        x = x_ref[...]
        u = _dot(x, w1_ref[...], dt) + b1_ref[0][None, :]
        h = _gelu(u, dt)
        do = g_ref[...].astype(jnp.float32)
        dw2_ref[...] += _dot_tt(h, do, dt)
        db2_ref[...] += jnp.sum(do, axis=0, keepdims=True)
        dh = _dot_t(do, w2_ref[...], dt)
        du = dh * _gelu_grad(u, dt)
        dw1_ref[...] += _dot_tt(x.astype(jnp.float32), du, dt)
        db1_ref[...] += jnp.sum(du, axis=0, keepdims=True)
        dx_ref[...] = _dot_t(du, w1_ref[...], dt).astype(dx_ref.dtype)

    return kernel


def _fwd(x, w1, b1, w2, b2):
    N, C = x.shape
    H = w1.shape[1]
    dt = x.dtype
    bn = _pick_bn(C, H, bwd=False)
    pad = (-N) % bn
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x

    out = pl.pallas_call(
        _make_fwd_kernel(dt),
        grid=((N + pad) // bn,),
        in_specs=[
            pl.BlockSpec((bn, C), lambda i: (i, 0)),
            pl.BlockSpec((C, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((H, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bn, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N + pad, C), x.dtype),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(xp, w1, b1, w2, b2)
    return out[:N]


def _bwd(res, do):
    x, w1, b1, w2 = res
    N, C = x.shape
    H = w1.shape[1]
    dt = x.dtype
    bn = _pick_bn(C, H, bwd=True)
    pad = (-N) % bn
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    dop = jnp.pad(do, ((0, pad), (0, 0))) if pad else do

    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        _make_bwd_kernel(dt),
        grid=((N + pad) // bn,),
        in_specs=[
            pl.BlockSpec((bn, C), lambda i: (i, 0)),
            pl.BlockSpec((C, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((H, C), lambda i: (0, 0)),
            pl.BlockSpec((bn, C), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bn, C), lambda i: (i, 0)),
            pl.BlockSpec((C, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((H, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N + pad, C), x.dtype),
            jax.ShapeDtypeStruct((C, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((H, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(xp, w1, b1, w2, dop)

    return (dx[:N], dw1.astype(w1.dtype), db1, dw2.astype(w2.dtype), db2)


@jax.custom_vjp
def _mlp_core(x, w1, b1, w2, b2):
    return _fwd(x, w1, b1, w2, b2)


def _fwd_rule(x, w1, b1, w2, b2):
    return _fwd(x, w1, b1, w2, b2), (x, w1, b1, w2)


_mlp_core.defvjp(_fwd_rule, _bwd)


def _ln_fwd_call(x, g, bln, w1, b1, w2, b2, c_real):
    N, C = x.shape
    H = w1.shape[1]
    dt = x.dtype
    bn = _pick_bn(C, H, bwd=False)
    pad = (-N) % bn
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x

    vec = lambda w: pl.BlockSpec((1, w), lambda i: (0, 0))
    out = pl.pallas_call(
        _make_ln_fwd_kernel(dt, c_real),
        grid=((N + pad) // bn,),
        in_specs=[
            pl.BlockSpec((bn, C), lambda i: (i, 0)),
            vec(C), vec(C),
            pl.BlockSpec((C, H), lambda i: (0, 0)), vec(H),
            pl.BlockSpec((H, C), lambda i: (0, 0)), vec(C),
        ],
        out_specs=pl.BlockSpec((bn, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N + pad, C), x.dtype),
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(xp, g, bln, w1, b1, w2, b2)
    return out[:N]


def _ln_bwd_call(c_real, res, do):
    x, g, bln, w1, b1, w2 = res
    N, C = x.shape
    H = w1.shape[1]
    dt = x.dtype
    bn = _pick_bn(C, H, bwd=True)
    pad = (-N) % bn
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    dop = jnp.pad(do, ((0, pad), (0, 0))) if pad else do

    vec = lambda w: pl.BlockSpec((1, w), lambda i: (0, 0))
    dx, dg, dbln, dw1, db1, dw2, db2 = pl.pallas_call(
        _make_ln_bwd_kernel(dt, c_real),
        grid=((N + pad) // bn,),
        in_specs=[
            pl.BlockSpec((bn, C), lambda i: (i, 0)),
            vec(C), vec(C),
            pl.BlockSpec((C, H), lambda i: (0, 0)), vec(H),
            pl.BlockSpec((H, C), lambda i: (0, 0)),
            pl.BlockSpec((bn, C), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bn, C), lambda i: (i, 0)),
            vec(C), vec(C),
            pl.BlockSpec((C, H), lambda i: (0, 0)), vec(H),
            pl.BlockSpec((H, C), lambda i: (0, 0)), vec(C),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N + pad, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((C, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((H, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(xp, g, bln, w1, b1, w2, dop)
    return (dx[:N], dg.astype(jnp.float32), dbln.astype(jnp.float32),
            dw1.astype(w1.dtype), db1, dw2.astype(w2.dtype), db2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _ln_mlp_res_core(x, g, bln, w1, b1, w2, b2, c_real):
    return _ln_fwd_call(x, g, bln, w1, b1, w2, b2, c_real)


def _ln_fwd_rule(x, g, bln, w1, b1, w2, b2, c_real):
    return (_ln_fwd_call(x, g, bln, w1, b1, w2, b2, c_real),
            (x, g, bln, w1, b1, w2))


_ln_mlp_res_core.defvjp(_ln_fwd_rule, _ln_bwd_call)


def fused_ln_mlp_residual(x, ln_scale, ln_bias, w1, b1, w2, b2):
    """x + mlp(layer_norm(x)) in one kernel (pre-LN transformer second half).

    The LN (flax nn.LayerNorm semantics, eps 1e-6, fast variance), the GELU
    MLP, and the residual add all happen on a VMEM-resident token tile: HBM
    traffic is x in / out out, vs ~6 extra C-wide passes for the composed
    LN -> fused_mlp -> add chain (LN read/write + stats, residual read x +
    read mlp-out + write; measured ~45 ms of the 237 ms ptx step).

    x: (..., C), or (..., Cp) lane-padded with exact zeros past the real
    C = w1.shape[0] (the Swin stage pipeline pads 96->128 / 192->256: Pallas
    block DMAs at non-128-multiple lane widths run at ~180 GB/s vs 500-650
    for 128-multiples on v5e — scripts/probe_copy_bw.py). Params are padded
    here with zeros, which keeps pad lanes of the output exactly zero; the
    LN statistics divide by the real C.

    ln_scale/ln_bias: (C,). Returns x.shape in x.dtype.
    """
    lead = x.shape[:-1]
    cp = x.shape[-1]
    c_real = w1.shape[0]
    if cp != c_real:
        padc = ((0, cp - c_real),)
        ln_scale = jnp.pad(ln_scale, padc)
        ln_bias = jnp.pad(ln_bias, padc)
        w1 = jnp.pad(w1, (padc[0], (0, 0)))
        w2 = jnp.pad(w2, ((0, 0), padc[0]))
        b2 = jnp.pad(b2, padc)
    x2 = x.reshape(-1, cp)
    out = _ln_mlp_res_core(
        x2, ln_scale.astype(jnp.float32)[None, :],
        ln_bias.astype(jnp.float32)[None, :],
        w1, b1.astype(jnp.float32)[None, :],
        w2, b2.astype(jnp.float32)[None, :], c_real)
    return out.reshape(*lead, cp)


def fused_mlp(x, w1, b1, w2, b2):
    """gelu_exact(x @ w1 + b1) @ w2 + b2 with the hidden kept in VMEM.

    x: (..., C); w1: (C, H); b1: (H,); w2: (H, C); b2: (C,).
    Returns x.shape in x.dtype.
    """
    lead = x.shape[:-1]
    C = x.shape[-1]
    x2 = x.reshape(-1, C)
    out = _mlp_core(x2, w1, b1.astype(jnp.float32)[None, :],
                    w2, b2.astype(jnp.float32)[None, :])
    return out.reshape(*lead, C)
