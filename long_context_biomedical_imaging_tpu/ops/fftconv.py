"""FFT long convolution (Hyena) on TPU.

Replaces the reference's cuFFT path (ref: model/models/hyena.py:32-51): a
causal length-L convolution computed as a 2L-padded real FFT product. XLA
lowers `jnp.fft.rfft/irfft` to the TPU FFT; compute is kept in fp32 (TPU FFT
does not support bf16) and cast back to the input dtype.

The FFT branch carries a CUSTOM VJP: autodiff through pad/fft/slice costs
2.5-4.3x the forward (measured on the cmr/emb 512-token windows), while the
analytic backward is just correlations — du = irfft(rfft(g) conj(k_f)),
dk = irfft(sum_b rfft(g) conj(u_f)) — one extra big FFT pair total.

The reference normalization (rfft(k)/2L * rfft(u), irfft(norm='forward'))
is algebraically identical to the default-norm product used here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .conv import depthwise_conv1d
from .spectral_conv import spectral_causal_conv, spectral_supported

# Below this length a direct depthwise conv beats batched tiny FFTs on TPU
# (window-sized hyena sequences are 16-512 tokens; the FFT path is tuned for
# 16k-66k full-sequence ViT mixing).
_DIRECT_CONV_MAX_LEN = 512


def _sp_spectral_conv(u, k, bias):
    """Sequence-parallel dispatch of the fused Pallas spectral conv.

    GSPMD cannot partition a pallas_call, so the kernel is wrapped in
    shard_map over the channel-sharded layout the hyena SP path already
    establishes (models/hyena.py re-shards token->channel around the long
    conv): after the all-to-all each chip owns FULL-length sequences for
    D/ways channels — exactly the kernel's (batch, channel)-cell grid. The
    depthwise conv is channel-disjoint, so every gradient (du, dk, dbias)
    is chip-local: no psum, no extra collectives beyond the all-to-alls the
    caller already pays. (VERDICT r3 #3: the previous gate dropped SP hyena
    to the XLA matmul-FFT, measured 5.8x slower fwd+bwd at 65k.)

    u: (B, D, L) channel-major; k: (D, L); bias: (D,) or None.
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import active_mesh
    mesh = active_mesh()
    dp = int(mesh.shape["data"])
    B, D = u.shape[0], u.shape[1]
    bspec = "data" if B % dp == 0 else None
    uspec = P(bspec, "model", None)
    if bias is None:
        f = jax.shard_map(
            lambda uu, kk: spectral_causal_conv(uu, kk, None), mesh=mesh,
            in_specs=(uspec, P("model", None)), out_specs=uspec,
            check_vma=False)
        return f(u, k)
    f = jax.shard_map(
        spectral_causal_conv, mesh=mesh,
        in_specs=(uspec, P("model", None), P("model")), out_specs=uspec,
        check_vma=False)
    return f(u, k, bias)


def _spectral_dispatch_ok(u, k) -> bool:
    """True if the fused Pallas spectral conv can serve this call.

    Single-chip: always. Sequence-parallel (model axis > 1): only via the
    shard_map wrapper above, which needs the channel axis to divide the
    model axis (u is channel-sharded at this point in the hyena SP path).
    """
    from ..parallel.mesh import active_mesh, model_axis_size
    ways = model_axis_size()
    if ways == 1:
        return True
    mesh = active_mesh()
    return u.shape[1] % ways == 0 and k.shape[0] % ways == 0 \
        and mesh is not None


def fft_causal_conv(u, k, bias=None):
    """Causal long convolution with a per-channel skip term.

    Args:
      u: (..., D, L) input.
      k: (D, L) convolution kernel (implicit Hyena filter).
      bias: (D,) skip weight; output += u * bias (ref: hyena.py:45).

    Returns: (..., D, L) in u.dtype.
    """
    L = u.shape[-1]
    if L <= _DIRECT_CONV_MAX_LEN and u.ndim == 3:
        # y[t] = sum_tau u[t-tau] k[tau]  ==  causal correlation with flip(k)
        y = depthwise_conv1d(u, jnp.flip(k, axis=-1), None, padding="causal")
        y32 = y.astype(jnp.float32)
        if bias is not None:
            y32 = y32 + u.astype(jnp.float32) * bias.astype(jnp.float32)[..., None]
        return y32.astype(u.dtype)

    if u.ndim == 3 and spectral_supported(L) and _spectral_dispatch_ok(u, k):
        # fused Pallas spectral conv: whole pad/FFT/product/iFFT/trim chain
        # in VMEM per (batch, channel) cell — 5.8x the XLA matmul-FFT
        # fwd+bwd at (1, 384, 65536) on v5e (14.6 vs 83.9 ms), and none of
        # its ~8GB/layer of HBM stage traffic
        k32 = k.astype(jnp.float32)
        b32 = None if bias is None else bias.astype(jnp.float32)
        from ..parallel.mesh import model_axis_size
        if model_axis_size() > 1:
            # sequence-parallel: shard_map over the channel-sharded cells
            return _sp_spectral_conv(u, k32, b32)
        return spectral_causal_conv(u, k32, b32)

    u32 = u.astype(jnp.float32)
    y = _fft_conv_core(u32, k.astype(jnp.float32))
    if bias is not None:
        y = y + u32 * bias.astype(jnp.float32)[..., None]
    return y.astype(u.dtype)


# --------------------------------------------------------------------------- #
# Matmul-FFT: Cooley-Tukey four-step with MXU-matmul DFT stages
# --------------------------------------------------------------------------- #
#
# The XLA TPU FFT measured ~15% efficient at the 16k-66k hyena lengths (the
# Toeplitz matmul beat it 35x at L=512 but is O(L^2) — infeasible at 65k).
# Instead: factor N = f1*...*fk (each <= 64) and run the classic four-step
# recursion  X[k1 + f*k2] = DFT_{n2}( w_N^{k1 n2} * DFT_f(x[n2*n1 + n2']) )
# where every DFT_f is ONE batched (f, f) real-matmul pair on the MXU and the
# twiddles fuse into the matmul epilogue. The transform is kept in SCRAMBLED
# (digit-reversed-by-stage) order — a fixed permutation P of the true DFT —
# which is free for convolution: ifft_s(fft_s(u) * fft_s(k)) with matching
# factor lists cancels P exactly, so no bit-reversal pass is ever paid.
# Everything is plain XLA (matmul + elementwise): no Pallas needed, XLA fuses
# the twiddle/gate chains between stages.

# Radix cap 64: at N=131072 the 3-stage [64,64,32] split needs 5x fewer
# matmul FLOPs than the 2-stage [512,256] one (cost ~ N*sum(factors)) and the
# extra stage's HBM pass is cheaper than the saved fp32 matmul time.
_MATMUL_FFT_MAX_RADIX = 64
# fp32 matmuls on the TPU MXU truncate to bf16 under DEFAULT precision — a
# disaster compounded over log_64(N) DFT stages; HIGHEST keeps fp32-exact
# accumulation and its FLOP cost stays under the stages' bandwidth floor.
_FFT_PRECISION = jax.lax.Precision.HIGHEST


def _fft_factors(n: int):
    """Balanced power-of-two factor list with every factor <= 64, or None."""
    if n <= 0 or n & (n - 1):
        return None
    e = n.bit_length() - 1
    k = -(-e // 6)  # ceil: radix 64 = 2^6
    base, extra = divmod(e, k)
    return [1 << (base + (1 if i < extra else 0)) for i in range(k)]


def _fmm(x, c):
    """DFT matmul along the last axis."""
    return jnp.einsum("...n,nk->...k", x, c, precision=_FFT_PRECISION)


def _smm(c, x):
    """DFT matmul along axis -2 (batched over the trailing lanes)."""
    return jnp.einsum("fk,...fn->...kn", c, x, precision=_FFT_PRECISION)


# These caches MUST hold numpy, never jnp: array creation inside a trace
# (e.g. the custom_vjp trace of _fft_conv_core) yields tracers, and a cached
# tracer escaping to the next trace is an UnexpectedTracerError. numpy
# constants are staged per-trace and constant-folded by XLA all the same.
@functools.lru_cache(maxsize=None)
def _dft_consts(f: int, sign: float):
    i = np.arange(f)
    ang = sign * 2 * np.pi / f * np.outer(i, i)
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


@functools.lru_cache(maxsize=None)
def _twiddle_consts(f: int, n2: int, n: int, sign: float):
    ang = sign * 2 * np.pi / n * np.outer(np.arange(f), np.arange(n2))
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def _cfft_scrambled(xr, xi, factors, sign: float):
    """Complex DFT along the last axis in scrambled order (fixed permutation
    of the true DFT; permutation determined by `factors`)."""
    n = xr.shape[-1]
    f = factors[0]
    cr, ci = _dft_consts(f, sign)
    if len(factors) == 1:
        if xi is None:
            return _fmm(xr, cr), _fmm(xr, ci)
        yr = _fmm(xr, cr) - _fmm(xi, ci)
        yi = _fmm(xr, ci) + _fmm(xi, cr)
        return yr, yi
    n2 = n // f
    shape = xr.shape[:-1] + (f, n2)
    xr = xr.reshape(shape)
    # DFT_f along axis -2 (batched MXU matmul over the n2 lanes);
    # real input (xi None) halves the first stage's matmuls
    if xi is None:
        ar = _smm(cr, xr)
        ai = _smm(ci, xr)
    else:
        xi = xi.reshape(shape)
        ar = _smm(cr, xr) - _smm(ci, xi)
        ai = _smm(ci, xr) + _smm(cr, xi)
    tr, ti = _twiddle_consts(f, n2, n, sign)
    br = ar * tr - ai * ti
    bi = ar * ti + ai * tr
    br, bi = _cfft_scrambled(br, bi, factors[1:], sign)
    out_shape = shape[:-2] + (n,)
    return br.reshape(out_shape), bi.reshape(out_shape)


def _icfft_scrambled(yr, yi, factors):
    """Exact inverse of _cfft_scrambled (same factors), WITHOUT the 1/N
    scale (applied once by the caller)."""
    n = yr.shape[-1]
    f = factors[0]
    cr, ci = _dft_consts(f, 1.0)    # conjugate of the forward's sign=-1
    if len(factors) == 1:
        xr = _fmm(yr, cr) - _fmm(yi, ci)
        xi = _fmm(yr, ci) + _fmm(yi, cr)
        return xr, xi
    n2 = n // f
    shape = yr.shape[:-1] + (f, n2)
    yr = yr.reshape(shape)
    yi = yi.reshape(shape)
    br, bi = _icfft_scrambled(yr, yi, factors[1:])
    tr, ti = _twiddle_consts(f, n2, n, 1.0)
    ar = br * tr - bi * ti
    ai = br * ti + bi * tr
    xr = _smm(cr, ar) - _smm(ci, ai)
    xi = _smm(ci, ar) + _smm(cr, ai)
    out_shape = shape[:-2] + (n,)
    return xr.reshape(out_shape), xi.reshape(out_shape)


def _mm_rfft(x, factors):
    """Real-input scrambled FFT. The full complex spectrum is kept (no
    hermitian halving — that would need -k index maps in scrambled order);
    the first DFT stage still skips its imaginary-part matmuls."""
    return _cfft_scrambled(x, None, factors, -1.0)


def _mm_conv_spectrum(ur, ui, kr, ki, factors, L):
    """Pointwise spectral product + scrambled inverse + real/causal trim."""
    n = 2 * L
    pr = ur * kr - ui * ki
    pi = ur * ki + ui * kr
    yr, _ = _icfft_scrambled(pr, pi, factors)
    return yr[..., :L] / n


@jax.custom_vjp
def _fft_conv_core(u, k):
    """y[..., t] = sum_{tau<=t} k[..., tau] * u[..., t-tau]; u (..., C, L)
    fp32, k (C, L) fp32."""
    L = u.shape[-1]
    n = 2 * L
    factors = _fft_factors(n)
    if factors is not None:
        pad = [(0, 0)] * (u.ndim - 1) + [(0, L)]
        ur, ui = _mm_rfft(jnp.pad(u, pad), factors)
        kr, ki = _mm_rfft(jnp.pad(k, [(0, 0)] * (k.ndim - 1) + [(0, L)]),
                          factors)
        return _mm_conv_spectrum(ur, ui, kr, ki, factors, L)
    y = jnp.fft.irfft(jnp.fft.rfft(u, n=n) * jnp.fft.rfft(k, n=n), n=n)
    return y[..., :L]


def _fft_conv_fwd(u, k):
    return _fft_conv_core(u, k), (u, k)


def _fft_conv_bwd(res, g):
    u, k = res
    L = u.shape[-1]
    n = 2 * L
    factors = _fft_factors(n)
    if factors is not None:
        # correlations in the scrambled basis: conj / product / sum are all
        # elementwise or batch reductions, so the permutation cancels exactly
        pad_u = [(0, 0)] * (u.ndim - 1) + [(0, L)]
        pad_k = [(0, 0)] * (k.ndim - 1) + [(0, L)]
        gr, gi = _mm_rfft(jnp.pad(g.astype(jnp.float32), pad_u), factors)
        kr, ki = _mm_rfft(jnp.pad(k, pad_k), factors)
        # du_s = sum_{t>=s} g_t k_{t-s}: correlation = product with conj(k_f)
        du = _mm_conv_spectrum(gr, gi, kr, -ki, factors, L)
        ur, ui = _mm_rfft(jnp.pad(u, pad_u), factors)
        batch = tuple(range(gr.ndim - k.ndim))
        sr = jnp.sum(gr * ur + gi * ui, axis=batch)
        si = jnp.sum(gi * ur - gr * ui, axis=batch)
        yr, _ = _icfft_scrambled(sr, si, factors)
        dk = yr[..., :L] / n
        return du, dk
    g_f = jnp.fft.rfft(g.astype(jnp.float32), n=n)
    # du_s = sum_{t>=s} g_t k_{t-s}: circular correlation; the zero padding
    # past L-1 kills the wrapped terms.
    du = jnp.fft.irfft(g_f * jnp.conj(jnp.fft.rfft(k, n=n)), n=n)[..., :L]
    # dk_tau = sum_{batch, t>=tau} g_t u_{t-tau}: same correlation against u,
    # reduced over the batch axes in frequency space (one small irfft).
    u_f = jnp.fft.rfft(u, n=n)
    s_f = jnp.sum(g_f * jnp.conj(u_f),
                  axis=tuple(range(g_f.ndim - k.ndim)))
    dk = jnp.fft.irfft(s_f, n=n)[..., :L]
    return du, dk


_fft_conv_core.defvjp(_fft_conv_fwd, _fft_conv_bwd)


# Above this length the O(L^2) shift-and-MAC form loses to the matmul/FFT.
_CM_DIRECT_MAX_LEN = 64
# Ceiling on the materialized (L, L, D) Toeplitz operator.
_TOEPLITZ_MAX_BYTES = 256 * 1024 * 1024


def _toeplitz_conv_cm(u, k):
    """Causal depthwise conv as a channel-batched Toeplitz MXU matmul.

    y[b, t, c] = sum_{s<=t} k[t-s, c] u[b, s, c] == einsum('bsc,tsc->btc')
    with T[t, s, c] = k[t-s, c]. At the cmr/emb window shapes (V=512) this
    measured 35x faster forward / 24x fwd+bwd than the XLA TPU FFT (2.1 vs
    73 ms at BW=2048, C=96) — the FFT runs ~15% efficient while the
    O(L^2 D) matmul rides the MXU. Channel-minor throughout (no transposes,
    unlike the FFT path). Custom VJP: the gather T-build's autodiff
    transpose is a scatter-add for dk (r5: 3.17 ms/block at stage 2), so
    the backward computes dk via chunk-lag dots instead."""
    return _toeplitz_conv_core(u, k)


def _toeplitz_T(k, L, dtype):
    """(L, L, D) causal Toeplitz operator T[t, s, c] = k[c, t-s] (0 for
    s > t). Gather build — fine forward; its autodiff transpose is a
    scatter-add (near-scalar on TPU), which is why the VJP below computes
    dk densely instead."""
    t_idx = np.arange(L)[:, None] - np.arange(L)[None, :]
    mask = jnp.asarray(t_idx >= 0)
    idx = jnp.asarray(np.clip(t_idx, 0, L - 1))
    kT = k.T                                     # (L, D)
    return jnp.where(mask[..., None], kT[idx], 0.0).astype(dtype)


@jax.custom_vjp
def _toeplitz_conv_core(u, k):
    T = _toeplitz_T(k, u.shape[1], u.dtype)
    return jnp.einsum("bsc,tsc->btc", u, T,
                      preferred_element_type=jnp.float32).astype(u.dtype)


def _toeplitz_conv_fwd(u, k):
    return _toeplitz_conv_core(u, k), (u, k)


@functools.lru_cache(maxsize=4)
def _diag_onehot(ch: int):
    """(ch, ch, 2ch-1) one-hot: E[x, y, o] = 1 iff x - y == o - (ch-1) —
    turns per-offset diagonal sums of a (C, ch, ch) block into one einsum."""
    x = np.arange(ch)[:, None, None]
    y = np.arange(ch)[None, :, None]
    o = np.arange(2 * ch - 1)[None, None, :]
    return jnp.asarray((x - y == o - (ch - 1)).astype(np.float32))


def _toeplitz_conv_bwd(res, g):
    """du via the transposed Toeplitz einsum; dk WITHOUT the gather's
    scatter-add transpose (3.17 ms per stage-2 hyena block on TPU — 19 ms
    of the emb step, r5 profile): dk[tau, c] = sum_{b, t} g[b,t,c]
    u[b,t-tau,c] computed as chunk-lag MXU dots (K = B*(n-d) chunk pairs)
    followed by per-offset diagonal sums via a small one-hot einsum."""
    u, k = res
    B, L, C = u.shape
    g32 = g.astype(u.dtype)
    T = _toeplitz_T(k, L, u.dtype)
    du = jnp.einsum("btc,tsc->bsc", g32, T,
                    preferred_element_type=jnp.float32).astype(u.dtype)

    ch = min(128, L)
    Lp = -(-L // ch) * ch
    pad = Lp - L
    gp = jnp.pad(g32, ((0, 0), (0, pad), (0, 0))) if pad else g32
    up = jnp.pad(u, ((0, 0), (0, pad), (0, 0))) if pad else u
    n = Lp // ch
    gr = gp.reshape(B, n, ch, C)
    ur = up.reshape(B, n, ch, C)
    E = _diag_onehot(ch).astype(u.dtype)
    # dkp[tau + ch - 1] accumulates lag tau; bands of consecutive d overlap
    dkp = jnp.zeros((Lp + ch, C), jnp.float32)
    for d in range(n):
        # P[c, x, y] = sum_{b, q >= d} g[b, q*ch+x, c] * u[b, (q-d)*ch+y, c]
        P = jax.lax.dot_general(
            gr[:, d:], ur[:, :n - d],
            (((0, 1), (0, 1)), ((3,), (3,))),
            preferred_element_type=jnp.float32)       # (C, ch, ch)
        s = jnp.einsum("cxy,xyo->oc", P.astype(u.dtype), E,
                       preferred_element_type=jnp.float32)
        dkp = jax.lax.dynamic_update_slice(
            dkp, jax.lax.dynamic_slice(dkp, (d * ch, 0), (2 * ch - 1, C)) + s,
            (d * ch, 0))
    dk = dkp[ch - 1:ch - 1 + L]                       # drop acausal lags
    return du, dk.T.astype(k.dtype)


_toeplitz_conv_core.defvjp(_toeplitz_conv_fwd, _toeplitz_conv_bwd)


def causal_long_conv_cm(u, k, bias=None):
    """Channel-minor causal long convolution: u (B, L, D), k (D, L), bias (D,).

    Short sequences (window volumes) run as L shift-and-MAC steps over the
    lane-major channel axis; mid lengths (the 512-token cmr/emb windows) run
    as a channel-batched Toeplitz matmul on the MXU; longer sequences
    transpose once and take the FFT path. Returns (B, L, D) in u.dtype.
    """
    L, D = u.shape[1], u.shape[2]
    if L <= _CM_DIRECT_MAX_LEN:
        # input-dtype shift-and-MAC: bandwidth-bound; bf16 under AMP
        kT = k.astype(u.dtype).T                  # (L, D)
        y = u * kT[0][None, None, :]
        for tau in range(1, L):
            shifted = jnp.pad(u, ((0, 0), (tau, 0), (0, 0)))[:, :L]
            y = y + shifted * kT[tau][None, None, :]
        if bias is not None:
            y = y + u * bias.astype(u.dtype)[None, None, :]
        return y
    if L * L * D * u.dtype.itemsize <= _TOEPLITZ_MAX_BYTES:
        y = _toeplitz_conv_cm(u, k)
        if bias is not None:
            y = y + u * bias.astype(u.dtype)[None, None, :]
        return y
    y = fft_causal_conv(u.transpose(0, 2, 1), k, bias)
    return y.transpose(0, 2, 1)
