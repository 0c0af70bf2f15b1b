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

# Below this length a direct depthwise conv beats batched tiny FFTs on TPU
# (window-sized hyena sequences are 16-512 tokens; the FFT path is tuned for
# 16k-66k full-sequence ViT mixing).
_DIRECT_CONV_MAX_LEN = 512


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

    u32 = u.astype(jnp.float32)
    y = _fft_conv_core(u32, k.astype(jnp.float32))
    if bias is not None:
        y = y + u32 * bias.astype(jnp.float32)[..., None]
    return y.astype(u.dtype)


@jax.custom_vjp
def _fft_conv_core(u, k):
    """y[..., t] = sum_{tau<=t} k[..., tau] * u[..., t-tau]; u (..., C, L)
    fp32, k (C, L) fp32."""
    L = u.shape[-1]
    n = 2 * L
    y = jnp.fft.irfft(jnp.fft.rfft(u, n=n) * jnp.fft.rfft(k, n=n), n=n)
    return y[..., :L]


def _fft_conv_fwd(u, k):
    return _fft_conv_core(u, k), (u, k)


def _fft_conv_bwd(res, g):
    u, k = res
    L = u.shape[-1]
    n = 2 * L
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
    O(L^2 D) matmul rides the MXU; XLA autodiffs the einsum + gather build
    efficiently, so no custom VJP is needed. Channel-minor throughout (no
    transposes, unlike the FFT path)."""
    L = u.shape[1]
    t_idx = np.arange(L)[:, None] - np.arange(L)[None, :]
    mask = jnp.asarray(t_idx >= 0)
    idx = jnp.asarray(np.clip(t_idx, 0, L - 1))
    kT = k.T                                     # (L, D)
    T = jnp.where(mask[..., None], kT[idx], 0.0).astype(u.dtype)
    return jnp.einsum("bsc,tsc->btc", u, T,
                      preferred_element_type=jnp.float32).astype(u.dtype)


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
