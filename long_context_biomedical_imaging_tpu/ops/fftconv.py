"""FFT long convolution (Hyena) on TPU.

Replaces the reference's cuFFT path (ref: model/models/hyena.py:32-51): a
causal length-L convolution computed as a 2L-padded real FFT product. XLA
lowers `jnp.fft.rfft/irfft` to the TPU FFT; compute is kept in fp32 (TPU FFT
does not support bf16) and cast back to the input dtype.

The reference normalization (rfft(k)/2L * rfft(u), irfft(norm='forward'))
is algebraically identical to the default-norm product used here.
"""

from __future__ import annotations

import jax.numpy as jnp

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

    fft_size = 2 * L
    u32 = u.astype(jnp.float32)
    k_f = jnp.fft.rfft(k.astype(jnp.float32), n=fft_size)
    u_f = jnp.fft.rfft(u32, n=fft_size)
    y = jnp.fft.irfft(u_f * k_f, n=fft_size)[..., :L]
    if bias is not None:
        y = y + u32 * bias.astype(jnp.float32)[..., None]
    return y.astype(u.dtype)


# Above this length the O(L^2) shift-and-MAC form loses to the FFT.
_CM_DIRECT_MAX_LEN = 64


def causal_long_conv_cm(u, k, bias=None):
    """Channel-minor causal long convolution: u (B, L, D), k (D, L), bias (D,).

    Short sequences (window volumes) run as L shift-and-MAC steps over the
    lane-major channel axis; long sequences transpose once and take the FFT
    path. Returns (B, L, D) in u.dtype.
    """
    L = u.shape[1]
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
    y = fft_causal_conv(u.transpose(0, 2, 1), k, bias)
    return y.transpose(0, 2, 1)
