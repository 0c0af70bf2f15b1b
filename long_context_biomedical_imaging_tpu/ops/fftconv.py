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


def fft_causal_conv(u, k, bias=None):
    """Causal long convolution with a per-channel skip term.

    Args:
      u: (..., D, L) input.
      k: (D, L) convolution kernel (implicit Hyena filter).
      bias: (D,) skip weight; output += u * bias (ref: hyena.py:45).

    Returns: (..., D, L) in u.dtype.
    """
    L = u.shape[-1]
    fft_size = 2 * L
    u32 = u.astype(jnp.float32)
    k_f = jnp.fft.rfft(k.astype(jnp.float32), n=fft_size)
    u_f = jnp.fft.rfft(u32, n=fft_size)
    y = jnp.fft.irfft(u_f * k_f, n=fft_size)[..., :L]
    if bias is not None:
        y = y + u32 * bias.astype(jnp.float32)[..., None]
    return y.astype(u.dtype)
