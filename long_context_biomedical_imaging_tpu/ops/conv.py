"""Depthwise 1D convolutions for the sequence mixers.

TPU equivalents of causal-conv1d / torch depthwise Conv1d
(ref: model/models/mamba.py:118-119 uses padding='same';
ref: model/models/hyena.py:285-291 pads ks-1 then truncates = causal).
XLA's `conv_general_dilated` with feature_group_count=channels maps these
onto the MXU/VPU efficiently at these tiny kernel sizes (3-5 taps).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def depthwise_conv1d(x, w, b=None, padding: str = "same"):
    """Depthwise conv over the last axis.

    Args:
      x: (B, D, L) input.
      w: (D, K) per-channel filters.
      b: (D,) bias or None.
      padding: 'same' (centered, torch padding='same' semantics for odd K) or
        'causal' (left-pad K-1: output[t] sees x[t-K+1..t]).

    Returns (B, D, L) in x.dtype.
    """
    d, ksize = w.shape
    if padding == "same":
        pads = [((ksize - 1) // 2, ksize // 2)]
    elif padding == "causal":
        pads = [(ksize - 1, 0)]
    else:
        raise ValueError(f"unknown padding {padding}")
    # lhs: (B, D, L); rhs (D, 1, K) with feature_group_count=D. Compute in the
    # input dtype (mixed preferred_element_type breaks the conv transpose rule
    # under AD); precision HIGHEST keeps fp32 accumulation for fp32 inputs.
    y = lax.conv_general_dilated(
        x, w[:, None, :].astype(x.dtype), window_strides=(1,), padding=pads,
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=d,
        precision=lax.Precision.HIGHEST)
    if b is not None:
        y = y + b[None, :, None].astype(y.dtype)
    return y.astype(x.dtype)


def depthwise_conv1d_cm(x, w, b=None, padding: str = "same"):
    """Channel-minor depthwise conv over the *middle* axis.

    TPU-first layout: x is (B, L, D) with channels on the 128-lane minor axis
    (sequence lengths here are window volumes of 16-512, which would waste
    7/8ths of the VPU if kept minor). Implemented as K shift-and-MAC steps —
    K static taps of fused multiply-adds that XLA fuses into one kernel, with
    a trivially efficient transpose-free backward (unlike conv_general's
    depthwise gradient, which dominated the step profile).

    Args:
      x: (B, L, D); w: (D, K); b: (D,) or None.
    """
    d, ksize = w.shape
    L = x.shape[1]
    if padding == "same":
        lo, hi = (ksize - 1) // 2, ksize // 2
    elif padding == "causal":
        lo, hi = ksize - 1, 0
    else:
        raise ValueError(f"unknown padding {padding}")
    # Compute in the input dtype: under bf16 AMP the K<=8-tap accumulation in
    # bf16 costs ~2 bits of mantissa but halves the HBM traffic of what is a
    # purely bandwidth-bound op.
    xp = jnp.pad(x, ((0, 0), (lo, hi), (0, 0)))
    wT = w.astype(x.dtype).T  # (K, D)
    y = xp[:, 0:L, :] * wT[0][None, None, :]
    for j in range(1, ksize):
        y = y + xp[:, j:j + L, :] * wT[j][None, None, :]
    if b is not None:
        y = y + b.astype(x.dtype)[None, None, :]
    return y
