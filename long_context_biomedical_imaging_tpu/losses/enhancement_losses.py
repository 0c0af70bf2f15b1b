"""Enhancement losses (ref: loss/loss_functions/enhancement_losses.py:18-278).

All losses are pure jittable functions over channels-last tensors
(B, T, H, W, C) with integer/float targets of the same shape. The reference's
host-side NaN `raise` cannot exist inside a compiled step; `combined` instead
zeroes non-finite terms (matching the reference Combined_Loss behavior of
skipping NaN terms, ref: :275-276) and the trainer monitors loss finiteness
host-side.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def mse_loss(outputs, targets, complex_i: bool = False):
    """Mean squared error; complex mode pairs channels 0/1 (ref: :18-58)."""
    o = outputs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    if complex_i:
        d = jnp.square(o[..., 0] - t[..., 0]) + jnp.square(o[..., 1] - t[..., 1])
    else:
        d = jnp.square(o - t)
    return jnp.sum(d) / d.size


def charbonnier_loss(outputs, targets, complex_i: bool = False, eps: float = 1e-3):
    """Charbonnier (smooth L1) loss (ref: :63-101)."""
    o = outputs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    if complex_i:
        dr = jnp.abs(o[..., 0] - t[..., 0])
        di = jnp.abs(o[..., 1] - t[..., 1])
        loss = jnp.sqrt(dr * dr + di * di + eps * eps)
    else:
        d = jnp.abs(o - t)
        loss = jnp.sqrt(d * d + eps * eps)
    return jnp.sum(loss) / loss.size


def _gaussian_and_derivatives_1d(sigma: float, halfwidth: float = 3.0,
                                 voxelsize: float = 1.0):
    """Sampled gaussian + normalized 1st derivative (ref: :106-146)."""
    n = round(halfwidth * sigma / voxelsize)
    pts = (np.arange(2 * n + 1) - n) * voxelsize
    norm = 1.0 / math.sqrt(2 * math.pi * sigma * sigma)
    t = np.exp(-(pts * pts) / (2 * sigma * sigma))
    g = norm * t
    g = g / g.sum()
    d = norm * (-pts / (sigma * sigma)) * t
    d = d / np.abs(d).sum()
    return g.astype(np.float32), d.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _deriv_kernel_3d(sigma: float, sigma_t: float):
    """Separable first-order derivative kernel, laid out (kt, kh, kw)
    (ref: create_window_3d + permute, :148-199)."""
    _, dh = _gaussian_and_derivatives_1d(sigma)
    _, dw = _gaussian_and_derivatives_1d(sigma)
    _, dt = _gaussian_and_derivatives_1d(sigma_t)
    k = dh[:, None] * dw[None, :]
    k = k[:, :, None] * dt[None, None, :]          # (kh, kw, kt)
    k = k / np.abs(k).sum()
    return np.transpose(k, (2, 0, 1))               # (kt, kh, kw)


def _sep_conv_axis(x, k1d, axis: int):
    """'same'-padded 1D correlation along `axis` as K shift-and-MAC passes.

    Matches conv_general_dilated's ((K-1)//2, K//2) padding and no-flip
    (cross-correlation) semantics exactly."""
    K = k1d.shape[0]
    lo, hi = (K - 1) // 2, K // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (lo, hi)
    xp = jnp.pad(x, pad)
    L = x.shape[axis]

    def sl(j):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(j, j + L)
        return xp[tuple(idx)]

    y = sl(0) * float(k1d[0])
    for j in range(1, K):
        y = y + sl(j) * float(k1d[j])
    return y


def gaussian_deriv3d_loss(outputs, targets, complex_i: bool = False,
                          sigmas=(0.25, 0.5, 1.0), sigmas_t=(0.25, 0.5, 0.5)):
    """L1 agreement of 3D gaussian-derivative responses at several scales
    (ref: :204-228). Input (B, T, H, W, C).

    TPU note: the reference's dense 3D kernel is an outer product of three
    |.|-normalized 1D derivative kernels, so its final dense normalization is
    a no-op and the conv factors EXACTLY into three separable 1D passes. The
    dense single-channel conv3d was catastrophic on TPU (1 input channel
    wastes 127/128 lanes; measured ~1.8 s of the cmr train step) — the
    separable shift-and-MAC form below runs on a (.., W)-minor layout with
    full lanes."""
    o = outputs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    if complex_i:
        o = jnp.sqrt(o[..., :1] ** 2 + o[..., 1:] ** 2)
        t = jnp.sqrt(t[..., :1] ** 2 + t[..., 1:] ** 2)

    # (B, T, H, W, C) -> (B*C, T, H, W): W-minor, channels folded into batch
    b, tt, hh, ww, c = o.shape
    o = o.transpose(0, 4, 1, 2, 3).reshape(b * c, tt, hh, ww)
    t = t.transpose(0, 4, 1, 2, 3).reshape(b * c, tt, hh, ww)

    total = 0.0
    for sigma, sigma_t in zip(sigmas, sigmas_t):
        _, dh = _gaussian_and_derivatives_1d(float(sigma))
        _, dt_k = _gaussian_and_derivatives_1d(float(sigma_t))
        # dense kernel layout is (kt, kh, kw) built from (dh x dw) x dt with
        # dw == dh; apply the separable factors along T, H, W
        go, gt = o, t
        for k1d, ax in ((dt_k, 1), (dh, 2), (dh, 3)):
            go = _sep_conv_axis(go, k1d, ax)
            gt = _sep_conv_axis(gt, k1d, ax)
        total = total + jnp.mean(jnp.abs(go - gt), axis=(1, 2, 3))
    total = total / len(sigmas)
    return jnp.mean(total)


def combined_enhance_loss(outputs, targets, complex_i: bool = False,
                          weights=(1.0, 1.0, 1.0)):
    """mse + charbonnier + gaussian3D weighted sum, skipping non-finite terms
    (ref: loss_base.py:27-30, enhancement_losses.py:233-278)."""
    terms = (mse_loss(outputs, targets, complex_i),
             charbonnier_loss(outputs, targets, complex_i),
             gaussian_deriv3d_loss(outputs, targets, complex_i))
    total = 0.0
    for w, v in zip(weights, terms):
        total = total + jnp.where(jnp.isfinite(v), w * v, 0.0)
    return total
