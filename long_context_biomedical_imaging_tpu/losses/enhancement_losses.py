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


def gaussian_deriv3d_loss(outputs, targets, complex_i: bool = False,
                          sigmas=(0.25, 0.5, 1.0), sigmas_t=(0.25, 0.5, 0.5)):
    """L1 agreement of 3D gaussian-derivative responses at several scales
    (ref: :204-228). Input (B, T, H, W, C)."""
    o = outputs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    if complex_i:
        o = jnp.sqrt(o[..., :1] ** 2 + o[..., 1:] ** 2)
        t = jnp.sqrt(t[..., :1] ** 2 + t[..., 1:] ** 2)

    c = o.shape[-1]
    total = 0.0
    for sigma, sigma_t in zip(sigmas, sigmas_t):
        k = jnp.asarray(_deriv_kernel_3d(float(sigma), float(sigma_t)))
        kt, kh, kw = k.shape
        # depthwise 3D conv, channels-last, 'same' padding
        rhs = jnp.broadcast_to(k[:, :, :, None, None], (kt, kh, kw, 1, c))
        rhs = rhs.transpose(4, 3, 0, 1, 2)  # (O=c, I=1, kt, kh, kw)
        pads = [((kk - 1) // 2, kk // 2) for kk in (kt, kh, kw)]
        conv = functools.partial(
            lax.conv_general_dilated, window_strides=(1, 1, 1), padding=pads,
            dimension_numbers=("NDHWC", "OIDHW", "NDHWC"), feature_group_count=c,
            precision=lax.Precision.HIGHEST)
        go = conv(o, rhs)
        gt = conv(t, rhs)
        total = total + jnp.mean(jnp.abs(go - gt), axis=(1, 2, 3, 4))
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
