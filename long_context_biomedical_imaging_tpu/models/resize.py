"""Separable linear resize and adaptive average pooling as matmuls.

The reference heads rely on torch F.interpolate (bilinear/trilinear with and
without align_corners) and AdaptiveAvgPool (ref: seg_heads.py:41-44,103-104,
176-178). On TPU the natural formulation is per-axis interpolation /
averaging matrices applied as tensordots: static numpy weights that XLA
constant-folds, and the resampling itself rides the MXU instead of gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _linear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic linear interpolation matrix."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        w[:, 0] = 1.0
        return w
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        else:
            src = (i + 0.5) * in_size / out_size - 0.5
            src = min(max(src, 0.0), in_size - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        w[i, lo] += 1.0 - frac
        w[i, hi] += frac
    return w


@functools.lru_cache(maxsize=None)
def _adaptive_avg_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) averaging matrix matching torch AdaptiveAvgPool bins."""
    w = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)  # ceil
        w[i, start:end] = 1.0 / (end - start)
    return w


def _apply_axis_matrices(x, matrices, first_axis: int):
    """Apply per-axis (out, in) matrices to consecutive axes starting at first_axis.

    Computes in the input dtype: full-resolution 3D feature maps make fp32
    intermediates multi-GB transients under bf16 AMP, and interpolation
    weights are short convex sums where bf16 is ample."""
    for offset, m in enumerate(matrices):
        axis = first_axis + offset
        mj = jnp.asarray(m).astype(x.dtype)
        y = jnp.tensordot(x, mj, axes=[[axis], [1]],
                          precision=jax.lax.Precision.HIGHEST)
        # tensordot moves the contracted axis to the end; rotate it back.
        x = jnp.moveaxis(y, -1, axis)
    return x


def linear_resize(x, out_sizes, align_corners: bool = False, first_axis: int = 1):
    """Bi/tri-linear resize of x's axes [first_axis, first_axis+len(out_sizes))
    to out_sizes. Channels-last friendly (default resizes axes 1..)."""
    mats = [_linear_matrix(x.shape[first_axis + i], int(o), align_corners)
            for i, o in enumerate(out_sizes)]
    return _apply_axis_matrices(x, mats, first_axis)


def adaptive_avg_pool(x, out_sizes, first_axis: int = 1):
    """torch AdaptiveAvgPool over axes [first_axis, ...] to out_sizes."""
    mats = [_adaptive_avg_matrix(x.shape[first_axis + i], int(o))
            for i, o in enumerate(out_sizes)]
    return _apply_axis_matrices(x, mats, first_axis)


@functools.lru_cache(maxsize=None)
def _shifted_linear_matrices(in_size: int, out_size: int, k: int,
                             align_corners: bool):
    """Per-tap (out, in) matrices S_d @ W for conv tap offsets d = t-(k-1)//2.

    (S_d W)[o] = W[o+d] rows with zero rows where o+d falls off the fine
    grid — this encodes the conv's zero padding exactly, while W itself
    encodes the interpolation's boundary clamping exactly."""
    W = _linear_matrix(in_size, out_size, align_corners)
    lo = (k - 1) // 2
    mats = []
    for t in range(k):
        d = t - lo
        S = np.zeros_like(W)
        if d == 0:
            S = W
        elif d > 0:
            S[:-d] = W[d:]
        else:
            S[-d:] = W[:d]
        mats.append(S)
    return tuple(mats)


def resize_conv(x, kernel, bias, out_sizes, align_corners: bool = False):
    """conv_k(linear_resize(x, out_sizes)) computed EXACTLY without ever
    materializing the resized feature map.

    Both ops are linear, so the composition folds the conv taps into
    shifted per-axis interpolation matrices: the Cin->Cout channel
    contraction runs once on the COARSE grid as a single
    (vol_c, Cin) @ (Cin, prod(k)*Cout) matmul, and the taps are reduced
    axis-by-axis while upsampling. Why: the reference UperNet head convs
    AFTER the resize to input resolution (ref: seg_heads.py:271-274
    interpolate -> self.head) — at abct geometry that is a 12.9 GB
    192-channel full-volume tensor feeding a 10-lane-output conv that runs
    at its 10/128-padded MXU ceiling (measured 78 ms fwd + 97 ms wgrad of
    the 665 ms step, plus ~42 ms of full-res layout copies). Composed, the
    wide matmul uses 270 output lanes at 1/8 the volume and the 10-channel
    logits are the only fine-grid tensors.

    x: (B, *spatial, Cin); kernel: (*k, Cin, Cout); bias: (Cout,) or None.
    """
    rank = x.ndim - 2
    ks = tuple(kernel.shape[:rank])
    cin, cout = kernel.shape[rank], kernel.shape[rank + 1]
    taps = 1
    for kk in ks:
        taps *= kk

    # channel contraction at coarse resolution, all taps at once
    km = jnp.moveaxis(kernel, rank, 0).reshape(cin, taps * cout)
    y = jnp.tensordot(x, km.astype(x.dtype), axes=[[x.ndim - 1], [0]],
                      precision=jax.lax.Precision.HIGHEST)
    y = y.reshape(y.shape[:-1] + ks + (cout,))   # (B, *S, *k, Cout)

    # reduce tap axes innermost-first, upsampling the matching spatial axis
    for a in reversed(range(rank)):
        mats = _shifted_linear_matrices(x.shape[1 + a], int(out_sizes[a]),
                                        ks[a], align_corners)
        tap_axis = 1 + rank + a
        acc = None
        for t in range(ks[a]):
            part = jnp.take(y, t, axis=tap_axis)
            part = _apply_axis_matrices(part, [mats[t]], 1 + a)
            acc = part if acc is None else acc + part
        y = acc
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
