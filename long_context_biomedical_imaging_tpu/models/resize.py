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
