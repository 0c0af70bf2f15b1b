"""Swin window machinery as pure JAX functions.

Behavioral equivalents of the reference's window partition/reverse, shift-mask
computation, window auto-shrink and relative-position index
(ref: model/models/backbone_swin.py:135-224, 591-628, 253-282). All functions
are shape-polymorphic in Python (static under jit) and operate on 3D token
grids ``(B, D, H, W, C)`` — 2D inputs use D=1 with window depth 1.

TPU notes: partition/reverse are pure reshape/transpose, which XLA fuses into
the surrounding attention; masks and relative-position indices are computed
once per (resolution, window, shift) at trace time and constant-folded.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def get_window_size(x_size, window_size, shift_size=None):
    """Shrink window (and zero shift) along dims where input <= window.

    Ref behavior: backbone_swin.py:200-224 — a window never exceeds the input
    grid, and no cyclic shift happens along a dimension fully covered by one
    window.
    """
    use_window = list(window_size)
    use_shift = list(shift_size) if shift_size is not None else None
    for i, (xs, ws) in enumerate(zip(x_size, window_size)):
        if xs <= ws:
            use_window[i] = xs
            if use_shift is not None:
                use_shift[i] = 0
    if shift_size is None:
        return tuple(use_window)
    return tuple(use_window), tuple(use_shift)


def window_partition(x, window_size):
    """(B, D, H, W, C) -> (B * nW, wd*wh*ww, C) (ref: backbone_swin.py:135-168)."""
    b, d, h, w, c = x.shape
    wd, wh, ww = window_size
    x = x.reshape(b, d // wd, wd, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, wd * wh * ww, c)


def window_reverse(windows, window_size, dims):
    """Inverse of :func:`window_partition` (ref: backbone_swin.py:171-197)."""
    b, d, h, w = dims
    wd, wh, ww = window_size
    x = windows.reshape(b, d // wd, h // wh, w // ww, wd, wh, ww, -1)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, d, h, w, -1)


def _shift_regions_np(dims, window_size, shift_size) -> np.ndarray:
    """Pre-shift region id per (window, token): (nW, win_vol) int32.

    Two tokens of a window may attend iff their region ids match — the Swin
    shift mask in factored form (ref: backbone_swin.py:591-628). Computed in
    numpy so it constant-folds at trace time.
    """
    d, h, w = dims
    wd, wh, ww = window_size
    sd, sh, sw = shift_size
    img = np.zeros((1, d, h, w, 1), dtype=np.int32)
    cnt = 0
    for ds in (slice(-wd), slice(-wd, -sd) if sd else slice(-wd, None), slice(-sd, None) if sd else None):
        if ds is None:
            continue
        for hs in (slice(-wh), slice(-wh, -sh) if sh else slice(-wh, None), slice(-sh, None) if sh else None):
            if hs is None:
                continue
            for ws in (slice(-ww), slice(-ww, -sw) if sw else slice(-ww, None), slice(-sw, None) if sw else None):
                if ws is None:
                    continue
                img[:, ds, hs, ws, :] = cnt
                cnt += 1
    # Partition into windows, flatten to (nW, win_vol).
    win = img.reshape(1, d // wd, wd, h // wh, wh, w // ww, ww, 1)
    win = win.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, wd * wh * ww)
    return win


def compute_shift_regions(dims, window_size, shift_size):
    """(nW, win_vol) int32 region ids for the fused windowed-attention kernel."""
    return jnp.asarray(_shift_regions_np(dims, window_size, shift_size))


def compute_shift_mask(dims, window_size, shift_size, mask_value=-100.0):
    """Additive attention mask for shifted windows (ref: backbone_swin.py:591-628).

    Returns (nW, win_vol, win_vol) float32 with ``mask_value`` at positions
    where query and key come from different pre-shift regions, 0 elsewhere.
    """
    win = _shift_regions_np(dims, window_size, shift_size)
    diff = win[:, None, :] - win[:, :, None]
    mask = np.where(diff != 0, mask_value, 0.0).astype(np.float32)
    return jnp.asarray(mask)


def relative_position_index(window_size):
    """Index into the relative-position-bias table per (query, key) pair.

    Standard Swin formula (ref: backbone_swin.py:253-282): for a 3D window the
    table has (2wd-1)(2wh-1)(2ww-1) entries; returns an int32 array of shape
    (win_vol, win_vol). Computed in numpy (static).
    """
    wd, wh, ww = window_size
    coords = np.stack(np.meshgrid(np.arange(wd), np.arange(wh), np.arange(ww),
                                  indexing="ij"))  # 3, wd, wh, ww
    coords = coords.reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # 3, V, V
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= (2 * ww - 1)
    index = rel.sum(-1)
    return jnp.asarray(index, dtype=jnp.int32)


def pad_to_window_multiple(x, window_size):
    """Pad (B, D, H, W, C) spatial dims up to window multiples; returns (x, dims)."""
    b, d, h, w, c = x.shape
    wd, wh, ww = window_size
    pd = (-d) % wd
    ph = (-h) % wh
    pw = (-w) % ww
    if pd or ph or pw:
        x = jnp.pad(x, ((0, 0), (0, pd), (0, ph), (0, pw), (0, 0)))
    return x, (d + pd, h + ph, w + pw)
