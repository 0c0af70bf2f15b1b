"""Shape normalization + paired host-side augmentations.

Equivalents of the reference data utils (ref: data/data_utils.py:19-150,
data/augmentation_functions/brightness.py:4-28), built on numpy/cv2 for the
host-side input pipeline. The framework's device layout is channels-last:
`normalize_shape` returns (T, H, W, C) instead of the reference's (C, T, H, W).

Paired augmentation: geometric params are sampled once per item and applied to
both input and target (the reference achieves this by re-seeding the global
RNG, ref: data/data_base.py:86-99); photometric jitter applies to the input
and, for enhancement tasks, to the target with the same draw.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import cv2
import numpy as np


def normalize_shape(image: np.ndarray, height: int, width: int, time: int,
                    no_channels: int, interp=cv2.INTER_LINEAR) -> np.ndarray:
    """Stored H x W (x D x C) numpy -> standardized (T, H, W, C) float32.

    Mirrors the reference's dim-combination handling: cv2 XY resize (bilinear,
    nearest for masks), center crop/pad on depth, channel checks
    (ref: data/data_utils.py:19-107).
    """
    image = np.asarray(image, dtype=np.float32)
    if image.ndim not in (2, 3, 4):
        raise ValueError(
            f"Image shape should be H x W (x D x C); got {image.ndim} dims")

    def resize_xy(img):
        if img.shape[0] == height and img.shape[1] == width:
            return img
        # cv2 5.x resize rejects >~128 trailing channels (matrix_wrap.cpp
        # dims<=2 assert) — deep volumes (H, W, D*C) must go in chunks;
        # per-channel bilinear results are independent, so this is exact
        if img.ndim == 3 and img.shape[2] > 128:
            parts = [cv2.resize(img[:, :, i:i + 128], (width, height),
                                interpolation=interp)
                     .reshape(height, width, -1)
                     for i in range(0, img.shape[2], 128)]
            out = np.concatenate(parts, axis=2)
        else:
            out = cv2.resize(img, (width, height), interpolation=interp)
        # cv2 drops trailing singleton channel axes: (H, W, 1) -> (H, W)
        return out.reshape((height, width) + img.shape[2:])

    def resize_depth(img):  # img: H, W, D(, C)
        d_axis = 2
        d = img.shape[d_axis]
        if d < time:
            pad = time - d
            pads = [(0, 0)] * img.ndim
            pads[d_axis] = (pad // 2, pad - pad // 2)
            img = np.pad(img, pads)
        elif d > time:
            crop = d - time
            sl = [slice(None)] * img.ndim
            sl[d_axis] = slice(crop // 2, d - (crop - crop // 2))
            img = img[tuple(sl)]
        return img

    if time == 1:
        if image.ndim == 2:
            if no_channels != 1:
                raise ValueError("Multi-channel specified but stored image is 2D")
            image = resize_xy(image)[:, :, None, None]
        elif image.ndim == 3:
            if image.shape[-1] != no_channels:
                raise ValueError(
                    f"Channel dim {image.shape[-1]} != specified {no_channels}")
            image = resize_xy(image)[:, :, None, :]
        else:  # 4D: H W 1 C
            if image.shape[-2] != 1:
                raise ValueError(f"time=1 but stored depth is {image.shape[-2]}")
            if image.shape[-1] != no_channels:
                raise ValueError(
                    f"Channel dim {image.shape[-1]} != specified {no_channels}")
            h0, w0, d0, c0 = image.shape
            image = resize_xy(image.reshape(h0, w0, d0 * c0)).reshape(
                height, width, d0, c0)
    else:
        if image.ndim == 2:
            raise ValueError("time>1 specified but stored image is 2D")
        if image.ndim == 3:
            if no_channels != 1:
                raise ValueError("time>1 and channels>1 need a 4D stored image")
            image = resize_xy(image)
            image = resize_depth(image)[:, :, :, None]
        else:
            if image.shape[-1] != no_channels:
                raise ValueError(
                    f"Channel dim {image.shape[-1]} != specified {no_channels}")
            h0, w0, d0, c0 = image.shape
            image = resize_xy(image.reshape(h0, w0, d0 * c0)).reshape(
                height, width, d0, c0)
            image = resize_depth(image)

    # (H, W, D, C) -> (T/D, H, W, C) channels-last
    return np.ascontiguousarray(np.transpose(image, (2, 0, 1, 3)))


@dataclass
class AugmentationParams:
    """Per-item draws shared between input and target."""
    apply_affine: bool = False
    angle: float = 0.0
    tx: int = 0
    ty: int = 0
    scale: float = 1.0
    shear_x: float = 0.0
    apply_brightness: bool = False
    alpha: float = 1.0
    beta: float = 0.0
    apply_blur: bool = False
    blur_sigma: float = 1.0


def sample_augmentation_params(rng: np.random.Generator, config, height: int,
                               width: int) -> AugmentationParams:
    """Sample per-item augs (torchvision parameter conventions,
    ref: data/data_utils.py:128-141)."""
    p = AugmentationParams()
    if config.affine_aug and rng.random() < 0.9:
        p.apply_affine = True
        p.angle = float(rng.uniform(-10, 10))
        p.tx = int(round(rng.uniform(-0.1, 0.1) * width))
        p.ty = int(round(rng.uniform(-0.1, 0.1) * height))
        p.scale = float(rng.uniform(0.95, 1.05))
        p.shear_x = float(rng.uniform(-10, 10))
    if config.brightness_aug and rng.random() < 0.9:
        p.apply_brightness = True
        p.alpha = 1.0 + float(rng.uniform(-0.3, 0.3))
        p.beta = float(rng.uniform(-0.3, 0.3))
    if config.gaussian_blur_aug and rng.random() < 0.15:
        p.apply_blur = True
        p.blur_sigma = float(rng.uniform(0.1, 5.0))
    return p


def _affine_matrix(params: AugmentationParams, height: int, width: int) -> np.ndarray:
    """Center-based affine (rotation + translate + scale + x-shear), matching
    torchvision.RandomAffine geometry."""
    cx, cy = width * 0.5, height * 0.5
    rot = math.radians(params.angle)
    sx = math.radians(params.shear_x)
    a = params.scale * math.cos(rot + sx) / math.cos(sx)
    b = params.scale * (-math.cos(rot + sx) * math.tan(sx) / math.cos(sx) - math.sin(rot))
    c = params.scale * math.sin(rot + sx) / math.cos(sx)
    d = params.scale * (-math.sin(rot + sx) * math.tan(sx) / math.cos(sx) + math.cos(rot))
    m = np.array([[a, b, 0.0], [c, d, 0.0]], dtype=np.float64)
    m[0, 2] = params.tx + cx - (a * cx + b * cy)
    m[1, 2] = params.ty + cy - (c * cx + d * cy)
    return m


def apply_augmentations(image: np.ndarray, params: AugmentationParams,
                        geometric: bool = True, photometric: bool = True,
                        nearest: bool = False) -> np.ndarray:
    """Apply sampled augs to a (T, H, W, C) array.

    torchvision RandomAffine default interpolation is NEAREST; we keep that
    for both images and masks (ref behavior).
    """
    t, h, w, c = image.shape
    out = image
    if geometric and params.apply_affine:
        m = _affine_matrix(params, h, w)
        flag = cv2.INTER_NEAREST  # torchvision default for RandomAffine
        warped = np.empty_like(out)
        for ti in range(t):
            warped[ti] = cv2.warpAffine(
                out[ti], m, (w, h), flags=flag,
                borderMode=cv2.BORDER_CONSTANT, borderValue=0.0,
            ).reshape(h, w, c)
        out = warped
    if photometric and params.apply_brightness:
        out = out * params.alpha
        out = out + params.beta * out.mean()
    if photometric and params.apply_blur:
        blurred = np.empty_like(out)
        for ti in range(t):
            blurred[ti] = cv2.GaussianBlur(
                out[ti], (1, 3), sigmaX=params.blur_sigma,
                sigmaY=params.blur_sigma).reshape(h, w, c)
        out = blurred
    return out.astype(np.float32)
