"""On-device (jit-compiled) train metrics.

The reference computes train metrics on-GPU via torchmetrics every step
(ref: metrics/metrics_base.py:150-183). Round 1 fetched the full model output
to the host each step instead — for the 3D segmentation workloads that is
hundreds of MB per step through a ~30 ms-latency relay. These functions
compute the same batch metrics as `metrics.functional` inside the compiled
train step, so the host fetches one small stats vector per step.

All functions take the raw channels-last model output, the raw labels, and a
`(B,)` validity mask (the loader pads ragged final batches to a static batch
size; padded rows must not contribute). Semantics mirror
`metrics/functional.py` exactly — parity is tested in tests/test_metrics_losses.py.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax


def _safe_div(num, den):
    return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)


# --------------------------------------------------------------------------- #
# Classification
# --------------------------------------------------------------------------- #

def _pairwise_auroc(scores, pos, neg):
    """Rank-statistic AUROC via pairwise comparisons (ties count 0.5) —
    identical to functional._binary_auroc's tie-averaged ranks. Batch sizes
    here are tiny (<=32), so the B^2 pair matrix is negligible."""
    s = scores.astype(jnp.float32)
    gt = (s[:, None] > s[None, :]).astype(jnp.float32)
    eq = (s[:, None] == s[None, :]).astype(jnp.float32)
    pair = pos[:, None] * neg[None, :]
    wins = jnp.sum(pair * (gt + 0.5 * eq))
    n_pairs = jnp.sum(pos) * jnp.sum(neg)
    return _safe_div(wins, n_pairs), n_pairs > 0


def auroc_device(output, labels, valid, binary: bool):
    """output (B, C) logits, labels (B,) ints, valid (B,) float mask."""
    probs = jnp.exp(output - output.max(axis=1, keepdims=True))
    probs = probs / probs.sum(axis=1, keepdims=True)
    labels = labels.astype(jnp.int32)
    if binary:
        pos = (labels == 1).astype(jnp.float32) * valid
        neg = (labels != 1).astype(jnp.float32) * valid
        auc, ok = _pairwise_auroc(probs[:, -1], pos, neg)
        return jnp.where(ok, auc, 0.0)
    vals, oks = [], []
    for c in range(output.shape[1]):
        pos = (labels == c).astype(jnp.float32) * valid
        neg = (labels != c).astype(jnp.float32) * valid
        auc, ok = _pairwise_auroc(probs[:, c], pos, neg)
        vals.append(auc)
        oks.append(ok.astype(jnp.float32))
    vals = jnp.stack(vals)
    oks = jnp.stack(oks)
    return _safe_div(jnp.sum(vals * oks), jnp.sum(oks))


# --------------------------------------------------------------------------- #
# Segmentation
# --------------------------------------------------------------------------- #

def f1_samplewise_device(output, labels, valid, binary: bool, num_classes: int):
    """Samplewise macro F1 (the Dice proxy; ref metrics_utils.py:19-20).
    output (B, ..., C) logits, labels (B, ...) int masks."""
    hard = jnp.argmax(output, axis=-1).reshape(output.shape[0], -1)
    lab = labels.reshape(labels.shape[0], -1).astype(hard.dtype)
    classes = [1] if binary else list(range(num_classes))
    f1s = []
    for c in classes:
        tp = jnp.sum((hard == c) & (lab == c), axis=1).astype(jnp.float32)
        fp = jnp.sum((hard == c) & (lab != c), axis=1).astype(jnp.float32)
        fn = jnp.sum((hard != c) & (lab == c), axis=1).astype(jnp.float32)
        f1s.append(_safe_div(2 * tp, 2 * tp + fp + fn))
    per_sample = jnp.mean(jnp.stack(f1s), axis=0)          # (B,)
    return _safe_div(jnp.sum(per_sample * valid), jnp.sum(valid))


# --------------------------------------------------------------------------- #
# Enhancement
# --------------------------------------------------------------------------- #

def _masked_data_range(target, valid):
    """torchmetrics default: data_range = max-min over the (valid) targets."""
    bshape = (-1,) + (1,) * (target.ndim - 1)
    m = valid.reshape(bshape) > 0
    tmax = jnp.max(jnp.where(m, target, -jnp.inf))
    tmin = jnp.min(jnp.where(m, target, jnp.inf))
    dr = tmax - tmin
    return jnp.where(dr == 0.0, 1.0, dr)


def psnr_device(output, target, valid):
    """Matches functional.psnr over the valid rows (equal-sized samples, so
    the batch-flat mean equals the mean of per-sample means)."""
    o = output.astype(jnp.float32)
    t = target.astype(jnp.float32)
    dr = _masked_data_range(t, valid)
    per = jnp.mean(jnp.square(o - t), axis=tuple(range(1, o.ndim)))
    mse = _safe_div(jnp.sum(per * valid), jnp.sum(valid))
    return 10.0 * jnp.log10(dr * dr / mse)


@functools.lru_cache(maxsize=None)
def _gauss1d(size: int = 11, sigma: float = 1.5):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _sep_filter_valid(x, k):
    """Separable VALID convolution of (N, 1, *spatial) with 1D kernel k along
    every spatial axis. Equal to functional.ssim's reflect-pad conv followed
    by its margin crop."""
    size = k.shape[0]
    spatial = x.ndim - 2
    for ax in range(spatial):
        kshape = [1, 1] + [1] * spatial
        kshape[2 + ax] = size
        rhs = jnp.asarray(k).reshape(kshape)
        x = lax.conv_general_dilated(
            x, rhs, window_strides=(1,) * spatial, padding="VALID",
            precision=lax.Precision.HIGHEST)
    return x


def ssim_device(output, target, valid, kernel_size: int = 11,
                sigma: float = 1.5):
    """torchmetrics SSIM (gaussian window, K1=.01, K2=.03), batch mean over
    valid rows. output/target in model layout (B, T, H, W, C); time squeezed
    when T == 1 (ref metrics_base.py:166-170)."""
    o = output.astype(jnp.float32)
    t = target.astype(jnp.float32)
    dr = _masked_data_range(t, valid)
    b, c = o.shape[0], o.shape[-1]
    # -> (B*C, 1, [T,] H, W)
    if o.shape[1] == 1:
        o = o[:, 0]
        t = t[:, 0]
    o = jnp.moveaxis(o, -1, 1).reshape((b * c, 1) + o.shape[1:-1])
    t = jnp.moveaxis(t, -1, 1).reshape((b * c, 1) + t.shape[1:-1])

    c1 = (0.01 * dr) ** 2
    c2 = (0.03 * dr) ** 2
    k = _gauss1d(kernel_size, sigma)
    f = functools.partial(_sep_filter_valid, k=k)
    mu_x, mu_y = f(o), f(t)
    sig_x = f(o * o) - mu_x ** 2
    sig_y = f(t * t) - mu_y ** 2
    sig_xy = f(o * t) - mu_x * mu_y
    num = (2 * mu_x * mu_y + c1) * (2 * sig_xy + c2)
    den = (mu_x ** 2 + mu_y ** 2 + c1) * (sig_x + sig_y + c2)
    per = jnp.mean((num / den).reshape(b, -1), axis=1)     # (B,)
    return _safe_div(jnp.sum(per * valid), jnp.sum(valid))


# --------------------------------------------------------------------------- #
# Task dispatch
# --------------------------------------------------------------------------- #

def valid_mask(b: int, n_valid) -> jnp.ndarray:
    """(B,) float validity mask from a count (first n rows valid —
    single-host, padding at the batch tail) or a per-row mask (multi-host,
    each process's padding sits at the tail of its own block of the global
    batch axis)."""
    if n_valid is None:
        return jnp.ones((b,), jnp.float32)
    if getattr(n_valid, "ndim", 0) >= 1:
        return jnp.reshape(n_valid, (-1,)).astype(jnp.float32)
    return (jnp.arange(b) < n_valid).astype(jnp.float32)


def make_train_metric_fn(config):
    """Returns (names, metric_fn) where metric_fn(output, labels, n_valid)
    computes the task's train metrics (sans loss) as a jnp vector, inside jit.
    `n_valid` is a count or a per-row mask (see valid_mask). `names` matches
    the manager's train metric order."""
    task = config.task_type
    binary = config.no_out_channel in (1, 2)
    nc = config.no_out_channel

    if task == "class":
        names = ("auroc",)

        def fn(output, labels, n_valid):
            valid = valid_mask(output.shape[0], n_valid)
            return jnp.stack([auroc_device(output, labels, valid, binary)])
    elif task == "seg":
        names = ("f1",)

        def fn(output, labels, n_valid):
            valid = valid_mask(output.shape[0], n_valid)
            return jnp.stack([
                f1_samplewise_device(output, labels, valid, binary, nc)])
    elif task == "enhance":
        names = ("ssim", "psnr")

        def fn(output, labels, n_valid):
            valid = valid_mask(output.shape[0], n_valid)
            return jnp.stack([ssim_device(output, labels, valid),
                              psnr_device(output, labels, valid)])
    else:
        names = ()

        def fn(output, labels, n_valid):
            return jnp.zeros((0,), jnp.float32)

    return names, fn
