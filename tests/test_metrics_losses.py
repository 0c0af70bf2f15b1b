"""Golden tests: metrics vs sklearn, losses vs hand-computed / torch formulas."""

import numpy as np
import pytest
from sklearn.metrics import f1_score as sk_f1
from sklearn.metrics import roc_auc_score

from long_context_biomedical_imaging_tpu.metrics import (accuracy_top1, auroc,
                                                         f1_score, psnr, ssim)


def test_binary_auroc_matches_sklearn(rng):
    scores = rng.random(200)
    labels = (rng.random(200) > 0.6).astype(int)
    got = auroc(scores, labels, binary=True)
    want = roc_auc_score(labels, scores)
    assert abs(got - want) < 1e-9


def test_multiclass_auroc_matches_sklearn(rng):
    probs = rng.random((300, 4))
    probs /= probs.sum(1, keepdims=True)
    labels = rng.integers(0, 4, 300)
    got = auroc(probs, labels, binary=False)
    want = roc_auc_score(labels, probs, multi_class="ovr", average="macro")
    assert abs(got - want) < 1e-9


def test_f1_matches_sklearn(rng):
    # binary global
    preds = rng.random(500)
    labels = rng.integers(0, 2, 500)
    got = f1_score(preds, labels, binary=True, num_classes=2)
    want = sk_f1(labels, preds >= 0.5)
    assert abs(got - want) < 1e-9
    # multiclass macro on hard labels
    hard = rng.integers(0, 5, 500)
    labels5 = rng.integers(0, 5, 500)
    got = f1_score(hard, labels5, binary=False, num_classes=5)
    want = sk_f1(labels5, hard, average="macro", labels=list(range(5)))
    assert abs(got - want) < 1e-9


def test_accuracy(rng):
    probs = rng.random((100, 3))
    labels = rng.integers(0, 3, 100)
    got = accuracy_top1(probs, labels, binary=False)
    assert abs(got - (probs.argmax(1) == labels).mean()) < 1e-12


def test_psnr_known_value():
    t = np.zeros((1, 1, 8, 8))
    p = np.full((1, 1, 8, 8), 0.1)
    t[0, 0, 0, 0] = 1.0  # data_range = 1
    mse = ((p - t) ** 2).mean()
    assert abs(psnr(p, t) - 10 * np.log10(1 / mse)) < 1e-9


def test_ssim_identity_and_noise(rng):
    img = rng.random((2, 1, 32, 32))
    assert ssim(img, img) > 0.9999
    noisy = img + rng.normal(0, 0.5, img.shape)
    assert ssim(noisy, img) < 0.6


def test_losses_match_reference_formulas(rng):
    import jax.numpy as jnp

    from long_context_biomedical_imaging_tpu.losses import (charbonnier_loss,
                                                            cross_entropy_loss,
                                                            get_loss_func,
                                                            mse_loss)

    o = rng.normal(size=(2, 4, 8, 8, 3)).astype(np.float32)
    t = rng.normal(size=(2, 4, 8, 8, 3)).astype(np.float32)
    got = float(mse_loss(jnp.asarray(o), jnp.asarray(t)))
    assert abs(got - ((o - t) ** 2).mean()) < 1e-5

    got = float(charbonnier_loss(jnp.asarray(o), jnp.asarray(t)))
    want = np.sqrt((o - t) ** 2 + 1e-6).mean()
    assert abs(got - want) < 1e-5

    # CE vs torch
    import torch
    logits = rng.normal(size=(8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, 8)
    got = float(cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    want = float(torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor(labels)))
    assert abs(got - want) < 1e-5

    # registry resolves and combined is finite
    comb = get_loss_func("CombinationEnhance")
    v = float(comb(jnp.asarray(o), jnp.asarray(t)))
    assert np.isfinite(v) and v > 0


def test_gaussian_deriv_loss_zero_on_identical(rng):
    import jax.numpy as jnp

    from long_context_biomedical_imaging_tpu.losses import gaussian_deriv3d_loss
    o = rng.normal(size=(1, 4, 16, 16, 1)).astype(np.float32)
    assert float(gaussian_deriv3d_loss(jnp.asarray(o), jnp.asarray(o))) == 0.0
    t = rng.normal(size=(1, 4, 16, 16, 1)).astype(np.float32)
    assert float(gaussian_deriv3d_loss(jnp.asarray(o), jnp.asarray(t))) > 0.0


# --------------------------------------------------------------------------- #
# Device (jit) train metrics must match the host functionals
# --------------------------------------------------------------------------- #

def test_device_auroc_matches_host(rng):
    import jax.numpy as jnp

    from long_context_biomedical_imaging_tpu.metrics.device import auroc_device

    # binary, with padded rows masked out
    logits = rng.normal(size=(16, 2)).astype(np.float32)
    labels = rng.integers(0, 2, 16)
    n_valid = 13
    valid = (np.arange(16) < n_valid).astype(np.float32)
    got = float(auroc_device(jnp.asarray(logits), jnp.asarray(labels),
                             jnp.asarray(valid), binary=True))
    e = np.exp(logits - logits.max(1, keepdims=True))
    probs = e / e.sum(1, keepdims=True)
    want = auroc(probs[:n_valid, -1], labels[:n_valid], binary=True)
    assert abs(got - want) < 1e-6

    # multiclass macro OVR
    logits = rng.normal(size=(16, 4)).astype(np.float32)
    labels = rng.integers(0, 4, 16)
    got = float(auroc_device(jnp.asarray(logits), jnp.asarray(labels),
                             jnp.asarray(valid), binary=False))
    e = np.exp(logits - logits.max(1, keepdims=True))
    probs = e / e.sum(1, keepdims=True)
    want = auroc(probs[:n_valid], labels[:n_valid], binary=False)
    assert abs(got - want) < 1e-6


def test_device_f1_samplewise_matches_host(rng):
    import jax.numpy as jnp

    from long_context_biomedical_imaging_tpu.metrics.device import \
        f1_samplewise_device

    for nc, binary in ((2, True), (5, False)):
        out = rng.normal(size=(6, 1, 8, 8, nc)).astype(np.float32)
        lab = rng.integers(0, nc, (6, 1, 8, 8))
        n_valid = 5
        valid = (np.arange(6) < n_valid).astype(np.float32)
        got = float(f1_samplewise_device(
            jnp.asarray(out), jnp.asarray(lab), jnp.asarray(valid),
            binary=binary, num_classes=nc))
        hard = out.argmax(-1).reshape(6, -1)[:n_valid]
        want = f1_score(hard, lab.reshape(6, -1)[:n_valid], binary=binary,
                        num_classes=nc, samplewise=True)
        assert abs(got - want) < 1e-6, (nc, binary)


def test_device_psnr_ssim_match_host(rng):
    import jax.numpy as jnp

    from long_context_biomedical_imaging_tpu.metrics.device import (
        psnr_device, ssim_device)

    # 2D enhance layout: model output (B, 1, H, W, C); host metric layout
    # (B, C, H, W) after the manager's postprocess
    out = rng.normal(size=(4, 1, 24, 24, 2)).astype(np.float32)
    lab = rng.normal(size=(4, 1, 24, 24, 2)).astype(np.float32)
    n_valid = 3
    valid = (np.arange(4) < n_valid).astype(np.float32)
    got_p = float(psnr_device(jnp.asarray(out), jnp.asarray(lab),
                              jnp.asarray(valid)))
    got_s = float(ssim_device(jnp.asarray(out), jnp.asarray(lab),
                              jnp.asarray(valid)))
    host_out = np.moveaxis(out, -1, 1)[:, :, 0][:n_valid]
    host_lab = np.moveaxis(lab, -1, 1)[:, :, 0][:n_valid]
    assert abs(got_p - psnr(host_out, host_lab)) < 1e-3
    assert abs(got_s - ssim(host_out, host_lab)) < 1e-3

    # 3D: (B, T, H, W, C) vs host (B, C, T, H, W)
    out = rng.normal(size=(2, 12, 16, 16, 1)).astype(np.float32)
    lab = rng.normal(size=(2, 12, 16, 16, 1)).astype(np.float32)
    valid = np.ones(2, np.float32)
    got_s = float(ssim_device(jnp.asarray(out), jnp.asarray(lab),
                              jnp.asarray(valid)))
    want_s = ssim(np.moveaxis(out, -1, 1), np.moveaxis(lab, -1, 1))
    assert abs(got_s - want_s) < 1e-3


def test_gaussian_deriv3d_separable_matches_dense(rng):
    """The separable shift-and-MAC form == the reference's dense 3D conv."""
    import functools

    import jax.numpy as jnp
    from jax import lax
    from long_context_biomedical_imaging_tpu.losses.enhancement_losses import (
        _deriv_kernel_3d, gaussian_deriv3d_loss)

    o = jnp.asarray(rng.normal(size=(2, 6, 10, 12, 1)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(2, 6, 10, 12, 1)).astype(np.float32))

    def dense(outputs, targets, sigmas=(0.25, 0.5, 1.0),
              sigmas_t=(0.25, 0.5, 0.5)):
        oo, tt = outputs, targets
        c = oo.shape[-1]
        total = 0.0
        for sigma, sigma_t in zip(sigmas, sigmas_t):
            k = jnp.asarray(_deriv_kernel_3d(float(sigma), float(sigma_t)))
            kt, kh, kw = k.shape
            rhs = jnp.broadcast_to(k[:, :, :, None, None], (kt, kh, kw, 1, c))
            rhs = rhs.transpose(4, 3, 0, 1, 2)
            pads = [((kk - 1) // 2, kk // 2) for kk in (kt, kh, kw)]
            conv = functools.partial(
                lax.conv_general_dilated, window_strides=(1, 1, 1),
                padding=pads, dimension_numbers=("NDHWC", "OIDHW", "NDHWC"),
                feature_group_count=c, precision=lax.Precision.HIGHEST)
            total = total + jnp.mean(jnp.abs(conv(oo, rhs) - conv(tt, rhs)),
                                     axis=(1, 2, 3, 4))
        return jnp.mean(total / len(sigmas))

    np.testing.assert_allclose(float(gaussian_deriv3d_loss(o, t)),
                               float(dense(o, t)), rtol=1e-5, atol=1e-6)
