"""Layer-level goldens: patchify-as-reshape equals strided-conv patchify;
Hyena implicit filter construction."""

import jax
import jax.numpy as jnp
import numpy as np

from long_context_biomedical_imaging_tpu.models.hyena import (
    HyenaFilter, _positional_embedding_init)
from long_context_biomedical_imaging_tpu.models.layers import extract_patches


def test_extract_patches_matches_manual(rng):
    x = rng.normal(size=(2, 4, 6, 8, 3)).astype(np.float32)  # (B, D, H, W, C)
    out = np.asarray(extract_patches(jnp.asarray(x), (2, 3, 4)))
    assert out.shape == (2, 2, 2, 2, 2 * 3 * 4 * 3)
    # features are (p0, p1, p2, C) row-major per output cell
    for b in (0, 1):
        cell = out[b, 1, 0, 1]
        want = x[b, 2:4, 0:3, 4:8, :].reshape(-1)
        np.testing.assert_array_equal(cell, want)


def test_patchify_dense_equals_strided_conv(rng):
    """reshape+Dense is the same linear map as kernel=stride conv."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 1)).astype(np.float32))
    w_conv = jnp.asarray(rng.normal(size=(4, 4, 1, 5)).astype(np.float32))
    conv_out = jax.lax.conv_general_dilated(
        x, w_conv, (4, 4), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    patches = extract_patches(x, (4, 4))               # (2, 2, 2, 16)
    dense_out = patches @ w_conv.reshape(16, 5)
    np.testing.assert_allclose(np.asarray(dense_out), np.asarray(conv_out),
                               rtol=1e-5, atol=1e-5)


def test_hyena_positional_embedding_formula():
    z = _positional_embedding_init(emb_dim=3, seq_len=100)
    assert z.shape == (1, 100, 3)
    # column 0 is normalized time
    np.testing.assert_allclose(z[0, :, 0], np.linspace(0, 1, 100), rtol=1e-6)
    # columns 1/2 are cos/-sin of f*2*pi*t/L with f=1e-4 (ref: hyena.py:79-84)
    w = 2 * np.pi * np.arange(100) / 100
    np.testing.assert_allclose(z[0, :, 1], np.cos(1e-4 * w), rtol=1e-5)
    np.testing.assert_allclose(z[0, :, 2], -np.sin(1e-4 * w), rtol=1e-5, atol=1e-7)


def test_hyena_filter_modulation_decays():
    filt = HyenaFilter(d_model=8, order=16, seq_len=64)
    variables = filt.init(jax.random.PRNGKey(0), 64)
    k = filt.apply(variables, 64)                      # (64, 8)
    assert k.shape == (64, 8)
    decay = np.asarray(filt.apply(variables, 64,
                                  method=lambda m, L: m._modulation_decay(L)))
    # exponential modulation decreases monotonically along the filter
    assert np.all(np.diff(decay, axis=0) <= 1e-7)
    assert decay.max() <= 1.0 + 1e-6 and decay.min() > 0
