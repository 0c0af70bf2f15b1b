"""The fused (grouped, block-diagonal, region-masked, projection-fused)
windowed-attention kernel must be numerically identical to plain per-window
XLA attention with a materialized bias, through the full Swin backbone
(shifted blocks included)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

import long_context_biomedical_imaging_tpu.models.swin as swin_mod
from long_context_biomedical_imaging_tpu.models.swin import SwinBackbone
from long_context_biomedical_imaging_tpu.ops.window_attention import (
    _xla_fallback_proj)


def _plain(x, wqkv, bqkv, wout, bout, rel, heads, rid=None,
           mask_value=-100.0, scale=None, group=None):
    c = x.shape[-1]
    d = c // heads
    if scale is None:
        scale = d ** -0.5
    if bqkv is None:
        bqkv = jnp.zeros((3 * c,), jnp.float32)
    if bout is None:
        bout = jnp.zeros((c,), jnp.float32)
    return _xla_fallback_proj(x, wqkv, bqkv, wout, bout, rel, heads, rid,
                              mask_value, scale)


def test_fused_equals_xla_reference(rng):
    x = jnp.asarray(rng.normal(size=(2, 1, 32, 32, 1)).astype(np.float32))

    model = SwinBackbone(patch_size=(2, 2), window_size=(4, 4), in_channels=1,
                         embed_dim=12, depths=(2, 2), num_heads=(2, 2))
    variables = model.init(jax.random.PRNGKey(0), x, deterministic=True)
    out_fused = model.apply(variables, x, deterministic=True)

    orig = swin_mod.windowed_attention_proj
    try:
        swin_mod.windowed_attention_proj = \
            lambda x, wqkv, bqkv, wout, bout, rel, heads, rid=None: \
            _plain(x, wqkv, bqkv, wout, bout, rel, heads, rid)
        out_plain = model.apply(variables, x, deterministic=True)
    finally:
        swin_mod.windowed_attention_proj = orig

    for g, p in zip(out_fused, out_plain):
        np.testing.assert_allclose(np.asarray(g), np.asarray(p),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_fused_gradients_match(rng):
    """Gradients (incl. the relative-position table and the in-kernel
    qkv/out projection weights) through the fused kernel match XLA."""
    x = jnp.asarray(rng.normal(size=(1, 1, 16, 16, 1)).astype(np.float32))
    model = SwinBackbone(patch_size=(2, 2), window_size=(4, 4), in_channels=1,
                         embed_dim=12, depths=(2,), num_heads=(2,))
    variables = model.init(jax.random.PRNGKey(0), x, deterministic=True)

    def loss(params):
        outs = model.apply({"params": params}, x, deterministic=True)
        return sum(jnp.sum(o ** 2) for o in outs)

    g_fused = jax.grad(loss)(variables["params"])

    orig = swin_mod.windowed_attention_proj
    try:
        swin_mod.windowed_attention_proj = \
            lambda x, wqkv, bqkv, wout, bout, rel, heads, rid=None: \
            _plain(x, wqkv, bqkv, wout, bout, rel, heads, rid)
        g_plain = jax.grad(loss)(variables["params"])
    finally:
        swin_mod.windowed_attention_proj = orig

    flat_f = jax.tree.leaves(g_fused)
    flat_p = jax.tree.leaves(g_plain)
    assert len(flat_f) == len(flat_p)
    for a, b in zip(flat_f, flat_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)
