"""The grouped block-diagonal window attention must be numerically identical
to per-window attention (same params), including shifted blocks."""

import jax
import jax.numpy as jnp
import numpy as np

import long_context_biomedical_imaging_tpu.models.swin as swin_mod
from long_context_biomedical_imaging_tpu.models.swin import SwinBackbone


def _forward(x, patch=False):
    model = SwinBackbone(patch_size=(2, 2), window_size=(4, 4), in_channels=1,
                         embed_dim=12, depths=(2, 2), num_heads=(2, 2))
    variables = model.init(jax.random.PRNGKey(0), x, deterministic=True)
    return model.apply(variables, x, deterministic=True), variables


def test_grouped_equals_ungrouped(rng):
    x = jnp.asarray(rng.normal(size=(2, 1, 32, 32, 1)).astype(np.float32))

    orig = swin_mod._window_group
    try:
        # grouped (normal path; V=16 -> G=16 windows/group)
        model = SwinBackbone(patch_size=(2, 2), window_size=(4, 4), in_channels=1,
                             embed_dim=12, depths=(2, 2), num_heads=(2, 2))
        variables = model.init(jax.random.PRNGKey(0), x, deterministic=True)
        out_grouped = model.apply(variables, x, deterministic=True)

        swin_mod._window_group = lambda *a, **k: 1
        out_plain = model.apply(variables, x, deterministic=True)
    finally:
        swin_mod._window_group = orig

    assert swin_mod._window_group is orig
    for g, p in zip(out_grouped, out_plain):
        np.testing.assert_allclose(np.asarray(g), np.asarray(p),
                                   rtol=2e-4, atol=2e-4)
