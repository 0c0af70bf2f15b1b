"""Model wiring tests: every encoder/decoder combo initializes and produces the
contracted output shapes on tiny inputs (mirrors the reference's model_info
smoke test, ref: utils/status.py:63-93)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from long_context_biomedical_imaging_tpu.models import build_model
from long_context_biomedical_imaging_tpu.setup import Config, check_args, parse_config


def make_config(**over):
    argv = []
    for k, v in over.items():
        if isinstance(v, bool):
            argv.append(f"--{k}={v}")
        elif isinstance(v, (list, tuple)):
            argv.append(f"--{k}")
            argv.extend(str(x) for x in v)
        else:
            argv.append(f"--{k}={v}")
    cfg = parse_config(argv=argv)
    return check_args(cfg)


def init_and_forward(cfg, batch=2):
    model = build_model(cfg)
    x = jnp.zeros((batch, cfg.time, cfg.height, cfg.width, cfg.no_in_channel),
                  jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, deterministic=True)
    out = model.apply(variables, x, deterministic=True)
    return out, variables


# ---- ViT combos -------------------------------------------------------------

@pytest.mark.parametrize("mixer", ["attn", "hyena", "mamba"])
def test_vit_linear_class_2d(mixer):
    cfg = make_config(encoder_name="ViT", decoder_name="ViTLinear", task_type="class",
                      height=32, width=32, time=1, no_in_channel=1, no_out_channel=2)
    cfg.ViT.size = "custom"
    cfg.ViT.hidden_size, cfg.ViT.mlp_dim = 48, 96
    cfg.ViT.num_layers, cfg.ViT.num_heads = 2, 2
    cfg.ViT.patch_size = [8, 8, 8]
    cfg.ViT.use_hyena = mixer == "hyena"
    cfg.ViT.use_mamba = mixer == "mamba"
    out, _ = init_and_forward(cfg)
    assert out.shape == (2, 2)


@pytest.mark.slow
def test_vit_upernet2d_seg():
    cfg = make_config(encoder_name="ViT", decoder_name="UperNet2D", task_type="seg",
                      height=32, width=32, time=1, no_in_channel=3, no_out_channel=4)
    cfg.ViT.size = "custom"
    cfg.ViT.hidden_size, cfg.ViT.mlp_dim = 48, 96
    cfg.ViT.num_layers, cfg.ViT.num_heads = 12, 2
    cfg.ViT.patch_size = [8, 8, 8]
    model = build_model(cfg)
    x = jnp.zeros((2, 1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, deterministic=True)
    out = model.apply(variables, x, deterministic=True,
                      mutable=["batch_stats"])[0]
    assert out.shape == (2, 1, 32, 32, 4)


@pytest.mark.slow
def test_vit_unetr_enhance_2d():
    cfg = make_config(encoder_name="ViT", decoder_name="ViTUNETR", task_type="enhance",
                      height=32, width=32, time=1, no_in_channel=2, no_out_channel=1)
    cfg.ViT.size = "custom"
    cfg.ViT.hidden_size, cfg.ViT.mlp_dim = 48, 96
    cfg.ViT.num_layers, cfg.ViT.num_heads = 12, 2
    cfg.ViT.patch_size = [4, 4, 4]
    out, _ = init_and_forward(cfg)
    assert out.shape == (2, 1, 32, 32, 1)


@pytest.mark.slow
def test_vit_3d_upernet3d():
    cfg = make_config(encoder_name="ViT", decoder_name="UperNet3D", task_type="seg",
                      height=16, width=16, time=8, no_in_channel=1, no_out_channel=3)
    cfg.ViT.size = "custom"
    cfg.ViT.hidden_size, cfg.ViT.mlp_dim = 48, 96
    cfg.ViT.num_layers, cfg.ViT.num_heads = 12, 2
    cfg.ViT.patch_size = [4, 4, 4]
    model = build_model(cfg)
    x = jnp.zeros((1, 8, 16, 16, 1))
    variables = model.init(jax.random.PRNGKey(0), x, deterministic=True)
    out = model.apply(variables, x, deterministic=True, mutable=["batch_stats"])[0]
    assert out.shape == (1, 8, 16, 16, 3)


# ---- Swin combos ------------------------------------------------------------

def swin_cfg(decoder, task, mixer="attn", time=1, h=32, w=32, cin=1, cout=2):
    cfg = make_config(encoder_name="Swin", decoder_name=decoder, task_type=task,
                      height=h, width=w, time=time, no_in_channel=cin,
                      no_out_channel=cout)
    cfg.Swin.size = "custom"
    cfg.Swin.embed_dim = 12
    cfg.Swin.depths = [2, 2, 2, 2]
    cfg.Swin.num_heads = [2, 2, 2, 2]
    cfg.Swin.patch_size = [2, 2, 2]
    cfg.Swin.window_size = [4, 4, 4]
    cfg.Swin.use_hyena = mixer == "hyena"
    cfg.Swin.use_mamba = mixer == "mamba"
    return cfg


@pytest.mark.parametrize("mixer", ["attn", "hyena", "mamba"])
@pytest.mark.slow
def test_swin_linear_class_2d(mixer):
    out, _ = init_and_forward(swin_cfg("SwinLinear", "class", mixer))
    assert out.shape == (2, 2)


@pytest.mark.slow
def test_swin_upernet2d():
    cfg = swin_cfg("UperNet2D", "seg", cin=3, cout=5)
    model = build_model(cfg)
    x = jnp.zeros((2, 1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, deterministic=True)
    out = model.apply(variables, x, deterministic=True, mutable=["batch_stats"])[0]
    assert out.shape == (2, 1, 32, 32, 5)


@pytest.mark.slow
def test_swin_unetr_enhance_2d():
    out, _ = init_and_forward(swin_cfg("SwinUNETR", "enhance", cin=1, cout=1))
    assert out.shape == (2, 1, 32, 32, 1)


@pytest.mark.slow
def test_swin_3d_upernet3d_mamba():
    cfg = swin_cfg("UperNet3D", "seg", mixer="mamba", time=16, h=16, w=16,
                   cin=1, cout=4)
    model = build_model(cfg)
    x = jnp.zeros((1, 16, 16, 16, 1))
    variables = model.init(jax.random.PRNGKey(0), x, deterministic=True)
    out = model.apply(variables, x, deterministic=True, mutable=["batch_stats"])[0]
    assert out.shape == (1, 16, 16, 16, 4)


@pytest.mark.parametrize("mixer", ["hyena", "mamba"])
def test_swin_mixer_non_window_multiple_geometry(mixer):
    """Regression: stage dims that aren't window multiples must NOT use the
    stage-level windowed layout — its pads would persist across blocks,
    get LayerNormed as data, and leak into real tokens through the causal
    window convs (the reference re-zeroes pads after every block's norm1).
    24x24 @ patch 2 -> stage dims 12, 6, 3 with window 4: stages 1-2 must
    fall back to the per-block path (nn.LayerNorm 'norm1' in the block, vs
    the windowed path's 'norm1_scale')."""
    cfg = swin_cfg("SwinLinear", "class", mixer=mixer, h=24, w=24)
    # the layout decision is visible in the parameter STRUCTURE (windowed
    # stage = in-kernel pre-LN 'norm1_scale'; per-block = nn.LayerNorm
    # 'norm1'), so eval_shape suffices — no interpret-mode forward needed
    model = build_model(cfg)
    x = jnp.zeros((2, cfg.time, cfg.height, cfg.width, 1), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, deterministic=True))
    p = variables["params"]["encoder"]
    assert "norm1_scale" in p["layer_0"]["block_0"]          # 12 % 4 == 0
    assert "norm1" in p["layer_1"]["block_0"]                # 6 % 4 != 0
    assert "norm1_scale" not in p["layer_1"]["block_0"]


@pytest.mark.slow
def test_swin_hidden_state_contract():
    cfg = swin_cfg("SwinLinear", "class")
    from long_context_biomedical_imaging_tpu.models import build_swin
    enc, channels = build_swin(cfg, 1)
    assert channels == [24, 48, 96, 192, 192 * 2][:5] or channels[-1] == 12 * 16
    x = jnp.zeros((1, 1, 32, 32, 1))
    variables = enc.init(jax.random.PRNGKey(0), x, deterministic=True)
    hs = enc.apply(variables, x, deterministic=True)
    assert len(hs) == 6
    # channels follow [e, 2e, 4e, 8e, 16e]
    assert [h.shape[-1] for h in hs[1:]] == [12, 24, 48, 96, 192]


def test_identity_passthrough():
    cfg = make_config(encoder_name="Identity", decoder_name="Identity",
                      task_type="enhance", height=8, width=8, time=1,
                      no_in_channel=2, no_out_channel=2)
    out, _ = init_and_forward(cfg)
    assert out.shape == (2, 1, 8, 8, 2)


@pytest.mark.slow
@pytest.mark.parametrize("mixer", ["hyena", "mamba"])
def test_swin_lane_padded_stage_matches_default(mixer, monkeypatch):
    """LCBI_LANE_PAD=1 routes the windowed stages through the lane-padded
    kernel pipeline (ops pad projections/LN params to a 128-multiple, LN
    divides by the real C): outputs must match the unpadded default exactly
    (pad lanes are exact zeros end to end)."""
    import numpy as np

    cfg = swin_cfg("SwinLinear", "class", mixer)
    model = build_model(cfg)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 1, 32, 32, 1).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, deterministic=True)
    ref = model.apply(variables, x, deterministic=True,
                      mutable=["batch_stats"])[0]
    monkeypatch.setenv("LCBI_LANE_PAD", "1")
    got = model.apply(variables, x, deterministic=True,
                      mutable=["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
