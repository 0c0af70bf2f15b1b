"""Config system tests: dotted nesting, parser merge, yaml round-trip, check_args."""

import os

import pytest

from long_context_biomedical_imaging_tpu.setup import (Config, check_args, config_to_yaml,
                                                       parse_config, yaml_to_config)


def test_nested_setattr():
    cfg = Config()
    setattr(cfg, "ViT.patch_size", [16, 16, 16])
    assert cfg.ViT.patch_size == [16, 16, 16]
    setattr(cfg, "ViT.hidden_size", 384)
    assert cfg.ViT.patch_size == [16, 16, 16]
    assert cfg.ViT.hidden_size == 384


def test_parse_defaults():
    cfg = parse_config(argv=[])
    assert cfg.task_type == "class"
    assert cfg.encoder_name == "ViT"
    assert cfg.ViT.size == "small"
    assert cfg.optim.lr == 1e-4
    assert cfg.scheduler.patience == 0  # default scheduler is ReduceLROnPlateau


def test_parse_swin_flags():
    cfg = parse_config(argv=[
        "--encoder_name=Swin", "--Swin.size", "tiny", "--Swin.patch_size", "2",
        "--Swin.window_size", "4", "--Swin.use_hyena", "True",
        "--scheduler_type", "OneCycleLR", "--optim.lr=1e-5",
    ])
    assert cfg.Swin.use_hyena is True
    assert cfg.optim.lr == 1e-5
    assert cfg.scheduler.pct_start == 0.3
    cfg.task_type = "class"
    check_args(cfg)
    assert cfg.Swin.patch_size == [2, 2, 2]
    assert cfg.Swin.window_size == [4, 4, 4]


def test_unknown_arg_rejected():
    with pytest.raises(NameError):
        parse_config(argv=["--not_a_real_flag=3"])


def test_hyena_mamba_exclusive():
    cfg = parse_config(argv=["--encoder_name=ViT", "--ViT.use_hyena=True",
                             "--ViT.use_mamba=True"])
    with pytest.raises(ValueError):
        check_args(cfg)


def test_yaml_roundtrip(tmp_path):
    cfg = parse_config(argv=["--encoder_name=Swin", "--Swin.depths", "2", "2", "6", "2"])
    path = os.path.join(tmp_path, "config.yaml")
    config_to_yaml(cfg, path)
    cfg2 = yaml_to_config(path)
    assert cfg2.Swin.depths == [2, 2, 6, 2]
    assert cfg2.to_dict() == cfg.to_dict()


def test_model_parallel_requires_vit():
    """--model_parallel shards the ViT token axis; with Swin it would only
    disable the fused kernels (model_axis gates) with no sharding benefit."""
    cfg = parse_config(argv=[
        "--encoder_name=Swin", "--decoder_name=SwinLinear",
        "--task_type=class", "--height=64", "--width=64", "--time=1",
        "--no_in_channel=1", "--no_out_channel=2", "--batch_size=2",
        "--scheduler_type=OneCycleLR", "--model_parallel=2"])
    with pytest.raises(ValueError, match="model_parallel"):
        check_args(cfg)
