"""Nested configuration system with YAML round-trip.

Provides the same config surface as the reference's ``Nestedspace``
(ref: setup/config_utils.py:9-141): dotted argument names like
``--ViT.patch_size`` become nested attribute access (``config.ViT.patch_size``),
configs serialize to/from YAML, and ``check_args`` performs the semantic
validation the reference applies after parsing (scalar->3D broadcast of
patch/window sizes, hyena/mamba mutual exclusion, task checks).
"""

from __future__ import annotations

import argparse
import copy
from typing import Any

import yaml


def str_to_bool(value: Any) -> bool:
    """Parse flexible boolean CLI values ('true', '1', 'yes', ...)."""
    if isinstance(value, bool):
        return value
    if str(value).lower() in {"false", "f", "0", "no", "n"}:
        return False
    if str(value).lower() in {"true", "t", "1", "yes", "y"}:
        return True
    raise argparse.ArgumentTypeError(f"{value} is not a valid boolean value")


def none_or_str(value: Any):
    """Parse 'None'/'none' as python None, otherwise keep the string."""
    if value is None or str(value).lower() == "none":
        return None
    return str(value)


class Config(argparse.Namespace):
    """A namespace where dotted attribute names create nested namespaces.

    ``setattr(cfg, 'ViT.patch_size', [16,16,16])`` creates ``cfg.ViT`` (itself a
    ``Config``) holding ``patch_size``. This mirrors the reference Nestedspace
    (ref: setup/config_utils.py:9-37) so the full dotted CLI surface
    (``--ViT.*``, ``--Swin.*``, ``--optim.*``, ``--scheduler.*``) is preserved.
    """

    def __setattr__(self, name: str, value: Any) -> None:
        if "." in name:
            head, _, rest = name.partition(".")
            ns = getattr(self, head, None)
            if ns is None:
                ns = Config()
                object.__setattr__(self, head, ns)
            setattr(ns, rest, value)
        else:
            object.__setattr__(self, name, value)

    def __getattr__(self, name: str):
        # Only called when normal lookup fails.
        if "." in name:
            head, _, rest = name.partition(".")
            return getattr(getattr(self, head), rest)
        raise AttributeError(f"Config has no attribute {name!r}")

    # -- dict / yaml round trip ------------------------------------------------

    def to_dict(self) -> dict:
        out = {}
        for key, value in vars(self).items():
            out[key] = value.to_dict() if isinstance(value, Config) else value
        return out

    @classmethod
    def from_dict(cls, data: dict) -> "Config":
        cfg = cls()
        for key, value in data.items():
            if isinstance(value, dict):
                object.__setattr__(cfg, key, cls.from_dict(value))
            else:
                object.__setattr__(cfg, key, value)
        return cfg

    def flat_items(self, prefix: str = ""):
        for key, value in vars(self).items():
            dotted = f"{prefix}{key}"
            if isinstance(value, Config):
                yield from value.flat_items(prefix=dotted + ".")
            else:
                yield dotted, value

    def get(self, dotted: str, default=None):
        try:
            return getattr(self, dotted)
        except AttributeError:
            return default

    def clone(self) -> "Config":
        return copy.deepcopy(self)


def config_to_yaml(config: Config, path: str) -> str:
    """Serialize resolved config to YAML (ref: setup/config_utils.py:39-50)."""
    with open(path, "w") as f:
        yaml.safe_dump(config.to_dict(), f, default_flow_style=False, sort_keys=True)
    return path


def yaml_to_config(path: str) -> Config:
    """Load YAML back into a Config (ref: setup/config_utils.py:53-59)."""
    with open(path) as f:
        return Config.from_dict(yaml.safe_load(f))


def _broadcast_3(value, name: str):
    """Broadcast a scalar or 1-element list to a 3-element list (T, H, W)."""
    if isinstance(value, int):
        return [value] * 3
    value = list(value)
    if len(value) == 1:
        return value * 3
    if len(value) == 3:
        return value
    raise ValueError(f"{name} must be a scalar or 3 values (T H W), got {value}")


def check_args(config: Config) -> Config:
    """Semantic cross-argument validation (ref: setup/config_utils.py:89-141).

    - broadcasts ViT.patch_size / Swin.patch_size / Swin.window_size to 3D
    - enforces hyena XOR mamba
    - validates task/loss/decoder compatibility basics
    """
    if config.get("task_type") not in {"class", "seg", "enhance"}:
        raise ValueError(f"Unknown task_type {config.get('task_type')}")

    if hasattr(config, "ViT"):
        config.ViT.patch_size = _broadcast_3(config.ViT.patch_size, "ViT.patch_size")
        if config.ViT.use_hyena and config.ViT.use_mamba:
            raise ValueError("Only one of ViT.use_hyena and ViT.use_mamba can be True")

    if hasattr(config, "Swin"):
        config.Swin.patch_size = _broadcast_3(config.Swin.patch_size, "Swin.patch_size")
        config.Swin.window_size = _broadcast_3(config.Swin.window_size, "Swin.window_size")
        if config.Swin.use_hyena and config.Swin.use_mamba:
            raise ValueError("Only one of Swin.use_hyena and Swin.use_mamba can be True")
        if len(config.Swin.depths) != len(config.Swin.num_heads):
            raise ValueError("Swin.depths and Swin.num_heads must have equal length")

    if config.get("percent_data") is not None and not (0.0 < config.percent_data <= 1.0):
        raise ValueError("percent_data must be in (0, 1]")

    if config.get("exact_metrics") and config.task_type != "class":
        raise ValueError("exact_metrics is only supported for classification tasks")

    if config.get("iters_to_accumulate", 1) < 1:
        raise ValueError("iters_to_accumulate must be >= 1")

    if int(config.get("model_parallel", 1) or 1) > 1 \
            and config.get("encoder_name") != "ViT":
        # sequence parallelism shards the ViT token axis; Swin's windowed
        # stages don't shard tokens, and a >1 'model' axis would only push
        # every fused Pallas kernel onto its composed fallback (their
        # model_axis_size()==1 gates) — all cost, no benefit
        raise ValueError(
            "--model_parallel > 1 (sequence parallelism) requires "
            "encoder_name=ViT; Swin scales via the 'data' mesh axis")

    return config
