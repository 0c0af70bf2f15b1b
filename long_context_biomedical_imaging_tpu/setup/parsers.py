"""Composable CLI parsers preserving the reference flag surface.

Five parser groups merge into one nested :class:`~..setup.config.Config`
(ref: setup/parsers/{general,model,optim,sched}_parser.py and
setup/setup_base.py:16-57). Flags are identical to the reference so the six
project scripts port 1:1; TPU-specific additions are kept to a minimum
(``--device`` gains a ``tpu`` choice; ``cuda`` is accepted as an alias for
"the default accelerator" so reference scripts run unmodified).
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime

from .config import Config, none_or_str, str_to_bool

_PROJECT_DIR = os.getcwd()


def _default_run_name() -> str:
    return "project_" + datetime.now().strftime("%H-%M-%S-%Y%m%d")


def build_general_parser() -> argparse.ArgumentParser:
    """All-project flags (ref: setup/parsers/general_parser.py:15-110)."""
    p = argparse.ArgumentParser("", add_help=False)

    # Path args
    p.add_argument("--run_name", type=str, default=_default_run_name())
    p.add_argument("--log_dir", type=str, default=os.path.join(_PROJECT_DIR, "logs"))
    p.add_argument("--data_dir", type=str, default=os.path.join(_PROJECT_DIR, "data"))
    p.add_argument("--split_csv_path", type=none_or_str, default=None)
    p.add_argument("--model_load_path", type=none_or_str, default=None)
    p.add_argument("--yaml_load_path", type=none_or_str, default=None)
    p.add_argument("--override", action="store_true")

    # Train/eval args
    p.add_argument("--train_model", type=str_to_bool, default=True)
    p.add_argument("--continued_training", type=str_to_bool, default=False)
    p.add_argument("--eval_train_set", type=str_to_bool, default=False)
    p.add_argument("--eval_val_set", type=str_to_bool, default=True)
    p.add_argument("--eval_test_set", type=str_to_bool, default=True)
    p.add_argument("--save_train_samples", type=str_to_bool, default=False)
    p.add_argument("--save_val_samples", type=str_to_bool, default=False)
    p.add_argument("--save_test_samples", type=str_to_bool, default=True)

    # Inference-only args
    p.add_argument("--inference_only", type=str_to_bool, default=False)
    p.add_argument("--inference_dir", type=none_or_str, default=None)
    p.add_argument("--inference_log_dir", type=str, default=os.path.join(_PROJECT_DIR, "logs"))
    p.add_argument("--inference_run_name", type=str, default=_default_run_name())

    # Experiment-tracking args (wandb-compatible; gated if wandb is absent)
    p.add_argument("--project", type=str, default="LCImaging")
    p.add_argument("--group", type=str, default="training")
    p.add_argument("--run_notes", type=str, default="Default project notes")
    p.add_argument("--wandb_entity", type=str, default="MyEntity")
    p.add_argument("--wandb_dir", type=str, default=os.path.join(_PROJECT_DIR, "wandb"))

    # Task args
    p.add_argument("--task_type", type=str, default="class", choices=["class", "seg", "enhance"])
    p.add_argument("--loss_func", type=str, default="CrossEntropy",
                   choices=["CrossEntropy", "MSE", "CombinationEnhance"])
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--time", type=int, default=1)
    p.add_argument("--no_in_channel", type=int, default=1)
    p.add_argument("--no_out_channel", type=int, default=2)

    # Augmentation args
    p.add_argument("--affine_aug", type=str_to_bool, default=True)
    p.add_argument("--brightness_aug", type=str_to_bool, default=True)
    p.add_argument("--gaussian_blur_aug", type=str_to_bool, default=True)

    # Model args
    p.add_argument("--encoder_name", type=str, default="ViT", choices=["Identity", "ViT", "Swin"])
    p.add_argument("--decoder_name", type=str, default="ViTLinear",
                   choices=["Identity", "ViTLinear", "SwinLinear", "UperNet2D", "UperNet3D",
                            "SwinUNETR", "ViTUNETR"])

    # Optimizer args
    p.add_argument("--optim_type", type=str, default="adam",
                   choices=["adam", "adamw", "nadam", "sgd", "lbfgs"])
    p.add_argument("--scheduler_type", type=none_or_str, default="ReduceLROnPlateau",
                   choices=["ReduceLROnPlateau", "StepLR", "OneCycleLR", None])

    # General training args. 'cuda' is accepted for reference-script
    # compatibility and means "default JAX accelerator".
    p.add_argument("--device", type=str, default="tpu", choices=["cpu", "cuda", "tpu"])
    p.add_argument("--debug", "-D", action="store_true")
    p.add_argument("--percent_data", type=float, default=1.0)
    p.add_argument("--summary_depth", type=int, default=6)
    p.add_argument("--num_workers", type=int, default=-1)
    p.add_argument("--prefetch_factor", type=int, default=8)
    p.add_argument("--use_amp", action="store_true")
    p.add_argument("--decoder_checkpoint", type=str_to_bool, default=False,
                   help="Gradient checkpointing on UNETR decoder blocks: the "
                        "full-resolution conv activations of SwinUNETR/ViTUNETR "
                        "at 1024^2-class inputs exceed one chip's HBM as grad "
                        "residuals (measured 57GB for ViT+ViTUNETR b4); remat "
                        "keeps only block boundaries")
    p.add_argument("--with_timer", action="store_true")
    p.add_argument("--stats_fetch_every", type=int, default=16,
                   help="Train-loop device->host stats flush cadence: the "
                        "per-step loss/metric vector stays on device and is "
                        "fetched as one stacked transfer every K steps (a "
                        "host fetch costs ~30ms through the remote-TPU relay "
                        "and serializes dispatch). NaN fail-fast still aborts "
                        "the epoch, on a <=K-step delay; --with_timer forces "
                        "K=1.")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--eval_frequency", type=int, default=1)
    p.add_argument("--checkpoint_frequency", type=int, default=10)
    p.add_argument("--exact_metrics", type=str_to_bool, default=False)
    p.add_argument("--ddp", action="store_true",
                   help="Multi-process data parallelism (jax.distributed); "
                        "single-process multi-chip DP is automatic on TPU")
    p.add_argument("--model_parallel", type=int, default=1,
                   help="TPU extension: size of the mesh 'model' axis. >1 "
                        "shards the ViT-hyena token axis across chips "
                        "(sequence parallelism for beyond-HBM contexts); "
                        "the reference has no equivalent (SURVEY §2.3)")

    # Training parameters
    p.add_argument("--num_epochs", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--clip_grad_norm", type=float, default=0)
    p.add_argument("--iters_to_accumulate", type=int, default=1)
    return p


def build_model_parser(model_type: str) -> argparse.ArgumentParser:
    """Backbone flags, conditioned on encoder (ref: setup/parsers/model_parser.py)."""
    p = argparse.ArgumentParser("", add_help=False)
    if "ViT" in model_type:
        p.add_argument("--ViT.size", type=str, default="small", choices=["small", "base", "custom"])
        p.add_argument("--ViT.patch_size", nargs="+", type=int, default=[16, 16, 16])
        p.add_argument("--ViT.hidden_size", type=int, default=768)
        p.add_argument("--ViT.mlp_dim", type=int, default=3072)
        p.add_argument("--ViT.num_layers", type=int, default=12)
        p.add_argument("--ViT.num_heads", type=int, default=12)
        p.add_argument("--ViT.use_hyena", type=str_to_bool, default=False)
        p.add_argument("--ViT.use_mamba", type=str_to_bool, default=False)
    if "Swin" in model_type:
        p.add_argument("--Swin.size", type=str, default="tiny",
                       choices=["unetr", "tiny", "small", "base", "large", "custom"])
        p.add_argument("--Swin.patch_size", nargs="+", type=int, default=[2, 2, 2])
        p.add_argument("--Swin.window_size", nargs="+", type=int, default=[8, 8, 8])
        p.add_argument("--Swin.embed_dim", type=int, default=24)
        p.add_argument("--Swin.depths", nargs="+", type=int, default=[2, 2, 6, 2])
        p.add_argument("--Swin.num_heads", nargs="+", type=int, default=[3, 6, 12, 24])
        p.add_argument("--Swin.use_hyena", type=str_to_bool, default=False)
        p.add_argument("--Swin.use_mamba", type=str_to_bool, default=False)
        p.add_argument("--Swin.use_checkpoint", type=str_to_bool, default=False,
                       help="Gradient checkpointing on Swin blocks (rematerialize "
                            "activations in backward; needed for 500k+ token 3D "
                            "configs on one chip)")
    return p


def build_optim_parser(optim_type: str) -> argparse.ArgumentParser:
    """Optimizer flags, conditioned on optim_type (ref: setup/parsers/optim_parser.py)."""
    p = argparse.ArgumentParser("", add_help=False)
    p.add_argument("--optim.lr", type=float, default=1e-4)
    p.add_argument("--optim.weight_decay", type=float, default=0.0)
    if optim_type in ("adam", "adamw", "nadam"):
        p.add_argument("--optim.beta1", type=float, default=0.90)
        p.add_argument("--optim.beta2", type=float, default=0.95)
    if optim_type == "lbfgs":
        p.add_argument("--optim.max_iter", type=int, default=100)
        p.add_argument("--optim.history_size", type=int, default=100)
        p.add_argument("--optim.line_search_fn", type=none_or_str, default=None)
    return p


def build_sched_parser(scheduler_type) -> argparse.ArgumentParser:
    """Scheduler flags, conditioned on scheduler_type (ref: setup/parsers/sched_parser.py)."""
    p = argparse.ArgumentParser("", add_help=False)
    if scheduler_type == "ReduceLROnPlateau":
        p.add_argument("--scheduler.patience", type=int, default=0)
        p.add_argument("--scheduler.cooldown", type=int, default=0)
        p.add_argument("--scheduler.min_lr", type=float, default=1e-8)
        p.add_argument("--scheduler.factor", type=float, default=0.9)
    if scheduler_type == "StepLR":
        p.add_argument("--scheduler.step_size", type=int, default=5)
        p.add_argument("--scheduler.gamma", type=float, default=0.8)
    if scheduler_type == "OneCycleLR":
        p.add_argument("--scheduler.pct_start", type=float, default=0.3)
    return p


def parse_config(argv=None, custom_parser=None) -> Config:
    """Merge the composable parsers into one Config, rejecting unknown flags.

    Mirrors the reference merge + unknown-arg detection
    (ref: setup/setup_base.py:16-57): later parsers are conditioned on values
    already parsed by the general parser (encoder/optim/sched selection).
    """
    general_ns, unknown_general = build_general_parser().parse_known_args(argv, namespace=Config())
    optim_ns, unknown_optim = build_optim_parser(general_ns.optim_type).parse_known_args(
        argv, namespace=Config())
    sched_ns, unknown_sched = build_sched_parser(general_ns.scheduler_type).parse_known_args(
        argv, namespace=Config())
    model_ns, unknown_model = build_model_parser(general_ns.encoder_name).parse_known_args(
        argv, namespace=Config())
    if custom_parser is not None:
        custom_ns, unknown_custom = custom_parser().parse_known_args(argv, namespace=Config())
    else:
        custom_ns, unknown_custom = Config(), []

    config = Config()
    for ns in (general_ns, optim_ns, sched_ns, model_ns, custom_ns):
        for key, value in vars(ns).items():
            object.__setattr__(config, key, value)

    # Any flag not consumed by *any* parser is an error.
    known = set()
    for dotted, _ in config.flat_items():
        known.add(dotted)
        known.add(dotted.split(".")[0])
    unknown = set()
    for tok in (unknown_general + unknown_optim + unknown_sched + unknown_model
                + list(unknown_custom)):
        if tok.startswith("--"):
            name = tok[2:].split("=")[0]
            if name not in known:
                unknown.add(name)
    if unknown:
        raise NameError(f"User input arguments that are not recognized: {sorted(unknown)}")
    return config
