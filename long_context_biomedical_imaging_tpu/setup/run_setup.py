"""Run setup: logging, seeding, directories, distributed init.

TPU-native equivalent of the reference's setup utilities
(ref: setup/setup_utils.py:25-129 and setup/setup_base.py:59-102):
instead of `dist.init_process_group(NCCL)`, multi-host runs call
`jax.distributed.initialize()` and single-process multi-chip runs need no
init at all — the trainer shards over a `jax.sharding.Mesh`.
"""

from __future__ import annotations

import logging
import os
import random
import sys
from datetime import datetime

import numpy as np

from .config import Config, check_args, config_to_yaml, yaml_to_config
from .parsers import parse_config


def set_seed(seed: int | None) -> None:
    """Seed host-side RNGs (ref: setup/setup_utils.py:25-38).

    Device-side randomness is handled by explicit `jax.random` key threading,
    which is deterministic by construction — no cudnn.deterministic analogue
    is needed on TPU.
    """
    if seed is None:
        return
    os.environ["PYTHONHASHSEED"] = str(seed)
    random.seed(seed)
    np.random.seed(seed)


def setup_logger(config: Config) -> logging.Logger:
    """File + stream logging per run dir (ref: setup/setup_utils.py:41-62)."""
    os.makedirs(config.log_dir_run, exist_ok=True)
    log_path = os.path.join(config.log_dir_run, "run.log")

    logger = logging.getLogger("lcbi")
    logger.setLevel(logging.INFO)
    logger.propagate = False  # avoid duplicate lines via the root logger
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s [%(levelname)s] %(message)s")
    fh = logging.FileHandler(log_path)
    fh.setFormatter(fmt)
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)

    # Epoch-summary logger that writes only to the file (ref: setup_utils.py:55-61).
    file_only = logging.getLogger("lcbi.file_only")
    file_only.setLevel(logging.INFO)
    file_only.handlers.clear()
    file_only.addHandler(fh)
    file_only.propagate = False
    return logger


def setup_distributed(config: Config) -> None:
    """Initialize multi-host JAX if launched under a multi-process runtime.

    Replaces the reference's torchrun/NCCL process-group setup
    (ref: setup/setup_utils.py:65-85). On a single host with N chips this is a
    no-op: all chips are visible to one process and the mesh handles sharding.
    Multi-host env detection follows JAX conventions (coordinator address set).
    """
    import jax

    if config.get("ddp") and os.environ.get("JAX_COORDINATOR_ADDRESS"):
        # torchrun-style env contract (ref reads LOCAL_RANK/RANK/WORLD_SIZE,
        # setup_utils.py:70-73); JAX's own auto-detect only covers managed
        # clusters (SLURM/GKE), so pass the trio explicitly.
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("WORLD_SIZE")
                              or os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ.get("RANK")
                           or os.environ["JAX_PROCESS_ID"]))
    config.world_size = jax.process_count()
    config.global_rank = jax.process_index()
    # All chips this process can see participate in the data mesh.
    config.local_device_count = jax.local_device_count()


def setup_run(config: Config) -> Config:
    """Date, dirs, seed, logging, distributed — (ref: setup/setup_utils.py:88-129)."""
    config.date = datetime.now().strftime("%Y-%m-%d")
    config.log_dir_run = os.path.join(config.log_dir, config.run_name)
    if os.path.exists(os.path.join(config.log_dir_run, "config.yaml")) and not config.get(
            "override", False) and config.get("train_model", True):
        raise FileExistsError(
            f"{config.log_dir_run} already contains a run; pass --override to overwrite")
    os.makedirs(config.log_dir_run, exist_ok=True)
    os.makedirs(os.path.join(config.log_dir_run, "models"), exist_ok=True)
    setup_logger(config)
    set_seed(config.get("seed"))
    setup_distributed(config)
    return config


def parse_config_and_setup_run(argv=None, custom_parser=None) -> Config:
    """Parse flags -> Config, apply yaml / inference-only rewiring, validate, set up.

    Mirrors ref: setup/setup_base.py:59-102 including the inference-only
    contract: load `config.yaml` from ``inference_dir``, force eval-only mode,
    and point ``model_load_path`` at the best checkpoint.
    """
    config = parse_config(argv=argv, custom_parser=custom_parser)

    if config.yaml_load_path is not None:
        loaded = yaml_to_config(config.yaml_load_path)
        loaded.log_dir = config.log_dir
        loaded.run_name = config.run_name
        config = loaded

    if config.inference_only:
        assert config.inference_dir not in (None, "None", "none"), \
            "If inference_only is True, inference_dir must be specified"
        assert os.path.exists(config.inference_dir), \
            f"inference_dir {config.inference_dir} does not exist"
        inference_dir = config.inference_dir
        new_log_dir = config.inference_log_dir
        new_run_name = config.inference_run_name
        config = yaml_to_config(os.path.join(inference_dir, "config.yaml"))
        config.log_dir = new_log_dir
        config.run_name = new_run_name
        config.inference_dir = inference_dir
        config.inference_only = True
        config.train_model = False
        config.model_load_path = os.path.join(inference_dir, "models", "model_best_checkpoint")
        config.eval_train_set = False
        config.eval_val_set = True
        config.eval_test_set = True
        config.save_train_samples = False
        config.save_val_samples = False
        config.save_test_samples = True
        config.override = True

    check_args(config)
    setup_run(config)

    # Persist the fully-resolved config alongside the run (ref: run.py:65).
    config_to_yaml(config, os.path.join(config.log_dir_run, "config.yaml"))
    return config
