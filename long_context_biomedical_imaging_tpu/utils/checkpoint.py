"""Checkpointing: three streams (last / periodic / best) via Orbax.

TPU-native equivalent of the reference save/load
(ref: model/model_utils.py:13-77, metrics/metrics_base.py:223-228,400-413).
Each checkpoint is a directory under `logs/<run>/models/<name>` holding:
  * `arrays/` — Orbax PyTree checkpoint of {params, batch_stats, opt_state}
    converted through flax.serialization.to_state_dict (pure array leaves; the
    optax named-tuple structure is rebuilt on load with from_state_dict)
  * `meta.yaml` — epoch, step, scheduler state, and the full resolved config
    (the reference embeds config into every .pth, ref: model_utils.py:36-37)
"""

from __future__ import annotations

import os
import shutil
from typing import Any

import flax
import jax
import numpy as np
import orbax.checkpoint as ocp
import yaml

from ..setup.config import Config


def _ckpt_dir(config, name: str) -> str:
    return os.path.join(config.log_dir_run, "models", name)


def save_checkpoint(config, name: str, state: dict) -> str:
    """state: {params, batch_stats, opt_state, step, sched_state, ...}.

    COLLECTIVE under multi-host: every process must call this (Orbax's save
    synchronizes all processes internally — a rank-0-only call deadlocks at
    that barrier). Rank 0 prepares the directory and writes meta.yaml; the
    state arrays are replicated, so Orbax's primary host writes them once.
    """
    path = _ckpt_dir(config, name)
    if jax.process_index() == 0:
        if os.path.exists(path):
            shutil.rmtree(path)
        os.makedirs(path, exist_ok=True)
    if jax.process_count() > 1:
        # every rank must see the fresh directory before Orbax writes into it
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(f"ckpt_dir:{name}")

    arrays = {k: flax.serialization.to_state_dict(state[k])
              for k in ("params", "batch_stats", "opt_state") if k in state}
    arrays = jax.tree.map(np.asarray, arrays)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "arrays"), arrays)

    if jax.process_index() == 0:
        meta = {"epoch": int(state.get("epoch", 0)),
                "step": int(state.get("step", 0)),
                "sched_state": state.get("sched_state", {}),
                "config": config.to_dict()}
        with open(os.path.join(path, "meta.yaml"), "w") as f:
            yaml.safe_dump(meta, f)
    return path


def load_checkpoint(path: str) -> dict:
    """Returns {params, batch_stats, opt_state (state-dict form), epoch, step,
    sched_state, config}."""
    with ocp.PyTreeCheckpointer() as ckptr:
        arrays = ckptr.restore(os.path.join(path, "arrays"))
    with open(os.path.join(path, "meta.yaml")) as f:
        meta = yaml.safe_load(f)
    out: dict[str, Any] = dict(arrays)
    out["epoch"] = meta.get("epoch", 0)
    out["step"] = meta.get("step", 0)
    out["sched_state"] = meta.get("sched_state", {})
    out["config"] = Config.from_dict(meta.get("config", {}))
    return out


def restore_into(target, state_dict):
    """Rebuild a structured pytree (e.g. optax opt_state) from its state dict."""
    return flax.serialization.from_state_dict(target, state_dict)
