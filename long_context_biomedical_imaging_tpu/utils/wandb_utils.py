"""Optional wandb integration — gated import so environments without wandb
(or without network egress) degrade to a no-op logger while preserving the
reference's logging call surface (ref: metrics/metrics_base.py:38-48,130-136).
"""

from __future__ import annotations

import os

try:
    import wandb as _wandb
    WANDB_AVAILABLE = True
except ImportError:  # pragma: no cover
    _wandb = None
    WANDB_AVAILABLE = False


class _NoopRun:
    summary: dict = {}

    def define_metric(self, *a, **k):
        pass

    def log(self, *a, **k):
        pass

    def watch(self, *a, **k):
        pass

    def finish(self):
        pass


def init_wandb(config):
    """wandb.init with the reference arg surface; no-op if wandb unavailable."""
    if not WANDB_AVAILABLE or os.environ.get("WANDB_MODE") == "disabled":
        return _NoopRun()
    return _wandb.init(project=config.project, group=config.group,
                       entity=config.wandb_entity, config=config.to_dict(),
                       name=config.run_name, notes=config.run_notes,
                       dir=config.wandb_dir)
