"""Optimizer + LR-schedule manager on optax.

Reimplements the reference OptimManager (ref: optim/optim_base.py:25-144,
optim/optim_utils.py:10-21): optimizers adam/adamw/nadam/sgd (single param
group, global lr/wd like the reference), torch-semantics schedulers
(OneCycleLR per optimizer step, StepLR per epoch, ReduceLROnPlateau on val
loss with patience/cooldown/factor/min_lr).

Design: the optax transform produces *unscaled* updates (moments only); the
learning rate is computed host-side per step by `current_lr(step, epoch)` and
passed into the compiled train step as a scalar argument. This keeps plateau
scheduling (a host-side control decision) out of the compiled graph — no
recompiles when the lr changes.
"""

from __future__ import annotations

import math

import optax


def compute_total_updates(config, num_train_samples: int,
                          world: int | None = None) -> int:
    """ceil(N / (B * accum * world)) * epochs (ref: optim_utils.py:10-21).

    `world` is the data-parallel degree. The reference's batch_size is
    PER-RANK (8-GPU DDP trains global batches of 8*B, optim_utils.py:14-19);
    here batch_size is per-device on the mesh 'data' axis, so world defaults
    to the device count (= data axis size for the default mesh)."""
    import jax
    if world is None:
        world = jax.device_count()
    per_step = config.batch_size * config.iters_to_accumulate * world
    return max(1, math.ceil(num_train_samples / per_step)) * config.num_epochs


def _torch_onecycle_lr(step: int, max_lr: float, total_steps: int,
                       pct_start: float, div_factor: float = 25.0,
                       final_div_factor: float = 1e4) -> float:
    """torch OneCycleLR with cosine annealing — exact step-for-step parity
    (torch anneals over [0, pct*total-1] then [pct*total-1, total-1])."""
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    up_end = max(pct_start * total_steps - 1, 1e-9)
    down_end = max(total_steps - 1 - up_end, 1e-9)
    step = min(step, total_steps - 1)

    def anneal(start, end, pct):
        return end + (start - end) / 2.0 * (1.0 + math.cos(math.pi * pct))

    if step <= up_end:
        return anneal(initial_lr, max_lr, step / up_end)
    return anneal(max_lr, min_lr, (step - up_end) / down_end)


class OptimManager:
    """Builds the optax transform and computes the host-side lr schedule."""

    def __init__(self, config, num_train_samples: int,
                 world: int | None = None):
        self.config = config
        self.base_lr = config.optim.lr
        self.total_updates = compute_total_updates(config, num_train_samples,
                                                   world)
        self.curr_epoch = 0

        wd = config.optim.weight_decay
        otype = config.optim_type
        if otype in ("adam", "nadam"):
            parts = []
            if wd > 0:
                parts.append(optax.add_decayed_weights(wd))  # L2 into grads (torch adam)
            parts.append(optax.scale_by_adam(
                b1=config.optim.beta1, b2=config.optim.beta2,
                nesterov=(otype == "nadam")))
            self.transform = optax.chain(*parts)
        elif otype == "adamw":
            self.transform = optax.chain(
                optax.scale_by_adam(b1=config.optim.beta1, b2=config.optim.beta2),
                optax.add_decayed_weights(wd))              # decoupled decay
        elif otype == "sgd":
            # ref optim_base.py:91 — torch SGD(momentum=0.9): wd folds into
            # the gradient first, then heavy-ball momentum (no dampening).
            parts = []
            if wd > 0:
                parts.append(optax.add_decayed_weights(wd))
            parts.append(optax.trace(decay=0.9))
            self.transform = optax.chain(*parts)
        elif otype == "lbfgs":
            # torch LBFGS with line_search_fn=None and max_iter=1 per batch:
            # an L-BFGS-preconditioned direction scaled by lr. (The reference's
            # torch LBFGS would run max_iter inner closures per step; the
            # compiled-step formulation applies one preconditioned update per
            # batch.) wd folds in as L2 like the other torch optimizers.
            parts = []
            if wd > 0:
                parts.append(optax.add_decayed_weights(wd))
            parts.append(optax.scale_by_lbfgs(
                memory_size=int(getattr(config.optim, "history_size", 100))))
            self.transform = optax.chain(*parts)
        else:
            raise ValueError(f"Unknown optim_type {otype}")

        if config.clip_grad_norm and config.clip_grad_norm > 0:
            self.transform = optax.chain(
                optax.clip_by_global_norm(config.clip_grad_norm), self.transform)

        # Plateau state (ref torch ReduceLROnPlateau semantics)
        self._plateau_scale = 1.0
        self._plateau_best = float("inf")
        self._plateau_bad_epochs = 0
        self._plateau_cooldown = 0

    # -- schedules -------------------------------------------------------------

    def current_lr(self, step: int, epoch: int) -> float:
        sched = self.config.scheduler_type
        if sched == "OneCycleLR":
            return _torch_onecycle_lr(step, self.base_lr, self.total_updates,
                                      self.config.scheduler.pct_start)
        if sched == "StepLR":
            return self.base_lr * (self.config.scheduler.gamma
                                   ** (epoch // self.config.scheduler.step_size))
        if sched == "ReduceLROnPlateau":
            return max(self.base_lr * self._plateau_scale,
                       self.config.scheduler.min_lr)
        return self.base_lr

    def plateau_step(self, val_loss: float):
        """Epoch-end plateau update (ref: trainer_base.py:211-214)."""
        if self.config.scheduler_type != "ReduceLROnPlateau":
            return
        # torch ReduceLROnPlateau order: improvement check, then cooldown
        # zeroes the bad-epoch count *after* the increment, then the reduction
        # test — so no reductions fire while cooling down.
        # torch's default improvement test is relative: a < best * (1 - 1e-4)
        # (threshold=1e-4, threshold_mode='rel', mode='min').
        s = self.config.scheduler
        if val_loss < self._plateau_best * (1.0 - 1e-4):
            self._plateau_best = val_loss
            self._plateau_bad_epochs = 0
        else:
            self._plateau_bad_epochs += 1
        if self._plateau_cooldown > 0:
            self._plateau_cooldown -= 1
            self._plateau_bad_epochs = 0
        if self._plateau_bad_epochs > s.patience:
            self._plateau_scale *= s.factor
            self._plateau_cooldown = s.cooldown
            self._plateau_bad_epochs = 0

    # -- resume (ref: optim_base.py:122-144) ------------------------------------

    def state_dict(self) -> dict:
        return {"plateau_scale": self._plateau_scale,
                "plateau_best": self._plateau_best,
                "plateau_bad_epochs": self._plateau_bad_epochs,
                "plateau_cooldown": self._plateau_cooldown,
                "curr_epoch": self.curr_epoch}

    def load_state_dict(self, d: dict):
        self._plateau_scale = float(d.get("plateau_scale", 1.0))
        self._plateau_best = float(d.get("plateau_best", float("inf")))
        self._plateau_bad_epochs = int(d.get("plateau_bad_epochs", 0))
        self._plateau_cooldown = int(d.get("plateau_cooldown", 0))
        self.curr_epoch = int(d.get("curr_epoch", 0))
