"""Metric manager: lifecycle hooks, averaging, checkpoint policy, logging.

Reimplements the reference MetricManager (ref: metrics/metrics_base.py:23-438):
per-task metric sets, AverageMeter batch averaging, exact-metrics gather for
classification, best-on-val-loss checkpointing, prediction .npy dumps, and
wandb/file logging. Cross-process reduction uses
`jax.experimental.multihost_utils` instead of NCCL all-reduce/gather
(single-process multi-chip runs need no reduction: the host already sees
global batches).
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np

from ..utils.checkpoint import save_checkpoint
from ..utils.wandb_utils import init_wandb
from . import functional as F


class AverageMeter:
    """Batch-weighted running average (ref: metrics_utils.py:32-57)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.vals = []
        self.counts = []

    def update(self, val, n=1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.vals.append(val)
        self.counts.append(n)

    @property
    def avg(self):
        return self.sum / self.count if self.count else 0.0


def _ragged_allgather(preds: np.ndarray, labels: np.ndarray):
    """Gather per-process (preds, labels) whose leading counts may differ.

    `process_allgather` requires identical shapes on every process, but the
    `pi::pc` eval loader shard is ragged when N % process_count != 0 (the
    reference's DistributedSampler pads instead, so its dist.gather is total,
    ref: trainer_base.py:276-283, metrics_base.py:344-350). Pad every process
    to the global max count, gather, then trim each segment by its true count.

    Dtypes are canonicalized (preds->float32, labels->int32) BEFORE the
    collective: the gather declares one global dtype, and per-process inputs
    can disagree (bf16 AMP preds vs a zero-row process's float32 empty,
    int32 pipeline labels vs an int64 empty). int32 because the gather
    round-trips through jnp, which silently downcasts int64 under the
    default x64-disabled config.
    """
    from jax.experimental import multihost_utils

    preds = preds.astype(np.float32, copy=False)
    labels = labels.astype(np.int32, copy=False)

    counts = np.asarray(multihost_utils.process_allgather(
        np.array([preds.shape[0]], np.int64))).reshape(-1)
    n_max = int(counts.max())

    def pad_gather(a):
        padded = np.pad(a, [(0, n_max - a.shape[0])] + [(0, 0)] * (a.ndim - 1))
        stacked = np.asarray(multihost_utils.process_allgather(padded))
        return np.concatenate([stacked[i, :counts[i]]
                               for i in range(len(counts))])

    if n_max == 0:
        return preds, labels
    return pad_gather(preds), pad_gather(labels)


_TASK_METRICS = {
    # (train metric names, eval metric names) — ref: metrics_base.py:59-115
    "class": (("loss", "auroc"), ("loss", "acc_1", "auroc", "f1")),
    "seg": (("loss", "f1"), ("loss", "f1")),
    "enhance": (("loss", "ssim", "psnr"), ("loss", "ssim", "psnr")),
}


class MetricManager:
    def __init__(self, config):
        self.config = config
        self.wandb_run = None
        self.logger = logging.getLogger("lcbi")
        self.file_logger = logging.getLogger("lcbi.file_only")

    # -- setup ---------------------------------------------------------------

    def init_wandb(self):
        self.wandb_run = init_wandb(self.config)

    def setup_wandb_and_metrics(self, rank: int = 0):
        task = self.config.task_type
        train_names, eval_names = _TASK_METRICS.get(task, (("loss",), ("loss",)))
        self.train_metrics = {n: AverageMeter() for n in train_names}
        self.eval_metrics = {n: AverageMeter() for n in eval_names}
        self.binary = self.config.no_out_channel in (1, 2)  # ref: :69-72
        self.samplewise = task == "seg"                      # ref: :88-91
        if rank <= 0 and self.wandb_run is not None:
            self.wandb_run.define_metric("epoch")
            for n in train_names:
                self.wandb_run.define_metric(f"train/{n}", step_metric="epoch")
            for n in eval_names:
                for split in ("val", "test", "train"):
                    self.wandb_run.define_metric(f"{split}/{n}",
                                                 step_metric="epoch")
        # every rank tracks the (all-reduced, hence identical) best loss: the
        # best-checkpoint save is collective
        self.best_val_loss = np.inf

    # -- shared postprocessing (ref: metrics_base.py:156-170, 248-264) --------

    def _postprocess(self, output: np.ndarray, labels: np.ndarray):
        """Channels-last model output -> metric-ready (preds, labels)."""
        task = self.config.task_type
        if task == "class":
            e = np.exp(output - output.max(axis=1, keepdims=True))
            probs = e / e.sum(axis=1, keepdims=True)
            preds = probs[:, -1] if self.binary else probs
            return preds, labels
        if task == "seg":
            hard = output.argmax(axis=-1)                   # (B, T, H, W)
            return hard.reshape(hard.shape[0], -1), labels.reshape(labels.shape[0], -1)
        # enhance: to (B, C, [T,] H, W); squeeze time when 2D (ref: :166-170)
        out = np.moveaxis(output, -1, 1)
        lab = np.moveaxis(labels, -1, 1)
        if lab.shape[2] == 1:
            out, lab = out[:, :, 0], lab[:, :, 0]
        return out, lab

    def _compute(self, name: str, preds: np.ndarray, labels: np.ndarray) -> float:
        c = self.config.no_out_channel
        if name == "acc_1":
            return F.accuracy_top1(preds, labels, self.binary)
        if name == "auroc":
            return F.auroc(preds, labels, self.binary)
        if name == "f1":
            return F.f1_score(preds, labels, self.binary, c,
                              samplewise=self.samplewise)
        if name == "psnr":
            return F.psnr(preds, labels)
        if name == "ssim":
            return F.ssim(preds, labels)
        raise NotImplementedError(name)

    # -- train hooks -----------------------------------------------------------

    def on_train_epoch_start(self):
        for m in self.train_metrics.values():
            m.reset()
        self._grad_norm_meter = AverageMeter()

    def on_train_step_end_device(self, stats, names, n, rank=0, curr_lr=None):
        """Update meters from device-computed metrics:
        stats = [loss, *names, grad_norm] (one small host fetch per step
        instead of the full model output; ref computes train metrics on-GPU
        too, metrics_base.py:150-183). The trailing grad norm is the
        wandb.watch-equivalent (ref trainer_base.py:108)."""
        stats = np.asarray(stats, dtype=np.float64)
        self.train_metrics["loss"].update(float(stats[0]), n=n)
        for name, val in zip(names, stats[1:]):
            if name in self.train_metrics:
                self.train_metrics[name].update(float(val), n=n)
        self._grad_norm_meter.update(float(stats[-1]), n=1)
        if rank <= 0 and self.wandb_run is not None:
            log = {"grad_norm": float(stats[-1])}
            if curr_lr is not None:
                log["lr"] = float(curr_lr)
            self.wandb_run.log(log)

    def on_train_step_end(self, loss, output, labels, rank=0, curr_lr=None):
        output = np.asarray(output)
        labels = np.asarray(labels)
        preds, labels_m = self._postprocess(output, labels)
        n = output.shape[0]
        for name, meter in self.train_metrics.items():
            if name == "loss":
                meter.update(float(loss), n=n)
            else:
                meter.update(self._compute(name, preds, labels_m), n=n)
        if rank <= 0 and self.wandb_run is not None and curr_lr is not None:
            self.wandb_run.log({"lr": float(curr_lr)})

    def _reduce_meters(self, meters: dict) -> dict:
        """Average meters; all-reduce (val*count, count) across hosts if needed
        (ref: metrics_base.py:191-206)."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            out = {}
            for name, m in meters.items():
                arr = np.array([m.sum, float(m.count)])
                tot = multihost_utils.process_allgather(arr).sum(axis=0)
                out[name] = float(tot[0] / max(tot[1], 1.0))
            return out
        return {name: m.avg for name, m in meters.items()}

    def on_train_epoch_end(self, train_state, epoch: int, rank: int = 0):
        average = self._reduce_meters(self.train_metrics)
        if rank <= 0 and self.wandb_run is not None:
            for name, val in average.items():
                self.wandb_run.log({"epoch": epoch, f"train/{name}": val},
                                   commit=False)
            gm = getattr(self, "_grad_norm_meter", None)
            if gm is not None and gm.count:
                import optax
                param_norm = float(jax.device_get(
                    optax.global_norm(train_state["params"])))
                self.wandb_run.log(
                    {"epoch": epoch, "train/grad_norm": gm.avg,
                     "train/param_norm": param_norm}, commit=False)
        # save_checkpoint is COLLECTIVE (Orbax syncs all processes) — every
        # rank must call it, not just rank 0
        save_checkpoint(self.config, "model_last_epoch",
                        dict(train_state, epoch=epoch))
        if epoch % self.config.checkpoint_frequency == 0:
            save_checkpoint(self.config, f"model_epoch_{epoch}",
                            dict(train_state, epoch=epoch))
        self.average_train_metrics = average
        return average

    # -- eval hooks ------------------------------------------------------------

    def on_eval_epoch_start(self):
        self.all_preds = []
        self.all_labels = []
        for m in self.eval_metrics.values():
            m.reset()

    def on_eval_step_end(self, loss, output, labels, ids, rank=0,
                         save_samples=False, split="val"):
        output = np.asarray(output)
        labels = np.asarray(labels)
        preds, labels_m = self._postprocess(output, labels)
        n = output.shape[0]

        if self.config.exact_metrics:
            if self.config.task_type != "class":
                raise NotImplementedError(
                    "Exact metric computation not implemented for anything but "
                    "class task type")
            self.all_preds.append(preds)
            self.all_labels.append(labels_m)

        for name, meter in self.eval_metrics.items():
            if name == "loss":
                meter.update(float(loss), n=n)
            elif not self.config.exact_metrics:
                meter.update(self._compute(name, preds, labels_m), n=n)

        if save_samples:
            save_path = os.path.join(self.config.log_dir_run, "saved_samples", split)
            os.makedirs(save_path, exist_ok=True)
            task = self.config.task_type
            for b_pred, b_out, b_id in zip(preds, output, ids):
                if task == "seg":
                    arr = b_pred.reshape(b_out.shape[:-1])  # (T, H, W) int labels
                elif task == "enhance":
                    arr = b_pred                             # (C, [T,] H, W)
                else:
                    arr = b_pred
                np.save(os.path.join(save_path, f"{b_id}_output.npy"),
                        np.asarray(arr, dtype=np.float32))

    def on_eval_epoch_end(self, train_state, epoch: int, split: str,
                          final_eval: bool, rank: int = 0):
        if self.config.exact_metrics:
            # class-only (enforced in on_eval_step_end): preds (n,) binary
            # probs or (n, C) softmax; labels (n,) ints. A process can hold
            # zero rows, so give empties the right trailing shape up front.
            tail = () if self.binary else (self.config.no_out_channel,)
            preds = (np.concatenate(self.all_preds) if self.all_preds
                     else np.zeros((0,) + tail, np.float32))
            labels = (np.concatenate(self.all_labels) if self.all_labels
                      else np.zeros((0,), np.int64))
            if jax.process_count() > 1:
                preds, labels = _ragged_allgather(preds, labels)
            average = {"loss": self._reduce_meters(
                {"loss": self.eval_metrics["loss"]})["loss"]}
            for name in self.eval_metrics:
                if name != "loss":
                    average[name] = self._compute(name, preds, labels)
        else:
            average = self._reduce_meters(self.eval_metrics)

        if not final_eval and average["loss"] < self.best_val_loss:
            # the all-reduced loss is identical on every rank, so this
            # decision (and the collective Orbax save) is rank-consistent
            self.best_val_loss = average["loss"]
            save_checkpoint(self.config, "model_best_checkpoint",
                            dict(train_state, epoch=epoch))
        if rank <= 0 and not final_eval:
            if self.wandb_run is not None:
                self.wandb_run.log({"epoch": epoch, "best_loss": self.best_val_loss},
                                   commit=False)
                for name, val in average.items():
                    self.wandb_run.log({"epoch": epoch, f"{split}/{name}": val},
                                       commit=False)
        self.average_eval_metrics = average
        return average

    def on_training_end(self, rank: int = 0, ran_training: bool = True):
        if rank <= 0 and self.wandb_run is not None:
            if ran_training:
                self.wandb_run.summary["best_val_loss"] = getattr(
                    self, "best_val_loss", np.inf)
            self.wandb_run.finish()
