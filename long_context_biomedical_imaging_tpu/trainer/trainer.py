"""TrainManager: the training/eval runtime (ref: trainer/trainer_base.py:37-418).

Owns the epoch/step loop, compiled-step dispatch over the device mesh, eval
scheduling, scheduler stepping, best-checkpoint reload before final eval, and
{split}_metrics.txt output. Where the reference wraps the model in DDP and
spawns per-GPU processes, this manager jit-compiles one SPMD step over a
Mesh('data','model') and feeds it host-sharded batches.
"""

from __future__ import annotations

import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data import BatchLoader
from ..parallel import batch_sharding, create_mesh, replicated_sharding
from ..utils.checkpoint import load_checkpoint, restore_into, save_checkpoint
from .train_state import TrainState, create_train_state, make_eval_step, make_train_step


class TrainManager:
    def __init__(self, config, datasets: dict, model, loss_func, optim_manager,
                 metric_manager):
        self.config = config
        self.datasets = datasets          # {'train','val','test'} -> NumpyDataset
        self.model = model
        self.loss_func = loss_func
        self.optim = optim_manager
        self.metrics = metric_manager
        self.logger = logging.getLogger("lcbi")
        self.file_logger = logging.getLogger("lcbi.file_only")
        self.mesh = create_mesh(
            model_parallel=int(config.get("model_parallel", 1) or 1))
        self.rank = jax.process_index()

        self._batch_shard = batch_sharding(self.mesh)
        self._replicated = replicated_sharding(self.mesh)

    # -- state -----------------------------------------------------------------

    def _init_state(self) -> TrainState:
        cfg = self.config
        shape = (2, cfg.time, cfg.height, cfg.width, cfg.no_in_channel)
        rng = jax.random.PRNGKey(cfg.seed or 0)
        # jitted init: tracing the full model op-by-op on device is minutes on
        # large configs; one compiled graph is seconds
        init = jax.jit(self.model.init, static_argnames=("deterministic",))
        variables = init(rng, jnp.zeros(shape, jnp.float32), deterministic=True)
        state = create_train_state(self.model, variables, self.optim.transform)
        # Replicate over the global mesh: single-process jit can freely reshard
        # a device-0-committed state, but multi-process jit cannot promote a
        # host-local array into the global computation — and an explicit
        # replicated layout skips that reshard on the first step either way.
        state = jax.device_put(state, self._replicated)
        if self.rank <= 0:
            from ..utils.status import get_device_info, model_info
            self.logger.info("%s", get_device_info())
            model_info(self.model, state.params,
                       jnp.zeros(shape, jnp.float32), logger=self.logger,
                       flops=False if not cfg.get("with_timer") else None)
        return state

    def _maybe_load(self, state: TrainState) -> TrainState:
        cfg = self.config
        if cfg.model_load_path:
            self.logger.info("Loading model from %s", cfg.model_load_path)
            ckpt = load_checkpoint(cfg.model_load_path)
            state = state.replace(
                params=restore_into(state.params, ckpt["params"]),
                batch_stats=restore_into(state.batch_stats,
                                         ckpt.get("batch_stats", {})))
            if cfg.continued_training:
                if "opt_state" in ckpt and ckpt["opt_state"] is not None:
                    state = state.replace(opt_state=restore_into(
                        state.opt_state, ckpt["opt_state"]))
                if "sched_state" in ckpt and ckpt["sched_state"]:
                    self.optim.load_state_dict(ckpt["sched_state"])
                self.optim.curr_epoch = int(ckpt.get("epoch", 0)) + 1
                state = state.replace(step=jnp.asarray(
                    int(ckpt.get("step", 0)), jnp.int32))
            # restored leaves are host arrays; re-replicate over the mesh
            # (multi-process jit cannot promote host-local inputs)
            state = jax.device_put(state, self._replicated)
        return state

    def _state_for_checkpoint(self, state: TrainState) -> dict:
        return {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "step": int(state.step),
                "sched_state": self.optim.state_dict()}

    # -- loaders -----------------------------------------------------------------

    def _loader(self, split: str, shuffle: bool) -> BatchLoader:
        cfg = self.config
        workers = cfg.num_workers if cfg.num_workers > 0 else (os.cpu_count() or 4)
        # batch_size is PER-DEVICE, matching the reference's per-rank batches
        # under 8-GPU DDP (trainer_base.py:126-135): each process loads
        # batch_size * its share of the 'data' axis; the global batch is
        # batch_size * data_parallel and shards evenly by construction.
        d_local = max(1, self.mesh.shape["data"] // jax.process_count())
        return BatchLoader(self.datasets[split], cfg.batch_size * d_local,
                           shuffle=shuffle,
                           seed=cfg.seed or 0, num_workers=min(workers, 16),
                           prefetch_batches=cfg.prefetch_factor)

    def _put(self, images, labels, accum: bool = False):
        from ..parallel import put_global_batch
        # Under AMP, upload images in bf16: the step casts its compute to
        # bf16 anyway (the patchify matmul runs bf16xbf16 either way, like
        # the reference's autocast), and halving the H2D bytes is worth
        # 60-100 ms/step through this remote-TPU relay on a 1-CPU host
        # (measured: fp32 feed 239-288 ms/step vs bf16 182 vs 181 bare
        # step). Loss targets stay fp32 — the loss computes in fp32.
        if self.config.use_amp and images.dtype == np.float32:
            images = images.astype(jnp.bfloat16)
        # Integer labels upload as uint8 when every class index fits: seg
        # masks are int32 (B, T, H, W) — 33 MB/step for abct, 4x the useful
        # bytes. H2D through this remote-TPU relay measured ~25 MB/s (r5,
        # BASELINE.md sustained section), so label bytes are wall-clock. The
        # step casts back to int32 on device (free — fused into the one-hot).
        if (np.issubdtype(labels.dtype, np.integer)
                and 0 < int(self.config.no_out_channel or 0) <= 255):
            labels = labels.astype(np.uint8)
        return put_global_batch(self.mesh, images, labels, accum=accum)

    # -- main ------------------------------------------------------------------

    def run(self):
        cfg = self.config
        if self.rank <= 0:
            self.metrics.init_wandb()
        self.metrics.setup_wandb_and_metrics(self.rank)

        state = self._maybe_load(self._init_state())

        ran_training = False
        epoch = self.optim.curr_epoch
        if cfg.train_model:
            try:
                state = self._train_loop(state)
            except KeyboardInterrupt:
                # graceful shutdown (ref: trainer_base.py:403-410). Any state
                # still on device may have been donated into a later step, so
                # recover from the durable per-epoch checkpoint instead.
                self.logger.warning("KeyboardInterrupt — stopping training early")
                last = os.path.join(cfg.log_dir_run, "models", "model_last_epoch")
                if os.path.exists(last):
                    ckpt = load_checkpoint(last)
                    state = self._init_state()
                    state = state.replace(
                        params=restore_into(state.params, ckpt["params"]),
                        batch_stats=restore_into(state.batch_stats,
                                                 ckpt.get("batch_stats", {})))
                    state = jax.device_put(state, self._replicated)
            ran_training = True
            epoch = cfg.num_epochs

            # reload best checkpoint before final eval (ref: trainer_base.py:224-228;
            # the barrier keeps other ranks from reading a half-written save)
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils
                multihost_utils.sync_global_devices("best_checkpoint_reload")
            best = os.path.join(cfg.log_dir_run, "models", "model_best_checkpoint")
            if os.path.exists(best):
                ckpt = load_checkpoint(best)
                state = state.replace(
                    params=restore_into(state.params, ckpt["params"]),
                    batch_stats=restore_into(state.batch_stats,
                                             ckpt.get("batch_stats", {})))
                state = jax.device_put(state, self._replicated)

        # final evals (ref: trainer_base.py:234-242)
        for split, do_eval, save in (
                ("train", cfg.eval_train_set, cfg.save_train_samples),
                ("val", cfg.eval_val_set, cfg.save_val_samples),
                ("test", cfg.eval_test_set, cfg.save_test_samples)):
            if do_eval:
                avg = self._eval_model(state, split, epoch, final_eval=True,
                                       save_samples=save)
                self._write_metrics_file(split, avg)

        self.metrics.on_training_end(self.rank, ran_training=ran_training)
        return state

    def _make_train_step(self, accum: int, grad_div: int):
        cfg = self.config
        from ..metrics.device import make_train_metric_fn
        self._train_metric_names, metrics_fn = make_train_metric_fn(cfg)
        return jax.jit(make_train_step(self.model, self.loss_func,
                                       self.optim.transform,
                                       use_amp=cfg.use_amp, accum=accum,
                                       metrics_fn=metrics_fn,
                                       return_output=False,
                                       grad_div=grad_div),
                       donate_argnums=(0,))

    def _train_loop(self, state: TrainState) -> TrainState:
        cfg = self.config
        accum = max(1, cfg.iters_to_accumulate)
        train_step = self._make_train_step(accum, accum)
        # Epoch-end flush of a partial accumulation group (ref flushes the
        # optimizer at idx+1 == total_iters, trainer_base.py:172; grads keep
        # the 1/iters_to_accumulate scaling of the full-group path). Compiled
        # lazily per tail size — the tail size is fixed for a given dataset.
        tail_steps: dict = {}
        loader = self._loader("train", shuffle=True)
        rng = jax.random.PRNGKey((cfg.seed or 0) + 1)
        # Per-step RNG split must be a COMPILED call: eager jax ops through
        # this environment's remote-TPU relay cost ~225 ms each (measured,
        # round 4) vs 0.04 ms jitted — an eager split alone would serialize
        # the host behind more than the whole 181 ms ptx step.
        split2 = jax.jit(lambda k: tuple(jax.random.split(k)))
        # host-side step counter — int(state.step) would force a device sync
        # (expensive through remote-TPU relays) on every iteration
        host_step = int(state.step)

        from ..utils.status import StepTimer
        timer = StepTimer(enabled=bool(cfg.get("with_timer")),
                          trace_dir=os.path.join(cfg.log_dir_run, "profile"))

        # Dispatch de-serialization (VERDICT r3 #4): a per-step
        # jax.device_get(stats) blocks until the step completes — through this
        # environment's remote-TPU relay a host fetch costs ~30 ms
        # (bench.py), serializing dispatch and costing up to ~17% of a
        # 181 ms step. Instead the tiny stats vectors stay on device and are
        # flushed in one stacked transfer every K steps; the reference's NaN
        # fail-fast (enhancement_losses.py:55-56,225-226) still aborts the
        # epoch, on a <= K-step delay. --with_timer forces K=1 so per-step
        # timings stay meaningful.
        flush_every = 1 if timer.enabled else max(
            1, int(cfg.get("stats_fetch_every") or 16))
        pending: list = []

        # stacking the buffered stats must also be compiled (eager
        # reshape+stack of 16 tiny arrays measured 950 ms on this relay);
        # one cached executable per distinct group size
        stack_fns: dict = {}
        # The fetch itself runs on a worker thread: a blocking device_get
        # waits for the just-dispatched step plus the ~566 ms relay round
        # trip (~47 ms/step amortized at K=16). One worker preserves metric
        # order; exceptions (the NaN fail-fast) surface on the next dispatch
        # or at the epoch-end drain.
        from concurrent.futures import ThreadPoolExecutor
        flusher = ThreadPoolExecutor(max_workers=1)
        flush_futures: list = []

        def process_rows(rows, meta):
            for row, (n, lr, epoch, step) in zip(rows, meta):
                if not np.isfinite(row[0]):
                    raise FloatingPointError(
                        f"non-finite loss at epoch {epoch} step {step}")
                self.metrics.on_train_step_end_device(
                    row, self._train_metric_names, n=n,
                    rank=self.rank, curr_lr=lr)

        def flush_stats(wait: bool = False):
            if pending:
                meta = [p[1:] for p in pending]
                if len(pending) == 1:
                    stacked = pending[0][0]
                else:
                    k = len(pending)
                    if k not in stack_fns:
                        stack_fns[k] = jax.jit(
                            lambda *xs: jnp.stack([x.reshape(-1) for x in xs]))
                    stacked = stack_fns[k](*[p[0] for p in pending])
                pending.clear()
                flush_futures.append(flusher.submit(
                    lambda s=stacked, m=meta: process_rows(
                        np.asarray(jax.device_get(s)).reshape(len(m), -1), m)))
            while flush_futures and (wait or flush_futures[0].done()):
                flush_futures.pop(0).result()   # re-raises the NaN fail-fast

        def dispatch(step_fn, state, micros, group_valid, epoch, stacked):
            nonlocal rng, host_step
            if stacked:
                im = np.stack([m[0] for m in micros])
                lb = np.stack([m[1] for m in micros])
            else:
                im, lb = micros[0][0], micros[0][1]
            rng, sub = split2(rng)
            lr = self.optim.current_lr(host_step, epoch)
            im_d, lb_d = self._put(im, lb, accum=stacked)
            if jax.process_count() > 1:
                # per-row mask over the global batch: this process's padding
                # sits at the tail of its own block, so a first-n count over
                # the global axis would mask the wrong rows
                from ..parallel import put_global_batch
                masks = [(np.arange(len(m[0])) < m[2]).astype(np.float32)
                         for m in micros]
                nv_arg = put_global_batch(
                    self.mesh, np.stack(masks) if stacked else masks[0],
                    accum=stacked)
            else:
                nv_arg = group_valid
            timer.start_step()
            state, stats, _ = step_fn(state, im_d, lb_d, lr, sub, nv_arg)
            host_step += 1
            pending.append((stats, group_valid, lr, epoch, host_step))
            if len(pending) >= flush_every:
                flush_stats()
            timer.end_step()
            return state

        for epoch in range(self.optim.curr_epoch, cfg.num_epochs):
            loader.set_epoch(epoch)
            self.metrics.on_train_epoch_start()
            t0 = time.perf_counter()
            micros, group_valid, n_seen = [], 0, 0

            for it, (images, labels, ids, n_valid) in enumerate(loader):
                if cfg.debug and it >= 3 * accum:
                    break
                micros.append((images, labels, n_valid))
                group_valid += n_valid
                n_seen += n_valid
                if len(micros) < accum:
                    continue
                state = dispatch(train_step, state, micros, group_valid,
                                 epoch, stacked=accum > 1)
                micros, group_valid = [], 0

            if micros:
                # partial tail group: one more optimizer step, grads still
                # divided by the full iters_to_accumulate (ref semantics)
                k = len(micros)
                if k not in tail_steps:
                    tail_steps[k] = self._make_train_step(k, accum)
                state = dispatch(tail_steps[k], state, micros, group_valid,
                                 epoch, stacked=k > 1)
                micros, group_valid = [], 0

            flush_stats(wait=True)   # epoch boundary: drain stats + NaN check
            dt = time.perf_counter() - t0
            if timer.enabled:
                self.file_logger.info("epoch %d %s", epoch, timer.summary())
            avg = self.metrics.on_train_epoch_end(
                self._state_for_checkpoint(state), epoch, rank=self.rank)
            self.file_logger.info(
                "epoch %d train: %s (%.1fs, %.2f samples/s)", epoch,
                {k: round(v, 5) for k, v in avg.items()}, dt,
                n_seen / max(dt, 1e-9))

            if epoch % cfg.eval_frequency == 0:
                val_avg = self._eval_model(state, "val", epoch, final_eval=False)
                self._last_val_loss = val_avg["loss"]
                self.file_logger.info("epoch %d val: %s", epoch,
                                      {k: round(v, 5) for k, v in val_avg.items()})
            # The reference steps ReduceLROnPlateau EVERY epoch, falling back
            # to the last available loss when no fresh eval ran
            # (trainer_base.py:211-217: stale average_eval_metrics, then the
            # step train loss).
            last_val = getattr(self, "_last_val_loss", None)
            self.optim.plateau_step(
                last_val if last_val is not None else avg.get("loss", float("inf")))
        flusher.shutdown(wait=False)
        return state

    def _eval_model(self, state: TrainState, split: str, epoch: int,
                    final_eval: bool, save_samples: bool = False) -> dict:
        cfg = self.config
        if not hasattr(self, "_eval_step"):
            # build once — a fresh closure per eval would recompile every time
            self._eval_step = jax.jit(make_eval_step(self.model, self.loss_func,
                                                     use_amp=cfg.use_amp))
        eval_step = self._eval_step
        loader = self._loader(split, shuffle=False)
        self.metrics.on_eval_epoch_start()
        for it, (images, labels, ids, n_valid) in enumerate(loader):
            if cfg.debug and it >= 3:
                break
            im_d, lb_d = self._put(images, labels)
            if jax.process_count() > 1:
                # per-row mask: each process's padding sits at the end of its
                # own block of the global batch, not of the global batch
                from ..parallel import put_global_batch
                mask = (np.arange(len(images)) < n_valid).astype(np.float32)
                nv_arg = put_global_batch(self.mesh, mask)
            else:
                nv_arg = n_valid
            loss, output = eval_step(state, im_d, lb_d, nv_arg)
            # fetch only this process's rows: device_get on a global
            # batch-sharded array is illegal under multi-host (the scalar
            # loss is replicated, hence fully addressable)
            from ..parallel import fetch_local_rows
            self.metrics.on_eval_step_end(
                jax.device_get(loss), fetch_local_rows(output)[:n_valid],
                labels[:n_valid], ids[:n_valid], rank=self.rank,
                save_samples=save_samples, split=split)
        return self.metrics.on_eval_epoch_end(
            self._state_for_checkpoint(state), epoch, split,
            final_eval=final_eval, rank=self.rank)

    def _write_metrics_file(self, split: str, metrics: dict):
        """(ref: trainer_base.py:332-338)."""
        if self.rank > 0:
            return
        path = os.path.join(self.config.log_dir_run, f"{split}_metrics.txt")
        with open(path, "w") as f:
            for name, val in metrics.items():
                f.write(f"{name}: {val}\n")
        self.logger.info("%s metrics: %s", split,
                         {k: round(v, 5) for k, v in metrics.items()})
