"""Model/device introspection and step timing.

TPU equivalents of the reference status utilities (ref: utils/status.py:15-107):
  * `model_info` — param counts + compiled-forward FLOP estimate (replaces the
    torchinfo summary, ref: :63-93)
  * `get_device_info` — chip inventory (replaces get_cuda_info, ref: :33-48)
  * `StepTimer` — wall-clock step statistics; the reference parses a
    `--with_timer` flag but never consumes it (SURVEY.md §5.1) — here it is
    wired into the trainer and can also capture a `jax.profiler` trace.
"""

from __future__ import annotations

import logging
import os
import time

import jax
import numpy as np


def get_device_info() -> str:
    devs = jax.devices()
    kinds = {}
    for d in devs:
        kinds[d.device_kind] = kinds.get(d.device_kind, 0) + 1
    parts = [f"{n}x {k}" for k, n in kinds.items()]
    return (f"{jax.process_count()} process(es), {len(devs)} device(s): "
            + ", ".join(parts))


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def model_info(model, params, example_input, logger=None, flops=None) -> dict:
    """Log a summary: total params, per-submodule params, fwd FLOPs estimate."""
    logger = logger or logging.getLogger("lcbi")
    total = count_params(params)
    lines = [f"Model parameters: {total / 1e6:.2f}M"]
    for name, sub in (params.items() if hasattr(params, "items") else []):
        lines.append(f"  {name}: {count_params(sub) / 1e6:.3f}M")
    if flops is None:
        try:
            fwd = jax.jit(lambda p, x: model.apply({"params": p}, x,
                                                   deterministic=True))
            flops = fwd.lower(params, example_input).compile().cost_analysis().get(
                "flops")
        except Exception:
            flops = None
    if flops:
        lines.append(f"Forward FLOPs (compiled estimate): {flops / 1e9:.2f} G")
    for line in lines:
        logger.info("%s", line)
    return {"params": total, "flops": flops}


class StepTimer:
    """Host-side wall-clock step timing with optional jax.profiler capture.

    Through remote-device relays `block_until_ready` may not wait, so per-step
    numbers are only meaningful when the caller forces a host fetch each step
    (the trainer fetches loss for metrics anyway).
    """

    def __init__(self, enabled: bool, trace_dir: str | None = None,
                 trace_steps: tuple[int, int] = (2, 5)):
        self.enabled = enabled
        self.trace_dir = trace_dir
        self.trace_steps = trace_steps
        self._tracing = False
        self.times: list[float] = []
        self._t0 = None
        self._step = 0

    def start_step(self):
        if not self.enabled:
            return
        if (self.trace_dir and self._step == self.trace_steps[0]
                and not self._tracing):
            os.makedirs(self.trace_dir, exist_ok=True)
            try:
                jax.profiler.start_trace(self.trace_dir)
                self._tracing = True
            except Exception as e:  # profiling may be unsupported on a relay
                logging.getLogger("lcbi").warning("profiler start failed: %s", e)
        self._t0 = time.perf_counter()

    def end_step(self):
        if not self.enabled or self._t0 is None:
            return
        self.times.append(time.perf_counter() - self._t0)
        self._step += 1
        if self._tracing and self._step >= self.trace_steps[1]:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
            self._tracing = False

    def summary(self) -> str:
        if not self.times:
            return "no steps timed"
        arr = np.asarray(self.times[1:] or self.times)
        return (f"step time: mean {arr.mean() * 1e3:.1f} ms, "
                f"p50 {np.percentile(arr, 50) * 1e3:.1f} ms, "
                f"p95 {np.percentile(arr, 95) * 1e3:.1f} ms over {len(arr)} steps")
