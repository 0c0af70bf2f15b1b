"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric: train-step throughput (images/sec/chip, fwd+bwd+adam) on the
flagship long-context workload at its FULL reference geometry: the ptx
configuration — Swin-tiny patch-2 window-4 Hyena classification at 1024x1024
(262,144 stage-0 tokens/image; ref: projects/run_ptx.sh), bf16 AMP, batch 4.
(Round 1 benched this at half resolution; round 2 onward reports the real
thing — BASELINE.md carries the per-round history for both geometries.)

vs_baseline: the reference repo publishes no numbers (BASELINE.md), so the
ratio reported is achieved model FLOPs / v5e peak (197 bf16 TFLOP/s) — i.e.
MXU utilization, comparable across rounds and geometries.

Usage: python bench.py  (runs on the default backend — the real TPU chip).
"""

from __future__ import annotations

import json
import shutil
import tempfile
import time

V5E_PEAK_FLOPS = 197e12
V5E_PEAK_HBM_BPS = 819e9


def _trace_step_bytes(run_steps, n_steps: int) -> int:
    """Per-step HBM bytes from an n_steps profiler trace (the number the
    roofline tables in BASELINE.md are built from)."""
    import jax

    from long_context_biomedical_imaging_tpu.utils.traceio import \
        trace_total_bytes
    tmpdir = tempfile.mkdtemp(prefix="lcbi_bench_trace_")
    try:
        with jax.profiler.trace(tmpdir):
            run_steps(n_steps)
        return trace_total_bytes(tmpdir) // max(n_steps, 1)
    except Exception:
        return 0
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def _ptx_kernel_step_model(B: int, H: int, W: int):
    """Analytic HBM I/O bytes and MXU FLOPs of the Pallas kernels in ONE ptx
    train step (fwd+bwd). The profiler trace reports bytes_accessed=0 and
    cost_analysis counts no FLOPs for custom calls, so without this term the
    published hbm_util was an undercount of unknown size (VERDICT r3 weak #1).

    Per Swin block the step runs two fused kernels (hyena mixer, LN-MLP),
    each streaming the (N_s, C_s) bf16 stage tensor: 2 passes fwd (x in, out
    out) + 3 passes bwd (x, do in; dx out). MXU FLOPs per block (BASELINE.md
    r4 anatomy): mixer 8*N*C^2 fwd + 24 bwd; MLP (H=4C) 16*N*C^2 fwd + 40
    bwd (recompute + 4 grad matmuls). Weight I/O is <1% and omitted."""
    depths = (2, 2, 6, 2)
    tokens0 = B * (H // 2) * (W // 2)
    bytes_total, flops_total = 0.0, 0.0
    for s, depth in enumerate(depths):
        n = tokens0 // 4 ** s
        c = 96 * 2 ** s
        bytes_total += depth * 10 * n * c * 2          # 5 passes x 2 kernels
        flops_total += depth * (32 + 56) * n * c * c
    return bytes_total, flops_total


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: repeat bench runs skip the multi-minute compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from long_context_biomedical_imaging_tpu.losses import get_loss_func
    from long_context_biomedical_imaging_tpu.models import build_model
    from long_context_biomedical_imaging_tpu.optim import OptimManager
    from long_context_biomedical_imaging_tpu.setup import check_args, parse_config
    from long_context_biomedical_imaging_tpu.trainer import (create_train_state,
                                                             make_train_step)

    H = W = 1024
    B = 4
    cfg = parse_config(argv=[
        "--encoder_name=Swin", "--decoder_name=SwinLinear", "--task_type=class",
        f"--height={H}", f"--width={W}", "--time=1",
        "--no_in_channel=1", "--no_out_channel=2",
        f"--batch_size={B}", "--scheduler_type=OneCycleLR", "--use_amp",
        "--Swin.size=tiny", "--Swin.patch_size", "2", "--Swin.window_size", "4",
        "--Swin.use_hyena=True", "--Swin.use_mamba=False"])
    check_args(cfg)

    model = build_model(cfg)
    x = jnp.zeros((B, 1, H, W, 1), jnp.float32)
    init = jax.jit(model.init, static_argnames=("deterministic",))
    variables = init(jax.random.PRNGKey(0), x, deterministic=True)
    optim = OptimManager(cfg, num_train_samples=1000)
    state = create_train_state(model, variables, optim.transform)
    step = jax.jit(make_train_step(model, get_loss_func("CrossEntropy"),
                                   optim.transform, use_amp=True),
                   donate_argnums=(0,))
    labels = jnp.zeros((B,), jnp.int32)
    rng = jax.random.PRNGKey(1)

    # compile once; reuse the executable for the timed loop
    compiled = step.lower(state, x, labels, 1e-4, rng).compile()
    # Model FLOPs for this geometry, pinned to XLA cost_analysis of the
    # all-XLA round-1 graph (9.604e12): once ops move into Pallas kernels,
    # cost_analysis stops counting their FLOPs, so the live number would
    # silently deflate vs_baseline. A fixed model-FLOPs constant keeps the
    # utilization ratio comparable across rounds (in-kernel backward
    # recompute is uncounted either way — utilization is a lower bound).
    flops_per_step = 9.604e12

    state, loss, _ = compiled(state, x, labels, 1e-4, rng)  # warmup
    float(loss)

    # Delta-method timing: this environment's remote-TPU relay makes
    # block_until_ready unreliable and adds a fixed ~30ms latency per host
    # fetch, so we time two chained-step runs of different lengths (each ended
    # by one scalar fetch) and take the difference.
    def run_chain(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, loss, _ = compiled(state, x, labels, 1e-4, rng)
        float(loss)  # force materialization through the relay
        return time.perf_counter() - t0

    n_small, n_large = 5, 25
    t_small = run_chain(n_small)
    t_large = run_chain(n_large)
    dt = max((t_large - t_small) / (n_large - n_small), 1e-6)

    n_chips = jax.local_device_count()
    images_per_sec_chip = B / dt / n_chips
    utilization = (flops_per_step / dt) / (V5E_PEAK_FLOPS * n_chips) \
        if flops_per_step == flops_per_step else 0.0

    # achieved HBM bandwidth (VERDICT r2 #9, r3 weak #1): XLA-visible bytes
    # from the trace PLUS the analytic in-kernel I/O of the Pallas kernels
    # (invisible to bytes_accessed); kernel MXU FLOPs reported alongside.
    xla_bytes = _trace_step_bytes(run_chain, 3)
    k_bytes, k_flops = _ptx_kernel_step_model(B, H, W)
    bytes_per_step = xla_bytes + int(k_bytes)
    hbm_util = (bytes_per_step / dt) / (V5E_PEAK_HBM_BPS * n_chips)

    print(json.dumps({
        "metric": "ptx_1024_swin_tiny_p2_w4_hyena_train_images_per_sec_chip",
        "value": round(images_per_sec_chip, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(utilization, 4),
        "hbm_util": round(hbm_util, 4),
        "bytes_per_step": bytes_per_step,
        "xla_bytes_per_step": xla_bytes,
        "kernel_bytes_per_step": int(k_bytes),
        "kernel_mxu_tflops_per_s": round(k_flops / dt / 1e12, 1),
    }))


if __name__ == "__main__":
    main()
