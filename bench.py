"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (`value`): train-step throughput (images/sec/chip,
fwd+bwd+adam) on the flagship long-context workload at its FULL reference
geometry: the ptx configuration — Swin-tiny patch-2 window-4 Hyena
classification at 1024x1024 (262,144 stage-0 tokens/image; ref:
projects/run_ptx.sh), bf16 AMP, batch 4.

Round 5 onward (VERDICT r4 missing #3): the line ALSO carries every flagship
workload (`workloads` dict: ptx/micro/vessel/cmr/emb/abct at the exact
reference geometries of projects/run_*.sh) and their geometric mean
(`geomean_images_per_sec_chip`), so wins outside ptx are visible to the
driver's BENCH_r*.json history.

vs_baseline: the reference repo publishes no numbers (BASELINE.md), so the
ratio reported is achieved model FLOPs / v5e peak (197 bf16 TFLOP/s) — i.e.
MXU utilization on the ptx step, comparable across rounds and geometries.

Usage: python bench.py  (runs on the default backend — the real TPU chip).
"""

from __future__ import annotations

import json
import math
import shutil
import tempfile
import time

V5E_PEAK_FLOPS = 197e12
V5E_PEAK_HBM_BPS = 819e9

# The six reference workloads at full geometry (SURVEY.md §2.5; batch sizes
# from BASELINE.md measurement history; remat dropped in r4 — faster AND fits).
WORKLOADS = {
    # name: (encoder argv, task, loss, H, W, T, Cin, Cout, B)
    "ptx": (["--Swin.size=tiny", "--Swin.patch_size", "2",
             "--Swin.window_size", "4", "--Swin.use_hyena=True"],
            "class", "CrossEntropy", 1024, 1024, 1, 1, 2, 4, "SwinLinear"),
    "micro": (["--Swin.size=tiny", "--Swin.patch_size", "2",
               "--Swin.window_size", "4", "--Swin.use_mamba=True"],
              "enhance", "CombinationEnhance", 1024, 1024, 1, 1, 1, 4,
              "UperNet2D"),
    "vessel": (["--Swin.size=tiny", "--Swin.patch_size", "2",
                "--Swin.window_size", "8", "--Swin.use_mamba=True"],
               "seg", "CrossEntropy", 1024, 1024, 1, 3, 2, 4, "UperNet2D"),
    "cmr": (["--Swin.size=tiny", "--Swin.patch_size", "2",
             "--Swin.window_size", "8", "--Swin.use_hyena=True"],
            "enhance", "CombinationEnhance", 128, 128, 32, 2, 1, 16,
            "UperNet3D"),
    "emb": (["--Swin.size=tiny", "--Swin.patch_size", "2",
             "--Swin.window_size", "8", "--Swin.use_hyena=True"],
            "class", "CrossEntropy", 256, 256, 64, 1, 2, 4, "SwinLinear"),
    "abct": (["--Swin.size=tiny", "--Swin.patch_size", "2",
              "--Swin.window_size", "4", "--Swin.use_mamba=True"],
             "seg", "CrossEntropy", 256, 256, 64, 1, 10, 2, "UperNet3D"),
}


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


def _build_step(name):
    """Compile the full train step (fwd+bwd+adam, bf16 AMP, donated state)
    for one flagship workload; returns (run_chain, B) where run_chain(n)
    executes n chained steps ended by one scalar fetch and returns wall
    seconds (delta-method timing: the axon relay breaks block_until_ready)."""
    import jax
    import jax.numpy as jnp

    from long_context_biomedical_imaging_tpu.losses import get_loss_func
    from long_context_biomedical_imaging_tpu.models import build_model
    from long_context_biomedical_imaging_tpu.optim import OptimManager
    from long_context_biomedical_imaging_tpu.setup import check_args, parse_config
    from long_context_biomedical_imaging_tpu.trainer import (create_train_state,
                                                             make_train_step)

    enc_argv, task, loss_name, H, W, T, Cin, Cout, B, dec = WORKLOADS[name]
    cfg = parse_config(argv=[
        "--encoder_name=Swin", f"--decoder_name={dec}", f"--task_type={task}",
        f"--height={H}", f"--width={W}", f"--time={T}",
        f"--no_in_channel={Cin}", f"--no_out_channel={Cout}",
        f"--batch_size={B}", "--scheduler_type=OneCycleLR", "--use_amp",
        *enc_argv])
    check_args(cfg)

    model = build_model(cfg)
    x = jnp.zeros((B, T, H, W, Cin), jnp.float32)
    if task == "class":
        labels = jnp.zeros((B,), jnp.int32)
    elif task == "seg":
        labels = jnp.zeros((B, T, H, W), jnp.int32)
    else:
        labels = jnp.zeros((B, T, H, W, Cout), jnp.float32)
    init = jax.jit(model.init, static_argnames=("deterministic",))
    variables = init(jax.random.PRNGKey(0), x, deterministic=True)
    optim = OptimManager(cfg, num_train_samples=1000)
    state = create_train_state(model, variables, optim.transform)
    step = jax.jit(make_train_step(model, get_loss_func(loss_name),
                                   optim.transform, use_amp=True),
                   donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)
    compiled = step.lower(state, x, labels, 1e-4, rng).compile()

    holder = {"state": state}

    def run_chain(n):
        t0 = time.perf_counter()
        s = holder["state"]
        for _ in range(n):
            s, loss, _ = compiled(s, x, labels, 1e-4, rng)
        holder["state"] = s
        float(loss)  # force materialization through the relay
        return time.perf_counter() - t0

    return run_chain, B


def _time_workload(name, n_small=4, n_large=16):
    run_chain, B = _build_step(name)
    run_chain(1)  # warmup (compile already done; first dispatch primes relay)
    t_small = run_chain(n_small)
    t_large = run_chain(n_large)
    dt = max((t_large - t_small) / (n_large - n_small), 1e-6)
    return dt, B / dt, run_chain


def main():
    import jax

    # persistent compile cache: repeat bench runs skip the multi-minute compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    workloads = {}
    ptx_chain = None
    for name in WORKLOADS:
        try:
            dt, img_s, chain = _time_workload(
                name, n_small=5 if name == "ptx" else 4,
                n_large=25 if name == "ptx" else 16)
            workloads[name] = {"ms_per_step": round(dt * 1e3, 1),
                               "images_per_sec_chip": round(img_s, 3)}
            if name == "ptx":
                ptx_chain, ptx_dt = chain, dt
        except Exception as e:  # one workload failing must not hide the rest
            workloads[name] = {"error": f"{type(e).__name__}: {e}"[:200]}

    ok = [w["images_per_sec_chip"] for w in workloads.values()
          if "images_per_sec_chip" in w]
    geomean = math.exp(sum(math.log(v) for v in ok) / len(ok)) if ok else 0.0

    n_chips = jax.local_device_count()
    ptx = workloads.get("ptx", {})
    ptx_img_s = ptx.get("images_per_sec_chip", 0.0)

    # Model FLOPs for the ptx geometry, pinned to XLA cost_analysis of the
    # all-XLA round-1 graph (9.604e12): once ops move into Pallas kernels,
    # cost_analysis stops counting their FLOPs, so the live number would
    # silently deflate vs_baseline. A fixed model-FLOPs constant keeps the
    # utilization ratio comparable across rounds (in-kernel backward
    # recompute is uncounted either way — utilization is a lower bound).
    flops_per_step = 9.604e12
    result = {
        "metric": "ptx_1024_swin_tiny_p2_w4_hyena_train_images_per_sec_chip",
        "value": ptx_img_s,
        "unit": "images/sec/chip",
        "vs_baseline": 0.0,
        "workloads": workloads,
        "geomean_images_per_sec_chip": round(geomean, 3),
    }
    if ptx_chain is not None:
        result["vs_baseline"] = round(
            (flops_per_step / ptx_dt) / (V5E_PEAK_FLOPS * n_chips), 4)
        # achieved HBM bandwidth (VERDICT r2 #9, r3 weak #1): XLA-visible
        # bytes from the trace PLUS the analytic in-kernel I/O of the Pallas
        # kernels (invisible to bytes_accessed); kernel MXU FLOPs alongside.
        xla_bytes = _trace_step_bytes(ptx_chain, 3)
        k_bytes, k_flops = _ptx_kernel_step_model(4, 1024, 1024)
        bytes_per_step = xla_bytes + int(k_bytes)
        result.update({
            "hbm_util": round(
                (bytes_per_step / ptx_dt) / (V5E_PEAK_HBM_BPS * n_chips), 4),
            "bytes_per_step": bytes_per_step,
            "xla_bytes_per_step": xla_bytes,
            "kernel_bytes_per_step": int(k_bytes),
            "kernel_mxu_tflops_per_s": round(k_flops / ptx_dt / 1e12, 1),
        })
    print(json.dumps(result))


if __name__ == "__main__":
    main()
