"""Overfit a single batch at full reference geometry on the real chip.

Convergence-level validation of the fused-kernel + donated-state train path
(VERDICT r2 item #5): a training step that only passes op-parity tests can
still lose to a kernel-gradient integration bug; driving the loss of one
fixed batch toward zero through run-of-the-mill `make_train_step` exercises
the full fwd+bwd+adam chain exactly as run.py does.

Usage: python scripts/overfit_one_batch.py --workload ptx [--steps 150]
       [--lr 1e-3] | --workload all

Prints loss at step 0/25/50/.../N and a PASS/FAIL verdict (final loss under
--target, default 0.05x initial). Results are recorded in PARITY.md.
"""
import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# full reference geometries (projects/run_*.sh; SURVEY.md §2.5)
WORKLOADS = {
    "ptx": dict(mixer="hyena", h=1024, w=1024, t=1, b=4, window=4, patch=2,
                task="class", decoder="SwinLinear", cin=1, cout=2),
    "micro": dict(mixer="mamba", h=1024, w=1024, t=1, b=4, window=4, patch=2,
                  task="enhance", decoder="UperNet2D", cin=1, cout=1),
    "vessel": dict(mixer="mamba", h=1024, w=1024, t=1, b=4, window=8, patch=2,
                   task="seg", decoder="UperNet2D", cin=3, cout=2,
                   remat=True),
    "cmr": dict(mixer="hyena", h=128, w=128, t=32, b=16, window=8, patch=2,
                task="enhance", decoder="UperNet3D", cin=2, cout=2,
                remat=True),
    "emb": dict(mixer="hyena", h=256, w=256, t=64, b=4, window=8, patch=2,
                task="class", decoder="SwinLinear", cin=1, cout=2, remat=True),
    "abct": dict(mixer="mamba", h=256, w=256, t=64, b=2, window=4, patch=2,
                 task="seg", decoder="UperNet3D", cin=1, cout=10, remat=True),
    # the BASELINE.json ViT full-sequence configs: convergence-validates the
    # flash-attention, matmul-FFT long-conv, and blocked long-scan kernels
    "vit16k": dict(encoder="ViT", mixer="attention", h=1024, w=1024, t=1, b=2,
                   patch=8, task="class", decoder="ViTLinear", cin=1, cout=2),
    "vit65k_hyena": dict(encoder="ViT", mixer="hyena", h=1024, w=1024, t=1,
                         b=1, patch=4, task="class", decoder="ViTLinear",
                         cin=1, cout=2),
    "vit65k_mamba": dict(encoder="ViT", mixer="mamba", h=1024, w=1024, t=1,
                         b=1, patch=4, task="class", decoder="ViTLinear",
                         cin=1, cout=2),
    # CPU smoke configs for validating the script itself (not flagships)
    "tiny": dict(mixer="hyena", h=32, w=32, t=1, b=2, window=4, patch=2,
                 task="class", decoder="SwinLinear", cin=1, cout=2),
    "tiny_vit": dict(encoder="ViT", mixer="attention", h=32, w=32, t=1, b=2,
                     patch=4, task="class", decoder="ViTLinear", cin=1,
                     cout=2),
}


def _linear_upsample(x, axis, new_size):
    """Half-pixel linear interpolation of one axis (numpy, target synthesis)."""
    import numpy as np
    old = x.shape[axis]
    pos = (np.arange(new_size) + 0.5) * old / new_size - 0.5
    f = np.floor(pos)
    w = (pos - f).astype(np.float32)       # weight BEFORE clipping: clamped
    lo = np.clip(f.astype(np.int64), 0, old - 1)       # edges then read the
    hi = np.clip(f.astype(np.int64) + 1, 0, old - 1)   # same sample (no
    # extrapolation overshoot at the low edge)
    shape = [1] * x.ndim
    shape[axis] = new_size
    w = w.reshape(shape)
    return (np.take(x, lo, axis=axis) * (1 - w)
            + np.take(x, hi, axis=axis) * w)


def run_workload(name, cfg_dict, steps, lr, target_ratio):
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from long_context_biomedical_imaging_tpu.losses import get_loss_func
    from long_context_biomedical_imaging_tpu.models import build_model
    from long_context_biomedical_imaging_tpu.optim import OptimManager
    from long_context_biomedical_imaging_tpu.setup import check_args, parse_config
    from long_context_biomedical_imaging_tpu.trainer import (
        create_train_state, make_train_step)

    a = argparse.Namespace(**cfg_dict)
    remat = cfg_dict.get("remat", False)
    encoder = cfg_dict.get("encoder", "Swin")
    argv = [
        f"--encoder_name={encoder}", f"--decoder_name={a.decoder}",
        f"--task_type={a.task}", f"--height={a.h}", f"--width={a.w}",
        f"--time={a.t}", f"--no_in_channel={a.cin}",
        f"--no_out_channel={a.cout}", f"--batch_size={a.b}",
        "--scheduler_type=OneCycleLR", "--use_amp"]
    if encoder == "Swin":
        argv += ["--Swin.size=tiny", "--Swin.patch_size", str(a.patch),
                 "--Swin.window_size", str(a.window),
                 f"--Swin.use_hyena={a.mixer == 'hyena'}",
                 f"--Swin.use_mamba={a.mixer == 'mamba'}"]
        if remat:
            argv += ["--Swin.use_checkpoint=True"]
    else:
        argv += ["--ViT.size=small", "--ViT.patch_size", str(a.patch),
                 f"--ViT.use_hyena={a.mixer == 'hyena'}",
                 f"--ViT.use_mamba={a.mixer == 'mamba'}"]
    cfg = parse_config(argv=argv)
    check_args(cfg)

    loss_name = {"class": "CrossEntropy", "seg": "CrossEntropy",
                 "enhance": "CombinationEnhance"}[a.task]
    model = build_model(cfg)

    rs = np.random.RandomState(0)
    # Targets must be LEARNABLE functions of the input: fully random per-pixel
    # labels at 1024^2 are unmemorizable in 150 steps (and white-noise maps
    # can't pass through UperNet's coarse decode grids at all), so a healthy
    # model would FAIL for the wrong reason. The input is a SMOOTH (trilinear)
    # low-frequency random field — a blockwise-constant (kron) field has step
    # edges the coarse-grid decoders can only render as ramps, which puts an
    # irreducible ~0.06-0.08x floor under the enhance/seg losses (measured:
    # cmr bottomed at 0.079x of initial after 400 steps with kron inputs,
    # oscillating, while every smooth-representable config converged) — an
    # expressivity limit, not a training-path bug, so it doesn't belong in
    # this check. class keeps random labels (b<=16 samples — memorizable);
    # seg learns quantized input intensity; enhance an affine map of input.
    bt, bh, bw = max(a.t // 4, 1), max(a.h // 16, 1), max(a.w // 16, 1)
    base = rs.rand(a.b, bt, bh, bw, a.cin).astype(np.float32)
    xh = base
    for axis, (src, dst) in zip((1, 2, 3), ((bt, a.t), (bh, a.h), (bw, a.w))):
        if src != dst:
            xh = _linear_upsample(xh, axis, dst)
    x = jnp.asarray(xh)
    if a.task == "class":
        labels = jnp.asarray(rs.randint(0, a.cout, size=(a.b,)), jnp.int32)
    elif a.task == "seg":
        lab = np.clip((xh.mean(-1) * a.cout).astype(np.int64), 0, a.cout - 1)
        labels = jnp.asarray(lab, jnp.int32)
    else:
        labels = jnp.asarray(0.5 * xh[..., :a.cout] + 0.2)

    init = jax.jit(model.init, static_argnames=("deterministic",))
    variables = init(jax.random.PRNGKey(0), x, deterministic=True)
    optim = OptimManager(cfg, num_train_samples=1000, world=1)
    state = create_train_state(model, variables, optim.transform)
    step = jax.jit(make_train_step(model, get_loss_func(loss_name),
                                   optim.transform, use_amp=True),
                   donate_argnums=(0,))
    compiled = step.lower(state, x, labels, lr, jax.random.PRNGKey(1)).compile()

    rng = jax.random.PRNGKey(1)
    losses = []
    t0 = time.perf_counter()
    for i in range(steps):
        state, loss, _ = compiled(state, x, labels, lr, rng)
        if i % 25 == 0 or i == steps - 1:
            l = float(loss)
            losses.append((i, l))
            print(f"  [{name}] step {i:4d}: loss {l:.5f}", flush=True)
            if not np.isfinite(l):
                print(f"  [{name}] FAIL: non-finite loss")
                return False
    dt = time.perf_counter() - t0
    first = losses[0][1]
    # verdict on the best loss over the back half: single-batch adam
    # oscillates, and a spike exactly on the final step shouldn't flip an
    # otherwise-converged run to FAIL
    tail = min(l for i, l in losses if i >= steps // 2)
    # The classification heads end in Tanh (reference quirk, SwinLinear /
    # ViTLinear): logits live in (-1, 1), so per-sample CE bottoms out at
    # softplus(-2) = 0.12693 even at perfect accuracy — that IS converged.
    floor = math.log1p(math.exp(-2.0)) if a.task == "class" else 0.0
    ok = tail <= max(first * target_ratio, floor * 1.05, 1e-3)
    print(f"  [{name}] {'PASS' if ok else 'FAIL'}: {first:.4f} -> {tail:.4f} "
          f"({tail / max(first, 1e-12):.3f}x) in {steps} steps, "
          f"{dt:.0f}s wall", flush=True)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="all")
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--lr", type=float, default=None,
                    help="override the per-workload default (class tasks use "
                         "2e-4 — the Tanh head saturates at 1e-3 and pins "
                         "wrong samples with vanishing grads; dense tasks "
                         "use 1e-3)")
    ap.add_argument("--target", type=float, default=0.05,
                    help="final/initial loss ratio to PASS")
    args = ap.parse_args()

    names = ([n for n in WORKLOADS if not n.startswith("tiny")]
             if args.workload == "all" else [args.workload])
    results = {}
    for name in names:
        print(f"== {name} ==", flush=True)
        lr = args.lr if args.lr is not None else (
            2e-4 if WORKLOADS[name]["task"] == "class" else 1e-3)
        results[name] = run_workload(name, WORKLOADS[name], args.steps,
                                     lr, args.target)
    print("\nsummary:", {k: ("PASS" if v else "FAIL")
                         for k, v in results.items()})
    sys.exit(0 if all(results.values()) else 1)


if __name__ == "__main__":
    main()
