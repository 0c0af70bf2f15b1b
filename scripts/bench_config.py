"""Measure train-step time for a workload config on the current backend.

Usage: python scripts/bench_config.py [--mixer hyena|mamba|attention]
       [--h 512] [--w 512] [--t 1] [--b 4] [--window 4] [--patch 2]
       [--task class] [--decoder SwinLinear] [--cin 1] [--cout 2] [--remat]
Delta-method timing (the axon relay breaks block_until_ready; see bench.py).
"""
import argparse, os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mixer", default="attention")
    ap.add_argument("--encoder", default="Swin")
    ap.add_argument("--h", type=int, default=512)
    ap.add_argument("--w", type=int, default=512)
    ap.add_argument("--t", type=int, default=1)
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--window", type=int, default=4)
    ap.add_argument("--patch", type=int, default=2)
    ap.add_argument("--task", default="class")
    ap.add_argument("--decoder", default="SwinLinear")
    ap.add_argument("--cin", type=int, default=1)
    ap.add_argument("--cout", type=int, default=2)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--loss", default=None)
    ap.add_argument("--chain", type=int, default=25)
    a = ap.parse_args()

    import jax, jax.numpy as jnp
    if os.environ.get("LCBI_FORCE_CPU"):
        # sitecustomize pre-registers the axon TPU plugin, so JAX_PLATFORMS
        # env alone is ignored; force through jax.config (see tests/conftest).
        # No persistent cache here: XLA:CPU AOT reloads are keyed to the
        # compiling machine's ISA features and SIGILL across hosts.
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from long_context_biomedical_imaging_tpu.losses import get_loss_func
    from long_context_biomedical_imaging_tpu.models import build_model
    from long_context_biomedical_imaging_tpu.optim import OptimManager
    from long_context_biomedical_imaging_tpu.setup import check_args, parse_config
    from long_context_biomedical_imaging_tpu.trainer import (create_train_state,
                                                             make_train_step)

    argv = [
        f"--encoder_name={a.encoder}", f"--decoder_name={a.decoder}",
        f"--task_type={a.task}", f"--height={a.h}", f"--width={a.w}",
        f"--time={a.t}", f"--no_in_channel={a.cin}", f"--no_out_channel={a.cout}",
        f"--batch_size={a.b}", "--scheduler_type=OneCycleLR", "--use_amp"]
    if a.encoder == "Swin":
        argv += ["--Swin.size=tiny", "--Swin.patch_size", str(a.patch),
                 "--Swin.window_size", str(a.window),
                 f"--Swin.use_hyena={a.mixer=='hyena'}",
                 f"--Swin.use_mamba={a.mixer=='mamba'}"]
        if a.remat:
            argv += ["--Swin.use_checkpoint=True"]
    else:
        argv += ["--ViT.size=small", "--ViT.patch_size", str(a.patch),
                 f"--ViT.use_hyena={a.mixer=='hyena'}",
                 f"--ViT.use_mamba={a.mixer=='mamba'}"]
    if a.remat and a.decoder in ("SwinUNETR", "ViTUNETR"):
        argv += ["--decoder_checkpoint=True"]
    cfg = parse_config(argv=argv)
    check_args(cfg)

    loss_name = a.loss or {"class": "CrossEntropy", "seg": "CrossEntropy",
                           "enhance": "CombinationEnhance"}[a.task]
    model = build_model(cfg)
    x = jnp.zeros((a.b, a.t, a.h, a.w, a.cin), jnp.float32)
    if a.task == "class":
        labels = jnp.zeros((a.b,), jnp.int32)
    elif a.task == "seg":
        labels = jnp.zeros((a.b, a.t, a.h, a.w), jnp.int32)
    else:
        labels = jnp.zeros((a.b, a.t, a.h, a.w, a.cout), jnp.float32)
    init = jax.jit(model.init, static_argnames=("deterministic",))
    variables = init(jax.random.PRNGKey(0), x, deterministic=True)
    optim = OptimManager(cfg, num_train_samples=1000, world=1)
    state = create_train_state(model, variables, optim.transform)
    step = jax.jit(make_train_step(model, get_loss_func(loss_name),
                                   optim.transform, use_amp=True),
                   donate_argnums=(0,))
    compiled = step.lower(state, x, labels, 1e-4, jax.random.PRNGKey(1)).compile()
    try:
        flops = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops = float("nan")
    rng = jax.random.PRNGKey(1)
    state, loss, _ = compiled(state, x, labels, 1e-4, rng)
    print("warmup loss:", float(loss))

    def chain(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, loss, _ = compiled(state, x, labels, 1e-4, rng)
        float(loss)
        return time.perf_counter() - t0

    n1 = max(1, a.chain // 5)
    n2 = max(n1 + 1, a.chain)
    t1 = chain(n1); t2 = chain(n2)
    dt = max((t2 - t1) / (n2 - n1), 1e-9)
    print(f"mixer={a.mixer} {a.h}x{a.w}x{a.t} b{a.b} w{a.window}: "
          f"{dt*1e3:.1f} ms/step, {a.b/dt:.2f} img/s/chip, "
          f"{flops/dt/1e12:.1f} TFLOP/s model-flops")


if __name__ == "__main__":
    main()
