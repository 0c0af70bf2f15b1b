"""Capture a jax.profiler trace of a workload train step and print a per-op
time table (aggregated over XLA Ops on the device timeline).

Usage: python scripts/profile_step.py [--mixer hyena] [--h 1024] ... (same
flags as bench_config.py) [--top 40] [--steps 3] [--keep-trace DIR]

The axon relay exposes the real TPU op timeline ("XLA Ops" thread), so this
gives the trace-backed per-op breakdown VERDICT round-2 item #1 asks for.
"""
import argparse, collections, os, re, shutil, sys, tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_step(a):
    import jax, jax.numpy as jnp
    if not os.environ.get("LCBI_NO_COMPILE_CACHE"):
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
    return compiled, state, x, labels


def classify(name):
    """Map an XLA op name to a coarse bucket."""
    n = name.lower()
    if "custom-call" in n or re.search(r"(hyena|mamba|flash|window_attention|selective|scan_kernel|tpu_custom_call)", n):
        return "pallas-kernel"
    if n.startswith("fusion") or ".fusion" in n:
        return "fusion"
    if "convolution" in n or "conv" in n:
        return "conv"
    if n.startswith("dot") or "dot" in n:
        return "dot"
    if "fft" in n:
        return "fft"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "layout"
    if "reduce" in n:
        return "reduce"
    return "other"


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
    ap.add_argument("--dump-args", dest="dump_args", type=int, default=0)
    ap.add_argument("--cin", type=int, default=1)
    ap.add_argument("--cout", type=int, default=2)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--loss", default=None)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--keep-trace", default=None)
    ap.add_argument("--dump-hlo", default=None,
                    help="dir for --xla_dump_to (disables the persistent "
                         "compile cache so the dump actually happens)")
    a = ap.parse_args()

    if a.dump_hlo:
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            f" --xla_dump_to={a.dump_hlo} --xla_dump_hlo_as_text"
        os.environ["LCBI_NO_COMPILE_CACHE"] = "1"

    import jax
    compiled, state, x, labels = build_step(a)
    rng = jax.random.PRNGKey(1)
    state, loss, _ = compiled(state, x, labels, 1e-4, rng)
    float(loss)

    tmpdir = a.keep_trace or tempfile.mkdtemp(prefix="lcbi_trace_")
    with jax.profiler.trace(tmpdir):
        for _ in range(a.steps):
            state, loss, _ = compiled(state, x, labels, 1e-4, rng)
        float(loss)

    from long_context_biomedical_imaging_tpu.utils.traceio import \
        load_xla_op_events
    events = load_xla_op_events(tmpdir)
    per_op = collections.Counter()
    per_op_bytes = collections.Counter()
    op_args = {}
    per_group = collections.Counter()
    per_group_bytes = collections.Counter()
    per_bucket = collections.Counter()
    calls = collections.Counter()
    gcalls = collections.Counter()
    total = 0.0
    for e in events:
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e["name"]
        group = re.sub(r"[.\d]+$", "", name)
        per_op[name] += dur
        per_op_bytes[name] += int(
            e.get("args", {}).get("bytes_accessed", 0))
        op_args.setdefault(name, e.get("args", {}))
        calls[name] += 1
        per_group[group] += dur
        gcalls[group] += 1
        per_group_bytes[group] += int(
            e.get("args", {}).get("bytes_accessed", 0))
        per_bucket[classify(name)] += dur
        total += dur
    nsteps = a.steps
    print(f"\n=== device XLA-op time over {nsteps} steps: {total:.1f} ms "
          f"({total/nsteps:.1f} ms/step) ===")
    print(f"{'ms/step':>9} {'%':>5} {'calls':>6} {'GB/step':>8} {'GB/s':>7}  op")
    for name, ms in per_op.most_common(a.top):
        gb = per_op_bytes[name] / nsteps / 1e9
        bw = gb / (ms / nsteps / 1e3) if ms else 0.0
        print(f"{ms/nsteps:9.2f} {100*ms/total:5.1f} {calls[name]//nsteps:6d} "
              f"{gb:8.2f} {bw:7.0f}  {name[:100]}")
    if a.dump_args:
        print("\n--- args of top ops ---")
        for name, _ in per_op.most_common(a.dump_args):
            info = {k: v for k, v in op_args[name].items()
                    if k not in ("bytes_accessed",)}
            print(f"  {name}: {str(info)[:600]}")
    print(f"\n--- grouped by op-name prefix ---")
    print(f"{'ms/step':>9} {'%':>5} {'calls':>6} {'GB/step':>8} {'GB/s':>7}  group")
    for g, ms in per_group.most_common(a.top):
        gb = per_group_bytes[g] / nsteps / 1e9
        bw = gb / (ms / nsteps / 1e3) if ms else 0.0
        print(f"{ms/nsteps:9.2f} {100*ms/total:5.1f} {gcalls[g]//nsteps:6d} "
              f"{gb:8.2f} {bw:7.0f}  {g[:100]}")
    print("\n--- buckets ---")
    for bkt, ms in per_bucket.most_common():
        print(f"{ms/nsteps:9.2f} {100*ms/total:5.1f}   {bkt}")
    if not a.keep_trace:
        shutil.rmtree(tmpdir, ignore_errors=True)


if __name__ == "__main__":
    main()
