"""Sweep grid-block sizes for the fused Pallas kernels at workload stage
shapes (delta-method timing; runs on the real chip).

Usage: python scripts/bench_fused_blocks.py --op mlp|hyena|mamba
       [--bw 65536] [--v 16] [--c 96] [--blocks 256,512,1024,...]
"""
import argparse, os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, chain=20):
    import jax
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready() if hasattr(
        jax.tree.leaves(out)[0], "block_until_ready") else None
    float(jax.tree.leaves(out)[0].ravel()[0])

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jax.tree.leaves(out)[0].ravel()[0])
        return time.perf_counter() - t0

    t_small = run(3)
    t_large = run(3 + chain)
    return (t_large - t_small) / chain * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", default="mlp")
    ap.add_argument("--bw", type=int, default=65536)
    ap.add_argument("--v", type=int, default=16)
    ap.add_argument("--c", type=int, default=96)
    ap.add_argument("--blocks", default="")
    a = ap.parse_args()

    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = jax.random.PRNGKey(0)
    blocks = [int(b) for b in a.blocks.split(",") if b] or [0]

    if a.op == "mlp":
        from long_context_biomedical_imaging_tpu.ops import fused_mlp as M
        N, C, H = a.bw * a.v, a.c, 4 * a.c
        x = jax.random.normal(rng, (N, C), jnp.bfloat16)
        g = jnp.ones((C,), jnp.float32); b0 = jnp.zeros((C,), jnp.float32)
        w1 = jax.random.normal(rng, (C, H), jnp.bfloat16) * 0.05
        b1 = jnp.zeros((H,), jnp.float32)
        w2 = jax.random.normal(rng, (H, C), jnp.bfloat16) * 0.05
        b2 = jnp.zeros((C,), jnp.float32)

        def loss(x, g, b0, w1, b1, w2, b2):
            return jnp.sum(M.fused_ln_mlp_residual(
                x, g, b0, w1, b1, w2, b2).astype(jnp.float32) ** 2)

        fwd = jax.jit(lambda *t: M.fused_ln_mlp_residual(*t))
        vjp = jax.jit(jax.grad(loss, argnums=(0, 3, 5)))
        for bn in blocks:
            if bn:
                os.environ["LCBI_MLP_BN"] = str(bn)
                os.environ["LCBI_MLP_BN_BWD"] = str(bn)
            fwd_t = timeit(lambda: fwd(x, g, b0, w1, b1, w2, b2))
            bwd_t = timeit(lambda: vjp(x, g, b0, w1, b1, w2, b2))
            jax.clear_caches()
            print(f"bn={bn or 'auto'}: fwd {fwd_t:.2f} ms  fwd+bwd {bwd_t:.2f} ms",
                  flush=True)

    elif a.op == "hyena":
        from long_context_biomedical_imaging_tpu.ops import hyena_window as Hy
        BW, V, C = a.bw, a.v, a.c
        x = jax.random.normal(rng, (BW, V, C), jnp.bfloat16)
        win = jax.random.normal(rng, (C, 3 * C), jnp.bfloat16) * 0.05
        bin_ = jnp.zeros((3 * C,), jnp.float32)
        ws = jax.random.normal(rng, (3 * C, 5), jnp.float32) * 0.1
        bs = jnp.zeros((3 * C,), jnp.float32)
        kl = jax.random.normal(rng, (C, V), jnp.float32) * 0.1
        bl = jnp.zeros((C,), jnp.float32)
        wo = jax.random.normal(rng, (C, C), jnp.bfloat16) * 0.05
        bo = jnp.zeros((C,), jnp.float32)
        args = (x, win, bin_, ws, bs, kl, bl, wo, bo)

        def loss(*t):
            return jnp.sum(Hy.hyena_window_mixer(*t).astype(jnp.float32) ** 2)

        fwd = jax.jit(lambda *t: Hy.hyena_window_mixer(*t))
        vjp = jax.jit(jax.grad(loss, argnums=(0, 1, 5)))
        for bb in blocks:
            if bb:
                os.environ["LCBI_HYENA_BB"] = str(bb)
                os.environ["LCBI_HYENA_BB_BWD"] = str(bb)
            fwd_t = timeit(lambda: fwd(*args))
            bwd_t = timeit(lambda: vjp(*args))
            jax.clear_caches()
            print(f"bb={bb or 'auto'}: fwd {fwd_t:.2f} ms  fwd+bwd {bwd_t:.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
