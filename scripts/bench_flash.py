"""Flash-attention kernel microbenchmark: fwd / bwd TFLOP/s at ViT geometry.

Measures the Pallas flash kernel (ops/flash_attention.py) in isolation at the
reference ViT hot-op shape (ref: model/models/backbone_vit.py:191-203):
hidden 384, 6 heads, d=64, 16k tokens (1024x1024 patch-8). Reports achieved
TFLOP/s for forward alone and forward+backward, against the v5e 197 TFLOP/s
bf16 peak. Delta-method timing (the axon relay breaks block_until_ready).

Usage: python scripts/bench_flash.py [--l 16384] [--bh 12] [--d 64]
       [--bq 512] [--bk 2048] [--dtype bf16] [--chain 30]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--l", type=int, default=16384)
    ap.add_argument("--bh", type=int, default=12)   # batch 2 x 6 heads
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--bq", type=int, default=512)
    ap.add_argument("--bk", type=int, default=2048)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--chain", type=int, default=30)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from long_context_biomedical_imaging_tpu.ops.flash_attention import flash_attention

    dt = jnp.bfloat16 if a.dtype == "bf16" else jnp.float32
    b, h = 1, a.bh
    kq = jax.random.PRNGKey(0)
    q = jax.random.normal(kq, (b, h, a.l, a.d), dt)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, h, a.l, a.d), dt)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, h, a.l, a.d), dt)

    fa = lambda q, k, v: flash_attention(q, k, v, block_q=a.bq, block_k=a.bk)

    fwd = jax.jit(lambda q, k, v: jnp.sum(fa(q, k, v).astype(jnp.float32)))
    g = jax.jit(jax.grad(lambda q, k, v: jnp.sum(fa(q, k, v).astype(jnp.float32)),
                         argnums=(0, 1, 2)))

    def bench(fn, outs_to_scalar):
        fn_out = fn(q, k, v)
        outs_to_scalar(fn_out)  # warmup + materialize

        def chain(n):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = fn(q, k, v)
            outs_to_scalar(o)
            return time.perf_counter() - t0

        n1, n2 = max(2, a.chain // 5), a.chain
        t1, t2 = chain(n1), chain(n2)
        return max((t2 - t1) / (n2 - n1), 1e-9)

    # attention FLOPs: QK^T + PV = 4 * L^2 * d per head-batch
    f_fwd = 4.0 * a.l * a.l * a.d * b * h
    f_bwd = 2.5 * f_fwd  # dq, dk, dv sweeps recompute s/p: 10 * L^2 * d

    t_fwd = bench(fwd, lambda o: float(o))
    t_full = bench(lambda q, k, v: g(q, k, v),
                   lambda o: float(jnp.sum(o[0][0, 0, 0])))

    t_bwd = max(t_full - t_fwd, 1e-9)
    print(f"L={a.l} bh={b*h} d={a.d} blocks=({a.bq},{a.bk}) {a.dtype}")
    print(f"fwd     : {t_fwd*1e3:8.2f} ms  {f_fwd/t_fwd/1e12:6.1f} TFLOP/s"
          f"  ({f_fwd/t_fwd/197e12*100:4.1f}% of v5e peak)")
    print(f"fwd+bwd : {t_full*1e3:8.2f} ms  {(f_fwd+f_bwd)/t_full/1e12:6.1f} TFLOP/s"
          f"  ({(f_fwd+f_bwd)/t_full/197e12*100:4.1f}% of v5e peak)")
    print(f"bwd est : {t_bwd*1e3:8.2f} ms  {f_bwd/t_bwd/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
