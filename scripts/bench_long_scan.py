"""A/B the long-sequence selective-scan implementations on the real chip.

Compares fwd and fwd+bwd wall time of the blocked Pallas long scan
(ops/selective_scan_long.py) against the chunked XLA associative scan
(ops/selective_scan.py) at the full-sequence ViT-mamba geometries.

Usage: python scripts/bench_long_scan.py [--l 65536] [--d 192] [--n 8] [--b 1]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, iters=10):
    jax_block(fn(*args))        # warmup/compile
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    jax_block(out)
    return (time.perf_counter() - t0) / iters * 1e3


def jax_block(x):
    import jax
    for leaf in jax.tree_util.tree_leaves(x):
        leaf.block_until_ready()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--l", type=int, default=65536)
    ap.add_argument("--d", type=int, default=192)   # ViT-small d_half
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--b", type=int, default=1)
    ap.add_argument("--iters", type=int, default=10)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from long_context_biomedical_imaging_tpu.ops.selective_scan import (
        selective_scan_chunked)
    from long_context_biomedical_imaging_tpu.ops.selective_scan_long import (
        selective_scan_long)

    rs = np.random.RandomState(0)
    u = jnp.asarray(rs.randn(a.b, a.l, a.d).astype(np.float32))
    dt = jnp.asarray(rs.randn(a.b, a.l, a.d).astype(np.float32))
    A = -jnp.exp(jnp.asarray(rs.randn(a.d, a.n).astype(np.float32)))
    B = jnp.asarray(rs.randn(a.b, a.l, a.n).astype(np.float32))
    C = jnp.asarray(rs.randn(a.b, a.l, a.n).astype(np.float32))
    D = jnp.asarray(rs.randn(a.d).astype(np.float32))
    db = jnp.asarray(rs.randn(a.d).astype(np.float32))

    long_f = jax.jit(lambda *x: selective_scan_long(*x, D, db))
    xla_f = jax.jit(lambda u_, d_, A_, B_, C_: selective_scan_chunked(
        u_.transpose(0, 2, 1), d_.transpose(0, 2, 1), A_,
        B_.transpose(0, 2, 1), C_.transpose(0, 2, 1), D,
        delta_bias=db).transpose(0, 2, 1))

    def g(f):
        return jax.jit(jax.grad(
            lambda *x: jnp.sum(jnp.sin(f(*x))), argnums=(0, 1, 2, 3, 4)))

    y1 = long_f(u, dt, A, B, C)
    y2 = xla_f(u, dt, A, B, C)
    err = float(jnp.max(jnp.abs(y1 - y2)))
    print(f"L={a.l} D={a.d} N={a.n} b={a.b}  max|long-xla|={err:.2e}")

    for name, f in (("pallas-long", long_f), ("xla-chunked", xla_f)):
        tf = timeit(f, u, dt, A, B, C, iters=a.iters)
        tg = timeit(g(f), u, dt, A, B, C, iters=max(a.iters // 2, 3))
        print(f"  {name:12s}: fwd {tf:8.2f} ms   fwd+bwd {tg:8.2f} ms")


if __name__ == "__main__":
    main()
