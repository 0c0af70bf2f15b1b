"""Probe the Pallas HBM copy bandwidth that floors every fused kernel.

The r4 kernel-anatomy runs showed the 'copy' variant of both the hyena mixer
(402 MB in+out in 1.83 ms = 220 GB/s) and the MLP (2.25 ms = 179 GB/s) at
~25% of the v5e's 819 GB/s — the single largest unexplained term in the
fused kernels' roofline gap. This sweeps the knobs that could explain it:
block rows, lane width (96 vs 128), dtype conversion, 2D vs 3D blocks,
dimension_semantics=arbitrary vs parallel.

Usage: python scripts/probe_copy_bw.py
"""
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, chain=20):
    out = fn()
    float(out.ravel()[0])

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn()
        float(o.ravel()[0])
        return time.perf_counter() - t0

    t_small = run(3)
    t_large = run(3 + chain)
    return (t_large - t_small) / chain * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = jax.random.PRNGKey(0)
    N = 1048576

    def copy2d(C, bn, convert, dt, semantics=None):
        x = jax.random.normal(rng, (N, C), dt)

        def kernel(x_ref, o_ref):
            xx = x_ref[...]
            if convert:
                xx = xx.astype(jnp.float32)
            o_ref[...] = xx.astype(o_ref.dtype)

        params = None
        if semantics and jax.default_backend() != "cpu":
            params = pltpu.CompilerParams(
                dimension_semantics=(semantics,))
        f = jax.jit(lambda xx: pl.pallas_call(
            kernel,
            grid=(N // bn,),
            in_specs=[pl.BlockSpec((bn, C), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((bn, C), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((N, C), dt),
            compiler_params=params,
        )(xx))
        ms = timeit(lambda: f(x))
        gb = 2 * N * C * x.dtype.itemsize / 1e9
        print(f"  2D C={C:4d} bn={bn:5d} conv={int(convert)} {dt.__name__}"
              f"{' ' + str(semantics) if semantics else '':10s}"
              f" {ms:6.2f} ms  {gb / ms * 1e3:6.0f} GB/s", flush=True)

    def copy3d(V, C, bb, dt):
        BW = N // V
        x = jax.random.normal(rng, (BW, V, C), dt)

        def kernel(x_ref, o_ref):
            o_ref[...] = x_ref[...].astype(jnp.float32).astype(o_ref.dtype)

        f = jax.jit(lambda xx: pl.pallas_call(
            kernel,
            grid=(BW // bb,),
            in_specs=[pl.BlockSpec((bb, V, C), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((bb, V, C), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((BW, V, C), dt),
        )(xx))
        ms = timeit(lambda: f(x))
        gb = 2 * N * C * x.dtype.itemsize / 1e9
        print(f"  3D V={V} C={C:4d} bb={bb:5d} conv=1 {dt.__name__}"
              f" {ms:6.2f} ms  {gb / ms * 1e3:6.0f} GB/s", flush=True)

    import jax.numpy as jnp
    print(f"pallas copy probe at N={N} rows:")
    probes = [
        lambda: copy2d(96, 2048, False, jnp.bfloat16),
        lambda: copy2d(96, 8192, False, jnp.bfloat16),
        lambda: copy2d(128, 2048, True, jnp.bfloat16),
        lambda: copy2d(128, 8192, True, jnp.bfloat16),
        lambda: copy2d(128, 8192, False, jnp.bfloat16),
        lambda: copy2d(96, 8192, True, jnp.float32),
        lambda: copy2d(96, 8192, True, jnp.bfloat16, semantics="arbitrary"),
        lambda: copy2d(96, 8192, True, jnp.bfloat16, semantics="parallel"),
        lambda: copy3d(16, 96, 64, jnp.bfloat16),
        lambda: copy3d(16, 96, 512, jnp.bfloat16),
    ]
    for pr in probes:
        try:
            pr()
        except Exception as e:
            print(f"  FAILED: {str(e)[:100]}", flush=True)

    # XLA baseline: pure HBM copy (x + 0) at the same shape
    x = jax.random.normal(rng, (N, 96), jnp.bfloat16)
    f = jax.jit(lambda xx: xx + jnp.bfloat16(1.0))
    ms = timeit(lambda: f(x))
    gb = 2 * N * 96 * 2 / 1e9
    print(f"  XLA x+1 C=96 bf16          {ms:6.2f} ms  {gb / ms * 1e3:6.0f} GB/s")


if __name__ == "__main__":
    main()


def probe_oob():
    """Does a 128-lane BlockSpec over a 96-lane array ride the contiguous
    DMA path (the physical buffer is already lane-padded to 128)?"""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = jax.random.PRNGKey(0)
    N, C, Cp, bn = 1048576, 96, 128, 8192
    x = jax.random.normal(rng, (N, C), jnp.bfloat16)

    def kernel(x_ref, o_ref):
        xx = x_ref[...]
        col = jax.lax.broadcasted_iota(jnp.int32, xx.shape, 1)
        xx = jnp.where(col < C, xx, jnp.bfloat16(0.0))
        o_ref[...] = xx

    f = jax.jit(lambda xx: pl.pallas_call(
        kernel,
        grid=(N // bn,),
        in_specs=[pl.BlockSpec((bn, Cp), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((bn, Cp), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.bfloat16),
    )(xx))
    try:
        out = f(x)
        ok = bool(jnp.all(out[:4] == x[:4]))
        ms = timeit(lambda: f(x))
        gb = 2 * N * C * 2 / 1e9
        print(f"  OOB 128-lane block over C=96: {ms:6.2f} ms "
              f"{gb / ms * 1e3:6.0f} GB/s (useful bytes; correct={ok})")
    except Exception as e:
        print(f"  OOB probe FAILED: {str(e)[:200]}")

    # 3D variant at the hyena block shape
    V, bb = 16, 512
    BW = N // V
    x3 = jax.random.normal(rng, (BW, V, C), jnp.bfloat16)

    def kernel3(x_ref, o_ref):
        xx = x_ref[...]
        col = jax.lax.broadcasted_iota(jnp.int32, xx.shape, 2)
        o_ref[...] = jnp.where(col < C, xx, jnp.bfloat16(0.0))

    f3 = jax.jit(lambda xx: pl.pallas_call(
        kernel3,
        grid=(BW // bb,),
        in_specs=[pl.BlockSpec((bb, V, Cp), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((bb, V, Cp), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BW, V, C), jnp.bfloat16),
    )(xx))
    try:
        out = f3(x3)
        ok = bool(jnp.all(out[:2] == x3[:2]))
        ms = timeit(lambda: f3(x3))
        gb = 2 * N * C * 2 / 1e9
        print(f"  OOB 3D (bb,16,128) over C=96: {ms:6.2f} ms "
              f"{gb / ms * 1e3:6.0f} GB/s (useful bytes; correct={ok})")
    except Exception as e:
        print(f"  OOB 3D probe FAILED: {str(e)[:200]}")


def probe_widths():
    """Pallas copy GB/s vs lane width: which stage channel counts (Swin-tiny
    C = 96/192/384/768, padded candidates 128/256) ride the fast DMA path?"""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = jax.random.PRNGKey(0)
    TOT = 1048576 * 96   # constant element count across widths

    for C in (96, 128, 192, 256, 288, 384, 768):
        N = TOT // C
        bn = max(512, min(8192, (4 * 1024 * 1024) // (C * 2)))
        bn = 1 << (bn.bit_length() - 1)
        while N % bn:
            bn //= 2
        x = jax.random.normal(rng, (N, C), jnp.bfloat16)

        def kernel(x_ref, o_ref):
            o_ref[...] = x_ref[...]

        f = jax.jit(lambda xx: pl.pallas_call(
            kernel,
            grid=(N // bn,),
            in_specs=[pl.BlockSpec((bn, C), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((bn, C), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((N, C), jnp.bfloat16),
        )(xx))
        try:
            ms = timeit(lambda: f(x))
            gb = 2 * N * C * 2 / 1e9
            print(f"  C={C:4d} bn={bn:5d}: {ms:6.2f} ms {gb/ms*1e3:6.0f} GB/s",
                  flush=True)
        except Exception as e:
            print(f"  C={C:4d} FAILED: {str(e)[:100]}", flush=True)
