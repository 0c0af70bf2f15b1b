"""Attribute time inside the fused Pallas kernels: benchmark forward-kernel
variants with individual stages disabled (at the ptx stage-0 shape by
default). The deltas tell us which in-kernel op holds the kernel off its
roofline (the grid/block sweep already ruled out grid overhead).

Usage: python scripts/bench_kernel_anatomy.py --op hyena|hyena-bwd|mamba|mlp|flash|vpu
       [--bw 65536] [--v 16] [--c 96] [--bb 0]

--op hyena-bwd defaults to the emb stage-0 shape (4096x512x96, lane-padded to
128): the V=512 chunked Toeplitz backward is the largest measured kernel cost
in any flagship (57.3 ms/call, 2 calls = 114.6 ms of emb's 365 ms r4 step).
"""
import argparse
import functools
import os
import sys
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", default="hyena")
    ap.add_argument("--bw", type=int, default=65536)
    ap.add_argument("--v", type=int, default=16)
    ap.add_argument("--c", type=int, default=96)
    ap.add_argument("--bb", type=int, default=0)
    ap.add_argument("--only", default="",
                    help="comma-separated variant filter (any --op)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (interpret-mode smoke test; "
                         "JAX_PLATFORMS alone is overridden by this "
                         "environment's sitecustomize TPU plugin)")
    a = ap.parse_args()

    def _sel(variants):
        if not a.only:
            return variants
        keep = set(a.only.split(","))
        return tuple(v for v in variants if v in keep)

    import jax

    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not a.cpu:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rng = jax.random.PRNGKey(0)

    if a.op == "hyena":
        from long_context_biomedical_imaging_tpu.ops import hyena_window as Hy
        BW, V, C = a.bw, a.v, a.c
        bb = a.bb or Hy._pick_bb(V, C, bwd=False)
        K = 5
        x = jax.random.normal(rng, (BW, V, C), jnp.bfloat16)
        win = jax.random.normal(rng, (C, 3 * C), jnp.bfloat16) * 0.05
        bin_ = jnp.zeros((1, 3 * C), jnp.float32)
        ws = jax.random.normal(rng, (K, 3 * C), jnp.float32) * 0.1
        bs = jnp.zeros((1, 3 * C), jnp.float32)
        kl = jax.random.normal(rng, (V, C), jnp.float32) * 0.1
        wo = jax.random.normal(rng, (C, C), jnp.bfloat16) * 0.05
        bo = jnp.zeros((1, C), jnp.float32)
        dt = jnp.bfloat16

        # block-banded matmul form of the long conv: Wl[t*C+c, u*C+c] =
        # kl[u-t, c] for u >= t; vl.2d = g.2d @ Wl rides the (idle) MXU.
        import numpy as np
        Wl_np = np.zeros((V * C, V * C), np.float32)
        kl_np = np.asarray(kl)
        for t_ in range(V):
            for u_ in range(t_, V):
                Wl_np[t_ * C:(t_ + 1) * C, u_ * C:(u_ + 1) * C] = \
                    np.diag(kl_np[u_ - t_])
        Wl = jnp.asarray(Wl_np, jnp.bfloat16)

        W4 = jnp.asarray(Wl_np.reshape(V, C, V * C), jnp.bfloat16)

        # 128-lane-padded banded weight: Cp=128 channels per token row
        Cp = 128
        Wp_np = np.zeros((V * Cp, V * Cp), np.float32)
        for t_ in range(V):
            for u_ in range(t_, V):
                Wp_np[t_ * Cp:t_ * Cp + C, u_ * Cp:u_ * Cp + C] =                     np.diag(kl_np[u_ - t_])
        Wp = jnp.asarray(Wp_np, jnp.bfloat16)

        def conv_roll(xv, taps):
            # rolled[u] = xv[u-m (mod V)]; rows u < m carry wrapped values ->
            # mask them with an iota-vs-m select before the MAC
            row = jax.lax.broadcasted_iota(jnp.int32, (1, V, 1), 1)
            y = xv * taps[0][None, None, :]
            for m in range(1, taps.shape[0]):
                rolled = pltpu.roll(xv, m, 1)
                rolled = jnp.where(row >= m, rolled, 0.0)
                y = y + rolled * taps[m][None, None, :]
            return y

        def conv_roll2d(xv, taps):
            # operate on the (nb*V, C) 2D form: sublane roll mixes across
            # window boundaries, so mask rows with (row_in_window < m)
            nb = xv.shape[0]
            x2 = xv.reshape(nb * V, C)
            row = jax.lax.broadcasted_iota(jnp.int32, (nb * V, 1), 0) % V
            y2 = x2 * taps[0][None, :]
            for m in range(1, taps.shape[0]):
                rolled = pltpu.roll(x2, m, 0)
                rolled = jnp.where(row >= m, rolled, 0.0)
                y2 = y2 + rolled * taps[m][None, :]
            return y2.reshape(nb, V, C)

        def conv_pad(xv, taps):
            y = xv * taps[0][None, None, :]
            for m in range(1, taps.shape[0]):
                sh = jnp.pad(xv, ((0, 0), (m, 0), (0, 0)))[:, :V, :]
                y = y + sh * taps[m][None, None, :]
            return y

        def conv_aligned(pad_ref, xv, taps):
            # m = 8a + r: one aligned shift-by-8 read, then 7 unaligned
            # shifts of the two-term combination
            pad_ref[:, :V, :] = jnp.zeros_like(xv)
            pad_ref[:, V:, :] = xv
            x8 = pad_ref[:, V - 8:2 * V - 8, :]
            y = xv * taps[0][None, None, :] + x8 * taps[8][None, None, :]
            for r in range(1, 8):
                u = (xv * taps[r][None, None, :]
                     + x8 * taps[8 + r][None, None, :])
                pad_ref[:, V:, :] = u
                y = y + pad_ref[:, V - r:2 * V - r, :]
            return y

        # per-tap causal tap matrices: tm[m, t, c] = (t >= m) * kl[m, c]
        tm_np = np.zeros((V, V, C), np.float32)
        for m_ in range(V):
            tm_np[m_, m_:, :] = kl_np[m_][None, :]
        tm = jnp.asarray(tm_np)

        def make(variant):
            def kernel(x_ref, win_ref, bin_ref, ws_ref, bs_ref, kl_ref,
                       wl_ref, wp_ref, tm_ref, wo_ref, bo_ref, o_ref,
                       zpad_scr, gpad_scr):
                nb = x_ref.shape[0]
                xx = x_ref[...].astype(jnp.float32)
                if variant == "copy":
                    o_ref[...] = xx[..., :C].astype(o_ref.dtype)
                    return
                z = Hy._dot(xx.reshape(nb * V, C), win_ref[...], dt)
                z = (z + bin_ref[0][None, :]).reshape(nb, V, 3 * C)
                if variant == "inproj":
                    o_ref[...] = z[..., :C].astype(o_ref.dtype)
                    return
                zc = Hy._causal_mac(zpad_scr, z, ws_ref[...], V)
                zc = zc + bs_ref[0][None, None, :]
                x1 = zc[:, :, :C]
                x2 = zc[:, :, C:2 * C]
                v = zc[:, :, 2 * C:]
                g = v * x1
                if variant == "full":
                    vl = Hy._causal_mac(gpad_scr, g, kl_ref[...], V)
                elif variant == "long-aligned":
                    vl = conv_aligned(gpad_scr, g, kl_ref[...])
                elif variant == "long-pad":
                    vl = conv_pad(g, kl_ref[...])
                elif variant == "long-roll":
                    vl = conv_roll(g, kl_ref[...])
                elif variant == "long-roll2d":
                    vl = conv_roll2d(g, kl_ref[...])
                elif variant == "long-matmul128":
                    gp = jnp.pad(g, ((0, 0), (0, 0), (0, Cp - C)))
                    g2 = gp.reshape(nb, V * Cp)
                    vl2 = Hy._dot(g2, wp_ref[...], dt)
                    vl = vl2.reshape(nb, V, Cp)[:, :, :C]
                elif variant == "long-tapmat":
                    # roll + tap-MATRIX mul: the causal mask is baked into a
                    # per-tap (V, C) matrix tm[m, t, c] = (t >= m) * kl[m, c]
                    # so each tap is roll + mul + add (no iota/select)
                    tm = tm_ref[...]
                    vl = g * tm[0][None, :, :]
                    for m in range(1, V):
                        rolled = pltpu.roll(g, m, 1)
                        vl = vl + rolled * tm[m][None, :, :]
                elif variant == "long-rollonly":
                    # isolates the roll cost: no masks, no tap muls
                    vl = g
                    for m in range(1, V):
                        vl = vl + pltpu.roll(g, m, 1)
                elif variant == "long-shift-tapmat":
                    # padded-scratch shifted reads + tap-matrix mul (is the
                    # where() or the unaligned read the expensive part?)
                    tm = tm_ref[...]
                    gpad_scr[:, :V, :] = jnp.zeros_like(g)
                    gpad_scr[:, V:, :] = g
                    vl = g * tm[0][None, :, :]
                    for m in range(1, V):
                        vl = vl + gpad_scr[:, V - m:2 * V - m, :] \
                            * tm[m][None, :, :]
                elif variant == "long-bf16":
                    # bf16 taps/data/accum: a V=16 window is ONE bf16
                    # (16,128) tile, so shifted reads stay intra-tile
                    gb = g.astype(jnp.bfloat16)
                    tapsb = kl_ref[...].astype(jnp.bfloat16)
                    y = gb * tapsb[0][None, None, :]
                    for m in range(1, V):
                        sh = jnp.pad(gb, ((0, 0), (m, 0), (0, 0)))[:, :V, :]
                        y = y + sh * tapsb[m][None, None, :]
                    vl = y.astype(jnp.float32)
                elif variant == "long-bf16-roll2d":
                    gb = g.astype(jnp.bfloat16)
                    tapsb = kl_ref[...].astype(jnp.bfloat16)
                    nb2 = gb.shape[0]
                    g2 = gb.reshape(nb2 * V, C)
                    row = jax.lax.broadcasted_iota(jnp.int32, (nb2 * V, 1), 0) % V
                    y2 = g2 * tapsb[0][None, :]
                    for m in range(1, V):
                        rolled = pltpu.roll(g2, m, 0)
                        rolled = jnp.where(row >= m, rolled,
                                           jnp.bfloat16(0.0))
                        y2 = y2 + rolled * tapsb[m][None, :]
                    vl = y2.reshape(nb2, V, C).astype(jnp.float32)
                elif variant == "long-noshift-bf16":
                    gb = g.astype(jnp.bfloat16)
                    tapsb = kl_ref[...].astype(jnp.bfloat16)
                    y = gb * tapsb[0][None, None, :]
                    for m in range(1, V):
                        y = y + gb * tapsb[m][None, None, :]
                    vl = y.astype(jnp.float32)
                elif variant == "long-noshift":
                    taps = kl_ref[...]
                    vl = g * taps[0][None, None, :]
                    for m in range(1, V):
                        vl = vl + g * taps[m][None, None, :]
                elif variant == "long-noshift2d":
                    taps = kl_ref[...]
                    g2 = g.reshape(nb * V, C)
                    vl2 = g2 * taps[0][None, :]
                    for m in range(1, V):
                        vl2 = vl2 + g2 * taps[m][None, :]
                    vl = vl2.reshape(nb, V, C)
                elif variant == "long-dge":
                    vl = jax.lax.dot_general(
                        g.astype(dt), wl_ref[...].reshape(V, C, V * C),
                        (((1, 2), (0, 1)), ((), ())),
                        preferred_element_type=jnp.float32)
                    vl = vl.reshape(nb, V, C)
                else:                       # nolong
                    vl = g
                v2 = vl * x2
                out = Hy._dot(v2.reshape(nb * V, C), wo_ref[...], dt) \
                    + bo_ref[0][None, :]
                o_ref[...] = out.reshape(nb, V, C).astype(o_ref.dtype)

            return kernel

        def build(variant):
            return jax.jit(lambda xx: pl.pallas_call(
                make(variant),
                grid=(BW // bb,),
                in_specs=[pl.BlockSpec((bb, V, C), lambda i: (i, 0, 0))]
                + Hy._weight_specs(C, K, V)
                + [pl.BlockSpec((V * C, V * C), lambda i: (0, 0)),
                   pl.BlockSpec((V * 128, V * 128), lambda i: (0, 0)),
                   pl.BlockSpec((V, V, C), lambda i: (0, 0, 0)),
                   pl.BlockSpec((C, C), lambda i: (0, 0)),
                   pl.BlockSpec((1, C), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((bb, V, C), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((BW, V, C), xx.dtype),
                scratch_shapes=[
                    pltpu.VMEM((bb, 2 * V, 3 * C), jnp.float32),
                    pltpu.VMEM((bb, 2 * V, C), jnp.float32),
                ],
                compiler_params=Hy._compiler_params(),
            )(xx, win, bin_, ws, bs, kl, Wl, Wp, tm, wo, bo))

        print(f"hyena fwd anatomy at ({BW},{V},{C}), bb={bb}:")
        for variant in _sel(("copy", "inproj", "nolong", "long-noshift",
                        "long-rollonly", "long-tapmat", "long-shift-tapmat",
                        "long-bf16", "long-dge", "long-matmul128",
                        "full")):
            try:
                f = build(variant)
                ms = timeit(lambda: f(x))
                print(f"  {variant:14s} {ms:7.2f} ms", flush=True)
            except Exception as e:
                print(f"  {variant:14s} FAILED: {str(e)[:120]}", flush=True)

        # numeric check: matmul conv vs tap conv
        try:
            da = np.asarray(build("full")(x), np.float32)
            dm = np.asarray(build("long-matmul128")(x), np.float32)
            print(f"  matmul-vs-taps max abs diff: {np.abs(da - dm).max():.4f} "
                  f"(scale {np.abs(da).max():.1f})")
        except Exception as e:
            print(f"  check FAILED: {str(e)[:120]}")

    elif a.op == "hyena-bwd":
        # Stage-knockout anatomy of the chunked (V>64) hyena BACKWARD kernel
        # (ops/hyena_window.py:_make_bwd_kernel_chunked) at the emb stage-0
        # shape. Each variant keeps the same scratch set (same VMEM pressure,
        # same bb) and knocks out one stage; deltas attribute the 57.3 ms.
        from long_context_biomedical_imaging_tpu.ops import hyena_window as Hy
        BW = a.bw if a.bw != 65536 else 4096
        V = a.v if a.v != 16 else 512
        C = a.c
        cp = 128 if C <= 128 else 256           # stage pipeline lane pad
        K = 5
        chunk = Hy._pick_chunk(V)
        n = V // chunk
        bb = a.bb or Hy._pick_bb_chunked(V, cp, bwd=True, chunk=chunk, bw=BW,
                                         C=C)
        dt = jnp.bfloat16

        x = jax.random.normal(rng, (BW, V, cp), dt) * \
            (jnp.arange(cp) < C).astype(dt)
        do = jax.random.normal(jax.random.PRNGKey(9), (BW, V, cp), dt) * \
            (jnp.arange(cp) < C).astype(dt)
        win = (jax.random.normal(rng, (cp, 3 * C), dt) * 0.05) * \
            (jnp.arange(cp) < C).astype(dt)[:, None]
        bin_ = jnp.zeros((1, 3 * C), jnp.float32)
        ws = jax.random.normal(rng, (K, 3 * C), jnp.float32) * 0.1
        bs = jnp.zeros((1, 3 * C), jnp.float32)
        kl = jax.random.normal(rng, (V, C), jnp.float32) * 0.05
        m = Hy._build_chunk_toeplitz(kl, chunk).astype(dt)
        # lag-stacked transpose for the wide dgT matmul:
        # mt[c, d*chunk + r, j] = m[d][c, j, r]
        mt = jnp.moveaxis(m, 0, 1).swapaxes(-1, -2).reshape(C, n * chunk,
                                                            chunk)
        wo = jax.random.normal(rng, (C, cp), dt) * 0.05
        bo = jnp.zeros((1, cp), jnp.float32)

        # r5 attack variants (VERDICT r4 #1): the per-lag dM matmuls contract
        # over only (n-d)*bb <= 32 rows (<=25% of the 128-deep MXU) and the
        # per-lag dgT matmuls have <=(n-d)*bb-row outputs.
        #   wide-dgt : ONE (C,n*bb,n*chunk)@(C,n*chunk,chunk) matmul (K=512)
        #   wide-dm  : ONE gT^T@(wide dvlT) matmul (amortizes fill/drain)
        #   wide-both: both restructures (the wide scratch is shared)
        #   stream-dm: no in-kernel dM at all — gT/dvlT stream to HBM bf16,
        #              dM is a full-depth (K=BW*(n-d)) XLA contraction outside
        WIDE = ("wide-dm", "wide-dgt", "wide-both")

        def make(variant):
            stream = variant.startswith("stream")

            def kernel(x_ref, win_ref, bin_ref, ws_ref, bs_ref, m_ref,
                       mt_ref, wo_ref, do_ref, dx_ref, dwin_ref, dbin_ref,
                       dws_ref, dbs_ref, *rest):
                if stream:
                    (gs_ref, ds_ref, dwo_ref, dbo_ref, zpad_scr, gT_scr,
                     vlT_scr, dvlT_scr, dgT_scr, tok_scr, wide_scr) = rest
                    dm_ref = None
                else:
                    (dm_ref, dwo_ref, dbo_ref, zpad_scr, gT_scr, vlT_scr,
                     dvlT_scr, dgT_scr, tok_scr, wide_scr) = rest
                i = pl.program_id(0)

                @pl.when(i == 0)
                def _init():
                    dwin_ref[...] = jnp.zeros_like(dwin_ref)
                    dbin_ref[...] = jnp.zeros_like(dbin_ref)
                    dws_ref[...] = jnp.zeros_like(dws_ref)
                    dbs_ref[...] = jnp.zeros_like(dbs_ref)
                    if dm_ref is not None:
                        dm_ref[...] = jnp.zeros_like(dm_ref)
                    dwo_ref[...] = jnp.zeros_like(dwo_ref)
                    dbo_ref[...] = jnp.zeros_like(dbo_ref)

                nb = x_ref.shape[0]
                x32 = x_ref[...].astype(jnp.float32)
                do32 = do_ref[...].astype(jnp.float32)
                if variant == "copy":
                    dx_ref[...] = (x32 + do32).astype(dx_ref.dtype)
                    return
                # ---- forward recompute ----
                z = Hy._dot(x32.reshape(nb * V, cp), win_ref[...], dt)
                z = z.reshape(nb, V, 3 * C) + bin_ref[0][None, None, :]
                if variant == "re-inproj":
                    dx_ref[...] = (z[..., :cp] + do32).astype(dx_ref.dtype)
                    return
                zc = Hy._causal_mac(zpad_scr, z, ws_ref[...], V) \
                    + bs_ref[0][None, None, :]
                x1 = zc[:, :, :C]
                x2 = zc[:, :, C:2 * C]
                v = zc[:, :, 2 * C:]
                g = v * x1
                if variant == "re-short":
                    o = jnp.concatenate([g, x32[:, :, C:]], -1)
                    dx_ref[...] = (o + do32).astype(dx_ref.dtype)
                    return
                if variant == "re-conv-nomm":   # transposes, no MXU conv
                    Hy._transpose_chunks_in(g, gT_scr, nb, chunk, n, C)
                    vlT_scr[...] = gT_scr[...]
                else:
                    Hy._chunk_long_conv(g, m_ref, gT_scr, vlT_scr, nb, C,
                                        chunk, n, dt)
                for q in range(n):
                    tok_scr[:, q * chunk:(q + 1) * chunk, :] = \
                        Hy._transpose_chunk_out(vlT_scr, q, nb, chunk, C)
                vl = tok_scr[...]
                if variant in ("re-conv", "re-conv-nomm"):
                    o = jnp.concatenate([vl, x32[:, :, C:]], -1)
                    dx_ref[...] = (o + do32).astype(dx_ref.dtype)
                    return
                v2 = vl * x2
                # ---- backward chain ----
                do2d = do32.reshape(nb * V, cp)
                dwo_ref[...] += Hy._dot_tt(v2.reshape(nb * V, C), do2d, dt)
                dbo_ref[...] += jnp.sum(do2d, axis=0, keepdims=True)
                dv2 = Hy._dot_t(do2d, wo_ref[...], dt).reshape(nb, V, C)
                if variant == "bw-outproj":
                    o = jnp.concatenate([dv2, x32[:, :, C:]], -1)
                    dx_ref[...] = o.astype(dx_ref.dtype)
                    return
                dvl = dv2 * x2
                dx2 = dv2 * vl
                if variant == "bw-noconvbwd":
                    dg = dvl
                else:
                    Hy._transpose_chunks_in(dvl, dvlT_scr, nb, chunk, n, C)
                    if variant in WIDE:
                        # wide[c, row, d*chunk+r] = dvlT[c, row + d*nb, r]
                        # (zero where the causal band ends)
                        wide_scr[...] = jnp.zeros_like(wide_scr)
                        for d in range(n):
                            rows = (n - d) * nb
                            wide_scr[:, :rows, d * chunk:(d + 1) * chunk] = \
                                dvlT_scr[:, d * nb:, :]
                    if stream:
                        gs_ref[0] = gT_scr[...].astype(jnp.bfloat16)
                        ds_ref[0] = dvlT_scr[...].astype(jnp.bfloat16)
                    # ---- dM ----
                    if variant in ("wide-dm", "wide-both"):
                        dmw = jax.lax.dot_general(
                            gT_scr[...].astype(dt), wide_scr[...].astype(dt),
                            (((1,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
                        for d in range(n):
                            dm_ref[d] += dmw[:, :, d * chunk:(d + 1) * chunk]
                    elif variant != "bw-nodm" and not stream:
                        for d in range(n):
                            rows = (n - d) * nb
                            dm_ref[d] += jax.lax.dot_general(
                                gT_scr[:, :rows, :].astype(dt),
                                dvlT_scr[:, d * nb:, :].astype(dt),
                                (((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
                    # ---- dgT ----
                    if variant in ("wide-dgt", "wide-both"):
                        dgT_scr[...] = jax.lax.dot_general(
                            wide_scr[...].astype(dt), mt_ref[...].astype(dt),
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
                    elif variant == "bw-nodgt":
                        dgT_scr[...] = jnp.zeros_like(dgT_scr)
                    else:
                        dgT_scr[...] = jnp.zeros_like(dgT_scr)
                        for d in range(n):
                            rows = (n - d) * nb
                            dgT_scr[:, :rows, :] += jax.lax.dot_general(
                                dvlT_scr[:, d * nb:, :].astype(dt),
                                m_ref[d].astype(dt),
                                (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
                    for q in range(n):
                        tok_scr[:, q * chunk:(q + 1) * chunk, :] = \
                            Hy._transpose_chunk_out(dgT_scr, q, nb, chunk, C)
                    dg = tok_scr[...]
                dv = dg * x1
                dx1 = dg * v
                dzc = jnp.concatenate([dx1, dx2, dv], axis=-1)
                dbs_ref[...] += jnp.sum(dzc, axis=(0, 1))[None, :]
                if variant != "bw-notapgrads":
                    dws_ref[...] += Hy._tap_grads(zpad_scr, dzc, z, K, V)
                dz = Hy._causal_mac_t(zpad_scr, dzc, ws_ref[...], V)
                dz2d = dz.reshape(nb * V, 3 * C)
                dbin_ref[...] += jnp.sum(dz2d, axis=0, keepdims=True)
                if variant != "bw-noinw":
                    dwin_ref[...] += Hy._dot_tt(x32.reshape(nb * V, cp),
                                                dz2d, dt)
                dy = Hy._dot_t(dz2d, win_ref[...], dt).reshape(nb, V, cp)
                dx_ref[...] = dy.astype(dx_ref.dtype)

            return kernel

        def build(variant, want="dx", use_bb=None):
            # want: "dx" -> dx only; "mid" -> (dx, dm) or (dx, gs, ds)
            vb = use_bb or bb
            stream = variant.startswith("stream")
            mid_specs = ([pl.BlockSpec((1, C, n * vb, chunk),
                                       lambda i: (i, 0, 0, 0))] * 2
                         if stream else
                         [pl.BlockSpec((n, C, chunk, chunk),
                                       lambda i: (0, 0, 0, 0))])
            mid_shapes = ([jax.ShapeDtypeStruct(
                (BW // vb, C, n * vb, chunk), jnp.bfloat16)] * 2
                if stream else
                [jax.ShapeDtypeStruct((n, C, chunk, chunk), jnp.float32)])
            wide_shape = ((C, n * vb, n * chunk) if variant in WIDE
                          else (1, 8, 128))
            fn0 = (lambda xx, dd: pl.pallas_call(
                make(variant),
                grid=(BW // vb,),
                in_specs=[pl.BlockSpec((vb, V, cp), lambda i: (i, 0, 0))]
                + Hy._chunked_weight_specs(C, K, n, chunk, cp)
                + [pl.BlockSpec((C, n * chunk, chunk), lambda i: (0, 0, 0)),
                   pl.BlockSpec((C, cp), lambda i: (0, 0)),
                   pl.BlockSpec((vb, V, cp), lambda i: (i, 0, 0))],
                out_specs=[pl.BlockSpec((vb, V, cp), lambda i: (i, 0, 0)),
                           pl.BlockSpec((cp, 3 * C), lambda i: (0, 0)),
                           pl.BlockSpec((1, 3 * C), lambda i: (0, 0)),
                           pl.BlockSpec((K, 3 * C), lambda i: (0, 0)),
                           pl.BlockSpec((1, 3 * C), lambda i: (0, 0))]
                + mid_specs
                + [pl.BlockSpec((C, cp), lambda i: (0, 0)),
                   pl.BlockSpec((1, cp), lambda i: (0, 0))],
                out_shape=[jax.ShapeDtypeStruct((BW, V, cp), xx.dtype),
                           jax.ShapeDtypeStruct((cp, 3 * C), jnp.float32),
                           jax.ShapeDtypeStruct((1, 3 * C), jnp.float32),
                           jax.ShapeDtypeStruct((K, 3 * C), jnp.float32),
                           jax.ShapeDtypeStruct((1, 3 * C), jnp.float32)]
                + mid_shapes
                + [jax.ShapeDtypeStruct((C, cp), jnp.float32),
                   jax.ShapeDtypeStruct((1, cp), jnp.float32)],
                scratch_shapes=[
                    pltpu.VMEM((vb, 2 * V, 3 * C), jnp.float32),
                    pltpu.VMEM((C, n * vb, chunk), jnp.float32),
                    pltpu.VMEM((C, n * vb, chunk), jnp.float32),
                    pltpu.VMEM((C, n * vb, chunk), jnp.float32),
                    pltpu.VMEM((C, n * vb, chunk), jnp.float32),
                    pltpu.VMEM((vb, V, C), jnp.float32),
                    pltpu.VMEM(wide_shape, jnp.float32),
                ],
                interpret=Hy._interpret(),
                compiler_params=Hy._compiler_params(),
            )(xx, win, bin_, ws, bs, m, mt, wo, dd))
            if want == "dx":
                return jax.jit(lambda xx, dd: fn0(xx, dd)[0])
            if stream:
                return jax.jit(lambda xx, dd: tuple(
                    fn0(xx, dd)[i] for i in (0, 5, 6)))
            return jax.jit(lambda xx, dd: tuple(
                fn0(xx, dd)[i] for i in (0, 5)))

        def dm_outside(gs, ds, vb):
            # full-depth dM: contraction over (grid, rows) = BW*(n-d) rows
            outs = []
            for d in range(n):
                rows = (n - d) * vb
                outs.append(jax.lax.dot_general(
                    gs[:, :, :rows, :], ds[:, :, d * vb:, :],
                    (((0, 2), (0, 2)), ((1,), (1,))),
                    preferred_element_type=jnp.float32))
            return jnp.stack(outs)

        print(f"hyena chunked-bwd anatomy at ({BW},{V},{C}) cp={cp} "
              f"chunk={chunk} n={n} bb={bb}:")
        for variant in _sel(("copy", "re-inproj", "re-short", "re-conv-nomm",
                             "re-conv", "bw-outproj", "bw-noconvbwd",
                             "bw-nodm", "bw-nodgt", "bw-notapgrads",
                             "bw-noinw", "full", "wide-dgt", "wide-dm",
                             "wide-both", "stream-dm")):
            try:
                f = build(variant)
                ms = timeit(lambda: f(x, do))
                print(f"  {variant:14s} {ms:7.2f} ms", flush=True)
            except Exception as e:
                print(f"  {variant:14s} FAILED: {str(e)[:140]}", flush=True)

        import numpy as np
        if not a.only or "stream-dm" in a.only:
            # the out-of-kernel einsum leg of stream-dm + bb sweep (dm_ref
            # freed -> bigger blocks may fit)
            for vb in sorted({bb, bb * 2, bb * 4}):
                try:
                    f3 = build("stream-dm", want="mid", use_bb=vb)
                    ein = jax.jit(functools.partial(dm_outside, vb=vb))
                    _, gs0, ds0 = f3(x, do)
                    ms_k = timeit(lambda: f3(x, do)[0])
                    ms_e = timeit(lambda: ein(gs0, ds0))
                    ms_t = timeit(lambda: ein(*f3(x, do)[1:]))
                    print(f"  stream-dm bb={vb}: kernel {ms_k:6.2f} "
                          f"einsum {ms_e:5.2f} total {ms_t:6.2f} ms",
                          flush=True)
                except Exception as e:
                    print(f"  stream-dm bb={vb} FAILED: {str(e)[:140]}",
                          flush=True)

        if not a.only:
            # numeric check: wide/stream dM against the shipped form
            dm_full = np.asarray(build("full", want="mid")(x, do)[1],
                                 np.float32)
            dm_v = np.asarray(build("wide-both", want="mid")(x, do)[1],
                              np.float32)
            err = np.abs(dm_v - dm_full).max()
            print(f"  wide-both dM max|diff| {err:.4f} "
                  f"(scale {np.abs(dm_full).max():.1f})")
            _, gs0, ds0 = build("stream-dm", want="mid")(x, do)
            dm_s = np.asarray(jax.jit(functools.partial(dm_outside, vb=bb))(
                gs0, ds0), np.float32)
            err = np.abs(dm_s - dm_full).max()
            print(f"  stream-dm dM max|diff| {err:.4f} "
                  f"(scale {np.abs(dm_full).max():.1f})")

    elif a.op == "mamba":
        # Stage-knockout anatomy of the fused MambaVision window mixer
        # BACKWARD (ops/mamba_window.py:_make_bwd_kernel) at the micro
        # stage-0 shape: the mixer bucket is 94.9 ms (41%) of the micro step
        # and 88.5 ms (37%) of vessel (BASELINE.md r4 profiles) and has
        # never had a binding-resource measurement (VERDICT r4 #3 / weak #2).
        import math as _math
        from long_context_biomedical_imaging_tpu.ops import mamba_window as Mw
        BW = a.bw                        # 65536 default = micro s0
        V = a.v                          # 16 default
        C = a.c                          # 96 default
        cp = 128 if C <= 128 else 256
        N = 8                            # d_state (ref call sites)
        Dh = C // 2
        R = _math.ceil(C / 16)
        Dc = Mw._pick_chunk(N, Dh)
        n_j = -(-Dh // Dc)
        nd = N * Dc
        dt = jnp.bfloat16
        bb = a.bb or Mw._pick_bb(V, cp, N, n_j, Dc, bwd=True)
        _LOG2E = Mw._LOG2E

        keep = (jnp.arange(cp) < C).astype(jnp.float32)
        x = (jax.random.normal(rng, (BW, V, cp), jnp.float32) * keep).astype(dt)
        do = (jax.random.normal(jax.random.PRNGKey(9), (BW, V, cp),
                                jnp.float32) * keep).astype(dt)
        wxz = (jax.random.normal(rng, (cp, C), jnp.float32) * 0.05
               * keep[:, None]).astype(dt)
        wconv = jax.random.normal(rng, (3, C), jnp.float32) * 0.3
        wdbl = jax.random.normal(rng, (Dh, R + 2 * N), dt) * 0.1
        wdt = jax.random.normal(rng, (R, Dh), dt) * 0.3
        dtb2 = jnp.zeros((1, Dh), jnp.float32)
        at = Mw._chunk_at(-jnp.abs(jax.random.normal(rng, (N, Dh))), Dc, n_j)
        dskip = jnp.ones((1, Dh), jnp.float32)
        wout = (jax.random.normal(rng, (C, cp), jnp.float32) * 0.05).astype(dt)
        E, Fr = Mw._expand_reduce(N, Dc)
        Fn = Mw._reduce_over_n(N, Dc)
        _dot32 = Mw._make_dot32(dt)

        def make(variant):
            def kernel(x_ref, wxz_ref, wconv_ref, wdbl_ref, wdt_ref, dtb2_ref,
                       at_ref, dskip_ref, wout_ref, e_ref, fn_ref, fr_ref,
                       g_ref, dx_ref, dwxz_ref, dwconv_ref, dwdbl_ref,
                       dwdt_ref, ddtb_ref, dat_ref, ddskip_ref, dwout_ref,
                       pad_scr, x_scr, dtv_scr, y_scr, a_scr, h_scr, hp_scr,
                       cg_scr, dxs_scr, ddt_scr, dB_scr, dC_scr):
                i = pl.program_id(0)

                @pl.when(i == 0)
                def _init():
                    dwxz_ref[...] = jnp.zeros_like(dwxz_ref)
                    dwconv_ref[...] = jnp.zeros_like(dwconv_ref)
                    dwdbl_ref[...] = jnp.zeros_like(dwdbl_ref)
                    dwdt_ref[...] = jnp.zeros_like(dwdt_ref)
                    ddtb_ref[...] = jnp.zeros_like(ddtb_ref)
                    dat_ref[...] = jnp.zeros_like(dat_ref)
                    ddskip_ref[...] = jnp.zeros_like(ddskip_ref)
                    dwout_ref[...] = jnp.zeros_like(dwout_ref)

                nb = x_ref.shape[0]
                x32 = x_ref[...].astype(jnp.float32)
                do32 = g_ref[...].astype(jnp.float32)
                if variant == "copy":
                    dx_ref[...] = (x32 + do32).astype(dx_ref.dtype)
                    return
                seq = variant not in ("noseq", "noseq-all")
                xz, u, xv, z, dt_part, dtv, Bc, Cc = Mw._pre_scan(
                    x32, wxz_ref[...], wconv_ref[...], wdbl_ref[...],
                    wdt_ref[...], dtb2_ref[...], pad_scr, V, C, Dh, R, N, dt)
                if variant == "pre":
                    o = jnp.concatenate([dtv, z, x32[:, :, C:]], -1)
                    dx_ref[...] = (o + do32).astype(dx_ref.dtype)
                    return

                Mw._fill_chunked(x_scr, xv, Dh)
                Mw._fill_chunked(dtv_scr, dtv, Dh)
                Bc2 = Bc.reshape(nb * V, N)
                Cc2 = Cc.reshape(nb * V, N)
                E_, Fn_, Fr_ = e_ref[...], fn_ref[...], fr_ref[...]

                def chunk_fwd(jc):
                    a2row = at_ref[jc, 0:1, :] * _LOG2E
                    lo = jc * Dc
                    d2 = jax.nn.softplus(
                        dtv_scr[:, :, lo:lo + Dc].reshape(nb * V, Dc))
                    x2 = x_scr[:, :, lo:lo + Dc].reshape(nb * V, Dc)
                    d_rep2 = pltpu.repeat(d2, N, axis=1)
                    a_scr[...] = jnp.exp2(d_rep2 * a2row).reshape(nb, V, nd)
                    c2 = pltpu.repeat(d2 * x2, N, axis=1) * _dot32(Bc2, E_)
                    cg_scr[...] = c2.reshape(nb, V, nd)
                    if seq:
                        h = jnp.zeros((nb, nd), jnp.float32)
                        for t in range(V):
                            h = a_scr[:, t, :] * h + cg_scr[:, t, :]
                            h_scr[:, t, :] = h
                    else:
                        h_scr[...] = cg_scr[...]
                    return d2, x2, d_rep2

                fwd_vals = None
                for jc in range(n_j):
                    fwd_vals = chunk_fwd(jc)
                    lo = jc * Dc
                    H2 = h_scr[...].reshape(nb * V, nd)
                    y2 = _dot32(H2 * _dot32(Cc2, E_), Fn_)
                    y_scr[:, :, lo:lo + Dc] = y2.reshape(nb, V, Dc)

                y = y_scr[:, :, :Dh] + xv * dskip_ref[0][None, None, :]
                yz2 = jnp.concatenate([y, z], axis=-1).reshape(nb * V, C)
                if variant == "fwd":
                    o = jnp.concatenate([yz2.reshape(nb, V, C),
                                         x32[:, :, C:]], -1)
                    dx_ref[...] = (o + do32).astype(dx_ref.dtype)
                    return
                do2 = do32.reshape(nb * V, cp)
                dwout_ref[...] += Mw._dot_tt(yz2, do2, dt)
                dyz = Mw._dot_t(do2, wout_ref[...], dt).reshape(nb, V, C)
                dy = dyz[:, :, :Dh]
                dz = dyz[:, :, Dh:]
                ddskip_ref[...] += jnp.sum(dy * xv, axis=(0, 1))[None, :]
                Mw._fill_chunked(y_scr, dy, Dh)

                dB_scr[...] = jnp.zeros_like(dB_scr)
                dC_scr[...] = jnp.zeros_like(dC_scr)
                if variant == "noscanbwd":
                    dxs_scr[...] = y_scr[...]
                    ddt_scr[...] = y_scr[...]
                else:
                    for jc in reversed(range(n_j)):
                        a_flat = at_ref[jc, 0:1, :]
                        lo = jc * Dc
                        if jc == n_j - 1:
                            # mirror of the shipped last-chunk dedup (r5):
                            # the scan scratches are still valid from the
                            # y-rebuild loop
                            d2, x2, d_rep2 = fwd_vals
                        else:
                            d2, x2, d_rep2 = chunk_fwd(jc)
                        raw2 = dtv_scr[:, :, lo:lo + Dc].reshape(nb * V, Dc)
                        hp_scr[:, 0:1, :] = jnp.zeros((nb, 1, nd), jnp.float32)
                        hp_scr[:, 1:, :] = h_scr[:, :V - 1, :]
                        g2 = y_scr[:, :, lo:lo + Dc].reshape(nb * V, Dc)
                        g_rep2 = pltpu.repeat(g2, N, axis=1)
                        cg2 = _dot32(Cc2, E_) * g_rep2
                        cg_scr[...] = cg2.reshape(nb, V, nd)
                        if seq:
                            dh = cg_scr[:, V - 1, :]
                            for t in range(V - 2, -1, -1):
                                dh = cg_scr[:, t, :] + a_scr[:, t + 1, :] * dh
                                cg_scr[:, t, :] = dh
                        H2 = h_scr[...].reshape(nb * V, nd)
                        DH2 = cg_scr[...].reshape(nb * V, nd)
                        HP2 = hp_scr[...].reshape(nb * V, nd)
                        dC_scr[...] += _dot32(H2 * g_rep2, Fr_).reshape(nb, V, N)
                        da_a = DH2 * HP2 * a_scr[...].reshape(nb * V, nd)
                        dat_ref[jc, 0:1, :] += jnp.sum(da_a * d_rep2, axis=0,
                                                       keepdims=True)
                        red2 = _dot32(DH2 * _dot32(Bc2, E_), Fn_)
                        dxs_scr[:, :, lo:lo + Dc] = (d2 * red2).reshape(nb, V, Dc)
                        ddt2 = jax.nn.sigmoid(raw2) * (
                            x2 * red2 + _dot32(da_a * a_flat, Fn_))
                        ddt_scr[:, :, lo:lo + Dc] = ddt2.reshape(nb, V, Dc)
                        dB_scr[...] += _dot32(
                            DH2 * pltpu.repeat(d2 * x2, N, axis=1),
                            Fr_).reshape(nb, V, N)

                ddtv2 = ddt_scr[:, :, :Dh].reshape(nb * V, Dh)
                ddtb_ref[...] += jnp.sum(ddtv2, axis=0, keepdims=True)
                dwdt_ref[...] += Mw._dot_tt(dt_part.reshape(nb * V, R), ddtv2, dt)
                ddt_part = Mw._dot_t(ddtv2, wdt_ref[...], dt).reshape(nb, V, R)
                ddbl = jnp.concatenate([ddt_part, dB_scr[...], dC_scr[...]],
                                       axis=-1)
                ddbl2 = ddbl.reshape(nb * V, R + 2 * N)
                dwdbl_ref[...] += Mw._dot_tt(xv.reshape(nb * V, Dh), ddbl2, dt)
                dx_total = dy * dskip_ref[0][None, None, :] \
                    + dxs_scr[:, :, :Dh] \
                    + Mw._dot_t(ddbl2, wdbl_ref[...], dt).reshape(nb, V, Dh)
                ds = jnp.concatenate([dx_total, dz], axis=-1)
                du_conv = ds * Mw._silu_grad(u)
                dwconv_ref[...] += Mw._conv3_tap_grads(pad_scr, du_conv, V)
                dxz = Mw._same_conv3(pad_scr, du_conv, wconv_ref[...], V,
                                     transpose=True)
                dxz2 = dxz.reshape(nb * V, C)
                dwxz_ref[...] += Mw._dot_tt(x32.reshape(nb * V, cp), dxz2, dt)
                dxin = Mw._dot_t(dxz2, wxz_ref[...], dt).reshape(nb, V, cp)
                dx_ref[...] = dxin.astype(dx_ref.dtype)

            return kernel

        def build(variant):
            return jax.jit(lambda xx, dd: pl.pallas_call(
                make(variant),
                grid=(BW // bb,),
                in_specs=[pl.BlockSpec((bb, V, cp), lambda i: (i, 0, 0))]
                + Mw._weight_specs(C, Dh, R, N, nd, n_j, cp)
                + [pl.BlockSpec((N, nd), lambda i: (0, 0)),
                   pl.BlockSpec((nd, Dc), lambda i: (0, 0)),
                   pl.BlockSpec((nd, N), lambda i: (0, 0)),
                   pl.BlockSpec((bb, V, cp), lambda i: (i, 0, 0))],
                out_specs=[pl.BlockSpec((bb, V, cp), lambda i: (i, 0, 0)),
                           pl.BlockSpec((cp, C), lambda i: (0, 0)),
                           pl.BlockSpec((3, C), lambda i: (0, 0)),
                           pl.BlockSpec((Dh, R + 2 * N), lambda i: (0, 0)),
                           pl.BlockSpec((R, Dh), lambda i: (0, 0)),
                           pl.BlockSpec((1, Dh), lambda i: (0, 0)),
                           pl.BlockSpec((n_j, 8, nd), lambda i: (0, 0, 0)),
                           pl.BlockSpec((1, Dh), lambda i: (0, 0)),
                           pl.BlockSpec((C, cp), lambda i: (0, 0))],
                out_shape=[jax.ShapeDtypeStruct((BW, V, cp), xx.dtype),
                           jax.ShapeDtypeStruct((cp, C), jnp.float32),
                           jax.ShapeDtypeStruct((3, C), jnp.float32),
                           jax.ShapeDtypeStruct((Dh, R + 2 * N), jnp.float32),
                           jax.ShapeDtypeStruct((R, Dh), jnp.float32),
                           jax.ShapeDtypeStruct((1, Dh), jnp.float32),
                           jax.ShapeDtypeStruct((n_j, 8, nd), jnp.float32),
                           jax.ShapeDtypeStruct((1, Dh), jnp.float32),
                           jax.ShapeDtypeStruct((C, cp), jnp.float32)],
                scratch_shapes=[
                    pltpu.VMEM((bb, 2 * V, C), jnp.float32),
                    pltpu.VMEM((bb, V, n_j * Dc), jnp.float32),
                    pltpu.VMEM((bb, V, n_j * Dc), jnp.float32),
                    pltpu.VMEM((bb, V, n_j * Dc), jnp.float32),
                    pltpu.VMEM((bb, V, nd), jnp.float32),
                    pltpu.VMEM((bb, V, nd), jnp.float32),
                    pltpu.VMEM((bb, V, nd), jnp.float32),
                    pltpu.VMEM((bb, V, nd), jnp.float32),
                    pltpu.VMEM((bb, V, n_j * Dc), jnp.float32),
                    pltpu.VMEM((bb, V, n_j * Dc), jnp.float32),
                    pltpu.VMEM((bb, V, N), jnp.float32),
                    pltpu.VMEM((bb, V, N), jnp.float32),
                ],
                compiler_params=Mw._compiler_params(),
            )(xx, wxz, wconv, wdbl, wdt, dtb2, at, dskip, wout,
              E, Fn, Fr, dd)[0])

        print(f"mamba window-mixer bwd anatomy at ({BW},{V},{C}) cp={cp} "
              f"N={N} R={R} Dc={Dc} n_j={n_j} bb={bb}:")
        for variant in _sel(("copy", "pre", "fwd", "noseq", "noscanbwd",
                             "full")):
            try:
                f = build(variant)
                ms = timeit(lambda: f(x, do))
                print(f"  {variant:11s} {ms:7.2f} ms", flush=True)
            except Exception as e:
                print(f"  {variant:11s} FAILED: {str(e)[:140]}", flush=True)

    elif a.op == "vpu":
        # VPU peak calibration: R compute passes per element on a VMEM-resident
        # fp32 tile, one DMA in/out per block. Slope vs R gives element-ops/s
        # for each op class — the denominator for every kernel's VPU-roofline
        # share (there is no public v5e VPU ops/s figure to cite; measure it).
        import numpy as np
        rows, lanes = 512, 1024
        nblk = 128
        x = jax.random.normal(rng, (nblk * rows, lanes), jnp.float32)
        xb = x.astype(jnp.bfloat16)

        def make(op, R):
            def kernel(x_ref, o_ref):
                y = x_ref[...]
                c = jnp.float32(0.999) if y.dtype == jnp.float32 \
                    else jnp.bfloat16(0.999)
                for _ in range(R):
                    if op == "fma":
                        y = y * c + c
                    elif op == "mul":
                        y = y * c
                    elif op == "exp2":
                        y = jnp.exp2(-jnp.abs(y))
                    elif op == "tanh":
                        y = jnp.tanh(y)
                    elif op == "roll":
                        y = pltpu.roll(y, 1, 0) + c
                    elif op == "max":
                        y = jnp.maximum(y, c)
                o_ref[...] = y

            return kernel

        def build(op, R, data):
            return jax.jit(lambda xx: pl.pallas_call(
                make(op, R),
                grid=(nblk,),
                in_specs=[pl.BlockSpec((rows, lanes), lambda i: (i, 0))],
                out_specs=pl.BlockSpec((rows, lanes), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct(data.shape, data.dtype),
            )(xx))

        n_elem = nblk * rows * lanes
        print(f"VPU calibration on ({rows},{lanes}) fp32/bf16 tiles, "
              f"{n_elem/1e6:.0f}M elements:")
        for op in ("fma", "mul", "exp2", "tanh", "roll", "max"):
            for data, tag in ((x, "f32"), (xb, "bf16")):
                try:
                    f8 = build(op, 8, data)
                    f40 = build(op, 40, data)
                    t8 = timeit(lambda: f8(data), chain=10)
                    t40 = timeit(lambda: f40(data), chain=10)
                    per_pass = (t40 - t8) / 32  # ms per compute pass
                    rate = n_elem / (per_pass * 1e-3)
                    print(f"  {op:5s} {tag:4s} {per_pass:7.3f} ms/pass  "
                          f"{rate/1e9:7.1f} Gelem/s", flush=True)
                except Exception as e:
                    print(f"  {op:5s} {tag:4s} FAILED: {str(e)[:100]}",
                          flush=True)

    elif a.op == "flash":
        # VPU-vs-MXU attribution for the fused flash backward (VERDICT r3 #7):
        # variants of _bwd_fused_kernel with the elementwise stages disabled.
        # The deltas measure what the exp2 recompute / softmax-grad muls /
        # bf16 casts cost against the 5-matmul floor, giving the kernel's
        # measured ceiling (matmul floor + inherent VPU work) instead of the
        # asserted one.
        import importlib
        F = importlib.import_module(
            "long_context_biomedical_imaging_tpu.ops.flash_attention")
        L = a.bw if a.bw != 65536 else 16384
        bh, d = 12, 64
        bq = int(os.environ.get("FLASH_BQ", 512))
        bk = int(os.environ.get("FLASH_BK", 1024))
        n_q, n_k = L // bq, L // bk
        q = jax.random.normal(rng, (bh, L, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(1), (bh, L, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(2), (bh, L, d), jnp.bfloat16)
        do = jax.random.normal(jax.random.PRNGKey(3), (bh, L, d), jnp.bfloat16)
        lse = jax.random.normal(jax.random.PRNGKey(4), (bh, L, 1),
                                jnp.float32) * 2.0 + 8.0
        delta = jax.random.normal(jax.random.PRNGKey(5), (bh, L, 1),
                                  jnp.float32)
        scale2 = (d ** -0.5) * 1.4426950408889634

        gb = F._fused_bwd_group_blocks(d, bq, bk, 2)
        gb = max(min(gb, n_q), 1)

        def make(variant):
            def kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                       dq_ref, dk_ref, dv_ref, dq_scr, dk_scr, dv_scr):
                ik = pl.program_id(1)
                iq = pl.program_id(2)
                n_k_ = pl.num_programs(1)
                n_q_ = pl.num_programs(2)

                @pl.when(iq == 0)
                def _init_kv():
                    dk_scr[:] = jnp.zeros_like(dk_scr)
                    dv_scr[:] = jnp.zeros_like(dv_scr)

                qv = q_ref[0].astype(jnp.float32) * scale2
                kv = k_ref[0]
                s = jax.lax.dot_general(
                    qv.astype(kv.dtype), kv, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if variant == "matmuls":
                    p = s
                elif variant == "noexp":
                    p = s - lse_ref[0]
                else:
                    p = jnp.exp2(s - lse_ref[0])
                dv_scr[:] += jax.lax.dot_general(
                    p.astype(do_ref.dtype), do_ref[0],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dp = jax.lax.dot_general(
                    do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if variant == "matmuls":
                    ds = dp
                elif variant == "nodsmul":
                    ds = dp - delta_ref[0]
                else:
                    ds = p * (dp - delta_ref[0])
                if variant == "onecast":
                    dsb = ds.astype(q_ref.dtype)
                    dk_scr[:] += jax.lax.dot_general(
                        dsb, q_ref[0], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    dq_c = jax.lax.dot_general(
                        dsb, kv, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                else:
                    dk_scr[:] += jax.lax.dot_general(
                        ds.astype(q_ref.dtype), q_ref[0],
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    dq_c = jax.lax.dot_general(
                        ds.astype(kv.dtype), kv, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                rows = pl.dslice(iq * bq, bq)

                @pl.when(ik == 0)
                def _dq_store():
                    dq_scr[rows, :] = dq_c

                @pl.when(ik > 0)
                def _dq_accum():
                    dq_scr[rows, :] += dq_c

                @pl.when(ik == n_k_ - 1)
                def _dq_flush():
                    dq_ref[0, rows, :] = dq_scr[rows, :].astype(dq_ref.dtype)

                @pl.when(iq == n_q_ - 1)
                def _kv_flush():
                    dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
                    dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)

            return kernel

        def build(variant):
            def run(q, k, v, do, lse, delta):
                dq_parts, dk_acc, dv_acc = [], None, None
                for g in range(-(-n_q // gb)):
                    q0 = g * gb * bq
                    rows = min(gb, n_q - g * gb) * bq
                    dqg, dkg, dvg = pl.pallas_call(
                        make(variant),
                        grid=(bh, n_k, rows // bq),
                        in_specs=[
                            pl.BlockSpec((1, bq, d), lambda b, ik, iq: (b, iq, 0)),
                            pl.BlockSpec((1, bk, d), lambda b, ik, iq: (b, ik, 0)),
                            pl.BlockSpec((1, bk, d), lambda b, ik, iq: (b, ik, 0)),
                            pl.BlockSpec((1, bq, d), lambda b, ik, iq: (b, iq, 0)),
                            pl.BlockSpec((1, bq, 1), lambda b, ik, iq: (b, iq, 0)),
                            pl.BlockSpec((1, bq, 1), lambda b, ik, iq: (b, iq, 0)),
                        ],
                        out_specs=[
                            pl.BlockSpec((1, rows, d), lambda b, ik, iq: (b, 0, 0)),
                            pl.BlockSpec((1, bk, d), lambda b, ik, iq: (b, ik, 0)),
                            pl.BlockSpec((1, bk, d), lambda b, ik, iq: (b, ik, 0)),
                        ],
                        out_shape=[
                            jax.ShapeDtypeStruct((bh, rows, d), q.dtype),
                            jax.ShapeDtypeStruct((bh, L, d), jnp.float32),
                            jax.ShapeDtypeStruct((bh, L, d), jnp.float32),
                        ],
                        scratch_shapes=[
                            pltpu.VMEM((rows, d), jnp.float32),
                            pltpu.VMEM((bk, d), jnp.float32),
                            pltpu.VMEM((bk, d), jnp.float32),
                        ],
                        compiler_params=pltpu.CompilerParams(
                            vmem_limit_bytes=100 * 1024 * 1024),
                    )(q[:, q0:q0 + rows], k, v, do[:, q0:q0 + rows],
                      lse[:, q0:q0 + rows], delta[:, q0:q0 + rows])
                    dq_parts.append(dqg)
                    dk_acc = dkg if dk_acc is None else dk_acc + dkg
                    dv_acc = dvg if dv_acc is None else dv_acc + dvg
                return jnp.concatenate(dq_parts, axis=1), dk_acc, dv_acc

            jitted = jax.jit(run)
            return lambda: jitted(q, k, v, do, lse, delta)[0]

        def build_interleave():
            """VERDICT r4 #9: two INDEPENDENT bq-row q chains per grid step.
            If the bwd's residual gap is MXU pipeline fill/drain between the
            5 serially-dependent matmuls, two dependency-free chains in one
            kernel body let Mosaic overlap chain A's matmul k+1 with chain
            B's matmul k — distinct from a single 2*bq matmul (which the r4
            tile sweep already rejected: same serial depth, bigger tiles)."""
            bq2 = 2 * bq

            def kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                       dq_ref, dk_ref, dv_ref, dq_scr, dk_scr, dv_scr):
                ik = pl.program_id(1)
                iq = pl.program_id(2)
                n_k_ = pl.num_programs(1)
                n_q_ = pl.num_programs(2)

                @pl.when(iq == 0)
                def _init_kv():
                    dk_scr[:] = jnp.zeros_like(dk_scr)
                    dv_scr[:] = jnp.zeros_like(dv_scr)

                kv = k_ref[0]
                halves = []
                for h_ in range(2):
                    rows_h = slice(h_ * bq, (h_ + 1) * bq)
                    qv = q_ref[0, rows_h, :].astype(jnp.float32) * scale2
                    s = jax.lax.dot_general(
                        qv.astype(kv.dtype), kv, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    p = jnp.exp2(s - lse_ref[0, rows_h, :])
                    dp = jax.lax.dot_general(
                        do_ref[0, rows_h, :], v_ref[0],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    ds = p * (dp - delta_ref[0, rows_h, :])
                    halves.append((rows_h, p, ds))
                for rows_h, p, ds in halves:
                    dv_scr[:] += jax.lax.dot_general(
                        p.astype(do_ref.dtype), do_ref[0, rows_h, :],
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    dk_scr[:] += jax.lax.dot_general(
                        ds.astype(q_ref.dtype), q_ref[0, rows_h, :],
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    dq_c = jax.lax.dot_general(
                        ds.astype(kv.dtype), kv, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    rows = pl.dslice(iq * bq2 + (rows_h.start - halves[0][0].start), bq)

                    @pl.when(ik == 0)
                    def _dq_store():
                        dq_scr[rows, :] = dq_c

                    @pl.when(ik > 0)
                    def _dq_accum():
                        dq_scr[rows, :] += dq_c

                    @pl.when(ik == n_k_ - 1)
                    def _dq_flush():
                        dq_ref[0, rows, :] = dq_scr[rows, :].astype(dq_ref.dtype)

                @pl.when(iq == n_q_ - 1)
                def _kv_flush():
                    dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
                    dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)

            gb2 = max(gb // 2, 1)

            def run(q, k, v, do, lse, delta):
                dq_parts, dk_acc, dv_acc = [], None, None
                n_q2 = L // bq2
                for g in range(-(-n_q2 // gb2)):
                    q0 = g * gb2 * bq2
                    rows = min(gb2, n_q2 - g * gb2) * bq2
                    dqg, dkg, dvg = pl.pallas_call(
                        kernel,
                        grid=(bh, n_k, rows // bq2),
                        in_specs=[
                            pl.BlockSpec((1, bq2, d), lambda b, ik, iq: (b, iq, 0)),
                            pl.BlockSpec((1, bk, d), lambda b, ik, iq: (b, ik, 0)),
                            pl.BlockSpec((1, bk, d), lambda b, ik, iq: (b, ik, 0)),
                            pl.BlockSpec((1, bq2, d), lambda b, ik, iq: (b, iq, 0)),
                            pl.BlockSpec((1, bq2, 1), lambda b, ik, iq: (b, iq, 0)),
                            pl.BlockSpec((1, bq2, 1), lambda b, ik, iq: (b, iq, 0)),
                        ],
                        out_specs=[
                            pl.BlockSpec((1, rows, d), lambda b, ik, iq: (b, 0, 0)),
                            pl.BlockSpec((1, bk, d), lambda b, ik, iq: (b, ik, 0)),
                            pl.BlockSpec((1, bk, d), lambda b, ik, iq: (b, ik, 0)),
                        ],
                        out_shape=[
                            jax.ShapeDtypeStruct((bh, rows, d), q.dtype),
                            jax.ShapeDtypeStruct((bh, L, d), jnp.float32),
                            jax.ShapeDtypeStruct((bh, L, d), jnp.float32),
                        ],
                        scratch_shapes=[
                            pltpu.VMEM((rows, d), jnp.float32),
                            pltpu.VMEM((bk, d), jnp.float32),
                            pltpu.VMEM((bk, d), jnp.float32),
                        ],
                        compiler_params=pltpu.CompilerParams(
                            vmem_limit_bytes=100 * 1024 * 1024),
                    )(q[:, q0:q0 + rows], k, v, do[:, q0:q0 + rows],
                      lse[:, q0:q0 + rows], delta[:, q0:q0 + rows])
                    dq_parts.append(dqg)
                    dk_acc = dkg if dk_acc is None else dk_acc + dkg
                    dv_acc = dvg if dv_acc is None else dv_acc + dvg
                return jnp.concatenate(dq_parts, axis=1), dk_acc, dv_acc

            jitted = jax.jit(run)
            return lambda: jitted(q, k, v, do, lse, delta)[0]

        flops = 10.0 * L * L * d * bh
        print(f"flash fused-bwd anatomy at L={L} bh={bh} d={d} "
              f"blocks=({bq},{bk}) gb={gb}:")
        for variant in _sel(("matmuls", "nodsmul", "noexp", "onecast",
                             "full")):
            try:
                f = build(variant)
                ms = timeit(f)
                print(f"  {variant:10s} {ms:7.2f} ms  "
                      f"{flops / (ms * 1e-3) / 1e12:6.1f} TF/s", flush=True)
            except Exception as e:
                print(f"  {variant:10s} FAILED: {str(e)[:120]}", flush=True)
        try:
            f = build_interleave()
            ms = timeit(f)
            print(f"  interleave2 {ms:6.2f} ms  "
                  f"{flops / (ms * 1e-3) / 1e12:6.1f} TF/s", flush=True)
        except Exception as e:
            print(f"  interleave2 FAILED: {str(e)[:120]}", flush=True)

    elif a.op == "mlp":
        from long_context_biomedical_imaging_tpu.ops import fused_mlp as M
        N, C, H = a.bw * a.v, a.c, 4 * a.c
        bn = a.bb or M._pick_bn(C, H, bwd=False)
        x = jax.random.normal(rng, (N, C), jnp.bfloat16)
        w1 = jax.random.normal(rng, (C, H), jnp.bfloat16) * 0.05
        b1 = jnp.zeros((1, H), jnp.float32)
        w2 = jax.random.normal(rng, (H, C), jnp.bfloat16) * 0.05
        b2 = jnp.zeros((1, C), jnp.float32)
        dt = jnp.bfloat16

        def make(variant):
            def kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
                xx = x_ref[...]
                if variant == "copy":
                    o_ref[...] = xx
                    return
                u = M._dot(xx, w1_ref[...], dt) + b1_ref[0][None, :]
                if variant == "matmuls":
                    h = u
                elif variant == "relu":
                    h = jnp.maximum(u, 0.0)
                elif variant == "tanhgelu":
                    # tanh-approx gelu
                    c0 = 0.7978845608028654
                    h = 0.5 * u * (1.0 + jnp.tanh(c0 * (u + 0.044715 * u ** 3)))
                else:
                    # exact-erf GELU (dt=fp32 selects the erf branch; the
                    # bf16 default would dispatch to tanh and void the
                    # erf-vs-tanh comparison this variant exists for)
                    h = M._gelu(u, jnp.float32)
                out = M._dot(h, w2_ref[...], dt) + b2_ref[0][None, :]
                o_ref[...] = out.astype(o_ref.dtype)

            return kernel

        def build(variant):
            return jax.jit(lambda xx: pl.pallas_call(
                make(variant),
                grid=(N // bn,),
                in_specs=[
                    pl.BlockSpec((bn, C), lambda i: (i, 0)),
                    pl.BlockSpec((C, H), lambda i: (0, 0)),
                    pl.BlockSpec((1, H), lambda i: (0, 0)),
                    pl.BlockSpec((H, C), lambda i: (0, 0)),
                    pl.BlockSpec((1, C), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((bn, C), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((N, C), xx.dtype),
                compiler_params=M._compiler_params(),
            )(xx, w1, b1, w2, b2))

        print(f"mlp fwd anatomy at ({N},{C}) H={H}, bn={bn}:")
        for variant in ("copy", "matmuls", "relu", "tanhgelu", "erfgelu"):
            f = build(variant)
            ms = timeit(lambda: f(x))
            print(f"  {variant:10s} {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
