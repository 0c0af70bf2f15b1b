"""Per-kernel binding-resource roofline table (VERDICT r3 #1).

Runs each fused Pallas kernel at its flagship stage shapes (fwd and fwd+bwd,
weights included in the grad like a real train step) and reports the measured
time against three analytic resource floors:

  - HBM:  kernel-level I/O bytes (block-streamed tensors; weights and weight
          grads counted once per call) at 819 GB/s (v5e).
  - MXU:  dot_general FLOPs (bwd includes the in-kernel forward recompute) at
          197 bf16 TFLOP/s, derated by the narrow-dim utilization of each
          matmul (a k- or n-dim below 128 uses k/128 or n/128 of the array;
          the derate is the FLOP-weighted mean over the kernel's matmuls).
  - VPU:  elementwise/shift work expressed as element-op passes over the
          token volume, converted to time with rates measured by
          `bench_kernel_anatomy.py --op vpu` on this chip (pass --vpu-gelem
          to override the default fma rate).

The binding resource is the largest floor; the table prints each kernel's
achieved fraction of it, plus achieved GB/s and TFLOP/s. VPU pass counts are
coarse (documented per kernel below); they are cross-checked against the
stage-disabled kernel variants in bench_kernel_anatomy.py.

Usage: python scripts/kernel_roofline.py [--case hyena_s0 ...] [--csv]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

HBM_GBS = 819.0
MXU_TFS = 197.0


def timeit(fn, chain=20):
    import jax

    def first_leaf(o):
        return jax.tree.leaves(o)[0]

    float(first_leaf(fn()).ravel()[0])

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn()
        # one materialization per chain: the relay's ~30 ms fetch would
        # otherwise dominate; chained dispatches serialize on the device
        float(first_leaf(o).ravel()[0])
        return time.perf_counter() - t0

    t_small = run(3)
    t_large = run(3 + chain)
    return (t_large - t_small) / chain * 1e3


def mxu_derate(matmuls):
    """FLOP-weighted mean utilization over [(flops, k, n), ...]: a contraction
    k < 128 or output width n < 128 uses only that fraction of the 128x128
    array (the v5e MXU processes 128-wide passes regardless)."""
    tot = sum(f for f, _, _ in matmuls)
    eff = sum(f * min(k / 128.0, 1.0) * min(n / 128.0, 1.0)
              for f, k, n in matmuls)
    return eff / tot, tot


def build_hyena(BW, V, C, K=5, ln=True):
    import jax
    import jax.numpy as jnp
    from long_context_biomedical_imaging_tpu.ops.hyena_window import (
        hyena_window_mixer)
    r = jax.random.PRNGKey(0)
    ks = jax.random.split(r, 9)
    x = jax.random.normal(ks[0], (BW, V, C), jnp.bfloat16)
    w = dict(
        w_in=jax.random.normal(ks[1], (C, 3 * C), jnp.bfloat16) * 0.05,
        b_in=jnp.zeros((3 * C,), jnp.float32),
        w_short=jax.random.normal(ks[2], (3 * C, K), jnp.float32) * 0.1,
        b_short=jnp.zeros((3 * C,), jnp.float32),
        k_long=jax.random.normal(ks[3], (C, V), jnp.float32) * 0.1,
        b_long=jnp.zeros((C,), jnp.float32),
        w_out=jax.random.normal(ks[4], (C, C), jnp.bfloat16) * 0.05,
        b_out=jnp.zeros((C,), jnp.float32),
        ln_scale=jnp.ones((C,), jnp.float32),
        ln_bias=jnp.zeros((C,), jnp.float32),
    )

    def f(x, w):
        return hyena_window_mixer(x, **w)

    N = BW * V
    it = 2  # bf16
    # --- analytic counts -------------------------------------------------- #
    # fwd matmuls: in_proj (k=C, n=3C), out_proj (k=C, n=C)
    mm_fwd = [(2 * N * C * 3 * C, C, 3 * C), (2 * N * C * C, C, C)]
    # bwd: recompute both + dwo (k=N, n=C), dv2 (k=C, n=C), dwin (k=N, n=3C),
    # dy (k=3C, n=C)
    mm_bwd = mm_fwd + [(2 * N * C * C, N, C), (2 * N * C * C, C, C),
                       (2 * N * C * 3 * C, N, 3 * C),
                       (2 * N * C * 3 * C, 3 * C, C)]
    long_conv_mm = []
    if V > 64:
        # chunked path: long conv rides the MXU as (k=64, n=64) block matmuls
        n_ch = V // 64
        fl = N * C * 64 * (n_ch + 1)
        long_conv_mm = [(fl, 64, 64)]
        mm_fwd = mm_fwd + long_conv_mm
        mm_bwd = mm_bwd + [(fl, 64, 64)] * 3   # recompute + dM + dg
    # VPU element-op passes over (N, C) fp32 elements. Shift-type ops are
    # separated (they run ~2x slower than fma on v5e, see --op vpu).
    # fwd: LN ~7; short conv: width 3C: K muls + (K-1) adds -> 3*(2K-1)=27 fma
    #      + 3*(K-1)=12 shift; gates 2; long conv (tap path): V muls+(V-1)adds
    #      fma + (V-1) shifts; residual 1; casts ~2.
    if V <= 64:
        vpu_fwd_fma = 7 + 3 * (2 * K - 1) + 2 + (2 * V - 1) + 1 + 2
        vpu_fwd_shift = 3 * (K - 1) + (V - 1)
        # bwd: recompute fwd + transposed convs (same cost) + tap-grad
        # reductions (V taps: mul+reduce ~2 passes each over C; K taps over
        # 3C) + gate grads ~6 + LN bwd ~10
        vpu_bwd_fma = (vpu_fwd_fma + 3 * (2 * K - 1) + (2 * V - 1)
                       + 2 * V + 2 * 3 * K + 6 + 10)
        vpu_bwd_shift = vpu_fwd_shift * 2 + (V - 1) + 3 * (K - 1)
    else:
        # chunked path: long conv on MXU; VPU pays the channel-major
        # transposes in/out (~4 copy passes each way, counted as shift-class)
        vpu_fwd_fma = 7 + 3 * (2 * K - 1) + 2 + 1 + 2
        vpu_fwd_shift = 3 * (K - 1) + 8
        vpu_bwd_fma = vpu_fwd_fma + 3 * (2 * K - 1) + 2 * 3 * K + 6 + 10
        vpu_bwd_shift = vpu_fwd_shift * 2 + 16
    wbytes = (C * 3 * C + C * C) * it + (3 * C * K + 3 * C + C * V + C) * 4
    return f, x, w, dict(
        bytes_fwd=2 * N * C * it + wbytes,
        bytes_bwd=3 * N * C * it + 2 * wbytes * 2,
        mm_fwd=mm_fwd, mm_bwd=mm_bwd,
        vpu_fwd=(vpu_fwd_fma, vpu_fwd_shift),
        vpu_bwd=(vpu_bwd_fma, vpu_bwd_shift),
        n_elem=N * C)


def build_mamba(BW, V, C, d_state=8, ln=True):
    import jax
    import jax.numpy as jnp
    from long_context_biomedical_imaging_tpu.ops.mamba_window import (
        mamba_window_mixer, _pick_chunk)
    Dh = C // 2
    R = -(-C // 16)
    r = jax.random.PRNGKey(0)
    ks = jax.random.split(r, 10)
    x = jax.random.normal(ks[0], (BW, V, C), jnp.bfloat16)
    w = dict(
        w_xz=jax.random.normal(ks[1], (C, C), jnp.bfloat16) * 0.05,
        w_conv_x=jax.random.normal(ks[2], (Dh, 3), jnp.float32) * 0.2,
        w_conv_z=jax.random.normal(ks[3], (Dh, 3), jnp.float32) * 0.2,
        w_dbl=jax.random.normal(ks[4], (Dh, R + 2 * d_state),
                                jnp.bfloat16) * 0.05,
        w_dt=jax.random.normal(ks[5], (R, Dh), jnp.bfloat16) * 0.05,
        dt_bias=jnp.full((Dh,), -2.0, jnp.float32),
        A=-jnp.exp(jax.random.normal(ks[6], (Dh, d_state), jnp.float32)),
        D=jnp.ones((Dh,), jnp.float32),
        w_out=jax.random.normal(ks[7], (C, C), jnp.bfloat16) * 0.05,
        ln_scale=jnp.ones((C,), jnp.float32),
        ln_bias=jnp.zeros((C,), jnp.float32),
    )

    def f(x, w):
        return mamba_window_mixer(x, w["w_xz"], w["w_conv_x"], w["w_conv_z"],
                                  w["w_dbl"], w["w_dt"], w["dt_bias"],
                                  w["A"], w["D"], w["w_out"], d_state,
                                  w["ln_scale"], w["ln_bias"])

    N = BW * V
    it = 2
    Dc = _pick_chunk(d_state, Dh)
    n_j = -(-Dh // Dc)
    nd = d_state * Dc
    # fwd matmuls: in_proj (k=C,n=C); x_proj (k=Dh,n=R+2N); dt_proj (k=R,n=Dh);
    # per chunk: Bc@E (k=Nst,n=nd), Cc@E (k=Nst,n=nd), y=(H*CE)@Fn (k=nd,n=Dc);
    # out_proj (k=C,n=C)
    mm_fwd = [(2 * N * C * C, C, C),
              (2 * N * Dh * (R + 2 * d_state), Dh, R + 2 * d_state),
              (2 * N * R * Dh, R, Dh)] + \
             [(2 * N * d_state * nd, d_state, nd)] * (2 * n_j) + \
             [(2 * N * nd * Dc, nd, Dc)] * n_j + \
             [(2 * N * C * C, C, C)]
    # bwd ~ recompute + transposed versions of each (+ weight grads)
    mm_bwd = mm_fwd + [(f_, max(k, 128), n) for (f_, k, n) in mm_fwd] + [
        (2 * N * C * C, N, C), (2 * N * C * C, N, C)]
    # VPU passes over (N, C): conv3 'same' both branches: 3 muls+2 adds over C
    # width + 2 shifts; SiLU ~4; softplus+exp2 over nd width = (nd/C)*(~8);
    # scan: V sequential steps of 2 ops on (bb, nd) tiles -> per token-elem
    # 2*nd/C; repeats ~2; D-skip+concat 2; casts 2; LN 7.
    scan_p = 2.0 * nd / C * 1.0
    vpu_fwd_fma = 7 + 5 + 4 + (nd / C) * 8 + scan_p + 2 + 2 + 2
    vpu_fwd_shift = 2 + 4
    vpu_bwd_fma = vpu_fwd_fma * 2 + scan_p * 2 + 20
    vpu_bwd_shift = vpu_fwd_shift * 2 + 4
    wbytes = 2 * C * C * it + (Dh * (R + 2 * d_state) + R * Dh) * it \
        + (Dh * 8) * 4
    return f, x, w, dict(
        bytes_fwd=2 * N * C * it + wbytes,
        bytes_bwd=3 * N * C * it + 2 * wbytes * 2,
        mm_fwd=mm_fwd, mm_bwd=mm_bwd,
        vpu_fwd=(vpu_fwd_fma, vpu_fwd_shift),
        vpu_bwd=(vpu_bwd_fma, vpu_bwd_shift),
        n_elem=N * C)


def build_mlp(N, C, ln=True):
    import jax
    import jax.numpy as jnp
    from long_context_biomedical_imaging_tpu.ops.fused_mlp import (
        fused_ln_mlp_residual)
    H = 4 * C
    r = jax.random.PRNGKey(0)
    ks = jax.random.split(r, 4)
    x = jax.random.normal(ks[0], (N, C), jnp.bfloat16)
    w = dict(
        ln_scale=jnp.ones((C,), jnp.float32),
        ln_bias=jnp.zeros((C,), jnp.float32),
        w1=jax.random.normal(ks[1], (C, H), jnp.bfloat16) * 0.05,
        b1=jnp.zeros((H,), jnp.float32),
        w2=jax.random.normal(ks[2], (H, C), jnp.bfloat16) * 0.05,
        b2=jnp.zeros((C,), jnp.float32),
    )

    def f(x, w):
        return fused_ln_mlp_residual(x, **w)

    it = 2
    mm_fwd = [(2 * N * C * H, C, H), (2 * N * H * C, H, C)]
    mm_bwd = mm_fwd + [(2 * N * H * C, N, H), (2 * N * H * C, H, C),
                       (2 * N * C * H, N, C), (2 * N * C * H, C, H)]
    # VPU: LN 7 + gelu(tanh) ~ (H/C)*10 + residual 1 + casts 2
    vpu_fwd = (7 + (H / C) * 10 + 1 + 2, 0)
    vpu_bwd = (vpu_fwd[0] + (H / C) * 14 + 10, 0)
    wbytes = 2 * C * H * it
    return f, x, w, dict(
        bytes_fwd=2 * N * C * it + wbytes,
        bytes_bwd=3 * N * C * it + 2 * wbytes * 2,
        mm_fwd=mm_fwd, mm_bwd=mm_bwd, vpu_fwd=vpu_fwd, vpu_bwd=vpu_bwd,
        n_elem=N * C)


def build_wattn(S, V, C, heads, ln=False):
    import jax
    import jax.numpy as jnp
    from long_context_biomedical_imaging_tpu.ops.window_attention import (
        windowed_attention_proj)
    r = jax.random.PRNGKey(0)
    ks = jax.random.split(r, 4)
    x = jax.random.normal(ks[0], (S, V, C), jnp.bfloat16)
    w = dict(
        wqkv=jax.random.normal(ks[1], (C, 3 * C), jnp.bfloat16) * 0.05,
        bqkv=jnp.zeros((3 * C,), jnp.float32),
        wout=jax.random.normal(ks[2], (C, C), jnp.bfloat16) * 0.05,
        bout=jnp.zeros((C,), jnp.float32),
        rel=jax.random.normal(ks[3], (heads, V, V), jnp.float32) * 0.1,
    )

    def f(x, w):
        return windowed_attention_proj(x, w["wqkv"], w["bqkv"], w["wout"],
                                       w["bout"], w["rel"], heads=heads,
                                       rid=None)

    N = S * V
    d = C // heads
    it = 2
    # qkv (k=C,n=3C) + out (k=C,n=C) + attention 4*V^2*d per head-window:
    # qk^T (k=d,n=V) + pv (k=V,n=d)
    attn_f = 4 * S * heads * V * V * d
    mm_fwd = [(2 * N * C * 3 * C, C, 3 * C), (2 * N * C * C, C, C),
              (attn_f / 2, d, V), (attn_f / 2, V, d)]
    mm_bwd = mm_fwd + [(2 * N * C * 3 * C, N, 3 * C),
                       (2 * N * C * 3 * C, 3 * C, C),
                       (2 * N * C * C, N, C), (2 * N * C * C, C, C),
                       (attn_f * 5 / 4, d, V), (attn_f * 5 / 4, V, d)]
    # VPU: softmax over (V,V) tiles ~ (V/C)*heads... express per (N,C) elem:
    # scores per token = heads*V -> softmax ~5 ops -> 5*heads*V/C passes
    smax = 5.0 * heads * V / C
    vpu_fwd = (smax + 6, 0)
    vpu_bwd = (smax * 2 + 14, 0)
    wbytes = (C * 3 * C + C * C) * it + heads * V * V * 4
    return f, x, w, dict(
        bytes_fwd=2 * N * C * it + wbytes,
        bytes_bwd=3 * N * C * it + 2 * wbytes * 2,
        mm_fwd=mm_fwd, mm_bwd=mm_bwd, vpu_fwd=vpu_fwd, vpu_bwd=vpu_bwd,
        n_elem=N * C)


CASES = {
    # ptx 1024x1024 p2 w4 hyena b4: stage shapes
    "hyena_s0": (build_hyena, dict(BW=65536, V=16, C=96)),
    "hyena_s1": (build_hyena, dict(BW=16384, V=16, C=192)),
    "hyena_s2": (build_hyena, dict(BW=4096, V=16, C=384)),
    "hyena_s3": (build_hyena, dict(BW=1024, V=16, C=768)),
    # cmr/emb 512-token windows (chunked Toeplitz path)
    "hyena_v512_cmr": (build_hyena, dict(BW=2048, V=512, C=96)),
    "hyena_v512_emb": (build_hyena, dict(BW=4096, V=512, C=96)),
    # emb/cmr stage-1: C=192 chunked kernel — 57.3 ms/call bwd in the emb
    # step profile, the single largest kernel cost in any flagship
    "hyena_v512_s1": (build_hyena, dict(BW=512, V=512, C=192)),
    # micro/abct mamba stage shapes (V=16 / V=64)
    "mamba_s0_micro": (build_mamba, dict(BW=65536, V=16, C=96)),
    "mamba_s0_abct": (build_mamba, dict(BW=16384, V=64, C=96)),
    "mamba_s1_abct": (build_mamba, dict(BW=2048, V=64, C=192)),
    # MLP at ptx s0/s1 volumes
    "mlp_s0": (build_mlp, dict(N=1048576, C=96)),
    "mlp_s1": (build_mlp, dict(N=262144, C=192)),
    # vessel w8 attention stage 0 (V=64, 3 heads)
    "wattn_s0": (build_wattn, dict(S=16384, V=64, C=96, heads=3)),
}

# measured by bench_kernel_anatomy.py --op vpu on the v5e chip; override via
# flags if re-measured. Units: Gelem/s per full-tile pass.
VPU_FMA_GELEMS = 400.0
VPU_SHIFT_GELEMS = 200.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", nargs="*", default=list(CASES))
    ap.add_argument("--fma-gelem", type=float, default=VPU_FMA_GELEMS)
    ap.add_argument("--shift-gelem", type=float, default=VPU_SHIFT_GELEMS)
    ap.add_argument("--chain", type=int, default=20)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    hdr = (f"{'case':16s} {'pass':7s} {'ms':>8s} {'GB/s':>7s} {'TF/s':>7s} "
           f"{'t_hbm':>7s} {'t_mxu':>7s} {'t_vpu':>7s} {'bind':>5s} "
           f"{'%bind':>6s} {'%floor':>6s}")
    print(hdr)
    print("-" * len(hdr))

    for name in a.case:
        build, kw = CASES[name]
        f, x, w, counts = build(**kw)

        fwd = jax.jit(lambda x, w: f(x, w))
        grad = jax.jit(jax.grad(
            lambda x, w: jnp.sum(f(x, w).astype(jnp.float32)),
            argnums=(0, 1)))

        for tag, fn in (("fwd", lambda: fwd(x, w)),
                        ("fwd+bwd", lambda: grad(x, w)[0])):
            try:
                ms = timeit(fn, chain=a.chain)
            except Exception as e:
                print(f"{name:16s} {tag:7s} FAILED: {str(e)[:90]}")
                continue
            if tag == "fwd":
                by, mm, vp = counts["bytes_fwd"], counts["mm_fwd"], counts["vpu_fwd"]
            else:
                by = counts["bytes_fwd"] + counts["bytes_bwd"]
                mm = counts["mm_fwd"] + counts["mm_bwd"]
                vp = (counts["vpu_fwd"][0] + counts["vpu_bwd"][0],
                      counts["vpu_fwd"][1] + counts["vpu_bwd"][1])
            derate, flops = mxu_derate(mm)
            t_hbm = by / (HBM_GBS * 1e9) * 1e3
            t_mxu = flops / (MXU_TFS * 1e12 * derate) * 1e3
            n = counts["n_elem"]
            t_vpu = (vp[0] * n / (a.fma_gelem * 1e9)
                     + vp[1] * n / (a.shift_gelem * 1e9)) * 1e3
            floors = {"hbm": t_hbm, "mxu": t_mxu, "vpu": t_vpu}
            bind = max(floors, key=floors.get)
            # serial floor: HBM overlaps compute (pipelined block DMA), MXU
            # and VPU issue from one core -> additive
            t_floor = max(t_hbm, t_mxu + t_vpu)
            print(f"{name:16s} {tag:7s} {ms:8.2f} {by/ms/1e6:7.0f} "
                  f"{flops/ms/1e9:7.1f} {t_hbm:7.2f} {t_mxu:7.2f} "
                  f"{t_vpu:7.2f} {bind:>5s} "
                  f"{floors[bind]/ms*100:5.0f}% {t_floor/ms*100:5.0f}%",
                  flush=True)


if __name__ == "__main__":
    main()
