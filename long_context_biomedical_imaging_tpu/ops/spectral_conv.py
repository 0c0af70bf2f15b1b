"""Fused Pallas spectral causal convolution for full-sequence Hyena (16k-66k).

Replaces the XLA matmul-FFT path of `fftconv.py` for the ViT full-sequence
hyena lengths (ref: model/models/hyena.py:32-51 at backbone_vit.py:172
l_max=66000). The XLA stages are individually efficient (~670 GB/s measured)
but materialize every DFT stage in HBM: the ViT-65k train step moved ~690 GB
per step, ~80% of it FFT intermediates, for a 1.1 s step. This kernel runs
the whole causal convolution per (batch, channel) cell in VMEM:

    pad -> FFT -> spectral product -> iFFT -> trim

as a TWO-FACTOR scrambled matmul FFT (n = 2L = n1*n2):
    X0 = x.view(n1, n2)              # j = j1*n2 + j2, free HBM reshape
    Y1 = DFT_{n1} @ X0               # left matmul over sublanes
    Z1 = Y1 * w_n^{k1 j2}            # elementwise twiddle table
    S  = DFT_{n2} @ Z1.T             # transpose + left matmul
    S[k2, k1] = X[k1 + n1 k2]        # spectrum in SCRAMBLED order
The scrambled order is a fixed permutation of the true DFT, so pointwise
products/conjugates are exact and the mirrored inverse cancels it — no
bit-reversal is ever paid (same trick as fftconv.py's XLA path). Every move
is a Mosaic-supported primitive (left matmul / elementwise / 2D transpose —
scripts/probe_mosaic_layouts.py); no lane-crossing reshapes.

Zero padding and causal trimming are FREE here: the padded input's stage-1
matmul only needs DFT columns [0, n1/2) and the trimmed output only needs
inverse rows [0, n1/2), so the first and last stages run at half FLOPs on
sliced DFT matrices instead of touching padded data at all.

Matmuls run in bf16 with fp32 accumulation (the v5e MXU truncates fp32
operands to bf16 at DEFAULT precision anyway; HIGHEST costs 6x). Relative
error vs the fp32 XLA FFT is ~1e-3..1e-2 — the same regime as the bf16
Toeplitz window conv already used for V<=512 windows, and consistent with
the AMP activations feeding the op.

Backward is analytic (same as fftconv.py): du = iF(F(g) conj(F(k)))[:L] via
the same kernel with a conjugation flag, dk = iF(sum_b F(g) conj(F(u)))[:L]
via a batch-accumulating variant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Dispatch floor: below this the Toeplitz/window paths win; above it the
# two-factor planes are lane-wide enough for the MXU.
SPECTRAL_MIN_LEN = 8192
# (n1, n2) plane ceiling: n = 2L <= 2^18 keeps the fp32 working set ~6MB/cell.
SPECTRAL_MAX_LEN = 131072


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _compiler_params():
    if jax.default_backend() == "cpu":
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _split(n: int):
    """n = n1*n2 with n1 = 2^ceil(e/2) >= n2; None if not a power of two."""
    if n <= 0 or n & (n - 1):
        return None
    e = n.bit_length() - 1
    n1 = 1 << ((e + 1) // 2)
    return n1, n // n1


def spectral_supported(L: int) -> bool:
    return (SPECTRAL_MIN_LEN <= L <= SPECTRAL_MAX_LEN
            and _split(2 * L) is not None)


# Cache numpy (never jnp): jnp constants created inside a custom_vjp trace
# would leak tracers across traces (see fftconv.py:_dft_consts).
@functools.lru_cache(maxsize=None)
def _consts(n: int):
    n1, n2 = _split(n)
    i1, i2 = np.arange(n1), np.arange(n2)
    a1 = -2 * np.pi / n1 * np.outer(i1, i1)
    a2 = -2 * np.pi / n2 * np.outer(i2, i2)
    tw = -2 * np.pi / n * np.outer(i1, i2)       # w_n^{k1 j2}, (n1, n2)
    return dict(
        d1r=np.cos(a1).astype(np.float32), d1i=np.sin(a1).astype(np.float32),
        d2r=np.cos(a2).astype(np.float32), d2i=np.sin(a2).astype(np.float32),
        twr=np.cos(tw).astype(np.float32), twi=np.sin(tw).astype(np.float32),
        # inverse twiddle table, transposed layout (n2, n1), sign +
        itwr=np.cos(tw).T.astype(np.float32).copy(),
        itwi=(-np.sin(tw).T).astype(np.float32).copy(),
    )


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _rfft2(x, c):
    """Real (n1h, n2) tile (the unpadded half) -> scrambled spectrum
    (n2, n1) fp32 pair. Stage-1 uses the sliced DFT columns [0, n1h) —
    the zero pad is never materialized."""
    xb = x.astype(jnp.bfloat16)
    y1r = _dot(c["d1r_in"], xb)                  # (n1, n1h) @ (n1h, n2)
    y1i = _dot(c["d1i_in"], xb)
    z1r = y1r * c["twr"] - y1i * c["twi"]
    z1i = y1r * c["twi"] + y1i * c["twr"]
    z1rt = z1r.T.astype(jnp.bfloat16)            # (n2, n1)
    z1it = z1i.T.astype(jnp.bfloat16)
    sr = _dot(c["d2r"], z1rt) - _dot(c["d2i"], z1it)
    si = _dot(c["d2r"], z1it) + _dot(c["d2i"], z1rt)
    return sr, si


def _irfft2_trim(pr, pi, c, inv_n):
    """Scrambled spectrum (n2, n1) -> real output rows [0, n1h) of the
    inverse, scaled by 1/n. Conjugate transforms: conj(D) = (dr, -di)."""
    prb = pr.astype(jnp.bfloat16)
    pib = pi.astype(jnp.bfloat16)
    ar = _dot(c["d2r"], prb) + _dot(c["d2i"], pib)
    ai = _dot(c["d2r"], pib) - _dot(c["d2i"], prb)
    br = ar * c["itwr"] - ai * c["itwi"]
    bi = ar * c["itwi"] + ai * c["itwr"]
    brt = br.T.astype(jnp.bfloat16)              # (n1, n2)
    bit = bi.T.astype(jnp.bfloat16)
    # real part of conj(DFT_{n1}) @ B, output rows [0, n1h) only
    xr = _dot(c["d1r_out"], brt) + _dot(c["d1i_out"], bit)
    return xr * inv_n


def _kernel_consts(n):
    """jnp views of the cached numpy tables, with the stage-1 column slice
    and inverse row slice baked in."""
    c = _consts(n)
    n1 = c["d1r"].shape[0]
    n1h = n1 // 2
    return dict(
        d1r_in=jnp.asarray(c["d1r"][:, :n1h], jnp.bfloat16),
        d1i_in=jnp.asarray(c["d1i"][:, :n1h], jnp.bfloat16),
        d1r_out=jnp.asarray(c["d1r"][:n1h, :], jnp.bfloat16),
        d1i_out=jnp.asarray(c["d1i"][:n1h, :], jnp.bfloat16),
        d2r=jnp.asarray(c["d2r"], jnp.bfloat16),
        d2i=jnp.asarray(c["d2i"], jnp.bfloat16),
        twr=jnp.asarray(c["twr"]), twi=jnp.asarray(c["twi"]),
        itwr=jnp.asarray(c["itwr"]), itwi=jnp.asarray(c["itwi"]),
    )


_CONST_KEYS = ("d1r_in", "d1i_in", "d1r_out", "d1i_out", "d2r", "d2i",
               "twr", "twi", "itwr", "itwi")


def _conv_kernel(u_ref, k_ref, b_ref, *refs, n, sgn, skip):
    cs = {k: refs[i][...] for i, k in enumerate(_CONST_KEYS)}
    o_ref = refs[len(_CONST_KEYS)]
    kr_ref, ki_ref = refs[len(_CONST_KEYS) + 1:]
    # grid is (D, B) with batch innermost: the filter spectrum is
    # batch-independent, so compute it once per channel and reuse it from
    # VMEM scratch for the remaining batch cells
    @pl.when(pl.program_id(1) == 0)
    def _spec_k():
        kr, ki = _rfft2(k_ref[0], cs)
        kr_ref[...] = kr
        ki_ref[...] = ki

    x = u_ref[0, 0]
    ur, ui = _rfft2(x, cs)
    kr, ki = kr_ref[...], ki_ref[...]
    pr = ur * kr - sgn * (ui * ki)
    pi = sgn * (ur * ki) + ui * kr
    y = _irfft2_trim(pr, pi, cs, 1.0 / n)
    if skip:
        # whole (D, 1) bias column is resident; pick this cell's channel
        y = y + b_ref[pl.program_id(0), 0] * x.astype(jnp.float32)
    o_ref[0, 0] = y.astype(o_ref.dtype)


def _dk_kernel(g_ref, u_ref, *refs, n, nb):
    cs = {k: refs[i][...] for i, k in enumerate(_CONST_KEYS)}
    o_ref = refs[len(_CONST_KEYS)]
    accr_ref, acci_ref = refs[len(_CONST_KEYS) + 1:]
    b = pl.program_id(1)
    gr, gi = _rfft2(g_ref[0, 0], cs)
    ur, ui = _rfft2(u_ref[0, 0], cs)
    pr = gr * ur + gi * ui                       # F(g) * conj(F(u))
    pi = gi * ur - gr * ui

    @pl.when(b == 0)
    def _init():
        accr_ref[...] = pr
        acci_ref[...] = pi

    @pl.when(b > 0)
    def _acc():
        accr_ref[...] += pr
        acci_ref[...] += pi

    @pl.when(b == nb - 1)
    def _emit():
        o_ref[0] = _irfft2_trim(accr_ref[...], acci_ref[...], cs,
                                1.0 / n).astype(o_ref.dtype)


def _plane_view(a, n1h, n2):
    return a.reshape(a.shape[:-1] + (n1h, n2))


def _conv_call(u, k, bias, conj_k: bool):
    """u (B, D, L), k (D, L), bias (D,)|None -> (B, D, L) in u.dtype."""
    B, D, L = u.shape
    n = 2 * L
    n1, n2 = _split(n)
    n1h = n1 // 2
    assert L == n1h * n2
    up = _plane_view(u, n1h, n2)
    kp = _plane_view(k.astype(jnp.float32), n1h, n2)
    bcol = (bias if bias is not None
            else jnp.zeros((D,), jnp.float32)).astype(jnp.float32)[:, None]
    cs = _kernel_consts(n)
    const_args = [cs[key] for key in _CONST_KEYS]
    cspecs = [pl.BlockSpec(cs[key].shape,
                           functools.partial(lambda nd, d, b: (0,) * nd,
                                             cs[key].ndim))
              for key in _CONST_KEYS]
    out = pl.pallas_call(
        functools.partial(_conv_kernel, n=n, sgn=(-1.0 if conj_k else 1.0),
                          skip=bias is not None),
        grid=(D, B),                         # b innermost: k-spectrum reuse
        in_specs=[
            pl.BlockSpec((1, 1, n1h, n2), lambda d, b: (b, d, 0, 0)),
            pl.BlockSpec((1, n1h, n2), lambda d, b: (d, 0, 0)),
            pl.BlockSpec((D, 1), lambda d, b: (0, 0)),
            *cspecs,
        ],
        out_specs=pl.BlockSpec((1, 1, n1h, n2), lambda d, b: (b, d, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, D, n1h, n2), u.dtype),
        scratch_shapes=[pltpu.VMEM((n2, n1), jnp.float32),
                        pltpu.VMEM((n2, n1), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(up, kp, bcol, *const_args)
    return out.reshape(B, D, L)


def _dk_call(g, u):
    """dk[d, tau] = sum_{b, t>=tau} g[b,d,t] u[b,d,t-tau] -> (D, L) fp32."""
    B, D, L = g.shape
    n = 2 * L
    n1, n2 = _split(n)
    n1h = n1 // 2
    gp = _plane_view(g, n1h, n2)
    up = _plane_view(u, n1h, n2)
    cs = _kernel_consts(n)
    const_args = [cs[key] for key in _CONST_KEYS]
    cspecs = [pl.BlockSpec(cs[key].shape,
                           functools.partial(lambda nd, d, b: (0,) * nd,
                                             cs[key].ndim))
              for key in _CONST_KEYS]
    out = pl.pallas_call(
        functools.partial(_dk_kernel, n=n, nb=B),
        grid=(D, B),                             # b innermost: sequential acc
        in_specs=[
            pl.BlockSpec((1, 1, n1h, n2), lambda d, b: (b, d, 0, 0)),
            pl.BlockSpec((1, 1, n1h, n2), lambda d, b: (b, d, 0, 0)),
            *cspecs,
        ],
        out_specs=pl.BlockSpec((1, n1h, n2), lambda d, b: (d, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((D, n1h, n2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n2, n1), jnp.float32),
                        pltpu.VMEM((n2, n1), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=_interpret(),
    )(gp, up, *const_args)
    return out.reshape(D, L)


@jax.custom_vjp
def spectral_causal_conv(u, k, bias):
    """y[b,d,t] = sum_{tau<=t} k[d,tau] u[b,d,t-tau] (+ bias[d] u), fused.

    u (B, D, L) any float dtype, k (D, L), bias (D,) or None.
    """
    return _conv_call(u, k, bias, conj_k=False)


def _spec_fwd(u, k, bias):
    return _conv_call(u, k, bias, conj_k=False), (u, k, bias)


def _spec_bwd(res, g):
    u, k, bias = res
    # du = correlation of g with k (+ bias g): the conv kernel with conj(K)
    du = _conv_call(g, k, bias, conj_k=True).astype(u.dtype)
    dk = _dk_call(g, u)
    dbias = None
    if bias is not None:
        # dbias[d] = sum_{b,t} g u = the tau=0 lag of the dk correlation —
        # already computed; no separate (B, D, L) reduction pass
        dbias = dk[:, 0].astype(bias.dtype)
    return du, dk.astype(k.dtype), dbias


spectral_causal_conv.defvjp(_spec_fwd, _spec_bwd)
