"""Op-level golden tests: window round-trips, masks, scan vs naive recurrence,
FFT conv vs direct convolution, flash attention vs reference (fwd + grad)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from long_context_biomedical_imaging_tpu.ops import (
    attention_reference, compute_shift_mask, depthwise_conv1d, fft_causal_conv,
    flash_attention, get_window_size, relative_position_index, selective_scan,
    selective_scan_chunked, selective_scan_reference, window_partition,
    window_reverse)


def test_window_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 3)).astype(np.float32))
    ws = (2, 4, 4)
    wins = window_partition(x, ws)
    assert wins.shape == (2 * 2 * 2 * 2, 32, 3)
    back = window_reverse(wins, ws, (2, 4, 8, 8))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_get_window_size_shrinks():
    ws, ss = get_window_size((2, 16, 16), (8, 8, 8), (4, 4, 4))
    assert ws == (2, 8, 8)
    assert ss == (0, 4, 4)


def test_shift_mask_zero_without_shift():
    m = compute_shift_mask((4, 8, 8), (2, 4, 4), (0, 0, 0))
    assert np.asarray(m).max() == 0 and np.asarray(m).min() == 0


def test_shift_mask_blocks_cross_region():
    m = np.asarray(compute_shift_mask((1, 8, 8), (1, 4, 4), (0, 2, 2)))
    assert m.shape == (4, 16, 16)
    assert (m == -100.0).any()
    # diagonal is always unmasked (a token attends to itself)
    for w in range(4):
        assert np.all(np.diag(m[w]) == 0)


def test_relative_position_index_bounds():
    idx = np.asarray(relative_position_index((2, 4, 4)))
    assert idx.shape == (32, 32)
    assert idx.min() >= 0 and idx.max() < 3 * 7 * 7
    # self-pairs share one index value
    assert len(set(np.diag(idx).tolist())) == 1


def test_selective_scan_matches_naive(rng):
    b, d, l, n = 2, 8, 33, 4
    u = jnp.asarray(rng.normal(size=(b, d, l)).astype(np.float32))
    delta = jnp.asarray(rng.normal(size=(b, d, l)).astype(np.float32))
    A = -jnp.exp(jnp.asarray(rng.normal(size=(d, n)).astype(np.float32)))
    B = jnp.asarray(rng.normal(size=(b, n, l)).astype(np.float32))
    C = jnp.asarray(rng.normal(size=(b, n, l)).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    db = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))

    ref = selective_scan_reference(u, delta, A, B, C, D, db)
    got = selective_scan(u, delta, A, B, C, D, db)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    got_c = selective_scan_chunked(u, delta, A, B, C, D, db, chunk=8)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_selective_scan_grad(rng):
    b, d, l, n = 1, 4, 16, 2
    u = jnp.asarray(rng.normal(size=(b, d, l)).astype(np.float32))
    delta = jnp.asarray(rng.normal(size=(b, d, l)).astype(np.float32))
    A = -jnp.exp(jnp.asarray(rng.normal(size=(d, n)).astype(np.float32)))
    B = jnp.asarray(rng.normal(size=(b, n, l)).astype(np.float32))
    C = jnp.asarray(rng.normal(size=(b, n, l)).astype(np.float32))

    f_scan = lambda u_: jnp.sum(selective_scan(u_, delta, A, B, C))
    f_ref = lambda u_: jnp.sum(selective_scan_reference(u_, delta, A, B, C))
    g_scan = jax.grad(f_scan)(u)
    g_ref = jax.grad(f_ref)(u)
    np.testing.assert_allclose(np.asarray(g_scan), np.asarray(g_ref), rtol=1e-4, atol=1e-4)


def test_fft_conv_matches_direct(rng):
    d, l = 3, 17
    u = jnp.asarray(rng.normal(size=(2, d, l)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(d, l)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    got = np.asarray(fft_causal_conv(u, k, bias))
    # direct causal convolution
    want = np.zeros((2, d, l), np.float32)
    un, kn = np.asarray(u), np.asarray(k)
    for t in range(l):
        for tau in range(t + 1):
            want[:, :, t] += un[:, :, t - tau] * kn[None, :, tau]
    want += un * np.asarray(bias)[None, :, None]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_depthwise_conv_same_and_causal(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 12)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    y_same = np.asarray(depthwise_conv1d(x, w, b, "same"))
    assert y_same.shape == (2, 4, 12)
    # torch F.conv1d(padding='same') equivalence via manual pad
    xn = np.pad(np.asarray(x), ((0, 0), (0, 0), (1, 1)))
    want = np.zeros((2, 4, 12), np.float32)
    for t in range(12):
        want[:, :, t] = (xn[:, :, t:t + 3] * np.asarray(w)[None]).sum(-1)
    want += np.asarray(b)[None, :, None]
    np.testing.assert_allclose(y_same, want, rtol=1e-5, atol=1e-5)

    y_causal = np.asarray(depthwise_conv1d(x, w, None, "causal"))
    xc = np.pad(np.asarray(x), ((0, 0), (0, 0), (2, 0)))
    want_c = np.zeros((2, 4, 12), np.float32)
    for t in range(12):
        want_c[:, :, t] = (xc[:, :, t:t + 3] * np.asarray(w)[None]).sum(-1)
    np.testing.assert_allclose(y_causal, want_c, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("l", [128, 300])
def test_flash_attention_matches_reference(rng, l):
    b, h, d = 2, 3, 32
    q = jnp.asarray(rng.normal(size=(b, h, l, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, l, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, l, d)).astype(np.float32))
    want = np.asarray(attention_reference(q, k, v))
    got = np.asarray(flash_attention(q, k, v, block_q=64, block_k=128))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_flash_attention_grads(rng):
    b, h, l, d = 1, 2, 160, 16
    q = jnp.asarray(rng.normal(size=(b, h, l, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, l, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, l, d)).astype(np.float32))

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, block_q=64, block_k=128)
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(attention_reference(q, k, v)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-3, atol=5e-3)


def test_flash_bwd_fused_matches_two_sweep(rng, monkeypatch):
    """The fused one-sweep backward must equal the two-kernel fallback."""
    from long_context_biomedical_imaging_tpu.ops import flash_attention
    fa = sys.modules[flash_attention.__module__]

    b, h, l, d = 1, 2, 160, 16
    q = jnp.asarray(rng.normal(size=(b, h, l, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, l, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, l, d)).astype(np.float32))

    def loss(q, k, v):
        o = fa.flash_attention(q, k, v, block_q=64, block_k=128)
        return jnp.sum(jnp.sin(o))

    assert fa._fused_bwd_group_blocks(d, 64, 128, 4) >= 3  # one group
    g_fused = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    # force gb == 1 -> three q-row groups with fp32 dk/dv partial sums
    budget = 14 * 1024 * 1024
    while fa._fused_bwd_group_blocks(d, 64, 128, 4) > 1:
        budget -= 64 * 1024
        monkeypatch.setattr(fa, "_FUSED_BWD_VMEM_BUDGET", budget)
    assert fa._fused_bwd_group_blocks(d, 64, 128, 4) == 1
    g_grouped = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    monkeypatch.setattr(fa, "_FUSED_BWD_VMEM_BUDGET", 0)
    g_split = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, g2, b_ in zip(g_fused, g_grouped, g_split):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)


def test_channel_minor_variants_match(rng):
    """Channel-minor conv/scan must equal the channel-major implementations."""
    import jax

    from long_context_biomedical_imaging_tpu.ops import (causal_long_conv_cm,
                                                         depthwise_conv1d_cm,
                                                         fft_causal_conv,
                                                         selective_scan_cm)

    # depthwise conv
    x = jnp.asarray(rng.normal(size=(2, 12, 16)).astype(np.float32))  # (b, L, D)
    w = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    for pad in ("same", "causal"):
        got = depthwise_conv1d_cm(x, w, b, pad)
        want = depthwise_conv1d(x.transpose(0, 2, 1), w, b, pad).transpose(0, 2, 1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    # causal long conv (direct path L=12 <= 64)
    k = jnp.asarray(rng.normal(size=(16, 12)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    got = causal_long_conv_cm(x, k, bias)
    want = fft_causal_conv(x.transpose(0, 2, 1), k, bias).transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    # channel-minor scan vs reference (incl. grads)
    bs, d, l, n = 2, 8, 20, 4
    u = jnp.asarray(rng.normal(size=(bs, l, d)).astype(np.float32))
    delta = jnp.asarray(rng.normal(size=(bs, l, d)).astype(np.float32))
    A = -jnp.exp(jnp.asarray(rng.normal(size=(d, n)).astype(np.float32)))
    B = jnp.asarray(rng.normal(size=(bs, l, n)).astype(np.float32))
    C = jnp.asarray(rng.normal(size=(bs, l, n)).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    got = selective_scan_cm(u, delta, A, B, C, D)
    want = selective_scan_reference(
        u.transpose(0, 2, 1), delta.transpose(0, 2, 1), A,
        B.transpose(0, 2, 1), C.transpose(0, 2, 1), D).transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    g1 = jax.grad(lambda u_: jnp.sum(selective_scan_cm(u_, delta, A, B, C, D)))(u)
    g2 = jax.grad(lambda u_: jnp.sum(selective_scan_reference(
        u_.transpose(0, 2, 1), delta.transpose(0, 2, 1), A,
        B.transpose(0, 2, 1), C.transpose(0, 2, 1), D)))(u)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)


def test_pallas_selective_scan_parity(rng):
    """Pallas windowed scan vs golden reference (fwd + all grads)."""
    from long_context_biomedical_imaging_tpu.ops.selective_scan_pallas import (
        selective_scan_pallas)

    bw, l, d, n = 24, 16, 8, 4
    u = jnp.asarray(rng.normal(size=(bw, l, d)).astype(np.float32))
    delta = jnp.asarray(rng.normal(size=(bw, l, d)).astype(np.float32))
    A = -jnp.exp(jnp.asarray(rng.normal(size=(d, n)).astype(np.float32)))
    B = jnp.asarray(rng.normal(size=(bw, l, n)).astype(np.float32))
    C = jnp.asarray(rng.normal(size=(bw, l, n)).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    db = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))

    def ref(u, delta, A, B, C):
        return selective_scan_reference(
            u.transpose(0, 2, 1), delta.transpose(0, 2, 1), A,
            B.transpose(0, 2, 1), C.transpose(0, 2, 1), D, db).transpose(0, 2, 1)

    got = selective_scan_pallas(u, delta, A, B, C, D, db)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(u, delta, A, B, C)),
                               rtol=1e-4, atol=1e-4)
    gp = jax.grad(lambda *a: jnp.sum(jnp.sin(selective_scan_pallas(*a, D, db))),
                  argnums=(0, 1, 2, 3, 4))(u, delta, A, B, C)
    gr = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                  argnums=(0, 1, 2, 3, 4))(u, delta, A, B, C)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_pallas_long_scan_parity(rng):
    """Blocked long-sequence scan (segments as rows + two-pass carry stitch)
    vs the golden reference: fwd + all grads. L=136 is deliberately NOT a
    multiple of SEG=64 (3 segments, last one padded) and b=2 checks the
    per-batch carry chains stay isolated."""
    from long_context_biomedical_imaging_tpu.ops.selective_scan_long import (
        selective_scan_long)

    b, l, d, n = 2, 136, 12, 4
    u = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
    delta = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
    A = -jnp.exp(jnp.asarray(rng.normal(size=(d, n)).astype(np.float32)))
    B = jnp.asarray(rng.normal(size=(b, l, n)).astype(np.float32))
    C = jnp.asarray(rng.normal(size=(b, l, n)).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    db = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))

    def ref(u, delta, A, B, C):
        return selective_scan_reference(
            u.transpose(0, 2, 1), delta.transpose(0, 2, 1), A,
            B.transpose(0, 2, 1), C.transpose(0, 2, 1), D, db).transpose(0, 2, 1)

    got = selective_scan_long(u, delta, A, B, C, D, db)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(u, delta, A, B, C)),
                               rtol=1e-4, atol=1e-4)
    gp = jax.grad(lambda *a: jnp.sum(jnp.sin(selective_scan_long(*a, D, db))),
                  argnums=(0, 1, 2, 3, 4))(u, delta, A, B, C)
    gr = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                  argnums=(0, 1, 2, 3, 4))(u, delta, A, B, C)
    for a, g_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(g_),
                                   rtol=1e-3, atol=5e-4)


@pytest.mark.slow
def test_pallas_long_scan_chunked_channels(rng):
    """Long scan with N*D over the single-chunk lane budget (n_j > 1) at the
    ViT-small mamba geometry ratios: fwd + grads vs the chunked XLA scan."""
    from long_context_biomedical_imaging_tpu.ops import selective_scan_long as ssl
    from long_context_biomedical_imaging_tpu.ops.selective_scan import (
        selective_scan_chunked)

    b, l, d, n = 1, 192, 160, 8                # N*D=1280 -> 2 channel chunks
    assert ssl._pick_chunk(n, d) < d
    u = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
    delta = jnp.asarray(rng.normal(size=(b, l, d)).astype(np.float32))
    A = -jnp.exp(jnp.asarray(rng.normal(size=(d, n)).astype(np.float32)))
    B = jnp.asarray(rng.normal(size=(b, l, n)).astype(np.float32))
    C = jnp.asarray(rng.normal(size=(b, l, n)).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    db = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))

    def ref(u, delta, A, B, C):
        return selective_scan_chunked(
            u.transpose(0, 2, 1), delta.transpose(0, 2, 1), A,
            B.transpose(0, 2, 1), C.transpose(0, 2, 1), D,
            delta_bias=db, chunk=64).transpose(0, 2, 1)

    got = ssl.selective_scan_long(u, delta, A, B, C, D, db)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(u, delta, A, B, C)),
                               rtol=1e-4, atol=1e-4)
    gp = jax.grad(lambda *a: jnp.sum(jnp.sin(
        ssl.selective_scan_long(*a, D, db))), argnums=(0, 1, 2, 3, 4))(
        u, delta, A, B, C)
    gr = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                  argnums=(0, 1, 2, 3, 4))(u, delta, A, B, C)
    for a, g_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(g_),
                                   rtol=1e-3, atol=5e-4)


def test_mamba_mixer_long_path_wiring(rng, monkeypatch):
    """The mixer's full-sequence long-scan branch (TPU-only by default) must
    produce the same output as the chunked-XLA branch it replaces — catches
    wiring bugs (layout/argument order) that op-level parity can't see."""
    from long_context_biomedical_imaging_tpu.models import mamba as M

    mixer = M.MambaVisionMixer(d_model=8, d_state=4, d_conv=3, expand=1)
    x = jnp.asarray(rng.normal(size=(1, 1088, 8)).astype(np.float32))
    vs = mixer.init(jax.random.PRNGKey(0), x)
    ref = mixer.apply(vs, x)                    # CPU gate false -> chunked XLA
    monkeypatch.setattr(M, "_use_long_scan", lambda *a: True)
    got = mixer.apply(vs, x)                    # forced long-kernel branch
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_selective_scan_chunked_channels(rng):
    """Channel-chunked grid (N*D over the 1024-lane single-chunk budget, with
    uneven chunks forcing channel padding): fwd + all grads vs reference."""
    from long_context_biomedical_imaging_tpu.ops import selective_scan_pallas as ssp

    bw, l, d, n = 16, 8, 40, 64                 # dc_max=16 -> 3 chunks of 14
    assert ssp._pick_chunk(n, d) < d
    u = jnp.asarray(rng.normal(size=(bw, l, d)).astype(np.float32))
    delta = jnp.asarray(rng.normal(size=(bw, l, d)).astype(np.float32))
    A = -jnp.exp(jnp.asarray(rng.normal(size=(d, n)).astype(np.float32)))
    B = jnp.asarray(rng.normal(size=(bw, l, n)).astype(np.float32))
    C = jnp.asarray(rng.normal(size=(bw, l, n)).astype(np.float32))
    D = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    db = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))

    def ref(u, delta, A, B, C):
        return selective_scan_reference(
            u.transpose(0, 2, 1), delta.transpose(0, 2, 1), A,
            B.transpose(0, 2, 1), C.transpose(0, 2, 1), D, db).transpose(0, 2, 1)

    got = ssp.selective_scan_pallas(u, delta, A, B, C, D, db)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(u, delta, A, B, C)),
                               rtol=1e-4, atol=1e-4)
    gp = jax.grad(lambda *a: jnp.sum(jnp.sin(
        ssp.selective_scan_pallas(*a, D, db))), argnums=(0, 1, 2, 3, 4))(
        u, delta, A, B, C)
    gr = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                  argnums=(0, 1, 2, 3, 4))(u, delta, A, B, C)
    for a, b in zip(gp, gr):
        # slightly looser than the unchunked test: the base-2 decay
        # (exp2(delta*A*log2e)) adds one fp32 rounding to the recurrence
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-4)


@pytest.mark.slow
def test_hyena_window_fused_parity(rng):
    """Fused Pallas hyena mixer == composed in_proj/conv/gates/longconv/out_proj
    (fp32; interpret mode on the CPU mesh)."""
    from long_context_biomedical_imaging_tpu.ops.conv import depthwise_conv1d_cm
    from long_context_biomedical_imaging_tpu.ops.fftconv import causal_long_conv_cm
    from long_context_biomedical_imaging_tpu.ops.hyena_window import (
        hyena_window_mixer, hyena_window_supported)

    assert hyena_window_supported(16) and not hyena_window_supported(512)
    # chunked-Toeplitz surface: V%64==0 up to 512 when channels fit VMEM
    assert hyena_window_supported(512, 96) and hyena_window_supported(128, 192)
    assert not hyena_window_supported(512, 384)   # deep stages stay composed
    assert not hyena_window_supported(96, 96)     # not chunk-aligned

    BW, V, C, K = 16, 16, 24, 5

    def mk(shape, scale=0.3):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)

    x = mk((BW, V, C), 1.0)
    w_in, b_in = mk((C, 3 * C)), mk((3 * C,))
    w_short, b_short = mk((3 * C, K)), mk((3 * C,))
    k_long, b_long = mk((C, V)), mk((C,))
    w_out, b_out = mk((C, C)), mk((C,))
    args = (x, w_in, b_in, w_short, b_short, k_long, b_long, w_out, b_out)

    def composed(x, w_in, b_in, w_short, b_short, k_long, b_long, w_out, b_out):
        z = (x.reshape(-1, C) @ w_in + b_in).reshape(BW, V, 3 * C)
        z = depthwise_conv1d_cm(z, w_short, b_short, padding="causal")
        x1, x2, v = z[..., :C], z[..., C:2 * C], z[..., 2 * C:]
        v = causal_long_conv_cm(v * x1, k_long, b_long) * x2
        return (v.reshape(-1, C) @ w_out + b_out).reshape(BW, V, C)

    out_f = hyena_window_mixer(*args)
    out_c = composed(*args)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_c),
                               rtol=2e-5, atol=2e-5)

    loss_f = lambda *a: jnp.sum(hyena_window_mixer(*a) ** 2)
    loss_c = lambda *a: jnp.sum(composed(*a) ** 2)
    gf = jax.grad(loss_f, argnums=tuple(range(9)))(*args)
    gc = jax.grad(loss_c, argnums=tuple(range(9)))(*args)
    for a, b in zip(gf, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)

    # ln variant: x + mixer(LN(x)) in one kernel == composed LN + mixer + add
    ln_s, ln_b = mk((C,), 1.0), mk((C,), 0.2)

    def composed_ln(x, ln_s, ln_b, *rest):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
        y = (x - mu) * jax.lax.rsqrt(var + 1e-6) * ln_s + ln_b
        return x + composed(y, *rest)

    def fused_ln(x, ln_s, ln_b, *rest):
        (w_in, b_in, w_short, b_short, k_long, b_long, w_out, b_out) = rest
        return hyena_window_mixer(x, w_in, b_in, w_short, b_short, k_long,
                                  b_long, w_out, b_out,
                                  ln_scale=ln_s, ln_bias=ln_b)

    args_ln = (x, ln_s, ln_b) + args[1:]
    np.testing.assert_allclose(np.asarray(fused_ln(*args_ln)),
                               np.asarray(composed_ln(*args_ln)),
                               rtol=2e-5, atol=2e-5)
    gf = jax.grad(lambda *a: jnp.sum(fused_ln(*a) ** 2),
                  argnums=tuple(range(11)))(*args_ln)
    gc = jax.grad(lambda *a: jnp.sum(composed_ln(*a) ** 2),
                  argnums=tuple(range(11)))(*args_ln)
    for a, b in zip(gf, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_hyena_window_chunked_parity(rng):
    """Chunked-Toeplitz fused mixer (V > 64: long conv as block-Toeplitz MXU
    matmuls) == composed path, values and gradients incl. the implicit-filter
    gradient through the differentiable M build (fp32, interpret on CPU).
    Ref call sites: backbone_swin.py:315-332 at window_volume 512 (cmr/emb)."""
    from long_context_biomedical_imaging_tpu.ops.conv import depthwise_conv1d_cm
    from long_context_biomedical_imaging_tpu.ops.fftconv import causal_long_conv_cm
    from long_context_biomedical_imaging_tpu.ops.hyena_window import (
        hyena_window_mixer)

    BW, V, C, K = 5, 128, 16, 5   # BW=5 also exercises row-block padding

    def mk(shape, scale=0.3):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)

    x = mk((BW, V, C), 1.0)
    args = (x, mk((C, 3 * C)), mk((3 * C,)), mk((3 * C, K)), mk((3 * C,)),
            mk((C, V)), mk((C,)), mk((C, C)), mk((C,)))

    def composed(x, w_in, b_in, w_short, b_short, k_long, b_long, w_out, b_out):
        z = (x.reshape(-1, C) @ w_in + b_in).reshape(BW, V, 3 * C)
        z = depthwise_conv1d_cm(z, w_short, b_short, padding="causal")
        x1, x2, v = z[..., :C], z[..., C:2 * C], z[..., 2 * C:]
        v = causal_long_conv_cm(v * x1, k_long, b_long) * x2
        return (v.reshape(-1, C) @ w_out + b_out).reshape(BW, V, C)

    np.testing.assert_allclose(np.asarray(hyena_window_mixer(*args)),
                               np.asarray(composed(*args)),
                               rtol=2e-5, atol=2e-5)
    gf = jax.grad(lambda *a: jnp.sum(hyena_window_mixer(*a) ** 2),
                  argnums=tuple(range(9)))(*args)
    gc = jax.grad(lambda *a: jnp.sum(composed(*a) ** 2),
                  argnums=tuple(range(9)))(*args)
    for a, b in zip(gf, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_hyena_window_chunked_ln_parity(rng):
    """ln variant of the chunked kernel: x + mixer(LN(x)) fused == composed
    (split out of the base parity test: the extra interpret-mode grad pair
    costs ~20s on CPU)."""
    from long_context_biomedical_imaging_tpu.ops.conv import depthwise_conv1d_cm
    from long_context_biomedical_imaging_tpu.ops.fftconv import causal_long_conv_cm
    from long_context_biomedical_imaging_tpu.ops.hyena_window import (
        hyena_window_mixer)

    BW, V, C, K = 5, 128, 16, 5

    def mk(shape, scale=0.3):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)

    x = mk((BW, V, C), 1.0)
    args = (x, mk((C, 3 * C)), mk((3 * C,)), mk((3 * C, K)), mk((3 * C,)),
            mk((C, V)), mk((C,)), mk((C, C)), mk((C,)))

    def composed(x, w_in, b_in, w_short, b_short, k_long, b_long, w_out, b_out):
        z = (x.reshape(-1, C) @ w_in + b_in).reshape(BW, V, 3 * C)
        z = depthwise_conv1d_cm(z, w_short, b_short, padding="causal")
        x1, x2, v = z[..., :C], z[..., C:2 * C], z[..., 2 * C:]
        v = causal_long_conv_cm(v * x1, k_long, b_long) * x2
        return (v.reshape(-1, C) @ w_out + b_out).reshape(BW, V, C)

    ln_s, ln_b = mk((C,), 1.0), mk((C,), 0.2)

    def composed_ln(x, ln_s, ln_b, *rest):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
        y = (x - mu) * jax.lax.rsqrt(var + 1e-6) * ln_s + ln_b
        return x + composed(y, *rest)

    out_fl = hyena_window_mixer(*args, ln_scale=ln_s, ln_bias=ln_b)
    np.testing.assert_allclose(np.asarray(out_fl),
                               np.asarray(composed_ln(x, ln_s, ln_b, *args[1:])),
                               rtol=2e-5, atol=2e-5)
    gfl = jax.grad(lambda x_, s_, b_: jnp.sum(hyena_window_mixer(
        x_, *args[1:], ln_scale=s_, ln_bias=b_) ** 2), argnums=(0, 1, 2))(
        x, ln_s, ln_b)
    gcl = jax.grad(lambda x_, s_, b_: jnp.sum(
        composed_ln(x_, s_, b_, *args[1:]) ** 2), argnums=(0, 1, 2))(
        x, ln_s, ln_b)
    for a, b in zip(gfl, gcl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_fused_mlp_parity(rng):
    """Fused Pallas MLP == Dense/gelu/Dense (fp32, interpret on CPU)."""
    from long_context_biomedical_imaging_tpu.ops.fused_mlp import fused_mlp

    N, C, H = 48, 24, 96

    def mk(shape, scale=0.5):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)

    x, w1, b1, w2, b2 = mk((N, C), 1.0), mk((C, H)), mk((H,)), mk((H, C)), mk((C,))

    def composed(x, w1, b1, w2, b2):
        h = jax.nn.gelu(x @ w1 + b1, approximate=False)
        return h @ w2 + b2

    np.testing.assert_allclose(np.asarray(fused_mlp(x, w1, b1, w2, b2)),
                               np.asarray(composed(x, w1, b1, w2, b2)),
                               rtol=2e-5, atol=2e-5)

    gf = jax.grad(lambda *a: jnp.sum(fused_mlp(*a) ** 2), argnums=(0, 1, 2, 3, 4))(
        x, w1, b1, w2, b2)
    gc = jax.grad(lambda *a: jnp.sum(composed(*a) ** 2), argnums=(0, 1, 2, 3, 4))(
        x, w1, b1, w2, b2)
    for a, b in zip(gf, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_fused_ln_mlp_residual_parity(rng):
    """Fused LN+MLP+residual == LayerNorm -> Dense/gelu/Dense -> add
    (fp32, interpret on CPU), values and grads incl. the LN affine."""
    from long_context_biomedical_imaging_tpu.ops.fused_mlp import (
        fused_ln_mlp_residual)

    N, C, H = 48, 24, 96

    def mk(shape, scale=0.5):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)

    x = mk((N, C), 1.0)
    g = mk((C,)) + 1.0
    bln = mk((C,))
    w1, b1, w2, b2 = mk((C, H)), mk((H,)), mk((H, C)), mk((C,))

    def composed(x, g, bln, w1, b1, w2, b2):
        mu = x.mean(axis=-1, keepdims=True)
        var = (x * x).mean(axis=-1, keepdims=True) - mu * mu
        y = (x - mu) * jax.lax.rsqrt(var + 1e-6) * g + bln
        h = jax.nn.gelu(y @ w1 + b1, approximate=False)
        return x + (h @ w2 + b2)

    args = (x, g, bln, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(fused_ln_mlp_residual(*args)),
                               np.asarray(composed(*args)),
                               rtol=2e-5, atol=2e-5)

    gf = jax.grad(lambda *a: jnp.sum(fused_ln_mlp_residual(*a) ** 2),
                  argnums=tuple(range(7)))(*args)
    gc = jax.grad(lambda *a: jnp.sum(composed(*a) ** 2),
                  argnums=tuple(range(7)))(*args)
    for a, b in zip(gf, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_mamba_window_fused_parity(rng):
    """Fused Pallas mamba mixer == composed in_proj/conv/x_proj/scan/out_proj
    (fp32; interpret mode on the CPU mesh)."""
    from long_context_biomedical_imaging_tpu.ops.conv import depthwise_conv1d_cm
    from long_context_biomedical_imaging_tpu.ops.mamba_window import (
        mamba_window_mixer, mamba_window_supported)
    from long_context_biomedical_imaging_tpu.ops.selective_scan import (
        selective_scan_cm)

    assert mamba_window_supported(16) and not mamba_window_supported(512)
    assert not mamba_window_supported(8)   # conv scratch margin needs V >= 16

    BW, V, C, N = 16, 16, 24, 4
    Dh, R = C // 2, 3

    def mk(shape, scale=0.3):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)

    x = mk((BW, V, C), 1.0)
    w_xz, wx, wz = mk((C, C)), mk((Dh, 3)), mk((Dh, 3))
    w_dbl, w_dt = mk((Dh, R + 2 * N)), mk((R, Dh))
    dt_bias = mk((Dh,), 0.1)
    A = -jnp.exp(mk((Dh, N)))
    D = mk((Dh,), 1.0)
    w_out = mk((C, C))
    args = (x, w_xz, wx, wz, w_dbl, w_dt, dt_bias, A, D, w_out)

    def composed(x, w_xz, wx, wz, w_dbl, w_dt, dt_bias, A, D, w_out):
        xz = (x.reshape(-1, C) @ w_xz).reshape(BW, V, C)
        xz = jax.nn.silu(depthwise_conv1d_cm(
            xz, jnp.concatenate([wx, wz], axis=0), None, "same"))
        xs, z = xz[..., :Dh], xz[..., Dh:]
        dbl = (xs.reshape(-1, Dh) @ w_dbl).reshape(BW, V, R + 2 * N)
        dt = (dbl[..., :R] @ w_dt) + dt_bias
        y = selective_scan_cm(xs, dt, A, dbl[..., R:R + N], dbl[..., R + N:],
                              D, delta_bias=dt_bias, delta_softplus=True)
        yz = jnp.concatenate([y, z], axis=-1)
        return (yz.reshape(-1, C) @ w_out).reshape(BW, V, C)

    out_f = mamba_window_mixer(*args, d_state=N)
    out_c = composed(*args)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_c),
                               rtol=3e-5, atol=3e-5)

    gf = jax.grad(lambda *a: jnp.sum(mamba_window_mixer(*a, d_state=N) ** 2),
                  argnums=tuple(range(10)))(*args)
    gc = jax.grad(lambda *a: jnp.sum(composed(*a) ** 2),
                  argnums=tuple(range(10)))(*args)
    for a, b in zip(gf, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)

    # ln variant: x + mixer(LN(x)) in one kernel == composed LN + mixer + add
    ln_s, ln_b = mk((C,), 1.0), mk((C,), 0.2)

    def composed_ln(x, ln_s, ln_b, *rest):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu
        y = (x - mu) * jax.lax.rsqrt(var + 1e-6) * ln_s + ln_b
        return x + composed(y, *rest)

    def fused_ln(x, ln_s, ln_b, *rest):
        return mamba_window_mixer(x, *rest, d_state=N,
                                  ln_scale=ln_s, ln_bias=ln_b)

    args_ln = (x, ln_s, ln_b) + args[1:]
    np.testing.assert_allclose(np.asarray(fused_ln(*args_ln)),
                               np.asarray(composed_ln(*args_ln)),
                               rtol=3e-5, atol=3e-5)
    gf = jax.grad(lambda *a: jnp.sum(fused_ln(*a) ** 2),
                  argnums=tuple(range(12)))(*args_ln)
    gc = jax.grad(lambda *a: jnp.sum(composed_ln(*a) ** 2),
                  argnums=tuple(range(12)))(*args_ln)
    for a, b in zip(gf, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_toeplitz_conv_custom_vjp(rng):
    """_toeplitz_conv_cm's custom VJP (r5: dk via chunk-lag dots instead of
    the gather build's scatter-add transpose) == plain-XLA autodiff of the
    gather-built einsum, at chunk-divisible AND padded lengths.
    (Ref op being replaced: hyena.py:32-51 long conv backward.)"""
    from long_context_biomedical_imaging_tpu.ops.fftconv import (
        _toeplitz_conv_cm)

    for (B, L, D) in ((3, 96, 8), (2, 320, 8)):
        u = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(D, L)).astype(np.float32) * 0.2)

        def ref(u, k):
            idx = np.arange(L)[:, None] - np.arange(L)[None, :]
            Tm = jnp.where(jnp.asarray(idx >= 0)[..., None],
                           k.T[jnp.asarray(np.clip(idx, 0, L - 1))], 0.0)
            return jnp.einsum("bsc,tsc->btc", u, Tm)

        f = lambda u, k: jnp.sum(jnp.sin(_toeplitz_conv_cm(u, k)))
        fr = lambda u, k: jnp.sum(jnp.sin(ref(u, k)))
        np.testing.assert_allclose(f(u, k), fr(u, k), rtol=1e-5)
        gu, gk = jax.grad(f, argnums=(0, 1))(u, k)
        ru, rk = jax.grad(fr, argnums=(0, 1))(u, k)
        np.testing.assert_allclose(np.asarray(gu), np.asarray(ru),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(rk),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_mamba_window_fused_parity_multichunk(rng):
    """Fused mamba mixer at a MULTI-chunk state split (Dh > 1024/N -> n_j=2):
    covers the r5 last-chunk scan-scratch reuse in the backward, which only
    changes behavior when n_j > 1 (the bwd chunk loop runs in reverse and
    skips one chunk_fwd; ops/mamba_window.py)."""
    from long_context_biomedical_imaging_tpu.ops.conv import depthwise_conv1d_cm
    from long_context_biomedical_imaging_tpu.ops.mamba_window import (
        _pick_chunk, mamba_window_mixer)
    from long_context_biomedical_imaging_tpu.ops.selective_scan import (
        selective_scan_cm)

    BW, V, C, N = 8, 16, 288, 8
    Dh, R = C // 2, 3
    assert -(-Dh // _pick_chunk(N, Dh)) == 2   # the shape must exercise n_j=2

    def mk(shape, scale=0.3):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)

    x = mk((BW, V, C), 1.0)
    w_xz, wx, wz = mk((C, C), 0.1), mk((Dh, 3)), mk((Dh, 3))
    w_dbl, w_dt = mk((Dh, R + 2 * N), 0.1), mk((R, Dh), 0.1)
    dt_bias = mk((Dh,), 0.1)
    A = -jnp.exp(mk((Dh, N)))
    D = mk((Dh,), 1.0)
    w_out = mk((C, C), 0.1)
    args = (x, w_xz, wx, wz, w_dbl, w_dt, dt_bias, A, D, w_out)

    def composed(x, w_xz, wx, wz, w_dbl, w_dt, dt_bias, A, D, w_out):
        xz = (x.reshape(-1, C) @ w_xz).reshape(BW, V, C)
        xz = jax.nn.silu(depthwise_conv1d_cm(
            xz, jnp.concatenate([wx, wz], axis=0), None, "same"))
        xs, z = xz[..., :Dh], xz[..., Dh:]
        dbl = (xs.reshape(-1, Dh) @ w_dbl).reshape(BW, V, R + 2 * N)
        dt = (dbl[..., :R] @ w_dt) + dt_bias
        y = selective_scan_cm(xs, dt, A, dbl[..., R:R + N], dbl[..., R + N:],
                              D, delta_bias=dt_bias, delta_softplus=True)
        yz = jnp.concatenate([y, z], axis=-1)
        return (yz.reshape(-1, C) @ w_out).reshape(BW, V, C)

    np.testing.assert_allclose(
        np.asarray(mamba_window_mixer(*args, d_state=N)),
        np.asarray(composed(*args)), rtol=3e-5, atol=3e-5)
    gf = jax.grad(lambda *a: jnp.sum(mamba_window_mixer(*a, d_state=N) ** 2),
                  argnums=tuple(range(10)))(*args)
    gc = jax.grad(lambda *a: jnp.sum(composed(*a) ** 2),
                  argnums=tuple(range(10)))(*args)
    for a, b in zip(gf, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_fused_kernel_dispatch():
    """The fused Pallas mixers must actually engage at the workload shapes
    (and stay off where the composed paths are faster/required)."""
    from long_context_biomedical_imaging_tpu.ops.hyena_window import (
        hyena_window_supported)
    from long_context_biomedical_imaging_tpu.ops.mamba_window import (
        mamba_window_supported)
    from long_context_biomedical_imaging_tpu.ops.window_attention import (
        MAX_TOKENS, pick_group, _round_up)

    # ptx/micro (w4 -> V=16), vessel/abct (w8/w4-3D -> V=64)
    for v in (16, 64):
        assert hyena_window_supported(v)
        assert mamba_window_supported(v)
    # cmr/emb windows (V=512) stay on the XLA/FFT paths for the mixers...
    assert not hyena_window_supported(512)
    assert not mamba_window_supported(512)
    # ...but windowed ATTENTION covers V=512 as one T=512 block
    assert _round_up(pick_group(512) * 512, 128) <= MAX_TOKENS
    # auto-shrunk degenerate windows fall back to composed
    assert not hyena_window_supported(1)
    assert not mamba_window_supported(4)


def test_fft_conv_custom_vjp_grads(rng):
    """The FFT branch's analytic VJP == autodiff through the direct conv."""
    from long_context_biomedical_imaging_tpu.ops.fftconv import (
        _DIRECT_CONV_MAX_LEN, fft_causal_conv)

    B, C, L = 3, 5, 48
    u = jnp.asarray(rng.normal(size=(B, C, L)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(C, L)).astype(np.float32) * 0.3)
    bias = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.3)

    def naive(u, k, bias):
        y = jnp.stack([
            jnp.stack([
                jnp.convolve(u[b, c], k[c], mode="full")[:L]
                for c in range(C)]) for b in range(B)])
        return y + u * bias[None, :, None]

    def loss_fft(u, k, bias):
        # force the FFT branch regardless of length
        from long_context_biomedical_imaging_tpu.ops import fftconv
        y32 = fftconv._fft_conv_core(u, k) + u * bias[None, :, None]
        return jnp.sum(y32 ** 2)

    def loss_naive(u, k, bias):
        return jnp.sum(naive(u, k, bias) ** 2)

    np.testing.assert_allclose(float(loss_fft(u, k, bias)),
                               float(loss_naive(u, k, bias)), rtol=1e-5)
    gf = jax.grad(loss_fft, argnums=(0, 1, 2))(u, k, bias)
    gn = jax.grad(loss_naive, argnums=(0, 1, 2))(u, k, bias)
    for a, b in zip(gf, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_matmul_fft_conv_matches_xla_fft(rng):
    """The Cooley-Tukey matmul-FFT path (power-of-two 2L: DFT stages as MXU
    matmuls in scrambled order) == the jnp.fft reference, values and the
    analytic VJP. Covers the 16k-66k ViT hyena lengths' algorithm at a
    CI-sized L (ref: model/models/hyena.py:32-51, backbone_vit.py:172)."""
    from long_context_biomedical_imaging_tpu.ops import fftconv as fc

    assert fc._fft_factors(131072) == [64, 64, 32]   # 66k-token geometry
    assert fc._fft_factors(4608) is None             # non-pow2 -> jnp.fft

    B, C, L = 2, 5, 1024                              # 2L = 2048 = [16,16,8]
    assert fc._fft_factors(2 * L) is not None
    u = jnp.asarray(rng.normal(size=(B, C, L)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(C, L)).astype(np.float32) * 0.3)
    n = 2 * L

    def ref(u, k):
        return jnp.fft.irfft(jnp.fft.rfft(u, n=n) * jnp.fft.rfft(k, n=n),
                             n=n)[..., :L]

    y_mm = fc._fft_conv_core(u, k)
    y_ref = ref(u, k)
    np.testing.assert_allclose(np.asarray(y_mm), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)

    g = jnp.asarray(rng.normal(size=u.shape).astype(np.float32))
    du, dk = fc._fft_conv_bwd((u, k), g)
    du_r, dk_r = jax.grad(lambda a, b: jnp.sum(ref(a, b) * g),
                          argnums=(0, 1))(u, k)
    np.testing.assert_allclose(np.asarray(du), np.asarray(du_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r),
                               rtol=1e-4, atol=2e-4)


def test_matmul_fft_consts_survive_cross_trace_reuse(rng):
    """Regression: _dft_consts/_twiddle_consts must cache NUMPY, not jnp —
    array creation inside the custom_vjp trace of _fft_conv_core yields
    tracers, and a cached tracer reused by a LATER trace (e.g. model.init
    populates the cache, the train step hits it) raised
    UnexpectedTracerError on every ViT-hyena config whose first FFT ran
    under a different jit than the second."""
    from long_context_biomedical_imaging_tpu.ops import fftconv as fc

    fc._dft_consts.cache_clear()
    fc._twiddle_consts.cache_clear()
    u = jnp.asarray(rng.normal(size=(2, 3, 1024)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 1024)).astype(np.float32) * 0.1)
    y1 = jax.jit(fc.fft_causal_conv)(u, k)                 # populates caches
    y2 = jax.jit(lambda a, b: fc.fft_causal_conv(a, b) + 0.0)(u, k)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5,
                               atol=1e-5)
    for cached in (fc._dft_consts(16, -1.0) + fc._twiddle_consts(16, 128,
                                                                 2048, -1.0)):
        assert isinstance(cached, np.ndarray)


def test_toeplitz_long_conv_matches_fft(rng):
    """The Toeplitz-matmul mid-length branch == the FFT path (fp32)."""
    from long_context_biomedical_imaging_tpu.ops.fftconv import (
        _toeplitz_conv_cm, fft_causal_conv)

    B, L, D = 4, 128, 8
    u = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(D, L)).astype(np.float32) * 0.2)
    y_t = _toeplitz_conv_cm(u, k)
    y_f = fft_causal_conv(u.transpose(0, 2, 1), k).transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(y_t), np.asarray(y_f),
                               rtol=2e-4, atol=2e-4)
    gt = jax.grad(lambda u, k: jnp.sum(_toeplitz_conv_cm(u, k) ** 2),
                  argnums=(0, 1))(u, k)
    gf = jax.grad(lambda u, k: jnp.sum(
        fft_causal_conv(u.transpose(0, 2, 1), k).transpose(0, 2, 1) ** 2),
        argnums=(0, 1))(u, k)
    for a, b in zip(gt, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_resize_conv_matches_composed(rng):
    """resize_conv (coarse-grid composition of linear_resize -> conv) must
    equal the materialized resize followed by a zero-padded conv, exactly,
    including interpolation clamping and conv border padding."""
    import jax.lax as lax

    from long_context_biomedical_imaging_tpu.models.resize import (
        linear_resize, resize_conv)

    for rank, cin, cout, in_sz, out_sz in (
            (2, 5, 3, (7, 9), (14, 18)),      # exact 2x
            (2, 4, 1, (6, 5), (17, 13)),      # non-integer ratios, 1 class
            (3, 6, 4, (4, 5, 6), (8, 10, 12))):
        x = jnp.asarray(rng.normal(size=(2, *in_sz, cin)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3,) * rank + (cin, cout))
                        .astype(np.float32) * 0.3)
        b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))

        def composed(x, k, b):
            up = linear_resize(x, out_sz, align_corners=False)
            dn = lax.conv_dimension_numbers(
                up.shape, k.shape,
                ("NHWC", "HWIO", "NHWC") if rank == 2
                else ("NDHWC", "DHWIO", "NDHWC"))
            y = lax.conv_general_dilated(up, k, (1,) * rank,
                                         [(1, 1)] * rank, dimension_numbers=dn)
            return y + b

        out_f = resize_conv(x, k, b, out_sz, align_corners=False)
        out_c = composed(x, k, b)
        assert out_f.shape == out_c.shape
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_c),
                                   rtol=2e-4, atol=2e-4)

        gf = jax.grad(lambda *a: jnp.sum(
            resize_conv(*a, out_sz, align_corners=False) ** 2),
            argnums=(0, 1, 2))(x, k, b)
        gc = jax.grad(lambda *a: jnp.sum(composed(*a) ** 2),
                      argnums=(0, 1, 2))(x, k, b)
        for a_, b_ in zip(gf, gc):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                       rtol=2e-3, atol=2e-3)


def test_spectral_conv_matches_fft(rng):
    """The fused Pallas spectral conv == the fp32 XLA FFT path (forward),
    within the bf16-matmul regime of the kernel's DFT stages."""
    from long_context_biomedical_imaging_tpu.ops.fftconv import _fft_conv_core
    from long_context_biomedical_imaging_tpu.ops.spectral_conv import (
        spectral_causal_conv)

    B, D, L = 2, 4, 1024
    u = jnp.asarray(rng.normal(size=(B, D, L)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(D, L))
                     * np.exp(-np.arange(L) / 200.0)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    y = spectral_causal_conv(u, k, bias)
    ref = _fft_conv_core(u, k) + u * bias[:, None]
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=0.02 * scale, rtol=0.05)
    # no-bias variant (custom_vjp None leaf)
    y0 = spectral_causal_conv(u, k, None)
    ref0 = _fft_conv_core(u, k)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(ref0),
                               atol=0.02 * float(jnp.max(jnp.abs(ref0))),
                               rtol=0.05)


def test_spectral_conv_grads_match(rng):
    """Analytic VJP (conj-spectrum correlation + batch-accumulated dk kernel)
    vs autodiff through the fp32 XLA FFT; B=3 exercises the odd-batch
    accumulation path of the dk kernel."""
    from long_context_biomedical_imaging_tpu.ops.fftconv import _fft_conv_core
    from long_context_biomedical_imaging_tpu.ops.spectral_conv import (
        spectral_causal_conv)

    B, D, L = 3, 4, 512
    u = jnp.asarray(rng.normal(size=(B, D, L)).astype(np.float32))
    k = jnp.asarray((rng.normal(size=(D, L))
                     * np.exp(-np.arange(L) / 100.0)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))

    def loss_s(u, k, b):
        return jnp.sum(jnp.sin(spectral_causal_conv(u, k, b)))

    def loss_r(u, k, b):
        return jnp.sum(jnp.sin(_fft_conv_core(u, k) + u * b[:, None]))

    gs = jax.grad(loss_s, argnums=(0, 1, 2))(u, k, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(u, k, bias)
    for a, b in zip(gs, gr):
        a = np.asarray(a, np.float64).ravel()
        b = np.asarray(b, np.float64).ravel()
        cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.995, f"gradient direction off: cos={cos}"
        rel = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)
        assert rel < 0.08, f"gradient rel l2 {rel}"


def test_flash_bwd_grouped_non_divisible_kv(rng, monkeypatch):
    """kv lengths whose padded block is not a multiple of the fused backward's
    k block must not drop tail key blocks (review regression: block_k=1536
    with bkf=1024 floored n_kf and silently truncated dk/dv/dq)."""
    from long_context_biomedical_imaging_tpu.ops import flash_attention
    fa = sys.modules[flash_attention.__module__]

    d = 64
    q = jnp.asarray(rng.normal(size=(1, 2, 1536, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 1536, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, 1536, d)).astype(np.float32))
    monkeypatch.setattr(fa, "_FUSED_BWD_BLOCK_K", 1024)

    def loss(q, k, v):
        o = fa.flash_attention(q, k, v, block_q=512, block_k=1536)
        return jnp.sum(jnp.sin(o))

    g_fused = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    monkeypatch.setattr(fa, "_FUSED_BWD_VMEM_BUDGET", 0)   # two-sweep ref
    g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_fft_causal_conv_dispatches_spectral(rng, monkeypatch):
    """The fft_causal_conv dispatch gate routes 3D power-of-two lengths to the
    spectral kernel (bf16 input, the AMP production path), and the result
    matches the fp32 XLA FFT within the kernel's bf16 regime."""
    from long_context_biomedical_imaging_tpu.ops import fftconv, spectral_conv

    monkeypatch.setattr(spectral_conv, "SPECTRAL_MIN_LEN", 1024)
    calls = []
    orig = spectral_conv.spectral_causal_conv

    def spy(u, k, bias):
        calls.append(u.shape)
        return orig(u, k, bias)

    monkeypatch.setattr(fftconv, "spectral_causal_conv", spy)
    B, D, L = 2, 4, 1024
    u = jnp.asarray(rng.normal(size=(B, D, L)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    k = jnp.asarray((rng.normal(size=(D, L))
                     * np.exp(-np.arange(L) / 200.0)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    y = fftconv.fft_causal_conv(u, k, bias)
    assert calls == [(B, D, L)], "spectral kernel was not dispatched"
    assert y.dtype == jnp.bfloat16
    ref = fftconv._fft_conv_core(u.astype(jnp.float32), k) \
        + u.astype(jnp.float32) * bias[:, None]
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(ref),
                               atol=0.03 * scale, rtol=0.1)
    # below the floor the old paths stay in charge
    calls.clear()
    u_small = u[..., :512]
    fftconv.fft_causal_conv(u_small, k[:, :512], bias)
    assert not calls
