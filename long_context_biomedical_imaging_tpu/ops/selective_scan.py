"""Selective scan (Mamba SSM recurrence) for TPU.

TPU-native replacement for the mamba-ssm CUDA `selective_scan_fn`
(ref: model/models/mamba.py:26,125-134). Semantics match the CUDA kernel:

    delta = softplus(delta + delta_bias)          (if delta_softplus)
    hbar[t] = exp(delta[t] * A) * hbar[t-1] + delta[t] * B[t] * u[t]
    y[t]    = C[t] . hbar[t] + D * u[t]

Two implementations:
  * `selective_scan` — `jax.lax.associative_scan` over the L axis. O(L) work,
    log-depth, fully differentiable through JAX AD. Materializes the
    (B, D, L, N) discretized state tensor, so it's the right choice for the
    windowed (Swin) call sites where L = window volume (16-512).
  * `selective_scan_chunked` — sequential `lax.scan` over chunks with an
    associative scan inside each chunk: same math, bounded memory, used for
    full-sequence (ViT) mixing at 16k-66k tokens.

State is carried in fp32 (the recurrence is numerically delicate in bf16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _combine(left, right):
    a_l, b_l = left
    a_r, b_r = right
    return a_l * a_r, a_r * b_l + b_r


def _discretize(u, delta, A, B, delta_bias, delta_softplus):
    """Compute per-step decay a = exp(delta*A) and input b = delta*B*u.

    u, delta: (B, D, L); A: (D, N); B: (B, N, L).
    Returns a, b of shape (B, D, L, N) in fp32.
    """
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)[None, :, None]
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    u32 = u.astype(jnp.float32)
    a = jnp.exp(delta[..., None] * A.astype(jnp.float32)[None, :, None, :])
    b = (delta * u32)[..., None] * B.astype(jnp.float32).transpose(0, 2, 1)[:, None]
    return a, b


def selective_scan_auto(u, delta, A, B, C, D=None, delta_bias=None,
                        delta_softplus=True, seq_max_len: int = 1024):
    """Dispatching selective scan.

    Windowed call sites (huge batch, L = window volume) route to the
    sequential low-memory scan; long full-sequence mixing routes to the
    chunked associative scan (log-depth, bounded memory).
    """
    L = u.shape[-1]
    if L <= seq_max_len:
        return selective_scan_seq(u, delta, A, B, C, D, delta_bias, delta_softplus)
    return selective_scan_chunked(u, delta, A, B, C, D, delta_bias, delta_softplus)


def selective_scan(u, delta, A, B, C, D=None, delta_bias=None, delta_softplus=True):
    """Associative-scan selective scan.

    Args:
      u: (batch, dim, L) input sequence.
      delta: (batch, dim, L) timestep (pre-softplus).
      A: (dim, N) state matrix (negative real, continuous-time).
      B: (batch, N, L) input projection.
      C: (batch, N, L) output projection.
      D: (dim,) skip connection or None.
      delta_bias: (dim,) added to delta before softplus, or None.

    Returns y: (batch, dim, L) in u.dtype.
    """
    a, b = _discretize(u, delta, A, B, delta_bias, delta_softplus)
    _, h = jax.lax.associative_scan(_combine, (a, b), axis=2)
    y = jnp.einsum("bdln,bnl->bdl", h, C.astype(jnp.float32))
    if D is not None:
        y = y + u.astype(jnp.float32) * D.astype(jnp.float32)[None, :, None]
    return y.astype(u.dtype)


def _chunked_scan_carry(u, delta, A, B, C, delta_bias, delta_softplus,
                        chunk: int, h_init=None):
    """Core of the chunked scan: also returns the exact final state.

    Returns (y, h_end): y is fp32 WITHOUT the D*u skip, (batch, dim, L);
    h_end is the state after step L-1, (batch, dim, N). Padded tail steps are
    masked to the identity element (a=1, b=0) — plain zero-padding of delta
    is NOT identity, because delta_bias+softplus turn a zero delta into a
    real decay step that would corrupt the carried state.
    Supports an optional initial state `h_init` (used by the
    sequence-parallel scan's cross-chip stitch).
    """
    bsz, dim, L = u.shape
    n = A.shape[1]
    pad = (-L) % chunk
    if pad:
        u = jnp.pad(u, ((0, 0), (0, 0), (0, pad)))
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, pad)))
        B = jnp.pad(B, ((0, 0), (0, 0), (0, pad)))
        C = jnp.pad(C, ((0, 0), (0, 0), (0, pad)))
    nc = (L + pad) // chunk

    def reshape_chunks(x):  # (b, d, L) -> (nc, b, d, chunk)
        return x.reshape(x.shape[0], x.shape[1], nc, chunk).transpose(2, 0, 1, 3)

    uc, dc = reshape_chunks(u), reshape_chunks(delta)
    Bc, Cc = reshape_chunks(B), reshape_chunks(C)
    starts = jnp.arange(nc, dtype=jnp.int32) * chunk

    def step(h0, args):
        u_i, d_i, B_i, C_i, start = args
        a, b = _discretize(u_i, d_i, A, B_i, delta_bias, delta_softplus)
        if pad:
            valid = (start + jnp.arange(chunk, dtype=jnp.int32)) < L
            vm = valid[None, None, :, None]
            a = jnp.where(vm, a, 1.0)
            b = jnp.where(vm, b, 0.0)
        cum_a, h_local = jax.lax.associative_scan(_combine, (a, b), axis=2)
        h = h_local + cum_a * h0[:, :, None, :]
        y = jnp.einsum("bdln,bnl->bdl", h, C_i.astype(jnp.float32))
        return h[:, :, -1, :], y

    h0 = (jnp.zeros((bsz, dim, n), jnp.float32) if h_init is None
          else h_init.astype(jnp.float32))
    h_end, ys = jax.lax.scan(step, h0, (uc, dc, Bc, Cc, starts))
    y = ys.transpose(1, 2, 0, 3).reshape(bsz, dim, L + pad)[:, :, :L]
    return y, h_end


@functools.partial(jax.jit, static_argnames=("delta_softplus", "chunk"))
def selective_scan_chunked(u, delta, A, B, C, D=None, delta_bias=None,
                           delta_softplus=True, chunk: int = 2048):
    """Chunked selective scan: O(chunk) memory footprint along L.

    Splits L into chunks; inside a chunk uses the associative scan, between
    chunks carries the (batch, dim, N) state through a sequential `lax.scan`.
    Suitable for 16k-66k token full-sequence mixing where the monolithic
    version would materialize tens of GB.
    """
    y, _ = _chunked_scan_carry(u, delta, A, B, C, delta_bias, delta_softplus,
                               chunk)
    if D is not None:
        y = y + u.astype(jnp.float32) * D.astype(jnp.float32)[None, :, None]
    return y.astype(u.dtype)


def selective_scan_seq(u, delta, A, B, C, D=None, delta_bias=None,
                       delta_softplus=True):
    """Sequential selective scan with O(batch*dim*N) live state.

    `lax.scan` over L whose rematerialized body reconstructs the discretized
    (a_t, b_t) from the per-step slices of (u, delta, B) — so neither forward
    nor backward ever materializes the (batch, dim, L, N) tensor the
    associative formulation needs. This is the memory/bandwidth-optimal choice
    for the windowed (Swin) call sites where the window batch is huge and L is
    the window volume (16-512); latency is L sequential VPU steps.
    """
    Af = A.astype(jnp.float32)
    db = None if delta_bias is None else delta_bias.astype(jnp.float32)

    @jax.checkpoint
    def step(h, xs):
        u_t, d_t, B_t, C_t = xs            # (b,dim), (b,dim), (b,N), (b,N)
        d_t = d_t.astype(jnp.float32)
        if db is not None:
            d_t = d_t + db[None, :]
        if delta_softplus:
            d_t = jax.nn.softplus(d_t)
        a_t = jnp.exp(d_t[..., None] * Af[None])              # (b, dim, N)
        b_t = (d_t * u_t.astype(jnp.float32))[..., None] * B_t.astype(
            jnp.float32)[:, None, :]                           # (b, dim, N)
        h = a_t * h + b_t
        y_t = jnp.einsum("bdn,bn->bd", h, C_t.astype(jnp.float32))
        return h, y_t

    bsz, dim, L = u.shape
    n = A.shape[1]
    xs = (u.transpose(2, 0, 1), delta.transpose(2, 0, 1),
          B.transpose(2, 0, 1), C.transpose(2, 0, 1))
    h0 = jnp.zeros((bsz, dim, n), jnp.float32)
    _, ys = jax.lax.scan(step, h0, xs)
    y = ys.transpose(1, 2, 0)                                  # (b, dim, L)
    if D is not None:
        y = y + u.astype(jnp.float32) * D.astype(jnp.float32)[None, :, None]
    return y.astype(u.dtype)


def selective_scan_cm(u, delta, A, B, C, D=None, delta_bias=None,
                      delta_softplus=True):
    """Channel-minor sequential selective scan (TPU-first layout).

    All operands keep the channel dim minor/lane-major:
      u, delta: (batch, L, dim); B, C: (batch, L, N); A: (dim, N); D: (dim,).
    Carry is (batch, N, dim) so every per-step VPU op is (batch*N, dim) with
    dim (48-768) on the 128 lanes — the (batch, dim, L) layout of the CUDA
    kernel would put the window volume (16-512) on the lanes instead.
    Rematerialized body: backward recomputes (a_t, b_t) instead of storing the
    (batch, L, N, dim) discretization. Returns (batch, L, dim).
    """
    AT = A.astype(jnp.float32).T                              # (N, dim)
    db = None if delta_bias is None else delta_bias.astype(jnp.float32)
    bsz, L, dim = u.shape
    n = A.shape[1]

    def step(h, u_t, d_t, B_t, C_t):
        d_t = d_t.astype(jnp.float32)
        if db is not None:
            d_t = d_t + db[None, :]
        if delta_softplus:
            d_t = jax.nn.softplus(d_t)
        a_t = jnp.exp(d_t[:, None, :] * AT[None])             # (b, N, dim)
        b_t = (d_t * u_t.astype(jnp.float32))[:, None, :] * B_t.astype(
            jnp.float32)[:, :, None]                           # (b, N, dim)
        h = a_t * h + b_t
        y_t = jnp.einsum("bnd,bn->bd", h, C_t.astype(jnp.float32))
        return h, y_t

    h0 = jnp.zeros((bsz, n, dim), jnp.float32)
    step_r = jax.checkpoint(lambda h, xs: step(h, *xs))
    xs = (u.transpose(1, 0, 2), delta.transpose(1, 0, 2),
          B.transpose(1, 0, 2), C.transpose(1, 0, 2))
    # partial unroll amortizes per-step scan overhead without the compile-time
    # blowup of fully inlining the recurrence into every block
    _, ys = jax.lax.scan(step_r, h0, xs, unroll=min(L, 8))
    y = ys.transpose(1, 0, 2)                                 # (b, L, dim)
    if D is not None:
        y = y + u.astype(jnp.float32) * D.astype(jnp.float32)[None, None, :]
    return y.astype(u.dtype)


def selective_scan_reference(u, delta, A, B, C, D=None, delta_bias=None,
                             delta_softplus=True):
    """Naive sequential recurrence — golden reference for tests only."""
    a, b = _discretize(u, delta, A, B, delta_bias, delta_softplus)

    def step(h, ab):
        a_t, b_t = ab
        h = a_t * h + b_t
        return h, h

    bsz, dim, L, n = a.shape
    h0 = jnp.zeros((bsz, dim, n), jnp.float32)
    _, hs = jax.lax.scan(step, h0, (a.transpose(2, 0, 1, 3), b.transpose(2, 0, 1, 3)))
    h = hs.transpose(1, 2, 0, 3)
    y = jnp.einsum("bdln,bnl->bdl", h, C.astype(jnp.float32))
    if D is not None:
        y = y + u.astype(jnp.float32) * D.astype(jnp.float32)[None, :, None]
    return y.astype(u.dtype)
