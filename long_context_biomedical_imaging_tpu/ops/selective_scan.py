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


@functools.partial(jax.jit, static_argnames=("delta_softplus", "chunk"))
def selective_scan_chunked(u, delta, A, B, C, D=None, delta_bias=None,
                           delta_softplus=True, chunk: int = 2048):
    """Chunked selective scan: O(chunk) memory footprint along L.

    Splits L into chunks; inside a chunk uses the associative scan, between
    chunks carries the (batch, dim, N) state through a sequential `lax.scan`.
    Suitable for 16k-66k token full-sequence mixing where the monolithic
    version would materialize tens of GB.
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

    def step(h0, args):
        u_i, d_i, B_i, C_i = args
        a, b = _discretize(u_i, d_i, A, B_i, delta_bias, delta_softplus)
        cum_a, h_local = jax.lax.associative_scan(_combine, (a, b), axis=2)
        h = h_local + cum_a * h0[:, :, None, :]
        y = jnp.einsum("bdln,bnl->bdl", h, C_i.astype(jnp.float32))
        return h[:, :, -1, :], y

    h0 = jnp.zeros((bsz, dim, n), jnp.float32)
    _, ys = jax.lax.scan(step, h0, (uc, dc, Bc, Cc))
    y = ys.transpose(1, 2, 0, 3).reshape(bsz, dim, L + pad)[:, :, :L]
    if D is not None:
        y = y + u[:, :, :L].astype(jnp.float32) * D.astype(jnp.float32)[None, :, None]
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
