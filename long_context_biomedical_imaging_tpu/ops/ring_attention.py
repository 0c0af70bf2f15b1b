"""Ring flash attention over the mesh 'model' axis.

The gathered-k/v sequence-parallel attention (ops/attention.sp_flash_attention)
shards compute and activations but still materializes the full k/v per chip —
an O(L) term that caps beyond-HBM contexts. The ring formulation removes it:
k/v stay sharded, each chip holds one L/n-token chunk and the chunks rotate
around the ring via `lax.ppermute` while every chip's flash kernel consumes
them one at a time. Per-chip memory is O(L/n) for everything.

Blockwise-softmax algebra (same as the in-kernel online softmax, one level
up): each (q_local, kv_chunk) flash call returns its locally-normalized
output o_s and base-2 logsumexp lse_s; the chunks merge by

  m      = max_s lse_s
  out    = sum_s exp2(lse_s - m) * o_s / sum_s exp2(lse_s - m)
  lse    = m + log2(sum_s exp2(lse_s - m))

which is exactly global softmax attention (the denominators recombine).

Backward is a second ring pass: with the GLOBAL (out, lse) saved, the
standard flash backward of (q, kv_chunk) yields the true partial dq (summed
locally over chunks) and the true complete (dk, dv) for the resident chunk
(delta = rowsum(do*out) and lse already encode the global softmax). The
(dk, dv) accumulators rotate WITH their chunk, collect every chip's
contribution, and arrive home after the final rotation.

The merge across chunks cannot be expressed through the flash op's existing
custom VJP (the merge weights depend on lse, whose cotangent the per-chunk
VJP does not produce), hence the ring-level custom_vjp below.

Call INSIDE shard_map: q, k, v are the per-chip shards (BH, L/n, D).

Non-divisible token counts (the +1 cls-token attention-classification
geometry, ref backbone_vit.py:369-370,384-386 — L = tokens+1 never divides
the mesh axis) ride `ring_flash_attention_tail`: the caller rings over the
divisible kv prefix and passes the r = L mod n remainder tokens as a tiny
REPLICATED tail chunk (r < n). The tail merges into the same blockwise-lse
algebra as one extra chunk; its backward is a flash bwd against the global
(out, lse) whose dk/dv partials every chip produces — the shard_map transpose
psums them at the replicated-input boundary. Per-chip memory stays O(L/n).

Replaces: nothing in the reference (no sequence parallelism there at all,
SURVEY §5.7); TPU-native extension in the spirit of Liu et al.'s ring
attention, built from the repo's own Pallas flash kernels with XLA ICI
collectives between them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .flash_attention import _flash_bwd, _flash_fwd


def _rot(x, axis_name: str, ways: int):
    return jax.lax.ppermute(x, axis_name,
                            [(i, (i + 1) % ways) for i in range(ways)])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def ring_flash_attention(q, k, v, scale, ways, axis_name, block_q, block_k):
    """Per-shard ring attention. q, k, v: (BH, L/ways, D) local shards."""
    out, _ = _ring_fwd_impl(q, k, v, scale, ways, axis_name, block_q, block_k)
    return out


def _ring_fwd_impl(q, k, v, scale, ways, axis_name, block_q, block_k,
                   tail=None):
    bh, lq, d = q.shape
    m = jnp.full((bh, lq), -jnp.inf, jnp.float32)
    den = jnp.zeros((bh, lq), jnp.float32)
    num = jnp.zeros((bh, lq, d), jnp.float32)

    def merge(m, den, num, o_s, lse_s):
        m_new = jnp.maximum(m, lse_s)
        w_old = jnp.exp2(m - m_new)
        w_s = jnp.exp2(lse_s - m_new)
        num = num * w_old[..., None] + o_s.astype(jnp.float32) * w_s[..., None]
        den = den * w_old + w_s
        return m_new, den, num

    kc, vc = k, v
    for s in range(ways):
        o_s, lse_s = _flash_fwd(q, kc, vc, scale, block_q, block_k)
        m, den, num = merge(m, den, num, o_s, lse_s)
        if s < ways - 1:
            kc, vc = _rot(kc, axis_name, ways), _rot(vc, axis_name, ways)
    if tail is not None:
        kt, vt = tail
        o_t, lse_t = _flash_fwd(q, kt, vt, scale, block_q, block_k)
        m, den, num = merge(m, den, num, o_t, lse_t)
    out = (num / den[..., None]).astype(q.dtype)
    lse = m + jnp.log2(den)
    return out, lse


def _ring_fwd_rule(q, k, v, scale, ways, axis_name, block_q, block_k):
    out, lse = _ring_fwd_impl(q, k, v, scale, ways, axis_name, block_q,
                              block_k)
    return out, (q, k, v, out, lse)


def _ring_bwd_impl(scale, ways, axis_name, block_q, block_k, res, do,
                   tail=None):
    q, k, v, out, lse = res
    dq = jnp.zeros(q.shape, jnp.float32)
    kc, vc = k, v
    dkc = jnp.zeros(k.shape, jnp.float32)
    dvc = jnp.zeros(v.shape, jnp.float32)
    # do/out are ring-invariant: pay the rowsum once, not once per step
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    for s in range(ways):
        dq_s, dk_s, dv_s = _flash_bwd(scale, block_q, block_k,
                                      (q, kc, vc, out, lse), do, delta=delta)
        dq = dq + dq_s.astype(jnp.float32)
        dkc = dkc + dk_s.astype(jnp.float32)
        dvc = dvc + dv_s.astype(jnp.float32)
        if s < ways - 1:
            kc, vc = _rot(kc, axis_name, ways), _rot(vc, axis_name, ways)
            dkc, dvc = _rot(dkc, axis_name, ways), _rot(dvc, axis_name, ways)
    # the resident chunk is now ways-1 hops from home; one more hop returns
    # its completed gradient accumulator
    dkc, dvc = _rot(dkc, axis_name, ways), _rot(dvc, axis_name, ways)
    tail_grads = ()
    if tail is not None:
        kt, vt = tail
        dq_t, dkt, dvt = _flash_bwd(scale, block_q, block_k,
                                    (q, kt, vt, out, lse), do, delta=delta)
        dq = dq + dq_t.astype(jnp.float32)
        # per-chip partials over the local q rows; the shard_map transpose
        # psums them at the replicated kt/vt input boundary
        tail_grads = (dkt.astype(kt.dtype), dvt.astype(vt.dtype))
    return (dq.astype(q.dtype), dkc.astype(k.dtype), dvc.astype(v.dtype),
            *tail_grads)


def _ring_bwd_rule(scale, ways, axis_name, block_q, block_k, res, do):
    return _ring_bwd_impl(scale, ways, axis_name, block_q, block_k, res, do)


ring_flash_attention.defvjp(_ring_fwd_rule, _ring_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def ring_flash_attention_tail(q, k, v, kt, vt, scale, ways, axis_name,
                              block_q, block_k):
    """Ring attention plus a replicated tail kv chunk (non-divisible L).

    q, k, v: (BH, Lq/ways resp. Lkv/ways, D) local shards; kt, vt: (BH, r, D)
    REPLICATED remainder tokens (r = L mod ways, so r < ways). Exact global
    softmax attention over the concatenated [ring kv | tail kv] sequence.
    """
    out, _ = _ring_fwd_impl(q, k, v, scale, ways, axis_name, block_q,
                            block_k, tail=(kt, vt))
    return out


def _ring_tail_fwd_rule(q, k, v, kt, vt, scale, ways, axis_name, block_q,
                        block_k):
    out, lse = _ring_fwd_impl(q, k, v, scale, ways, axis_name, block_q,
                              block_k, tail=(kt, vt))
    return out, (q, k, v, kt, vt, out, lse)


def _ring_tail_bwd_rule(scale, ways, axis_name, block_q, block_k, res, do):
    q, k, v, kt, vt, out, lse = res
    return _ring_bwd_impl(scale, ways, axis_name, block_q, block_k,
                          (q, k, v, out, lse), do, tail=(kt, vt))


ring_flash_attention_tail.defvjp(_ring_tail_fwd_rule, _ring_tail_bwd_rule)
