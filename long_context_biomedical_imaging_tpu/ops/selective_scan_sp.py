"""Sequence-parallel selective scan over the mesh 'model' axis.

Completes the sequence-parallel story for the third mixer family: hyena
re-shards around its long conv and attention runs per-query-shard flash
(ops/attention.sp_flash_attention), but the Mamba recurrence
h[t] = a[t]*h[t-1] + b[t] is cross-token, so naive token sharding would
serialize the chips. The first-order linear recurrence decomposes exactly
over contiguous token segments, which is the same two-pass stitch the
single-chip Pallas long-scan kernel uses across its VPU rows — here applied
across chips over ICI:

  1. every chip scans its local token segment from zero state, keeping the
     exact final state h_end (ops/selective_scan._chunked_scan_carry);
  2. a (k, batch, dim, N)-sized all_gather of per-segment (decay product,
     h_end) summaries — tiny: the full sequence never moves — followed by an
     unrolled k-step prefix recurrence H_i = P_i*H_{i-1} + h_i gives each
     chip the state entering its segment;
  3. the incoming state's contribution is added in closed form:
     y[t] += C[t] . (exp(A * cumsum(dt')[t]) * h_prev) — a cumsum and a
     chunked einsum, no second scan pass.

The decay products use exp(A * sum(dt')) == prod(exp(A*dt')) exactly (fp32
cumsum vs product-of-exps differ only in rounding).

Replaces: nothing in the reference — it has no sequence parallelism at all
(SURVEY §5.7: long context handled purely algorithmically); this is the TPU
extension that lets beyond-HBM ViT-mamba contexts shard the token axis like
the hyena/attention paths already do.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .selective_scan import _chunked_scan_carry


from .selective_scan_long import use_long_scan as _use_pallas_local  # noqa: E402
# (module-level alias of the shared dispatch gate — the Pallas long-scan
# kernel runs fine inside shard_map, the manual shards are plain per-device
# arrays; aliased under this module's name so tests can monkeypatch the SP
# local dispatch without touching the single-chip path)


def sp_scan_applicable(L: int) -> bool:
    """Whether the sequence-parallel scan path engages for token count L:
    full-sequence regime only, and the token axis must divide the mesh
    'model' axis. Callers (models/vit.py token sharding, models/mamba.py
    dispatch) share this so tokens are never sharded for a geometry whose
    scan would then run un-shard_mapped (GSPMD would silently gather the
    tokens around the recurrence on every chip)."""
    from ..parallel.mesh import model_axis_size
    k = model_axis_size()
    return k > 1 and L > 1024 and L % k == 0


def _h_end_closed_form(u_s, dtp, S, B_s, Af, lc: int = 2048):
    """Exact final state of the zero-initialized local scan, no scan pass:

      h_end[b,d,n] = sum_t exp(A[d,n]*(S_end[b,d]-S[b,t,d])) * dt'*u[b,t,d] * B[b,t,n]

    (the decay from step t to the segment end is exp(A * (S_end - S_t)); the
    per-step input is dt'*u*B). Fully parallel over t — pairs with the Pallas
    local scan, which emits y but not its final state. Chunked over l like
    _fixup; far tokens underflow to 0 (A < 0), which is the true decay.
    """
    b, l, d = dtp.shape
    n = B_s.shape[-1]
    S_end = S[:, -1]                                          # (b, d)
    w = dtp * u_s.astype(jnp.float32)                         # (b, l, d)
    pad = (-l) % lc
    Bf = B_s.astype(jnp.float32)
    if pad:
        w = jnp.pad(w, ((0, 0), (0, pad), (0, 0)))            # 0 -> no contrib
        S = jnp.pad(S, ((0, 0), (0, pad), (0, 0)))
        Bf = jnp.pad(Bf, ((0, 0), (0, pad), (0, 0)))
    nc = (l + pad) // lc
    wc = w.reshape(b, nc, lc, d).transpose(1, 0, 2, 3)
    Sc = S.reshape(b, nc, lc, d).transpose(1, 0, 2, 3)
    Bc = Bf.reshape(b, nc, lc, n).transpose(1, 0, 2, 3)

    def chunk_fn(acc, args):
        w_c, S_c, B_c = args
        decay = jnp.exp((S_end[:, None] - S_c)[..., None] * Af[None, None])
        return acc + jnp.einsum("bldn,bld,bln->bdn", decay, w_c, B_c), None

    acc0 = jnp.zeros((b, d, n), jnp.float32)
    h_end, _ = jax.lax.scan(chunk_fn, acc0, (wc, Sc, Bc))
    return h_end


def _fixup(C_s, S, Af, h_prev, lc: int = 2048):
    """Closed-form contribution of the incoming state h_prev to local y.

    C_s: (b, l, N) local output projections; S: (b, l, d) fp32 cumsum of
    post-softplus dt; Af: (d, N); h_prev: (b, d, N). Chunked over l so the
    (b, lc, d, N) decay tensor stays bounded. exp(S*A) underflows to 0 for
    far tokens (A < 0) — correct: they have forgotten the incoming state.
    """
    b, l, n = C_s.shape
    d = S.shape[-1]
    pad = (-l) % lc
    Cf = C_s.astype(jnp.float32)
    if pad:
        Cf = jnp.pad(Cf, ((0, 0), (0, pad), (0, 0)))
        S = jnp.pad(S, ((0, 0), (0, pad), (0, 0)))
    nc = (l + pad) // lc
    Cc = Cf.reshape(b, nc, lc, n).transpose(1, 0, 2, 3)
    Sc = S.reshape(b, nc, lc, d).transpose(1, 0, 2, 3)

    def chunk_fn(_, args):
        C_c, S_c = args
        decay = jnp.exp(S_c[..., None] * Af[None, None])      # (b, lc, d, N)
        return None, jnp.einsum("bldn,bdn,bln->bld", decay, h_prev, C_c)

    _, cs = jax.lax.scan(chunk_fn, None, (Cc, Sc))
    return cs.transpose(1, 0, 2, 3).reshape(b, l + pad, d)[:, :l]


def sp_selective_scan_cm(u, delta, A, B, C, D=None, delta_bias=None,
                         delta_softplus=True, chunk: int = 2048):
    """Channel-minor selective scan with the token axis sharded over 'model'.

    u, delta: (batch, L, dim); B, C: (batch, L, N); A: (dim, N); D: (dim,).
    Returns (batch, L, dim) in u.dtype — numerically the single-device scan.
    Requires L % model-axis == 0 and batch % data-axis == 0 (callers gate).
    """
    from ..parallel.mesh import active_mesh

    mesh = active_mesh()
    k = int(mesh.shape["model"])
    dp = int(mesh.shape["data"])
    # batch stays sharded over 'data' when it divides (the trainer guarantees
    # this for training); replicate otherwise rather than error
    bspec = "data" if u.shape[0] % dp == 0 else None
    has_D, has_db = D is not None, delta_bias is not None

    def local(u_s, d_s, B_s, C_s, A_r, D_r, db_r):
        Af = A_r.astype(jnp.float32)
        db = db_r.astype(jnp.float32) if has_db else None

        dtp = d_s.astype(jnp.float32)
        if db is not None:
            dtp = dtp + db
        if delta_softplus:
            dtp = jax.nn.softplus(dtp)
        S = jnp.cumsum(dtp, axis=1)                            # (b, l_loc, d)

        l_loc, dim = u_s.shape[1], u_s.shape[2]
        if _use_pallas_local(l_loc, B_s.shape[-1], dim):
            from .selective_scan_long import selective_scan_long
            y_loc = selective_scan_long(
                u_s, d_s, A_r, B_s, C_s, D=None, delta_bias=db_r if has_db
                else None, delta_softplus=delta_softplus
            ).astype(jnp.float32).transpose(0, 2, 1)           # (b, d, l_loc)
            h_end = _h_end_closed_form(u_s, dtp, S, B_s, Af, lc=chunk)
        else:
            # chunked XLA core wants (b, d, l); also returns the exact carry
            y_loc, h_end = _chunked_scan_carry(
                u_s.transpose(0, 2, 1), d_s.transpose(0, 2, 1), Af,
                B_s.transpose(0, 2, 1), C_s.transpose(0, 2, 1),
                db, delta_softplus, chunk)

        P_end = jnp.exp(S[:, -1][..., None] * Af[None])        # (b, d, N)

        Pg = jax.lax.all_gather(P_end, "model")                # (k, b, d, N)
        hg = jax.lax.all_gather(h_end, "model")
        H = jnp.zeros_like(h_end)
        prefixes = []
        for i in range(k):                                     # k <= mesh dim: tiny
            prefixes.append(H)
            H = Pg[i] * H + hg[i]
        h_prev = jnp.stack(prefixes)[jax.lax.axis_index("model")]

        y = y_loc.transpose(0, 2, 1) + _fixup(C_s, S, Af, h_prev, lc=chunk)
        if has_D:
            y = y + u_s.astype(jnp.float32) * D_r.astype(jnp.float32)[None, None]
        return y.astype(u.dtype)

    tok = P(bspec, "model", None)
    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(tok, tok, tok, tok, P(), P(), P()),
                      out_specs=tok,
                      check_vma=False)  # scan carry mixes varying/unvarying
    # params ride as replicated args — closed-over tracers are not legal
    # inside shard_map; None placeholders become unused zero scalars
    D_arg = D if has_D else jnp.zeros((), jnp.float32)
    db_arg = delta_bias if has_db else jnp.zeros((), jnp.float32)
    return f(u, delta, B, C, A, D_arg, db_arg)
