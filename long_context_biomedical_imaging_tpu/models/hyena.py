"""Hyena operator: gated FFT long convolution as an attention drop-in.

TPU-native reimplementation of the reference Hyena stack
(ref: model/models/hyena.py:219-360 HyenaOperator, :117-199 Filter,
:67-89 PositionalEmbedding, :92-113 ExponentialModulation, :54-64 Sin).
The long convolution runs through `ops.fft_causal_conv` (fused Pallas
spectral conv at 16k-66k full-sequence lengths, Toeplitz/direct below)
instead of cuFFT; the short filter is a causal depthwise conv.

Behavioral notes (ref quirks, SURVEY.md §2.4): the reference's
`bidrectional=True` call-site typo means the bidirectional path is dead code —
effective behavior is the causal/unidirectional conv implemented here. The
implicit filter is parameterized on the full `l_max` time grid and truncated
to the first L points at call time (ref: hyena.py:88-89).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import depthwise_conv1d_cm
from ..ops.fftconv import causal_long_conv_cm
from ..ops.hyena_window import hyena_window_mixer, hyena_window_supported
from .layers import TorchDense, fan_in_bias_init, torch_linear_kernel_init


def _positional_embedding_init(emb_dim: int, seq_len: int) -> np.ndarray:
    """Initial z: [t, Re exp(-i f w), Im exp(-i f w)] on the l_max grid
    (ref: hyena.py:67-85)."""
    t = np.linspace(0, 1, seq_len)[None, :, None].astype(np.float32)
    bands = (emb_dim - 1) // 2
    t_rescaled = np.linspace(0, seq_len - 1, seq_len)[None, :, None].astype(np.float32)
    w = 2 * math.pi * t_rescaled / seq_len
    f = np.linspace(1e-4, bands - 1, bands)[None, None].astype(np.float32)
    z = np.exp(-1j * f * w)
    return np.concatenate([t, z.real.astype(np.float32), z.imag.astype(np.float32)],
                          axis=-1)  # (1, seq_len, emb_dim)


class HyenaFilter(nn.Module):
    """Implicit long filter: trainable pos-emb -> Sin-MLP -> exponential decay.

    Produces k of shape (L, d_model) for the first L points of the l_max grid.
    """

    d_model: int
    emb_dim: int = 3
    order: int = 64            # MLP width (call sites pass filter_order=64)
    seq_len: int = 1024        # l_max
    w: float = 1.0             # Sin activation frequency (ref Filter default w=1)
    num_inner_mlps: int = 2
    modulate: bool = True
    fast_decay_pct: float = 0.3
    slow_decay_pct: float = 1.5
    target: float = 1e-2
    shift: float = 0.0

    def setup(self):
        assert self.emb_dim % 2 == 1 and self.emb_dim >= 3
        z0 = _positional_embedding_init(self.emb_dim, self.seq_len)
        self.z = self.param("z", lambda key: jnp.asarray(z0))
        # fftconv skip weight (ref: hyena.py:156 `self.bias = Parameter(randn(d))`)
        self.bias = self.param("bias", nn.initializers.normal(stddev=1.0), (self.d_model,))
        self.freqs = [self.param(f"sin_freq_{i}", nn.initializers.constant(self.w),
                                 (1, self.order))
                      for i in range(self.num_inner_mlps + 1)]
        self.linears_in = TorchDense(self.order)
        self.linears_mid = [TorchDense(self.order) for _ in range(self.num_inner_mlps)]
        self.linear_out = TorchDense(self.d_model, use_bias=False)

    def _modulation_decay(self, L: int) -> jnp.ndarray:
        max_decay = math.log(self.target) / self.fast_decay_pct
        min_decay = math.log(self.target) / self.slow_decay_pct
        deltas = np.linspace(min_decay, max_decay, self.d_model).astype(np.float32)
        t = np.linspace(0, 1, self.seq_len)[:L, None].astype(np.float32)
        return jnp.asarray(np.exp(-t * np.abs(deltas)[None, :]))  # (L, d_model)

    def __call__(self, L: int) -> jnp.ndarray:
        h = self.z[0, :L]  # (L, emb_dim)
        h = jnp.sin(self.freqs[0] * self.linears_in(h))
        for lin, freq in zip(self.linears_mid, self.freqs[1:]):
            h = jnp.sin(freq * lin(h))
        h = self.linear_out(h)  # (L, d_model)
        if self.modulate:
            h = h * (self._modulation_decay(L) + self.shift)
        return h


class HyenaOperator(nn.Module):
    """Gated causal long-convolution token mixer (ref: hyena.py:219-360).

    Input/output (B, L, d_model). Per-head implicit filter over head_dim
    channels, shared across heads.
    """

    d_model: int
    l_max: int
    filter_order: int = 64
    num_heads: int = 1
    num_blocks: int = 1
    short_filter_order: int = 5
    dropout: float = 0.0
    filter_dropout: float = 0.0

    @nn.compact
    def __call__(self, u, deterministic: bool = True, ln_params=None):
        """Channel-minor forward: every tensor keeps channels on the minor
        (lane) axis — window-volume sequences of 16-512 tokens would waste the
        128-lane VPU if the reference's (B, D, L) layout were kept.

        ln_params: optional (scale, bias) of the caller's pre-LN. When given,
        returns u + mixer(LN(u)) with LN and residual folded into the fused
        kernel (2 fewer HBM passes over the stage tensor each way)."""
        b, l, cp = u.shape
        d = self.d_model
        assert l <= self.l_max, f"Input length {l} exceeds maximum length {self.l_max}"
        # cp > d: lane-padded stage stream (models/swin.py pads 96->128 /
        # 192->256 for contiguous Pallas DMAs; pad lanes are exact zeros)
        assert cp == d or cp > d, (cp, d)
        head_dim = self.d_model // self.num_heads
        width = 3 * self.d_model

        # Projection params declared directly (torch nn.Linear defaults) so
        # the fused Pallas path and the composed path share one param tree.
        w_in = self.param("in_proj_kernel", torch_linear_kernel_init,
                          (d, width))
        b_in = self.param("in_proj_bias", fan_in_bias_init(d), (width,))
        w_out = self.param("out_proj_kernel", torch_linear_kernel_init,
                           (d, d))
        b_out = self.param("out_proj_bias", fan_in_bias_init(d), (d,))
        w_short = self.param("short_filter_kernel",
                             depthwise_conv_init(self.short_filter_order),
                             (width, self.short_filter_order))
        b_short = self.param("short_filter_bias",
                             depthwise_conv_init(self.short_filter_order), (width,))

        filt = HyenaFilter(d_model=head_dim, order=self.filter_order,
                           seq_len=self.l_max, name="filter_fn")
        k = filt(l)                                       # (l, head_dim)
        # per-channel kernel, shared across heads (head-major channel layout)
        k_full = jnp.tile(k.T, (self.num_heads, 1))       # (d, l)
        bias_full = jnp.tile(filt.bias, self.num_heads)   # (d,)

        from ..parallel.mesh import model_axis_size
        if hyena_window_supported(l, d) and model_axis_size() == 1 and \
                (self.dropout == 0.0 or deterministic):
            # (model_axis gate: pallas_call does not SPMD-partition — under
            # token-axis sharding the composed path below re-shards around
            # the long conv instead)
            # windowed regime: one Pallas kernel for the whole mixer body —
            # the composed path streams the 3d-wide projection through HBM
            # ~6x per block (measured 1.4-1.9x step-op speedup on v5e)
            if ln_params is not None:
                return hyena_window_mixer(u, w_in, b_in, w_short, b_short,
                                          k_full, bias_full, w_out, b_out,
                                          ln_scale=ln_params[0],
                                          ln_bias=ln_params[1])
            return hyena_window_mixer(u, w_in, b_in, w_short, b_short,
                                      k_full, bias_full, w_out, b_out)

        def composed(y):
            # in_proj emits [x1 | x2 | v] channel blocks (head-major inside
            # each) — a learned permutation of the reference's interleaved
            # layout. 2D-flattened matmuls: XLA lowers >2D Dense gradients
            # ~6x slower.
            z = (y.reshape(b * l, d) @ w_in.astype(y.dtype)
                 + b_in.astype(y.dtype)).reshape(b, l, width)

            # Short causal depthwise conv (ref: hyena.py:285-291,321).
            z = depthwise_conv1d_cm(z, w_short, b_short, padding="causal")

            x1 = z[..., :self.d_model]
            x2 = z[..., self.d_model:2 * self.d_model]
            v = z[..., 2 * self.d_model:]

            v = v * x1                                    # pre-gate
            v = nn.Dropout(self.dropout)(v, deterministic=deterministic)

            # Token-sharded sequences re-shard to channel-parallel for the
            # depthwise long conv (each device convolves the FULL sequence for
            # d/n channels — XLA inserts the all-to-all pair) and back. No-op
            # on a model=1 mesh.
            from ..parallel.mesh import shard_channels, shard_tokens
            v = shard_channels(v)
            v = causal_long_conv_cm(v, k_full, bias_full)
            v = shard_tokens(v)

            v = v * x2                                    # post-gate
            v = (v.reshape(b * l, d) @ w_out.astype(y.dtype)
                 + b_out.astype(y.dtype)).reshape(b, l, d)
            return v                                      # out_proj

        if cp != d:
            # pad-aware composed fallback: mix the real channels, zero-pad
            # the output back so pad lanes stay exact zeros
            u_real = u[..., :d]
            if ln_params is None:
                return jnp.pad(composed(u_real),
                               ((0, 0), (0, 0), (0, cp - d)))
            from ..ops.fused_mlp import fast_layernorm
            y = composed(fast_layernorm(u_real, ln_params[0], ln_params[1]))
            return u + jnp.pad(y, ((0, 0), (0, 0), (0, cp - d)))
        if ln_params is None:
            return composed(u)
        # composed fallback keeps the x + mixer(LN(x)) contract; LN formula
        # shared with the fused kernels (ops/fused_mlp.fast_layernorm)
        from ..ops.fused_mlp import fast_layernorm
        return u + composed(fast_layernorm(u, ln_params[0], ln_params[1]))


def depthwise_conv_init(kernel_size: int):
    """torch depthwise Conv1d defaults: U(+-1/sqrt(fan_in)), fan_in = K (groups=C).
    Applies the same bound to weight (C, K) and bias (C,) as torch does."""
    import jax

    bound = 1.0 / math.sqrt(kernel_size)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
