"""MambaVision-style mixer on the TPU selective-scan op.

Reimplements the reference MambaVisionMixer (ref: model/models/mamba.py:30-139)
with `ops.selective_scan` replacing the mamba-ssm CUDA kernel. Input/output
is (B, L, d_model).

Behavioral notes (SURVEY.md §2.4):
  * conv1d_x / conv1d_z have no bias in the reference (`bias=conv_bias//2` ->
    True//2 == 0, ref: mamba.py:91-106); replicated here.
  * the reference applies dt_proj's bias inside the linear AND passes it again
    as `delta_bias` to selective_scan (ref: mamba.py:122,132, inherited from
    upstream MambaVision) — effective delta is softplus(W dt + 2b); replicated.
  * A_log / D carry no weight decay in the reference; the optimizer here uses a
    single param group like the reference OptimManager (ref: optim_base.py:58).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import depthwise_conv1d_cm, selective_scan_chunked
from ..ops.mamba_window import mamba_window_mixer, mamba_window_supported
from ..ops.selective_scan import selective_scan_cm
from ..ops.selective_scan_long import selective_scan_long, use_long_scan
from ..ops.selective_scan_sp import sp_scan_applicable, sp_selective_scan_cm
from ..ops.selective_scan_pallas import pallas_scan_supported, selective_scan_pallas
from .hyena import depthwise_conv_init
from .layers import torch_linear_kernel_init


# module-level alias so tests can monkeypatch this module's gate alone
_use_long_scan = use_long_scan


def _dt_proj_kernel_init(dt_rank: int, dt_scale: float = 1.0):
    std = dt_rank ** -0.5 * dt_scale

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -std, std)

    return init


def _dt_proj_bias_init(d: int, dt_min: float = 0.001, dt_max: float = 0.1,
                       dt_init_floor: float = 1e-4):
    """Inverse-softplus of log-uniform dt (ref: mamba.py:72-78)."""

    def init(key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, shape, jnp.float32)
        dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
        dt = jnp.clip(dt, dt_init_floor, None)
        inv = dt + jnp.log(-jnp.expm1(-dt))
        return inv.astype(dtype)

    return init


class MambaVisionMixer(nn.Module):
    """Selective-scan token mixer with a non-SSM gate branch."""

    d_model: int
    d_state: int = 8
    d_conv: int = 3
    expand: int = 1
    dt_rank: int | None = None    # default ceil(d_model/16)

    @nn.compact
    def __call__(self, hidden_states, deterministic: bool = True,
                 ln_params=None):
        """ln_params: optional (scale, bias) of the caller's pre-LN. When
        given, returns x + mixer(LN(x)) with LN and residual folded into the
        fused kernel (2 fewer HBM passes over the stage tensor each way)."""
        b, l, _ = hidden_states.shape
        d_inner = int(self.expand * self.d_model)
        d_half = d_inner // 2
        dt_rank = self.dt_rank or math.ceil(self.d_model / 16)

        # Projection params declared directly (torch nn.Linear defaults) so
        # the fused Pallas path and the composed path share one param tree.
        w_xz = self.param("in_proj_kernel", torch_linear_kernel_init,
                          (self.d_model, d_inner))
        wx = self.param("conv1d_x_kernel", depthwise_conv_init(self.d_conv),
                        (d_half, self.d_conv))
        wz = self.param("conv1d_z_kernel", depthwise_conv_init(self.d_conv),
                        (d_half, self.d_conv))
        w_dbl = self.param("x_proj_kernel", torch_linear_kernel_init,
                           (d_half, dt_rank + 2 * self.d_state))
        dt_kernel = self.param("dt_proj_kernel", _dt_proj_kernel_init(dt_rank),
                               (dt_rank, d_half))
        dt_bias = self.param("dt_proj_bias", _dt_proj_bias_init(d_half), (d_half,))
        w_out = self.param("out_proj_kernel", torch_linear_kernel_init,
                           (d_inner, self.d_model))
        A_log = self.param("A_log",
                           lambda key: jnp.log(jnp.broadcast_to(
                               jnp.arange(1, self.d_state + 1, dtype=jnp.float32),
                               (d_half, self.d_state))))
        A = -jnp.exp(A_log.astype(jnp.float32))
        D = self.param("D", nn.initializers.ones, (d_half,))

        L = hidden_states.shape[1]
        if (self.expand == 1 and self.d_conv == 3
                and mamba_window_supported(L) and b >= 1024):
            # windowed regime: the ENTIRE mixer body as one Pallas kernel —
            # the composed path streams xz/conv/x/dt/B/C/y through HBM
            # between stages (measured 1.1-2.3x fwd+bwd on v5e)
            if ln_params is not None:
                return mamba_window_mixer(hidden_states, w_xz, wx, wz, w_dbl,
                                          dt_kernel, dt_bias, A, D, w_out,
                                          d_state=self.d_state,
                                          ln_scale=ln_params[0],
                                          ln_bias=ln_params[1])
            return mamba_window_mixer(hidden_states, w_xz, wx, wz, w_dbl,
                                      dt_kernel, dt_bias, A, D, w_out,
                                      d_state=self.d_state)

        # composed fallback keeps the x + mixer(LN(x)) contract: normalize
        # here, mix the normalized stream, re-add the residual at the end.
        # Lane-padded inputs (models/swin.py, cp > d_model with exact-zero
        # pad lanes) mix their real channels and zero-pad the output back.
        residual = None
        lane_pad = hidden_states.shape[-1] - self.d_model
        if lane_pad:
            if ln_params is not None:
                residual = hidden_states     # padded residual: pads stay 0
            hidden_states = hidden_states[..., :self.d_model]
        if ln_params is not None:
            # LN formula shared with the fused kernels (ops/fused_mlp)
            from ..ops.fused_mlp import fast_layernorm
            if residual is None:
                residual = hidden_states
            hidden_states = fast_layernorm(hidden_states, ln_params[0],
                                           ln_params[1])


        # Channel-minor throughout: (b, l, channels) with channels on the VPU
        # lanes — see selective_scan_cm for why the reference's (b, d, l)
        # layout is hostile to TPU at window-volume sequence lengths.
        xz = (hidden_states.reshape(b * l, self.d_model)
              @ w_xz.astype(hidden_states.dtype)).reshape(b, l, d_inner)

        # Two depthwise conv branches, no bias (ref quirk), SiLU. Run as ONE
        # conv over the concatenated channels: at Swin stage-0 each half is
        # d_model/2 = 48 channels — 48 of 128 VPU lanes (37.5%) split vs 96
        # (75%) concatenated. Separate parameters, concatenated compute.
        xz = nn.silu(depthwise_conv1d_cm(
            xz, jnp.concatenate([wx, wz], axis=0), None, "same"))
        x, z = xz[..., :d_half], xz[..., d_half:]

        # Input-dependent dt, B, C.
        x_dbl = (x.reshape(b * l, d_half) @ w_dbl.astype(x.dtype)
                 ).reshape(b, l, dt_rank + 2 * self.d_state)
        dt = x_dbl[..., :dt_rank]
        B = x_dbl[..., dt_rank:dt_rank + self.d_state]
        C = x_dbl[..., dt_rank + self.d_state:]

        dt = dt @ dt_kernel + dt_bias                              # (b, l, d_half)

        if sp_scan_applicable(L):
            # sequence-parallel full-sequence regime: tokens sharded over the
            # mesh 'model' axis; each chip scans its segment and the carries
            # stitch across chips (ops/selective_scan_sp)
            y = sp_selective_scan_cm(x, dt, A, B, C, D,
                                     delta_bias=dt_bias,  # added twice on purpose
                                     delta_softplus=True)
        elif pallas_scan_supported(L, self.d_state, d_half,
                                   batch=hidden_states.shape[0]):
            # windowed regime: fused Pallas kernel (state never leaves VMEM)
            y = selective_scan_pallas(x, dt, A, B, C, D,
                                      delta_bias=dt_bias,  # added twice on purpose
                                      delta_softplus=True)
        elif L <= 1024:
            y = selective_scan_cm(x, dt, A, B, C, D,
                                  delta_bias=dt_bias,  # added twice on purpose
                                  delta_softplus=True)
        elif _use_long_scan(L, self.d_state, d_half):
            # long full-sequence (ViT) mixing: blocked Pallas kernel —
            # segments as VPU rows, two-pass carry stitch; the N-expanded
            # state never touches HBM (vs the XLA chunked scan's log-depth
            # passes over the (B, D, L, N) discretization)
            y = selective_scan_long(x, dt, A, B, C, D,
                                    delta_bias=dt_bias,  # added twice on purpose
                                    delta_softplus=True)
        else:
            # CPU fallback (interpret-mode Pallas would crawl): chunked
            # associative scan
            y = selective_scan_chunked(
                x.transpose(0, 2, 1), dt.transpose(0, 2, 1), A,
                B.transpose(0, 2, 1), C.transpose(0, 2, 1), D,
                delta_bias=dt_bias, delta_softplus=True).transpose(0, 2, 1)

        y = jnp.concatenate([y, z], axis=-1)                       # (b, l, d_inner)
        out = (y.reshape(b * l, d_inner)                           # out_proj
               @ w_out.astype(y.dtype)).reshape(b, l, self.d_model)
        if lane_pad:
            out = jnp.pad(out, ((0, 0), (0, 0), (0, lane_pad)))
        return out if residual is None else residual + out
