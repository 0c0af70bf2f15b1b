"""Convergence head-to-head: this repo (JAX) vs the reference's own torch
modules, trained side by side on the same data (VERDICT r4 #7).

The reference's full trainer cannot run in this image (monai / torchvision /
torchmetrics are not installed and installs are unavailable), so this drives
the strongest feasible subset: a classification model whose token mixer is
the REFERENCE HyenaOperator loaded from /root/reference (the quirk-dense
core compute), with the same surrounding architecture on both sides:

    blocks x { x + Hyena(LN(x)) }  ->  mean-pool  ->  Linear -> Tanh  ->  CE
    (the ViTLinear hyena/mamba head, ref class_heads.py:32-49)

Both sides start from the SAME transplanted initialization, consume the same
batch order, and step Adam(0.9, 0.99) + OneCycleLR with identical
hyperparameters (ref projects/run_*.sh optimizer family). Printed: loss
trajectories and final AUROC (shared numpy implementation). fp32, CPU.

Usage: python scripts/convergence_head_to_head.py [--steps 120]
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

D_MODEL, L, BLOCKS, HEADS = 32, 64, 2, 1
L_MAX = 128
N_TRAIN, BATCH, NCLS = 64, 8, 2
LR, WD = 1e-3, 0.0


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(N_TRAIN, L, D_MODEL)).astype(np.float32)
    # learnable rule: sign of a fixed projection of the token mean
    w = rng.normal(size=(D_MODEL,)).astype(np.float32)
    y = (x.mean(axis=1) @ w > 0).astype(np.int64)
    return x, y


def auroc(scores, labels):
    order = np.argsort(-scores)
    lab = labels[order]
    pos = lab.sum()
    neg = len(lab) - pos
    if pos == 0 or neg == 0:
        return float("nan")
    ranks = np.arange(1, len(lab) + 1)
    return float((ranks[lab == 0].sum() - neg * (neg + 1) / 2) / (pos * neg))


def build_jax(total_steps):
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    from long_context_biomedical_imaging_tpu.models.hyena import HyenaOperator
    from long_context_biomedical_imaging_tpu.models.layers import TorchDense

    class Model(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(BLOCKS):
                h = nn.LayerNorm(name=f"ln_{i}")(x)
                x = x + HyenaOperator(
                    d_model=D_MODEL, l_max=L_MAX, filter_order=64,
                    num_heads=HEADS, short_filter_order=5,
                    name=f"hyena_{i}")(h)
            pooled = x.mean(axis=1)
            return jnp.tanh(TorchDense(NCLS, name="head")(pooled))

    model = Model()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, L, D_MODEL), jnp.float32))
    # lr follows the repo's host-side-lr design: the torch-exact OneCycle
    # value (optim/optim_base.py:_torch_onecycle_lr, already unit-tested
    # step-for-step against torch) is computed on host and fed per step.
    tx = optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-8)
    opt_state = tx.init(variables["params"])

    def loss_fn(params, xb, yb):
        logits = model.apply({"params": params}, xb)
        logp = jax.nn.log_softmax(logits)
        return -jnp.mean(jnp.take_along_axis(logp, yb[:, None], axis=1))

    @jax.jit
    def step(params, opt_state, xb, yb, lr):
        loss, g = jax.value_and_grad(loss_fn)(params, xb, yb)
        updates, opt_state = tx.update(g, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict(params, xb):
        return jax.nn.softmax(model.apply({"params": params}, xb))[:, 1]

    return model, variables, opt_state, step, predict


def build_torch(variables, total_steps):
    import torch
    import torch.nn as tnn

    from test_golden_parity import _load_ref, _t, _transplant_hyena

    ref_hy = _load_ref("ref_hyena", "model/models/hyena.py")

    class TModel(tnn.Module):
        def __init__(self):
            super().__init__()
            self.lns = tnn.ModuleList(
                [tnn.LayerNorm(D_MODEL) for _ in range(BLOCKS)])
            self.mixers = tnn.ModuleList([
                ref_hy.HyenaOperator(
                    d_model=D_MODEL, l_max=L_MAX, filter_order=64,
                    num_heads=HEADS, num_blocks=1, short_filter_order=5,
                    bidrectional=False, dropout=0.0, filter_dropout=0.0,
                    activation="id")
                for _ in range(BLOCKS)])
            self.head = tnn.Linear(D_MODEL, NCLS)

        def forward(self, x):
            for ln, mix in zip(self.lns, self.mixers):
                x = x + mix(ln(x))
            return torch.tanh(self.head(x.mean(dim=1)))

    tm = TModel()
    params = variables["params"]
    with torch.no_grad():
        for i in range(BLOCKS):
            ln = params[f"ln_{i}"]
            tm.lns[i].weight.copy_(_t(ln["scale"]))
            tm.lns[i].bias.copy_(_t(ln["bias"]))
            _transplant_hyena(tm.mixers[i], params[f"hyena_{i}"],
                              D_MODEL, HEADS)
        head = params["head"]["Dense_0"]
        tm.head.weight.copy_(_t(np.asarray(head["kernel"]).T))
        tm.head.bias.copy_(_t(head["bias"]))

    opt = torch.optim.Adam(tm.parameters(), lr=LR, betas=(0.9, 0.99),
                           eps=1e-8, weight_decay=WD)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=LR, total_steps=total_steps, pct_start=0.3,
        anneal_strategy="cos", div_factor=25.0, final_div_factor=1e4)
    lossf = torch.nn.CrossEntropyLoss()   # ref loss_base.py:24-25
    return tm, opt, sched, lossf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    a = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)
    import jax.numpy as jnp
    import torch

    from long_context_biomedical_imaging_tpu.optim.optim_base import \
        _torch_onecycle_lr

    x, y = make_data()
    model, variables, opt_state, jstep, jpredict = build_jax(a.steps)
    tm, topt, tsched, tlossf = build_torch(variables, a.steps)
    params = variables["params"]

    order_rng = np.random.default_rng(42)
    jl_hist, tl_hist = [], []
    print(f"{'step':>5} {'jax_loss':>10} {'torch_loss':>11} {'|diff|':>9}")
    for s in range(a.steps):
        idx = order_rng.permutation(N_TRAIN)[:BATCH]
        xb, yb = x[idx], y[idx]
        lr_s = _torch_onecycle_lr(s, LR, a.steps, pct_start=0.3)
        params, opt_state, jl = jstep(params, opt_state, jnp.asarray(xb),
                                      jnp.asarray(yb), lr_s)
        topt.zero_grad()
        tl = tlossf(tm(torch.from_numpy(xb)), torch.from_numpy(yb))
        tl.backward()
        topt.step()
        tsched.step()
        jl, tl = float(jl), float(tl)
        jl_hist.append(jl)
        tl_hist.append(tl)
        if s < 10 or s % 10 == 0 or s == a.steps - 1:
            print(f"{s:5d} {jl:10.6f} {tl:11.6f} {abs(jl - tl):9.2e}")

    js = np.asarray(jax.device_get(jpredict(params, jnp.asarray(x))))
    with torch.no_grad():
        ts = torch.softmax(tm(torch.from_numpy(x)), dim=1)[:, 1].numpy()
    print(f"\nfinal train AUROC: jax={auroc(js, y):.4f} "
          f"torch={auroc(ts, y):.4f}")
    jl_h, tl_h = np.asarray(jl_hist), np.asarray(tl_hist)
    print(f"first-10-step max |loss diff|: {np.abs(jl_h - tl_h)[:10].max():.2e}")
    print(f"last-20-step mean loss: jax={jl_h[-20:].mean():.5f} "
          f"torch={tl_h[-20:].mean():.5f}")


if __name__ == "__main__":
    main()
