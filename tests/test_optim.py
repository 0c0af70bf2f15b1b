"""Optimizer/scheduler semantics: OneCycle parity vs torch, StepLR, plateau,
total-update math, optimizer construction."""

import numpy as np
import pytest

from long_context_biomedical_imaging_tpu.optim import OptimManager, compute_total_updates
from long_context_biomedical_imaging_tpu.setup import parse_config


def make_optim(**over):
    argv = []
    for k, v in over.items():
        argv.append(f"--{k}={v}")
    cfg = parse_config(argv=argv)
    return cfg, OptimManager(cfg, num_train_samples=100, world=1)


def test_onecycle_matches_torch():
    import torch

    cfg, om = make_optim(scheduler_type="OneCycleLR", batch_size=10, num_epochs=5)
    total = om.total_updates
    assert total == 50

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=cfg.optim.lr)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=cfg.optim.lr, total_steps=total,
        pct_start=cfg.scheduler.pct_start)
    for step in range(total):
        torch_lr = sched.get_last_lr()[0]
        ours = om.current_lr(step, epoch=step // 10)
        assert ours == pytest.approx(torch_lr, rel=2e-2, abs=1e-9), f"step {step}"
        opt.step()
        sched.step()


def test_step_lr():
    cfg, om = make_optim(scheduler_type="StepLR")
    base = cfg.optim.lr
    g, s = cfg.scheduler.gamma, cfg.scheduler.step_size
    assert om.current_lr(0, epoch=0) == base
    assert om.current_lr(0, epoch=s) == pytest.approx(base * g)
    assert om.current_lr(0, epoch=3 * s) == pytest.approx(base * g ** 3)


def test_plateau_semantics():
    cfg, om = make_optim(scheduler_type="ReduceLROnPlateau")
    base = cfg.optim.lr
    om.plateau_step(1.0)             # best
    assert om.current_lr(0, 0) == base
    om.plateau_step(1.1)             # worse once; patience=0 -> reduce
    assert om.current_lr(0, 0) == pytest.approx(base * cfg.scheduler.factor)
    om.plateau_step(0.5)             # improves, no change
    assert om.current_lr(0, 0) == pytest.approx(base * cfg.scheduler.factor)
    # never below min_lr
    for _ in range(500):
        om.plateau_step(2.0)
    assert om.current_lr(0, 0) >= cfg.scheduler.min_lr


def test_all_optimizers_construct():
    for otype in ("adam", "adamw", "nadam", "sgd", "lbfgs"):
        cfg, om = make_optim(optim_type=otype)
        assert om.transform is not None


def test_total_updates_with_accumulation():
    cfg = parse_config(argv=["--batch_size=8", "--iters_to_accumulate=2",
                             "--num_epochs=3"])
    assert compute_total_updates(cfg, 100, world=1) == int(np.ceil(100 / 16)) * 3
    # per-device batches: an 8-way data-parallel mesh consumes 8x per update
    assert compute_total_updates(cfg, 100, world=8) == int(np.ceil(100 / 128)) * 3


def test_plateau_cooldown_blocks_reductions():
    """torch semantics: while cooling down, stagnation must not reduce again."""
    cfg, om = make_optim(scheduler_type="ReduceLROnPlateau")
    cfg.scheduler.cooldown = 2
    base = cfg.optim.lr
    f = cfg.scheduler.factor
    om.plateau_step(1.0)   # best
    om.plateau_step(1.5)   # bad > patience(0) -> reduce, cooldown=2
    assert om.current_lr(0, 0) == pytest.approx(base * f)
    om.plateau_step(1.5)   # cooling down: no reduction
    om.plateau_step(1.5)   # cooling down: no reduction
    assert om.current_lr(0, 0) == pytest.approx(base * f)
    om.plateau_step(1.5)   # cooldown over: reduce again
    assert om.current_lr(0, 0) == pytest.approx(base * f * f)


def test_sgd_matches_torch_momentum():
    """ref optim_base.py:91: torch SGD(momentum=0.9). Our optax chain must
    reproduce torch's heavy-ball update (incl. wd folded into the grad)."""
    import jax.numpy as jnp
    import torch

    cfg, om = make_optim(optim_type="sgd")
    cfg.optim.weight_decay = 0.01
    cfg.clip_grad_norm = 0.0
    _, om = cfg, OptimManager(cfg, num_train_samples=100, world=1)
    lr = cfg.optim.lr

    w0 = 0.7
    p = torch.nn.Parameter(torch.tensor([w0]))
    opt = torch.optim.SGD([p], lr=lr, momentum=0.9, weight_decay=0.01)
    params = {"w": jnp.array([w0])}
    opt_state = om.transform.init(params)
    grads_seq = [0.3, -0.1, 0.25]
    for g in grads_seq:
        p.grad = torch.tensor([g])
        opt.step()
        updates, opt_state = om.transform.update(
            {"w": jnp.array([g])}, opt_state, params)
        params = {"w": params["w"] - lr * updates["w"]}
    assert float(params["w"][0]) == pytest.approx(float(p.detach()[0]), abs=1e-7)


def test_plateau_relative_threshold():
    """torch default threshold=1e-4 (rel): a tiny improvement below the
    threshold still counts as a bad epoch."""
    cfg, om = make_optim(scheduler_type="ReduceLROnPlateau")
    base = cfg.optim.lr
    om.plateau_step(1.0)                 # establishes best
    om.plateau_step(1.0 - 1e-6)          # within threshold -> bad epoch
    # patience=0 -> the sub-threshold "improvement" triggers a reduction
    assert om.current_lr(0, 0) == pytest.approx(base * cfg.scheduler.factor)
