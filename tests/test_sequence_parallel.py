"""Sequence (token-axis) parallelism for beyond-HBM ViT-hyena contexts.

The reference scales context only algorithmically (SURVEY §5.7); the TPU
rebuild additionally shards the ViT token axis over the mesh 'model' axis
(parallel/mesh.py:shard_tokens), re-sharding to channel-parallel around the
depthwise long conv (models/hyena.py). These tests run the FULL train step on
an 8-virtual-CPU mesh (2 data x 4 model) and check:
  1. numerically identical loss/grads vs the unsharded step (same params,
     same batch);
  2. the compiled HLO really contains the token<->channel all-to-alls (i.e.
     the constraints did something, rather than XLA gathering everything).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from long_context_biomedical_imaging_tpu.losses import get_loss_func
from long_context_biomedical_imaging_tpu.models import build_model
from long_context_biomedical_imaging_tpu.optim import OptimManager
from long_context_biomedical_imaging_tpu.parallel import (create_mesh,
                                                          set_active_mesh)
from long_context_biomedical_imaging_tpu.setup import check_args, parse_config
from long_context_biomedical_imaging_tpu.trainer import (create_train_state,
                                                         make_train_step)


def _vit_hyena_config(batch):
    cfg = parse_config(argv=[
        "--encoder_name=ViT", "--decoder_name=ViTLinear", "--task_type=class",
        "--height=64", "--width=64", "--time=1",
        "--no_in_channel=1", "--no_out_channel=2",
        f"--batch_size={batch}", "--scheduler_type=OneCycleLR",
        "--ViT.size=custom", "--ViT.patch_size", "4",
        "--ViT.hidden_size=32", "--ViT.mlp_dim=64",
        "--ViT.num_layers=2", "--ViT.num_heads=4",
        "--ViT.use_hyena=True"])
    return check_args(cfg)


@pytest.fixture
def setup():
    batch = 2
    cfg = _vit_hyena_config(batch)   # 256 tokens -> 64/device on model=4
    model = build_model(cfg)
    optim = OptimManager(cfg, num_train_samples=64)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(batch, 1, 64, 64, 1).astype(np.float32))
    labels = jnp.asarray(rs.randint(0, 2, size=(batch,)), jnp.int32)
    set_active_mesh(None)
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        jax.random.PRNGKey(0), x, deterministic=True)
    state = create_train_state(model, variables, optim.transform)
    step = make_train_step(model, get_loss_func("CrossEntropy"),
                           optim.transform)
    yield model, optim, state, step, x, labels
    set_active_mesh(None)


@pytest.mark.slow
def test_sequence_parallel_matches_single_device(setup):
    model, optim, state, step, x, labels = setup

    # baseline: no mesh, single device
    set_active_mesh(None)
    ref_state, ref_loss, ref_out = jax.jit(step)(
        state, x, labels, 1e-3, jax.random.PRNGKey(1))
    ref_loss = float(ref_loss)

    # sequence-parallel: 2 data x 4 model; the token axis (256) shards 4-way
    mesh = create_mesh(data_parallel=2, model_parallel=4)
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P("data"))
    sp_state = jax.device_put(state, repl)
    sp_x = jax.device_put(x, bsh)
    sp_labels = jax.device_put(labels, bsh)
    sp_step = jax.jit(step)
    new_state, loss, out = sp_step(sp_state, sp_x, sp_labels, 1e-3,
                                   jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # CPU fp32 math is order-sensitive across the all-to-all re-sharding;
    # agreement to ~1e-5 rules out any wiring error
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-4, atol=1e-5)
    # parameter update parity (covers the full grad path incl. filter params)
    rp = jax.tree_util.tree_leaves(ref_state.params)
    sp = jax.tree_util.tree_leaves(jax.device_get(new_state.params))
    for a, b in zip(rp, sp):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=1e-5)


def test_sequence_parallel_inserts_all_to_all(setup):
    model, optim, state, step, x, labels = setup
    mesh = create_mesh(data_parallel=2, model_parallel=4)
    from jax.sharding import NamedSharding, PartitionSpec as P
    sp_state = jax.device_put(state, NamedSharding(mesh, P()))
    sp_x = jax.device_put(x, NamedSharding(mesh, P("data")))
    sp_labels = jax.device_put(labels, NamedSharding(mesh, P("data")))
    compiled = jax.jit(step).lower(sp_state, sp_x, sp_labels, 1e-3,
                                   jax.random.PRNGKey(1)).compile()
    hlo = compiled.as_text()
    assert "all-to-all" in hlo, \
        "token<->channel re-shard around the long conv did not materialize"


def test_sp_flash_attention_matches_unsharded():
    """sp_flash_attention (q sharded over 'model' under shard_map, k/v
    gathered, Pallas kernel per shard) == single-device flash, fwd + grads,
    including a token count that does NOT divide the model axis (padding
    path)."""
    import jax.numpy as jnp

    from long_context_biomedical_imaging_tpu.ops.attention import (
        sp_flash_attention)
    from long_context_biomedical_imaging_tpu.ops.flash_attention import (
        flash_attention)
    from long_context_biomedical_imaging_tpu.parallel import (
        create_mesh, use_active_mesh)

    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(2, 2, 258, 16).astype(np.float32))  # 258 % 4 != 0
    k = jnp.asarray(rs.randn(2, 2, 258, 16).astype(np.float32))
    v = jnp.asarray(rs.randn(2, 2, 258, 16).astype(np.float32))

    ref = flash_attention(q, k, v)
    gref = jax.grad(lambda *a: jnp.sum(jnp.sin(flash_attention(*a))),
                    argnums=(0, 1, 2))(q, k, v)

    mesh = create_mesh(data_parallel=2, model_parallel=4)
    with use_active_mesh(mesh):
        got = jax.jit(sp_flash_attention)(q, k, v)
        gsp = jax.jit(jax.grad(
            lambda *a: jnp.sum(jnp.sin(sp_flash_attention(*a))),
            argnums=(0, 1, 2)))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(gsp, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_sp_cls_token_residual_stream_shards():
    """VERDICT r4 #6: the cls-token geometry (L = tokens+1) must PAD the
    residual stream to a mesh-axis multiple so every inter-block activation
    shards — no 'constraint skipped' warning (the r4 failure mode, visible
    in MULTICHIP_r04.json for shape (8, 1025, 32)), and the compiled forward
    must contain the ring's collective-permutes (attention ran sharded over
    k/v chunks, not gathered)."""
    import warnings as _w

    cfg = parse_config(argv=[
        "--encoder_name=ViT", "--decoder_name=ViTLinear", "--task_type=class",
        "--height=128", "--width=128", "--time=1",
        "--no_in_channel=1", "--no_out_channel=2",
        "--batch_size=2", "--scheduler_type=OneCycleLR",
        "--ViT.size=custom", "--ViT.patch_size", "4",
        "--ViT.hidden_size=32", "--ViT.mlp_dim=64",
        "--ViT.num_layers=2", "--ViT.num_heads=4"])
    check_args(cfg)
    model = build_model(cfg)  # 1024 patch tokens + cls = 1025 (flash regime)
    x = jnp.zeros((2, 1, 128, 128, 1), jnp.float32)
    set_active_mesh(None)
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        jax.random.PRNGKey(0), x, deterministic=True)
    mesh = create_mesh(data_parallel=2, model_parallel=4)
    try:
        with _w.catch_warnings(record=True) as caught:
            _w.simplefilter("always")
            compiled = jax.jit(
                lambda v, xx: model.apply(v, xx, deterministic=True)[-1]
            ).lower(variables, x).compile()
        skipped = [w for w in caught
                   if "sequence-parallel constraint" in str(w.message)]
        assert not skipped, [str(w.message) for w in skipped]
        hlo = compiled.as_text()
        assert "collective-permute" in hlo, \
            "ring attention collectives missing — stream likely replicated"
    finally:
        set_active_mesh(None)


@pytest.mark.slow
def test_sequence_parallel_vit_attention_train_step():
    """Full ViT-attention train step under SP (flash >= 1024 tokens, plus a
    cls token): since r5 the residual stream pads to a mesh-axis multiple and
    SHARDS (attention slices k/v back to the real 1025 tokens); loss/update
    parity vs the unsharded step proves the pad rows never leak into real
    outputs."""
    cfg = parse_config(argv=[
        "--encoder_name=ViT", "--decoder_name=ViTLinear", "--task_type=class",
        "--height=128", "--width=128", "--time=1",
        "--no_in_channel=1", "--no_out_channel=2",
        "--batch_size=2", "--scheduler_type=OneCycleLR",
        "--ViT.size=custom", "--ViT.patch_size", "4",
        "--ViT.hidden_size=32", "--ViT.mlp_dim=64",
        "--ViT.num_layers=2", "--ViT.num_heads=4"])
    check_args(cfg)
    model = build_model(cfg)
    optim = OptimManager(cfg, num_train_samples=64)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 1, 128, 128, 1).astype(np.float32))
    labels = jnp.asarray(rs.randint(0, 2, size=(2,)), jnp.int32)
    set_active_mesh(None)
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        jax.random.PRNGKey(0), x, deterministic=True)
    state = create_train_state(model, variables, optim.transform)
    step = make_train_step(model, get_loss_func("CrossEntropy"),
                           optim.transform)

    ref_state, ref_loss, _ = jax.jit(step)(state, x, labels, 1e-3,
                                           jax.random.PRNGKey(1))
    ref_loss = float(ref_loss)

    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = create_mesh(data_parallel=2, model_parallel=4)
    try:
        sp_state = jax.device_put(state, NamedSharding(mesh, P()))
        sp_x = jax.device_put(x, NamedSharding(mesh, P("data")))
        sp_labels = jax.device_put(labels, NamedSharding(mesh, P("data")))
        new_state, loss, _ = jax.jit(step)(sp_state, sp_x, sp_labels, 1e-3,
                                           jax.random.PRNGKey(1))
        np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
        rp = jax.tree_util.tree_leaves(ref_state.params)
        sp = jax.tree_util.tree_leaves(jax.device_get(new_state.params))
        for a, b in zip(rp, sp):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=1e-5)
    finally:
        set_active_mesh(None)


def test_sp_selective_scan_matches_single_device():
    """sp_selective_scan_cm (token segments scanned per chip, carries
    stitched via all_gather + prefix recurrence, closed-form fix-up) ==
    the single-device channel-minor scan, fwd + grads."""
    from long_context_biomedical_imaging_tpu.ops.selective_scan import (
        selective_scan_cm)
    from long_context_biomedical_imaging_tpu.ops.selective_scan_sp import (
        sp_selective_scan_cm)
    from long_context_biomedical_imaging_tpu.parallel import (
        create_mesh, use_active_mesh)

    rs = np.random.RandomState(0)
    b, l, d, n = 2, 512, 24, 8
    u = jnp.asarray(rs.randn(b, l, d).astype(np.float32))
    dt = jnp.asarray(rs.randn(b, l, d).astype(np.float32) * 0.5)
    A = -jnp.exp(jnp.asarray(rs.rand(d, n).astype(np.float32)))
    B = jnp.asarray(rs.randn(b, l, n).astype(np.float32))
    C = jnp.asarray(rs.randn(b, l, n).astype(np.float32))
    D = jnp.asarray(rs.rand(d).astype(np.float32))
    db = jnp.asarray(rs.randn(d).astype(np.float32) * 0.1)

    ref = selective_scan_cm(u, dt, A, B, C, D, delta_bias=db)

    def loss_ref(*a):
        return jnp.sum(jnp.sin(selective_scan_cm(*a, delta_bias=db)))

    gref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(u, dt, A, B, C, D)

    mesh = create_mesh(data_parallel=2, model_parallel=4)
    with use_active_mesh(mesh):
        got = jax.jit(lambda *a: sp_selective_scan_cm(*a, delta_bias=db,
                                                      chunk=128))(
            u, dt, A, B, C, D)
        gsp = jax.jit(jax.grad(
            lambda *a: jnp.sum(jnp.sin(sp_selective_scan_cm(
                *a, delta_bias=db, chunk=128))),
            argnums=(0, 1, 2, 3, 4, 5)))(u, dt, A, B, C, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    for name, a, b_ in zip("u dt A B C D".split(), gsp, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-3, err_msg=f"grad {name}")


@pytest.mark.slow
def test_sequence_parallel_vit_mamba_train_step():
    """Full ViT-mamba train step under SP: 4096 tokens shard 4-way and the
    scan dispatches to the cross-chip carry-stitch path (L > 1024 gate);
    loss/update parity vs the unsharded step."""
    cfg = parse_config(argv=[
        "--encoder_name=ViT", "--decoder_name=ViTLinear", "--task_type=class",
        "--height=128", "--width=128", "--time=1",
        "--no_in_channel=1", "--no_out_channel=2",
        "--batch_size=2", "--scheduler_type=OneCycleLR",
        "--ViT.size=custom", "--ViT.patch_size", "2",
        "--ViT.hidden_size=32", "--ViT.mlp_dim=64",
        "--ViT.num_layers=2", "--ViT.num_heads=4",
        "--ViT.use_mamba=True"])
    check_args(cfg)
    model = build_model(cfg)
    optim = OptimManager(cfg, num_train_samples=64)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 1, 128, 128, 1).astype(np.float32))
    labels = jnp.asarray(rs.randint(0, 2, size=(2,)), jnp.int32)
    set_active_mesh(None)
    variables = jax.jit(model.init, static_argnames=("deterministic",))(
        jax.random.PRNGKey(0), x, deterministic=True)
    state = create_train_state(model, variables, optim.transform)
    step = make_train_step(model, get_loss_func("CrossEntropy"),
                           optim.transform)

    ref_state, ref_loss, _ = jax.jit(step)(state, x, labels, 1e-3,
                                           jax.random.PRNGKey(1))
    ref_loss = float(ref_loss)

    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = create_mesh(data_parallel=2, model_parallel=4)
    try:
        sp_state = jax.device_put(state, NamedSharding(mesh, P()))
        sp_x = jax.device_put(x, NamedSharding(mesh, P("data")))
        sp_labels = jax.device_put(labels, NamedSharding(mesh, P("data")))
        new_state, loss, _ = jax.jit(step)(sp_state, sp_x, sp_labels, 1e-3,
                                           jax.random.PRNGKey(1))
        np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
        rp = jax.tree_util.tree_leaves(ref_state.params)
        sp = jax.tree_util.tree_leaves(jax.device_get(new_state.params))
        for a, b in zip(rp, sp):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-4, atol=1e-5)
    finally:
        set_active_mesh(None)


@pytest.mark.slow
def test_sp_selective_scan_pallas_local_path():
    """SP scan with the Pallas long-scan kernel as the local per-chip scan
    (gate monkeypatched on; interpret mode on CPU) + the closed-form final
    state pairing it: parity vs the single-device scan, fwd + grads."""
    from long_context_biomedical_imaging_tpu.ops import selective_scan_sp
    from long_context_biomedical_imaging_tpu.ops.selective_scan import (
        selective_scan_cm)
    from long_context_biomedical_imaging_tpu.parallel import (
        create_mesh, use_active_mesh)

    rs = np.random.RandomState(1)
    b, l, d, n = 2, 512, 16, 8
    u = jnp.asarray(rs.randn(b, l, d).astype(np.float32))
    dt = jnp.asarray(rs.randn(b, l, d).astype(np.float32) * 0.5)
    A = -jnp.exp(jnp.asarray(rs.rand(d, n).astype(np.float32)))
    B = jnp.asarray(rs.randn(b, l, n).astype(np.float32))
    C = jnp.asarray(rs.randn(b, l, n).astype(np.float32))
    D = jnp.asarray(rs.rand(d).astype(np.float32))
    db = jnp.asarray(rs.randn(d).astype(np.float32) * 0.1)

    ref = selective_scan_cm(u, dt, A, B, C, D, delta_bias=db)
    gref = jax.grad(lambda *a: jnp.sum(jnp.sin(
        selective_scan_cm(*a, delta_bias=db))), argnums=(0, 1, 2, 3, 4))(
        u, dt, A, B, C, D)

    mesh = create_mesh(data_parallel=2, model_parallel=4)
    orig = selective_scan_sp._use_pallas_local
    selective_scan_sp._use_pallas_local = lambda *a: True
    try:
        with use_active_mesh(mesh):
            got = jax.jit(lambda *a: selective_scan_sp.sp_selective_scan_cm(
                *a, delta_bias=db, chunk=128))(u, dt, A, B, C, D)
            gsp = jax.jit(jax.grad(
                lambda *a: jnp.sum(jnp.sin(
                    selective_scan_sp.sp_selective_scan_cm(
                        *a, delta_bias=db, chunk=128))),
                argnums=(0, 1, 2, 3, 4)))(u, dt, A, B, C, D)
    finally:
        selective_scan_sp._use_pallas_local = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    for name, a, b_ in zip("u dt A B C".split(), gsp, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-3, err_msg=f"grad {name}")


def test_ring_flash_attention_matches_unsharded():
    """Ring path of sp_flash_attention (q AND k/v sharded, chunks rotating
    via ppermute, lse-merged) == single-device flash, fwd + grads."""
    from long_context_biomedical_imaging_tpu.ops.attention import (
        sp_flash_attention)
    from long_context_biomedical_imaging_tpu.ops.flash_attention import (
        flash_attention)
    from long_context_biomedical_imaging_tpu.parallel import (
        create_mesh, use_active_mesh)

    rs = np.random.RandomState(2)
    q = jnp.asarray(rs.randn(2, 2, 256, 16).astype(np.float32))  # 256 % 4 == 0
    k = jnp.asarray(rs.randn(2, 2, 256, 16).astype(np.float32))
    v = jnp.asarray(rs.randn(2, 2, 256, 16).astype(np.float32))

    ref = flash_attention(q, k, v)
    gref = jax.grad(lambda *a: jnp.sum(jnp.sin(flash_attention(*a))),
                    argnums=(0, 1, 2))(q, k, v)

    mesh = create_mesh(data_parallel=2, model_parallel=4)
    with use_active_mesh(mesh):
        got = jax.jit(sp_flash_attention)(q, k, v)
        gsp = jax.jit(jax.grad(
            lambda *a: jnp.sum(jnp.sin(sp_flash_attention(*a))),
            argnums=(0, 1, 2)))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    for name, a, b_ in zip("q k v".split(), gsp, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5, err_msg=f"grad {name}")


def test_ring_flash_attention_hlo_has_collective_permute():
    """The compiled ring-attention step must move k/v chunks by
    collective-permute (the ring), NOT by all-gathering k/v to every chip."""
    from long_context_biomedical_imaging_tpu.ops.attention import (
        sp_flash_attention)
    from long_context_biomedical_imaging_tpu.parallel import (
        create_mesh, use_active_mesh)

    q = jnp.zeros((2, 2, 256, 16), jnp.float32)
    mesh = create_mesh(data_parallel=2, model_parallel=4)
    with use_active_mesh(mesh):
        hlo = jax.jit(sp_flash_attention).lower(q, q, q).compile().as_text()
    assert "collective-permute" in hlo, "ring rotation did not materialize"


def test_sp_flash_attention_ring_tail_hlo_no_allgather_of_kv():
    """Non-divisible L with L >= ways (the cls-token geometry) must route to
    the ring+tail path: compiled HLO shows collective-permutes (the ring) and
    the only replicated k/v term is the r-token tail, not the full sequence.
    The numeric parity of this path is covered by
    test_sp_flash_attention_matches_unsharded (258 = 4*64 + 2)."""
    from long_context_biomedical_imaging_tpu.ops.attention import (
        sp_flash_attention)
    from long_context_biomedical_imaging_tpu.parallel import (
        create_mesh, use_active_mesh)

    q = jnp.zeros((2, 2, 257, 16), jnp.float32)   # 257 = 4*64 + 1 (cls token)
    mesh = create_mesh(data_parallel=2, model_parallel=4)
    with use_active_mesh(mesh):
        hlo = jax.jit(sp_flash_attention).lower(q, q, q).compile().as_text()
    assert "collective-permute" in hlo, \
        "cls-token geometry fell back to gathered k/v instead of the ring"


def test_sp_flash_attention_below_ways_gathered_fallback():
    """L < ways has no ring chunk; the gathered-k/v fallback must still give
    exact parity (fwd + grads)."""
    from long_context_biomedical_imaging_tpu.ops.attention import (
        sp_flash_attention)
    from long_context_biomedical_imaging_tpu.ops.attention import (
        attention_reference)
    from long_context_biomedical_imaging_tpu.parallel import (
        create_mesh, use_active_mesh)

    rs = np.random.RandomState(3)
    q = jnp.asarray(rs.randn(2, 2, 3, 16).astype(np.float32))
    k = jnp.asarray(rs.randn(2, 2, 3, 16).astype(np.float32))
    v = jnp.asarray(rs.randn(2, 2, 3, 16).astype(np.float32))

    ref = attention_reference(q, k, v)
    mesh = create_mesh(data_parallel=2, model_parallel=4)
    with use_active_mesh(mesh):
        got = jax.jit(sp_flash_attention)(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_sp_flash_attention_ring_tail_16k_cls_geometry():
    """VERDICT r3 #2 done-criterion: ring+tail parity at the 16385-token
    attention+classification geometry (16384 patch tokens + 1 cls) on the
    virtual mesh, fwd + grads through the lse merge and the psummed tail."""
    from long_context_biomedical_imaging_tpu.ops.attention import (
        sp_flash_attention)
    from long_context_biomedical_imaging_tpu.ops.flash_attention import (
        flash_attention)
    from long_context_biomedical_imaging_tpu.parallel import (
        create_mesh, use_active_mesh)

    rs = np.random.RandomState(4)
    L = 16385
    q = jnp.asarray(rs.randn(1, 1, L, 16).astype(np.float32))
    k = jnp.asarray(rs.randn(1, 1, L, 16).astype(np.float32))
    v = jnp.asarray(rs.randn(1, 1, L, 16).astype(np.float32))

    ref = flash_attention(q, k, v)
    gref = jax.grad(lambda *a: jnp.mean(jnp.sin(flash_attention(*a))),
                    argnums=(0, 1, 2))(q, k, v)

    mesh = create_mesh(data_parallel=2, model_parallel=4)
    with use_active_mesh(mesh):
        got = jax.jit(sp_flash_attention)(q, k, v)
        gsp = jax.jit(jax.grad(
            lambda *a: jnp.mean(jnp.sin(sp_flash_attention(*a))),
            argnums=(0, 1, 2)))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    for name, a, b_ in zip("q k v".split(), gsp, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6, err_msg=f"grad {name}")


def test_sp_spectral_conv_matches_single_device():
    """VERDICT r3 #3: under sequence parallelism the hyena long conv must
    keep the fused Pallas spectral kernel (shard_map over channel-sharded
    cells), not fall back to the 5.8x-slower XLA matmul-FFT. Checks dispatch
    (via a counting wrapper) and numeric parity fwd + grads."""
    from long_context_biomedical_imaging_tpu.ops import fftconv
    from long_context_biomedical_imaging_tpu.ops.fftconv import (
        fft_causal_conv)
    from long_context_biomedical_imaging_tpu.parallel import (
        create_mesh, use_active_mesh)

    rs = np.random.RandomState(5)
    B, D, L = 2, 8, 8192            # L >= SPECTRAL_MIN_LEN, D % model == 0
    u = jnp.asarray(rs.randn(B, D, L).astype(np.float32))
    kf = jnp.asarray((rs.randn(D, L) * np.exp(
        -np.linspace(0, 8, L))[None, :]).astype(np.float32))
    bias = jnp.asarray(rs.randn(D).astype(np.float32))

    ref = fft_causal_conv(u, kf, bias)
    gref = jax.grad(lambda *a: jnp.mean(jnp.sin(fft_causal_conv(*a))),
                    argnums=(0, 1, 2))(u, kf, bias)

    calls = []
    orig = fftconv.spectral_causal_conv

    def spy(*a):
        calls.append(1)
        return orig(*a)

    mesh = create_mesh(data_parallel=2, model_parallel=4)
    fftconv.spectral_causal_conv = spy
    try:
        with use_active_mesh(mesh):
            got = jax.jit(fft_causal_conv)(u, kf, bias)
            gsp = jax.jit(jax.grad(
                lambda *a: jnp.mean(jnp.sin(fft_causal_conv(*a))),
                argnums=(0, 1, 2)))(u, kf, bias)
    finally:
        fftconv.spectral_causal_conv = orig
    assert calls, "SP hyena long conv did not dispatch to the spectral kernel"
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)
    for name, a, b_ in zip("u k bias".split(), gsp, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-2, atol=5e-2, err_msg=f"grad {name}")
