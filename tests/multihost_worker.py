"""Worker process for the 2-process multi-host test (tests/test_multihost.py).

Runs a full run.py training under 2-process JAX (each with 2 virtual CPU
devices — global mesh of 4), then unit-asserts the multi-host primitives:
loader process-sharding, global batch assembly, local-row fetch, and metric
all-reduce. Mirrors the reference's torchrun+DDP+DistributedSampler contract
(ref: setup/setup_utils.py:65-85, trainer/trainer_base.py:126-135,
metrics/metrics_base.py:191-206) without needing a multi-chip machine.

Launched by test_multihost.py with JAX_COORDINATOR_ADDRESS / WORLD_SIZE /
RANK env vars set and the TPU-plugin hook disabled.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    tmp = sys.argv[1]
    pid = int(os.environ["RANK"])

    from run import main as run_main

    args = [
        "--run_name=mh_run", f"--log_dir={tmp}/logs", f"--data_dir={tmp}/data",
        "--task_type=class", "--loss_func=CrossEntropy",
        "--height=16", "--width=16", "--time=1",
        "--no_in_channel=1", "--no_out_channel=2",
        "--num_epochs=2", "--batch_size=1", "--debug", "--override", "--ddp",
        "--seed=1", "--eval_frequency=1", "--checkpoint_frequency=100",
        "--device=cpu", "--num_workers=1", "--prefetch_factor=2",
        "--scheduler_type=OneCycleLR",
        "--encoder_name=ViT", "--decoder_name=ViTLinear",
        "--ViT.size=custom", "--ViT.hidden_size=32", "--ViT.mlp_dim=64",
        "--ViT.num_layers=2", "--ViT.num_heads=2", "--ViT.patch_size", "4",
    ]
    rc = run_main(args)
    assert rc == 0, f"run.py failed on process {pid}"

    import jax
    import numpy as np

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())

    # rank 0 wrote the artifacts (shared filesystem)
    if pid == 0:
        run_dir = f"{tmp}/logs/mh_run"
        for f in ("config.yaml", "models/model_best_checkpoint",
                  "val_metrics.txt", "test_metrics.txt"):
            assert os.path.exists(os.path.join(run_dir, f)), f

    # ---- loader shards subjects disjointly across processes (pi::pc) ------
    from long_context_biomedical_imaging_tpu.data.loader import BatchLoader

    class FakeDS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return (np.full((2, 2), i, np.float32), np.int64(i % 2), f"id{i}")

    loader = BatchLoader(FakeDS(), batch_size=2, shuffle=False, num_workers=1)
    local_ids = [i for b in loader for i in b[2]]
    from jax.experimental import multihost_utils
    counts = multihost_utils.process_allgather(
        np.array([int(s[2:]) in set(int(x[2:]) for x in local_ids)
                  for s in (f"id{k}" for k in range(10))], np.int32))
    per_subject = counts.sum(axis=0)
    assert (per_subject == 1).all(), f"not a disjoint cover: {per_subject}"

    # ---- global batch assembly + local-row fetch ---------------------------
    from long_context_biomedical_imaging_tpu.parallel import (
        create_mesh, fetch_local_rows, put_global_batch)

    mesh = create_mesh()
    local = (np.arange(6, dtype=np.float32).reshape(2, 3) + 100 * pid)
    lab = np.array([pid, pid], np.int32)
    g_img, g_lab = put_global_batch(mesh, local, lab)
    assert g_img.shape == (4, 3), g_img.shape        # global batch = 2 procs x 2
    total = jax.jit(lambda x: x.sum())(g_img)
    expect = sum(np.arange(6) + 100 * p for p in range(2)).sum()
    assert float(total) == expect, (float(total), expect)
    back = fetch_local_rows(g_img)
    assert np.array_equal(back, local), back

    # ---- metric all-reduce: (sum, count) weighted average across hosts -----
    from long_context_biomedical_imaging_tpu.metrics.manager import (
        AverageMeter, MetricManager)

    mm = MetricManager.__new__(MetricManager)   # only _reduce_meters needed
    m = AverageMeter()
    m.update(1.0 + pid, n=1 + pid)   # p0: (1.0, n=1); p1: (2.0, n=2)
    avg = mm._reduce_meters({"x": m})["x"]
    assert abs(avg - (1.0 * 1 + 2.0 * 2) / 3) < 1e-6, avg  # fp32 allgather

    # ---- exact-metrics gather with ragged per-process counts ---------------
    # 9 subjects over 2 processes (5/4 split): the reference's sampler pads so
    # its dist.gather is total; ours must handle the ragged pi::pc shard.
    from long_context_biomedical_imaging_tpu.metrics import functional as MF
    from long_context_biomedical_imaging_tpu.metrics.manager import \
        _ragged_allgather

    rs = np.random.RandomState(0)
    all_preds = rs.rand(9).astype(np.float32)           # binary probs
    all_labels = (rs.rand(9) > 0.5).astype(np.int64)
    lo, hi = (0, 5) if pid == 0 else (5, 9)
    g_preds, g_labels = _ragged_allgather(all_preds[lo:hi], all_labels[lo:hi])
    assert np.allclose(g_preds, all_preds), g_preds
    assert np.array_equal(g_labels, all_labels), g_labels
    assert abs(MF.auroc(g_preds, g_labels, True)
               - MF.auroc(all_preds, all_labels, True)) < 1e-9

    # multiclass (n, C) preds + a zero-row process, with MISMATCHED
    # per-process dtypes: the non-empty process holds bf16 AMP preds and
    # int32 pipeline labels while the zero-row process falls back to
    # float32/int64 empties — the gather must canonicalize before the
    # collective declares a global dtype.
    mc = rs.rand(9, 3).astype(np.float32)
    lo, hi = (0, 9) if pid == 0 else (9, 9)
    import jax.numpy as jnp
    local_mc = (np.asarray(jnp.asarray(mc[lo:hi], jnp.bfloat16))
                if pid == 0 else np.zeros((0, 3), np.float32))
    local_lab = (all_labels[lo:hi].astype(np.int32)
                 if pid == 0 else np.zeros((0,), np.int64))
    g_mc, g_lab = _ragged_allgather(local_mc, local_lab)
    assert g_mc.dtype == np.float32 and g_lab.dtype == np.int32, (g_mc.dtype,
                                                                  g_lab.dtype)
    assert np.allclose(g_mc, mc, atol=1e-2) and np.array_equal(
        g_lab, all_labels)

    print(f"worker {pid}: OK", flush=True)


if __name__ == "__main__":
    main()
