"""End-to-end smoke tests: synthetic .npy datasets -> run.py main() in debug
mode on the 8-device CPU mesh, for each task type; plus inference-only reload.
(SURVEY.md §4 test strategy: 3-step debug runs per task on synthetic data.)"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from run import main  # noqa: E402


def make_dataset(root, task, n=10, h=16, w=16, t=1, cin=1, cout=2, rng=None):
    rng = rng or np.random.default_rng(0)
    rows = []
    for i in range(n):
        sid = f"subj{i:03d}"
        d = os.path.join(root, sid)
        os.makedirs(d, exist_ok=True)
        if t == 1:
            img = rng.normal(size=(h, w)).astype(np.float32) if cin == 1 else \
                rng.normal(size=(h, w, cin)).astype(np.float32)
        else:
            img = rng.normal(size=(h, w, t)).astype(np.float32) if cin == 1 else \
                rng.normal(size=(h, w, t, cin)).astype(np.float32)
        np.save(os.path.join(d, f"{sid}_input.npy"), img)
        if task == "seg":
            mask = rng.integers(0, cout, size=(h, w) if t == 1 else (h, w, t))
            np.save(os.path.join(d, f"{sid}_output.npy"), mask.astype(np.float32))
        elif task == "enhance":
            out = rng.normal(size=img.shape[:2] + ((t,) if t > 1 else ()) +
                             ((cout,) if cout > 1 else ())).astype(np.float32)
            if t == 1 and cout == 1:
                out = rng.normal(size=(h, w)).astype(np.float32)
            np.save(os.path.join(d, f"{sid}_output.npy"), out)
        rows.append((sid, int(rng.integers(0, cout))))
    if task == "class":
        import pandas as pd
        pd.DataFrame({"SubjectID": [r[0] for r in rows],
                      "Label": [r[1] for r in rows]}).to_csv(
            os.path.join(root, "x_metadata.csv"), index=False)
    return root


def base_args(tmp_path, task, run_name, **extra):
    args = [
        f"--run_name={run_name}", f"--log_dir={tmp_path}/logs",
        f"--data_dir={tmp_path}/data", f"--task_type={task}",
        "--height=16", "--width=16", "--time=1",
        "--num_epochs=2", "--batch_size=8", "--debug", "--override",
        "--seed=1", "--eval_frequency=1", "--checkpoint_frequency=100",
        "--device=cpu", "--num_workers=2", "--prefetch_factor=2",
        "--scheduler_type=OneCycleLR",
    ]
    for k, v in extra.items():
        args.append(f"--{k}={v}")
    return args


def small_vit_args():
    return ["--encoder_name=ViT", "--ViT.size=custom", "--ViT.hidden_size=32",
            "--ViT.mlp_dim=64", "--ViT.num_layers=2", "--ViT.num_heads=2",
            "--ViT.patch_size", "4"]


def test_e2e_classification(tmp_path):
    make_dataset(f"{tmp_path}/data", "class", cout=2)
    rc = main(base_args(tmp_path, "class", "cls_run",
                        loss_func="CrossEntropy", decoder_name="ViTLinear",
                        no_in_channel=1, no_out_channel=2) + small_vit_args())
    assert rc == 0
    run_dir = f"{tmp_path}/logs/cls_run"
    assert os.path.exists(f"{run_dir}/config.yaml")
    assert os.path.exists(f"{run_dir}/models/model_last_epoch")
    assert os.path.exists(f"{run_dir}/models/model_best_checkpoint")
    assert os.path.exists(f"{run_dir}/val_metrics.txt")
    assert os.path.exists(f"{run_dir}/test_metrics.txt")
    metrics = dict(l.split(": ") for l in
                   open(f"{run_dir}/val_metrics.txt").read().strip().splitlines())
    assert {"loss", "acc_1", "auroc", "f1"} <= set(metrics)


@pytest.mark.slow
def test_e2e_segmentation_swin(tmp_path):
    make_dataset(f"{tmp_path}/data", "seg", cout=3)
    args = base_args(tmp_path, "seg", "seg_run", loss_func="CrossEntropy",
                     encoder_name="Swin", decoder_name="UperNet2D",
                     no_in_channel=1, no_out_channel=3)
    args += ["--Swin.size=custom", "--Swin.embed_dim=12",
             "--Swin.depths", "1", "1", "1", "1",
             "--Swin.num_heads", "2", "2", "2", "2",
             "--Swin.patch_size", "2", "--Swin.window_size", "2"]
    rc = main(args)
    assert rc == 0
    run_dir = f"{tmp_path}/logs/seg_run"
    assert os.path.exists(f"{run_dir}/models/model_best_checkpoint")
    saved = os.listdir(f"{run_dir}/saved_samples/test")
    assert any(f.endswith("_output.npy") for f in saved)


def tiny_swin_args(window=2, use_hyena=False, use_mamba=False):
    return ["--Swin.size=custom", "--Swin.embed_dim=12",
            "--Swin.depths", "1", "1", "1", "1",
            "--Swin.num_heads", "2", "2", "2", "2",
            "--Swin.patch_size", "2", "--Swin.window_size", str(window),
            f"--Swin.use_hyena={use_hyena}", f"--Swin.use_mamba={use_mamba}"]


@pytest.mark.slow
def test_e2e_classification_swin_hyena(tmp_path):
    """Full train/eval/checkpoint loop with the hyena mixer (the ptx workload
    shape: Swin + hyena + SwinLinear classification) so the fftconv/direct-conv
    dispatch thresholds run inside the real loop (ref: projects/run_ptx.sh)."""
    make_dataset(f"{tmp_path}/data", "class", cout=2)
    rc = main(base_args(tmp_path, "class", "hyena_run",
                        loss_func="CrossEntropy", encoder_name="Swin",
                        decoder_name="SwinLinear",
                        no_in_channel=1, no_out_channel=2)
              + tiny_swin_args(use_hyena=True))
    assert rc == 0
    run_dir = f"{tmp_path}/logs/hyena_run"
    assert os.path.exists(f"{run_dir}/models/model_best_checkpoint")
    assert os.path.exists(f"{run_dir}/val_metrics.txt")


@pytest.mark.slow
def test_e2e_segmentation_swin_mamba(tmp_path):
    """Full loop with the mamba mixer (the vessel workload shape: Swin + mamba
    + UperNet2D segmentation) so the selective-scan dispatch
    (pallas_scan_supported / XLA paths) runs inside the real loop
    (ref: projects/run_vessel.sh)."""
    make_dataset(f"{tmp_path}/data", "seg", cout=2)
    rc = main(base_args(tmp_path, "seg", "mamba_run", loss_func="CrossEntropy",
                        encoder_name="Swin", decoder_name="UperNet2D",
                        no_in_channel=1, no_out_channel=2)
              + tiny_swin_args(use_mamba=True))
    assert rc == 0
    run_dir = f"{tmp_path}/logs/mamba_run"
    assert os.path.exists(f"{run_dir}/models/model_best_checkpoint")
    assert os.path.exists(f"{run_dir}/val_metrics.txt")


@pytest.mark.slow
def test_e2e_enhance_and_inference_only(tmp_path):
    make_dataset(f"{tmp_path}/data", "enhance", cout=1)
    # ViTUNETR taps hidden states 4/7/10 (ref: enhance_heads.py:335-356) so the
    # backbone must have 12 layers like the reference presets.
    vit12 = ["--encoder_name=ViT", "--ViT.size=custom", "--ViT.hidden_size=32",
             "--ViT.mlp_dim=64", "--ViT.num_layers=12", "--ViT.num_heads=2",
             "--ViT.patch_size", "4"]
    rc = main(base_args(tmp_path, "enhance", "enh_run",
                        loss_func="CombinationEnhance", decoder_name="ViTUNETR",
                        no_in_channel=1, no_out_channel=1) + vit12)
    assert rc == 0
    run_dir = f"{tmp_path}/logs/enh_run"
    assert os.path.exists(f"{run_dir}/models/model_best_checkpoint")

    # inference-only reconstructs everything from the run dir (ref:
    # setup_base.py:76-93)
    rc = main(["--inference_only=True", f"--inference_dir={run_dir}",
               f"--inference_log_dir={tmp_path}/logs_inf",
               "--inference_run_name=inf_run"])
    assert rc == 0
    inf_dir = f"{tmp_path}/logs_inf/inf_run"
    assert os.path.exists(f"{inf_dir}/test_metrics.txt")
    assert os.path.exists(f"{inf_dir}/saved_samples/test")


@pytest.mark.slow
def test_e2e_sequence_parallel_cli(tmp_path):
    """run.py --model_parallel=2: the full CLI train/eval/checkpoint loop on
    a dp x sp mesh (ViT-hyena, 16 tokens shard 2-way). Covers the mesh
    plumbing from the flag through run_setup/trainer to shard_tokens — the
    op/step-level SP parity lives in test_sequence_parallel.py."""
    make_dataset(f"{tmp_path}/data", "class", cout=2)
    rc = main(base_args(tmp_path, "class", "sp_run",
                        loss_func="CrossEntropy", decoder_name="ViTLinear",
                        no_in_channel=1, no_out_channel=2,
                        model_parallel=2)
              + ["--encoder_name=ViT", "--ViT.size=custom",
                 "--ViT.hidden_size=32", "--ViT.mlp_dim=64",
                 "--ViT.num_layers=2", "--ViT.num_heads=2",
                 "--ViT.patch_size", "4", "--ViT.use_hyena=True"])
    assert rc == 0
    run_dir = f"{tmp_path}/logs/sp_run"
    assert os.path.exists(f"{run_dir}/models/model_best_checkpoint")
    assert os.path.exists(f"{run_dir}/val_metrics.txt")
