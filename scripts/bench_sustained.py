"""Sustained run.py training throughput at flagship geometries.

bench.py times the bare compiled step; the reference's production path runs
DataLoader workers + per-step metrics around the hot loop
(ref: trainer/trainer_base.py:126-135,154-189). This measures the same thing
for the TPU rebuild: a REAL run.py epoch over synthetic on-disk .npy subjects
(loader threads + paired augmentations + device stats accumulation), and
reports samples/s from the trainer's own epoch line to compare against the
bench.py number. Done-criterion: sustained >= 90% of bench.py.

Round 5 (VERDICT r4 #8): --workload emb/abct run the 3D flagships — 256x256x64
multi-channel volumes (4/16 MB per sample fp32) that stress the single-CPU
host and the H2D relay much harder than ptx's 2D images.

Usage: python scripts/bench_sustained.py [--workload ptx|emb|abct]
       [--subjects 128] [--epochs 3] [--stats-every 16]
"""
import argparse
import os
import re
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> (H, W, T, Cin, Cout, batch, task, loss, encoder argv)
WORKLOADS = {
    "ptx": (1024, 1024, 1, 1, 2, 4, "class", None,
            ["--Swin.window_size", "4", "--Swin.use_hyena=True"]),
    "emb": (256, 256, 64, 1, 2, 4, "class", None,
            ["--Swin.window_size", "8", "--Swin.use_hyena=True"]),
    "abct": (256, 256, 64, 1, 10, 2, "seg", None,
             ["--Swin.window_size", "4", "--Swin.use_mamba=True"]),
}


def make_dataset(root: str, n: int, h: int, w: int, t: int, cout: int,
                 task: str):
    import numpy as np
    os.makedirs(root, exist_ok=True)
    rows = ["SubjectID,Label"]
    rs = np.random.RandomState(0)
    for i in range(n):
        sid = f"s{i:04d}"
        d = os.path.join(root, sid)
        os.makedirs(d, exist_ok=True)
        shape = (h, w) if t == 1 else (h, w, t)
        # fp32 like the reference loader's source arrays
        np.save(os.path.join(d, f"{sid}_input.npy"),
                rs.rand(*shape).astype(np.float32))
        if task == "seg":
            np.save(os.path.join(d, f"{sid}_output.npy"),
                    rs.randint(0, cout, size=shape).astype(np.float32))
        elif task == "enhance":
            np.save(os.path.join(d, f"{sid}_output.npy"),
                    rs.rand(*shape).astype(np.float32))
        rows.append(f"{sid},{i % 2}")
    with open(os.path.join(root, "x_metadata.csv"), "w") as f:
        f.write("\n".join(rows))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="ptx", choices=sorted(WORKLOADS))
    ap.add_argument("--subjects", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--stats-every", type=int, default=16)
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--no-augs", dest="no_augs", action="store_true",
                    help="disable the paired augmentations (isolates the "
                         "loader/upload cost from the aug cost)")
    a = ap.parse_args()

    h, w, t, cin, cout, b, task, loss, enc = WORKLOADS[a.workload]
    data = f"/tmp/lcbi_sustained_{a.workload}"
    marker = os.path.join(data, f".n{a.subjects}")
    if not os.path.exists(marker):
        if os.path.exists(data):
            shutil.rmtree(data)
        print(f"writing {a.subjects} synthetic subjects to {data} ...",
              flush=True)
        make_dataset(data, a.subjects, h, w, t, cout, task)
        open(marker, "w").close()

    decoder = {"class": "SwinLinear", "seg": "UperNet2D" if t == 1
               else "UperNet3D", "enhance": "UperNet2D"}[task]
    logdir = "/tmp/lcbi_sustained_logs"
    if os.path.exists(logdir):
        shutil.rmtree(logdir)
    # full reference geometry with eval disabled so the measured epochs are
    # pure training; 60/20/20 split leaves ~60% for train
    cmd = [sys.executable, os.path.join(ROOT, "run.py"),
           f"--task_type={task}", "--encoder_name=Swin",
           f"--decoder_name={decoder}", f"--data_dir={data}",
           f"--log_dir={logdir}", "--run_name=sustained", "--override",
           f"--height={h}", f"--width={w}", f"--time={t}",
           f"--no_in_channel={cin}", f"--no_out_channel={cout}",
           f"--batch_size={b}", f"--num_epochs={a.epochs}",
           "--scheduler_type=OneCycleLR", "--use_amp",
           "--Swin.size=tiny", "--Swin.patch_size", "2", *enc,
           f"--stats_fetch_every={a.stats_every}",
           "--eval_val_set=False", "--eval_test_set=False",
           "--eval_frequency=1000000"]
    on = "False" if a.no_augs else "True"
    cmd += [f"--affine_aug={on}", f"--brightness_aug={on}",
            f"--gaussian_blur_aug={on}"]
    print(" ".join(cmd), flush=True)
    env = dict(os.environ)
    r = subprocess.run(cmd, cwd=ROOT, env=env, capture_output=True, text=True)
    sys.stdout.write(r.stdout[-3000:])
    sys.stderr.write(r.stderr[-3000:])
    log = os.path.join(logdir, "sustained", "run.log")
    rates = []
    if os.path.exists(log):
        for line in open(log):
            m = re.search(r"epoch (\d+) train: .*\(([\d.]+)s, ([\d.]+) samples/s\)",
                          line)
            if m:
                rates.append((int(m.group(1)), float(m.group(2)),
                              float(m.group(3))))
    for ep, secs, rate in rates:
        tag = " (compile epoch)" if ep == 0 else ""
        print(f"epoch {ep}: {secs:.1f}s  {rate:.2f} samples/s{tag}")
    if len(rates) > 1:
        steady = max(r for ep, _, r in rates if ep > 0)
        print(f"SUSTAINED {a.workload}: {steady:.2f} samples/s "
              f"(stats_fetch_every={a.stats_every})")
    if not a.keep and os.path.exists(logdir):
        shutil.rmtree(logdir)


if __name__ == "__main__":
    main()
