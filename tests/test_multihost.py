"""2-process multi-host test: full run.py training + multi-host primitives.

Spawns two subprocesses (tests/multihost_worker.py), each a separate JAX
process with 2 virtual CPU devices, connected through the JAX distributed
runtime — the same code paths a real multi-host TPU pod uses (ref capability:
torchrun 8-process DDP, setup_utils.py:65-85). Covers: jax.distributed init
from torchrun-style env vars, per-process loader sharding, global batch
assembly (jax.make_array_from_process_local_data), sharded-output local
fetch, metric (sum,count) all-reduce, and checkpoint/barrier flow.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from test_e2e import make_dataset  # noqa: E402


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training(tmp_path):
    make_dataset(f"{tmp_path}/data", "class", cout=2)
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")

    env = dict(os.environ)
    # a fresh interpreter without the TPU-plugin sitecustomize hook, pinned to
    # 2 virtual CPU devices per process
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{_free_port()}"
    env["WORLD_SIZE"] = "2"
    env["WANDB_MODE"] = "disabled"

    procs = []
    for pid in range(2):
        penv = dict(env)
        penv["RANK"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(tmp_path)],
            env=penv, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"worker {pid}: OK" in out

    # both ranks agreed on the artifacts rank 0 wrote
    run_dir = f"{tmp_path}/logs/mh_run"
    metrics = dict(l.split(": ") for l in
                   open(f"{run_dir}/val_metrics.txt").read().strip().splitlines())
    assert np.isfinite(float(metrics["loss"]))
