"""Training / inference entry point (ref: run.py:17-70).

Wires config -> datasets -> model -> loss -> optim -> metrics -> trainer and
runs. All reference flags work unchanged; see projects/*.sh for the six
workload configurations.
"""

from __future__ import annotations

import sys


def main(argv=None):
    from long_context_biomedical_imaging_tpu.data import NumpyDataset
    from long_context_biomedical_imaging_tpu.losses import get_loss_func
    from long_context_biomedical_imaging_tpu.metrics import MetricManager
    from long_context_biomedical_imaging_tpu.models import build_model
    from long_context_biomedical_imaging_tpu.optim import OptimManager
    from long_context_biomedical_imaging_tpu.setup import parse_config_and_setup_run
    from long_context_biomedical_imaging_tpu.trainer import TrainManager

    config = parse_config_and_setup_run(argv=argv)

    datasets = {split: NumpyDataset(config, split)
                for split in ("train", "val", "test")}

    model = build_model(config)
    loss_func = get_loss_func(config.loss_func)
    optim_manager = OptimManager(config, num_train_samples=len(datasets["train"]))
    metric_manager = MetricManager(config)

    trainer = TrainManager(config, datasets, model, loss_func, optim_manager,
                           metric_manager)
    try:
        trainer.run()
    finally:
        # a --model_parallel>1 run sets the process-global active mesh
        # (parallel/mesh.py); in-process callers (tests, notebooks) must not
        # inherit it — a leaked model axis would knock every later-traced
        # model off the fused Pallas paths
        from long_context_biomedical_imaging_tpu.parallel import set_active_mesh
        set_active_mesh(None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
