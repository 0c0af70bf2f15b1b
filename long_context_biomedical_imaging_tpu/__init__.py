"""TPU-native long-context biomedical imaging framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of
NHLBI/long_context_biomedical_imaging (ML4H 2024): ViT and Swin backbones in 2D/3D
whose token mixer can be swapped between softmax attention, Hyena (FFT long
convolution) and Mamba (selective scan); classification / segmentation /
enhancement heads; per-subject .npy data pipeline with paired augmentations;
and a pjit-compiled data-parallel training runtime over a `jax.sharding.Mesh`.

Layout
------
setup/     config system, composable CLI parsers, run setup (ref: setup/)
data/      .npy subject datasets, shape normalizer, paired augs (ref: data/)
ops/       TPU compute ops: flash attention, windowed attention, FFT long-conv,
           selective scan, depthwise conv (Pallas kernels + XLA baselines)
models/    backbones (ViT/Swin/Identity), mixers (hyena/mamba), decoder heads
losses/    CrossEntropy / MSE / Charbonnier / GaussianDeriv3D / Combined
metrics/   AUROC / accuracy / F1-Dice / SSIM / PSNR + MetricManager
optim/     optax-based OptimManager (adam/adamw/sgd/nadam; onecycle/step/plateau)
parallel/  mesh construction and sharding policy (DP over ICI, optional TP)
trainer/   TrainManager: pjit train/eval steps, checkpoint streams, inference
utils/     logging, checkpointing (orbax), profiling timers
"""

__version__ = "0.1.0"
