#!/bin/bash
# Beyond-HBM full-sequence ViT via sequence parallelism — a TPU-native
# extension with no reference counterpart (the reference scales context only
# algorithmically; SURVEY.md §5.7). The 65,536-token hyena ViT (the l_max
# ceiling config, ref: model/models/backbone_vit.py:172) with the token axis
# sharded over the mesh 'model' axis: --model_parallel=4 puts 16,384 tokens
# per chip, so activations/residuals scale O(L/n) per chip.
#
# Works for all three mixers: hyena (channel re-shard around the long conv),
# attention (ring flash attention, ops/ring_attention.py), mamba (cross-chip
# scan carry stitch, ops/selective_scan_sp.py). Swap --ViT.use_hyena for
# --ViT.use_mamba or neither to select the mixer.
source "$(dirname "$0")/_common.sh"

$RUN \
                --run_name="vit_longseq_sp" \
                --project="lc_biomedical_img" \
                --data_dir="preprocessed_data/ptx" \
                --split_csv_path="csv_samplers/ptx_split.csv" \
                --task_type=class \
                --height=1024 --width=1024 --time=1 \
                --no_in_channel=1 --no_out_channel=2 \
                --batch_size 4 --num_epochs=250 --train_model=True \
                --encoder_name=ViT --ViT.size=small \
                --ViT.patch_size 4 \
                --ViT.use_hyena True --ViT.use_mamba False \
                --decoder_name=ViTLinear --loss_func=CrossEntropy \
                --optim_type=adam --optim.lr=1e-5 --optim.beta1=0.9 --optim.beta2=0.99 \
                --scheduler_type OneCycleLR \
                --model_parallel=4 \
                --device=tpu --use_amp --num_workers=16 --seed 1 \
                --checkpoint_frequency 1000 --override \
                "$@"
