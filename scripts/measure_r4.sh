#!/bin/bash
# Round-4 TPU measurement campaign (VERDICT r3 items #1/#4/#5/#6).
# Usage: bash scripts/measure_r4.sh [logfile] [stage...]
#   stages: bench swin abct profile vit sustained anatomy flash
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4_measurements.log}
shift || true
STAGES=${*:-bench swin abct profile vit sustained anatomy flash}

run() {
  echo "=== [$(date +%H:%M:%S)] $* ===" >> "$LOG"
  timeout 2400 python "$@" >> "$LOG" 2>&1
  echo "--- exit $? [$(date +%H:%M:%S)] ---" >> "$LOG"
}

has() { case " $STAGES " in *" $1 "*) return 0;; *) return 1;; esac; }

if has bench; then
  run bench.py
fi

if has swin; then
  run scripts/bench_config.py --mixer hyena --h 1024 --w 1024 --b 4 --window 4 --patch 2                                        # ptx
  run scripts/bench_config.py --mixer mamba --h 1024 --w 1024 --b 4 --window 4 --patch 2 --task enhance --decoder UperNet2D --cout 1  # micro
  run scripts/bench_config.py --mixer mamba --h 1024 --w 1024 --b 4 --window 8 --patch 2 --task seg --decoder UperNet2D --cin 3 --cout 2  # vessel
  run scripts/bench_config.py --mixer hyena --h 128 --w 128 --t 32 --b 16 --window 8 --patch 2 --task enhance --decoder UperNet3D --cin 2 --cout 2  # cmr
  run scripts/bench_config.py --mixer hyena --h 256 --w 256 --t 64 --b 4 --window 8 --patch 2 --task class --decoder SwinLinear  # emb
  run scripts/bench_config.py --mixer mamba --h 256 --w 256 --t 64 --b 2 --window 4 --patch 2 --task seg --decoder UperNet3D --cout 10  # abct
fi

if has abct; then
  # VERDICT r3 #6: is the blanket Swin remat (the 219 GB/s recompute chain)
  # still needed for HBM, and what does dropping it buy?
  run scripts/bench_config.py --mixer mamba --h 256 --w 256 --t 64 --b 2 --window 4 --patch 2 --task seg --decoder UperNet3D --cout 10  # abct NO remat
  run scripts/bench_config.py --mixer mamba --h 1024 --w 1024 --b 4 --window 8 --patch 2 --task seg --decoder UperNet2D --cin 3 --cout 2  # vessel NO remat
  run scripts/bench_config.py --mixer hyena --h 128 --w 128 --t 32 --b 16 --window 8 --patch 2 --task enhance --decoder UperNet3D --cin 2 --cout 2  # cmr NO remat
  run scripts/bench_config.py --mixer hyena --h 256 --w 256 --t 64 --b 4 --window 8 --patch 2 --task class --decoder SwinLinear  # emb NO remat
fi

if has profile; then
  # VERDICT r3 #5: per-op tables for ALL six flagships
  run scripts/profile_step.py --mixer hyena --h 1024 --w 1024 --b 4 --window 4 --patch 2 --top 25          # ptx
  run scripts/profile_step.py --mixer mamba --h 1024 --w 1024 --b 4 --window 4 --patch 2 --task enhance --decoder UperNet2D --cout 1 --top 25  # micro
  run scripts/profile_step.py --mixer mamba --h 1024 --w 1024 --b 4 --window 8 --patch 2 --task seg --decoder UperNet2D --cin 3 --cout 2 --top 25  # vessel
  run scripts/profile_step.py --mixer hyena --h 128 --w 128 --t 32 --b 16 --window 8 --patch 2 --task enhance --decoder UperNet3D --cin 2 --cout 2 --top 25  # cmr
  run scripts/profile_step.py --mixer hyena --h 256 --w 256 --t 64 --b 4 --window 8 --patch 2 --task class --decoder SwinLinear --top 25  # emb
  run scripts/profile_step.py --mixer mamba --h 256 --w 256 --t 64 --b 2 --window 4 --patch 2 --task seg --decoder UperNet3D --cout 10 --top 25  # abct
fi

if has vit; then
  run scripts/bench_config.py --encoder ViT --mixer attention --patch 8 --h 1024 --w 1024 --b 2 --decoder ViTLinear   # ViT 16k flash
  run scripts/bench_config.py --encoder ViT --mixer hyena --patch 4 --h 1024 --w 1024 --b 1 --decoder ViTLinear      # ViT 65k hyena
  run scripts/bench_config.py --encoder ViT --mixer mamba --patch 4 --h 1024 --w 1024 --b 1 --decoder ViTLinear      # ViT 65k mamba
fi

if has sustained; then
  # VERDICT r3 #4: run.py + loader + metrics sustaining the bench number
  run scripts/bench_sustained.py --subjects 128 --epochs 3 --stats-every 16
  run scripts/bench_sustained.py --subjects 128 --epochs 2 --stats-every 1
fi

if has anatomy; then
  # VERDICT r3 #1: in-kernel stage attribution at flagship stage shapes
  run scripts/bench_kernel_anatomy.py --op hyena --bw 65536 --v 16 --c 96   # ptx s0
  run scripts/bench_kernel_anatomy.py --op hyena --bw 16384 --v 16 --c 192  # ptx s1
  run scripts/bench_kernel_anatomy.py --op mlp --bw 65536 --v 16 --c 96     # ptx s0 MLP
fi

if has flash; then
  run scripts/bench_flash.py
fi

echo "=== campaign done [$(date +%H:%M:%S)] ===" >> "$LOG"
