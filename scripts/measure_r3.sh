#!/bin/bash
# Round-3 TPU measurement campaign (VERDICT r2 items #1/#2/#4/#5/#9).
# Runs every flagship + ViT config sequentially on the real chip, logging to
# $LOG; each config is its own process so a crash doesn't kill the campaign.
# Usage: bash scripts/measure_r3.sh [logfile] [stage...]
#   stages: bench swin vit profile overfit   (default: all)
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r3_measurements.log}
shift || true
STAGES=${*:-bench swin vit profile overfit}

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
  # the six reference workloads at full geometry (projects/run_*.sh)
  run scripts/bench_config.py --mixer hyena --h 1024 --w 1024 --b 4 --window 4 --patch 2                                        # ptx
  run scripts/bench_config.py --mixer mamba --h 1024 --w 1024 --b 4 --window 4 --patch 2 --task enhance --decoder UperNet2D --cout 1  # micro
  run scripts/bench_config.py --mixer mamba --h 1024 --w 1024 --b 4 --window 8 --patch 2 --task seg --decoder UperNet2D --cin 3 --cout 2 --remat  # vessel
  run scripts/bench_config.py --mixer hyena --h 128 --w 128 --t 32 --b 16 --window 8 --patch 2 --task enhance --decoder UperNet3D --cin 2 --cout 2 --remat  # cmr
  run scripts/bench_config.py --mixer hyena --h 256 --w 256 --t 64 --b 4 --window 8 --patch 2 --task class --decoder SwinLinear --remat  # emb
  run scripts/bench_config.py --mixer mamba --h 256 --w 256 --t 64 --b 2 --window 4 --patch 2 --task seg --decoder UperNet3D --cout 10 --remat  # abct
fi

if has vit; then
  # BASELINE.json ViT configs (VERDICT r2 #4)
  run scripts/bench_config.py --encoder ViT --mixer attention --patch 8 --h 1024 --w 1024 --b 2 --decoder ViTLinear   # ViT 16k flash
  run scripts/bench_config.py --encoder ViT --mixer hyena --patch 4 --h 1024 --w 1024 --b 1 --decoder ViTLinear      # ViT 65k hyena (l_max ceiling)
  run scripts/bench_config.py --encoder ViT --mixer mamba --patch 4 --h 1024 --w 1024 --b 1 --decoder ViTLinear      # ViT 65k mamba (chunked scan)
  run scripts/bench_config.py --encoder ViT --mixer attention --patch 16 --h 1024 --w 1024 --b 4 --decoder ViTLinear # PTX-ViT (BASELINE.json cfg 1)
  run scripts/bench_config.py --encoder ViT --mixer attention --patch 16 --h 1024 --w 1024 --b 4 --task enhance --decoder ViTUNETR --cout 1  # micro-ViT (cfg 2)
  run scripts/bench_config.py --encoder ViT --mixer hyena --patch 2 --h 128 --w 128 --t 32 --b 1 --task seg --decoder UperNet3D --cout 4  # cmr-ViT hyena 65k 3D (cfg 4)
fi

if has profile; then
  # per-op bytes+time breakdowns for BASELINE.md (VERDICT r2 #1)
  run scripts/profile_step.py --mixer hyena --h 1024 --w 1024 --b 4 --window 4 --patch 2 --top 25          # ptx
  run scripts/profile_step.py --mixer mamba --h 256 --w 256 --t 64 --b 2 --window 4 --patch 2 --task seg --decoder UperNet3D --cout 10 --remat --top 25  # abct
  run scripts/profile_step.py --encoder ViT --mixer hyena --patch 4 --h 1024 --w 1024 --b 1 --decoder ViTLinear --top 25  # ViT 65k hyena
  run scripts/profile_step.py --encoder ViT --mixer mamba --patch 4 --h 1024 --w 1024 --b 1 --decoder ViTLinear --top 25  # ViT 65k mamba (chunked scan cost)
  run scripts/bench_long_scan.py --l 65536 --d 192 --n 8       # long-scan kernel A/B at the ViT-small geometry
  run scripts/bench_long_scan.py --l 16384 --d 192 --n 8
fi

if has overfit; then
  run scripts/overfit_one_batch.py --workload all   # convergence validation (VERDICT r2 #5)
fi

echo "=== campaign done [$(date +%H:%M:%S)] ===" >> "$LOG"
