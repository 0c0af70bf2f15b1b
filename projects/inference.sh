#!/bin/bash
# TPU port of the reference workload (ref: projects/inference.sh). Same flags; a
# single process drives all local chips via the data-parallel mesh.
source "$(dirname "$0")/_common.sh"

$RUN \
                --inference_only True \
                --inference_dir "/dir_to_load" \
                --inference_log_dir "/dir_to_save" \
                --inference_run_name "inference_only"
