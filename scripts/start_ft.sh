#!/usr/bin/env bash
# Stage-2 open-domain finetune on VIPSeg + CoTracker trajectories
# (reference start_ft.sh).
set -e
DATA=${1:?path to VIPSeg root}
CKPT=${2:?stage-1 checkpoint dir}
OUT=${3:-runs/ft}
python -m posetraj_tpu.train.cli --stage ft --video_folder "$DATA" \
  --output_dir "$OUT" --controlnet_init "$CKPT" --num_train_epochs 3 \
  --height 320 --width 576 --learning_rate 1e-5 \
  --per_device_batch_size 1 --gradient_accumulation_steps 2
