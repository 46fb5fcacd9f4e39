#!/usr/bin/env bash
# Stage-1 PoseTraj-10k pretrain with 3D-bbox-composited targets, then continue
# without bbox (reference start_pretrain.sh two-phase recipe).
set -e
DATA=${1:?path to PoseTraj-10k root}
OUT=${2:-runs/pretrain}
python -m posetraj_tpu.train.cli --stage pretrain --video_folder "$DATA" \
  --output_dir "$OUT" --images_bbox --num_train_epochs 6 \
  --height 320 --width 576 --learning_rate 1e-5 \
  --per_device_batch_size 1 --gradient_accumulation_steps 2 \
  --checkpointing_steps 10000
python -m posetraj_tpu.train.cli --stage pretrain --video_folder "$DATA" \
  --output_dir "$OUT-phase2" --num_train_epochs 6 \
  --controlnet_init "$OUT/checkpoint-50000/controlnet" \
  --height 320 --width 576 --learning_rate 1e-5 \
  --per_device_batch_size 1 --gradient_accumulation_steps 2
