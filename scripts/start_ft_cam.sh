#!/usr/bin/env bash
# Camera-disentangled finetune: per-frame extrinsics into the ControlNet hint
# encoder, zero-masked half the time (reference start_ft_cam.sh).
set -e
DATA=${1:?path to VIPSeg root}
CKPT=${2:?stage-1 checkpoint dir}
CAM=${3:?camera npy root}
OUT=${4:-runs/ft_cam}
python -m posetraj_tpu.train.cli --stage ft_cam --video_folder "$DATA" \
  --output_dir "$OUT" --controlnet_init "$CKPT" --num_train_epochs 3 \
  --cam_path "$CAM" --cam_mask_ratio 0.5 \
  --height 320 --width 576 --learning_rate 1e-5 \
  --per_device_batch_size 1 --gradient_accumulation_steps 2
