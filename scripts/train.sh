#!/usr/bin/env bash
# Canonical 2D training invocation — the same configuration of record as the
# reference's scripts/train.sh (UNet_3Plus, 512x512, lr 0.005, wd 0.001,
# warmup 0.001, batch 5/device, 5000 epochs, best-model metric IoU).
set -euo pipefail

DATA_PATH=${1:?usage: scripts/train.sh /path/to/DRIVE [extra args...]}
shift || true

python train.py \
  --output_dir output \
  --data_path "${DATA_PATH}" \
  --eval_strategy steps \
  --eval_steps 100 \
  --logging_steps 100 \
  --num_train_epochs 5000 \
  --per_device_train_batch_size 5 \
  --per_device_eval_batch_size 5 \
  --save_steps 1000 \
  --save_total_limit 5 \
  --warmup_ratio 0.001 \
  --learning_rate 0.005 \
  --weight_decay 0.001 \
  --metric_for_best_model iou \
  --in_channels 3 \
  --out_channels 1 \
  --unet_type UNet_3Plus \
  --resolution 512 \
  --bf16 \
  "$@"
