#!/usr/bin/env bash
# Enhancement wrapper, mirroring the reference's inference.sh (inference.sh:6-10).
# Accepts our .npz checkpoints or the released torch .tar; --dtype int8 is the
# fastest serving mode.
set -eu

config=${INFERENCE_CONFIG:-configs/inference.toml}
checkpoint=${CHECKPOINT:-logs/FullSubNet_Plus/train/checkpoints/best_model.npz}
input_dir=${INPUT_DIR:-data/noisy}
output_dir=${OUTPUT_DIR:-logs/eval/enhanced}

python -m fullsubnet_plus_tpu.cli.enhance \
  -C "${config}" \
  -M "${checkpoint}" \
  -I "${input_dir}" \
  -O "${output_dir}" \
  "$@"
