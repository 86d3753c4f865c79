#!/usr/bin/env bash
# Staged pipeline wrapper, mirroring the reference's run.sh (run.sh:41-91 of
# RookieJunChen/FullSubNet-plus): stage 0 = data prep, 1 = train, 2 = enhance.
#   bash run.sh            # all stages
#   bash run.sh 1          # just training
#   bash run.sh 0 1        # prep + train
# Paths are overridable via environment variables instead of the reference's
# hard-coded workspace paths.
set -eu

if test "$#" -eq 1; then
  stage=$(($1)); stop_stage=$(($1))
elif test "$#" -eq 2; then
  stage=$(($1)); stop_stage=$(($2))
else
  stage=0; stop_stage=10
fi

config=${CONFIG:-configs/train.toml}
inference_config=${INFERENCE_CONFIG:-configs/inference.toml}
clean_dir=${CLEAN_DIR:-data/clean}
noise_dir=${NOISE_DIR:-data/noise}
train_data_dir=${TRAIN_DATA_DIR:-train_data}
checkpoint=${CHECKPOINT:-logs/FullSubNet_Plus/train/checkpoints/best_model.npz}
input_dir=${INPUT_DIR:-data/noisy}
output_dir=${OUTPUT_DIR:-logs/eval/enhanced}

# stage 0: generate clean/noise file lists (reference run.sh:41-56)
if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
  mkdir -p "${train_data_dir}"
  python -m fullsubnet_plus_tpu.cli.prepare_data gen-lst \
    "${clean_dir}" "${train_data_dir}/clean.txt"
  python -m fullsubnet_plus_tpu.cli.prepare_data gen-lst \
    "${noise_dir}" "${train_data_dir}/noise.txt"
fi

# stage 1: train (reference run.sh:58-60)
if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  python -m fullsubnet_plus_tpu.cli.train -C "${config}"
fi

# stage 2: enhance (reference run.sh:62-91)
if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  python -m fullsubnet_plus_tpu.cli.enhance \
    -C "${inference_config}" \
    -M "${checkpoint}" \
    -I "${input_dir}" \
    -O "${output_dir}"
fi
