#!/usr/bin/env bash
# Offline metric wrapper, mirroring the reference's mertrics.sh (sic —
# filename kept for surface parity; mertrics.sh:3-8 of the reference).
set -eu

ref_dir=${REF_DIR:-data/clean}
est_dir=${EST_DIR:-logs/eval/enhanced}
metrics=${METRICS:-SI_SDR,STOI,WB_PESQ,NB_PESQ}
spec=${SPEC:-DNS_1}
out_dir=${OUT_DIR:-logs/eval/metrics}

python -m fullsubnet_plus_tpu.cli.calculate_metrics \
  -R "${ref_dir}" \
  -E "${est_dir}" \
  -M "${metrics}" \
  -S "${spec}" \
  -D "${out_dir}"
