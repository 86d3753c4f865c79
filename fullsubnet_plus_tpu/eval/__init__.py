"""Evaluation metrics: SI-SDR / STOI / PESQ registry + scoring helpers."""

from fullsubnet_plus_tpu.eval.metrics import (
    si_sdr,
    stoi,
    wb_pesq,
    nb_pesq,
    REGISTERED_METRICS,
    compute_metric,
    transform_pesq_range,
    validation_score,
)
