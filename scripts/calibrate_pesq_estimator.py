"""Calibrate the PESQ-estimator disturbance weights on synthetic anchors.

See `_CALIBRATION_NOTE` in fullsubnet_plus_tpu/eval/pesq_estimator.py: the
anchor 'utterance' is speech-shaped, 4 Hz-amplitude-modulated pink noise
with a silence, degraded by additive white noise at SNR ∈ {0,10,20,30,40}
dB; the two mode weights (d_weight, a_weight) are least-squares fit so the
MOS-LQO at those anchors tracks the well-known PESQ-vs-SNR curve shapes.

    python scripts/calibrate_pesq_estimator.py          # fit NB, check WB

Prints the fitted weights (hardcoded into the module's `NB` table) and the
per-anchor residuals for both modes.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fullsubnet_plus_tpu.eval import pesq_estimator as pe  # noqa: E402

SR = 16000
SNRS = (0.0, 10.0, 20.0, 30.0, 40.0)
# WB: reported WB-PESQ (MOS-LQO) vs SNR shape for white-noise-degraded speech.
WB_TARGETS = (1.3, 2.0, 2.8, 3.6, 4.2)
# NB: raw-PESQ shape {1.5, 2.2, 2.9, 3.6, 4.2} through the P.862.1 sigmoid.
NB_TARGETS = (1.35, 1.8, 2.65, 3.65, 4.3)


def anchor_signal(seconds=4.0, seed=0):
    rng = np.random.default_rng(seed)
    n = int(seconds * SR)
    spec = np.fft.rfft(rng.standard_normal(n))
    f = np.fft.rfftfreq(n, 1 / SR)
    shape = 1.0 / np.sqrt(np.maximum(f, 60.0))
    shape *= np.exp(-np.maximum(f - 500, 0) / 2500.0)
    x = np.fft.irfft(spec * shape, n)
    t = np.arange(n) / SR
    x = x * (0.55 + 0.45 * np.sin(2 * np.pi * 4.0 * t))
    i = int(1.5 * SR)
    x[i : i + SR // 2] *= 0.02
    return (x / np.abs(x).max() * 0.5).astype(np.float64)


def degraded_set(ref, seed=99):
    rng = np.random.default_rng(seed)
    noise = rng.standard_normal(len(ref))
    out = []
    for snr in SNRS:
        npow = (ref**2).mean() / (10 ** (snr / 10))
        out.append(ref + noise * np.sqrt(npow / (noise**2).mean()))
    return out


def fit(mode, targets, disturbance_pairs):
    """Least-squares over the sigmoid-mapped anchors with the
    symmetric/asymmetric weight ratio CONSTRAINED to WB's. An
    unconstrained 2-parameter fit on additive-noise-only anchors collapses
    to d_weight≈0 (the asymmetric disturbance alone explains additive
    noise) — which would leave the estimator blind to omission-type
    distortions, exactly what over-suppressing enhancement produces. One
    scale parameter, 5 anchors."""
    slope, offset = mode.sigmoid
    d = np.array([p[0] for p in disturbance_pairs]) ** pe.D_POWER
    a = np.array([p[1] for p in disturbance_pairs]) ** pe.D_POWER
    targets = np.asarray(targets)
    ratio = pe.WB.d_weight / pe.WB.a_weight

    def mos(wd, wa):
        raw = np.clip(4.5 - wd * d - wa * a, -0.5, 4.5)
        return 0.999 + 4.0 / (1.0 + np.exp(-slope * raw + offset))

    best = (np.inf, None)
    for s in np.linspace(0.01, 3.0, 6000):
        wd, wa = ratio * s, s
        r = float(np.sqrt(np.mean((mos(wd, wa) - targets) ** 2)))
        if r < best[0]:
            best = (r, (wd, wa))
    (rmse, (wd, wa)) = best
    return wd, wa, rmse, mos(wd, wa)


def main():
    ref = anchor_signal()
    degs = degraded_set(ref)

    for name, mode, targets in (("WB", pe.WB, WB_TARGETS),
                                ("NB", pe.NB, NB_TARGETS)):
        pairs = [pe._disturbances(ref, d, SR, mode) for d in degs]
        wd, wa, rmse, fitted = fit(mode, targets, pairs)
        current = [pe._score(ref, d, SR, mode) for d in degs]
        print(f"{name}: fitted d_weight={wd:.4f} a_weight={wa:.4f} "
              f"rmse={rmse:.3f}")
        print(f"  targets        : {np.round(targets, 2).tolist()}")
        print(f"  fit at anchors : {np.round(fitted, 2).tolist()}")
        print(f"  module weights ({mode.d_weight}, {mode.a_weight}) give: "
              f"{np.round(current, 2).tolist()}")


if __name__ == "__main__":
    main()
