"""WB-PESQ-style perceptual quality estimator (pure numpy, 16 kHz).

Role: the reference consumes ITU-T P.862 ONLY through the `pesq` wheel
(audio_zen/metrics.py:92-100), which is not installable in this
environment — so its headline WB-PESQ metric is uncomputable here. This
module fills that hole with a from-scratch estimator that follows the
P.862/P.862.2 pipeline *structure*:

  level alignment → 100 Hz input high-pass (wideband mode) → envelope
  time alignment → 32 ms Hann frames → Bark-band pitch power densities →
  partial frequency compensation (of the reference) → short-term gain
  compensation (of the degraded) → Zwicker loudness → masked symmetric +
  asymmetric disturbances → L6/L2 two-stage time aggregation → sigmoid
  MOS-LQO mapping.

It is explicitly **NOT ITU-conformant** (registered as `WB_PESQ_EST`,
never silently substituted for `WB_PESQ`): the ITU band tables, filters
and calibration data are licensed and unavailable offline, so

  * the 49 Bark bands use the Traunmüller bark scale,
  * the absolute hearing threshold uses Terhardt's approximation with the
    P.862 assumption that active speech sits at 79 dB SPL,
  * time alignment is a single global envelope cross-correlation (no
    utterance splitting / bad-interval realignment),
  * the two disturbance weights are self-calibrated (see
    `_CALIBRATION_NOTE`) so that additive white noise on speech-shaped
    material reproduces the well-known WB-PESQ-vs-SNR curve shape
    (≈1.3 at 0 dB SNR rising to ≈4.2 at 40 dB) and identical signals
    score ≈4.64.

Within those limits it is monotone in distortion, level-invariant,
delay-robust, and bounded to [~1.0, 4.64] — the properties the framework
needs it for: ranking checkpoints in the validation gate
(base_trainer.py:296-302) and relative A/B evaluation when the wheel is
absent.
"""

from __future__ import annotations

import numpy as np

FS = 16000
FRAME = 512  # 32 ms
SHIFT = 256
N_BANDS = 49
ACTIVE_SPEECH_SPL = 79.0  # dB SPL assumed for level-aligned speech (P.862)

_CALIBRATION_NOTE = """
The aggregation constants below were fit once on synthetic anchors: a
speech-shaped, 4 Hz-amplitude-modulated pink-noise "utterance" with
silences, degraded by additive white noise at SNR ∈ {0, 10, 20, 30, 40} dB,
targeting MOS-LQO ≈ {1.3, 2.0, 2.8, 3.6, 4.2} (the widely reported WB-PESQ
vs SNR shape for noisy speech). The power-law p=0.7 on both disturbances
fits that curve to 0.07 MOS RMSE ({1.34, 1.93, 2.81, 3.47, 4.16}); the
identical-signal score is pinned at 4.64 by construction (zero disturbance
→ raw 4.5 → sigmoid 4.64).
"""

D_POWER = 0.7
D_WEIGHT = 0.5155  # symmetric-disturbance weight (see _CALIBRATION_NOTE)
A_WEIGHT = 0.2011  # asymmetric-disturbance weight


# ---------------------------------------------------------------------------
# Bark scale / tables (Traunmüller; Terhardt absolute threshold)
# ---------------------------------------------------------------------------

def _bark(f):
    return 26.81 * f / (1960.0 + f) - 0.53


def _bark_inv(z):
    return 1960.0 * (z + 0.53) / (26.28 - z)


def _make_bands(n_fft=FRAME, fs=FS, n_bands=N_BANDS):
    """Returns (bin->band index map [n_bins], band centers Hz, band widths
    in bark). Bands are equal-width in bark from 50 Hz to Nyquist."""
    z_lo, z_hi = _bark(50.0), _bark(fs / 2)
    edges_z = np.linspace(z_lo, z_hi, n_bands + 1)
    edges_hz = _bark_inv(edges_z)
    freqs = np.fft.rfftfreq(n_fft, 1.0 / fs)
    band_of_bin = np.clip(np.searchsorted(edges_hz, freqs, side="right") - 1, -1, n_bands - 1)
    band_of_bin[freqs < edges_hz[0]] = -1  # below 50 Hz: discarded
    centers = 0.5 * (edges_hz[:-1] + edges_hz[1:])
    widths_bark = np.diff(edges_z)
    return band_of_bin, centers, widths_bark


_BAND_OF_BIN, _CENTERS_HZ, _WIDTH_BARK = _make_bands()


def _terhardt_threshold_spl(f_hz):
    """Absolute hearing threshold in dB SPL (Terhardt 1979 approximation)."""
    f = np.maximum(f_hz, 20.0) / 1000.0
    return (
        3.64 * f ** -0.8
        - 6.5 * np.exp(-0.6 * (f - 3.3) ** 2)
        + 1e-3 * f ** 4
    )


_ABS_THRESH = 10.0 ** (_terhardt_threshold_spl(_CENTERS_HZ) / 10.0)  # intensity


# ---------------------------------------------------------------------------
# Front end
# ---------------------------------------------------------------------------

def _highpass_100hz(x):
    """2nd-order Butterworth high-pass at 100 Hz (P.862.2 wideband input
    filter role; our own design — the ITU IIR coefficients are not
    reproduced here)."""
    from scipy.signal import butter, sosfilt

    sos = butter(2, 100.0, btype="highpass", fs=FS, output="sos")
    return sosfilt(sos, x)


def _speech_band_power(x):
    """Mean power in the 350-3250 Hz speech band (level-alignment band)."""
    spec = np.fft.rfft(x)
    freqs = np.fft.rfftfreq(len(x), 1.0 / FS)
    mask = (freqs >= 350.0) & (freqs <= 3250.0)
    # Parseval: mean power of the band-limited signal
    return (np.abs(spec[mask]) ** 2).sum() * 2.0 / (len(x) ** 2) + 1e-20


def _level_align(x, target=1e7 / 32768.0**2):
    """Scale so the 350-3250 Hz band has fixed power (P.862 fix_power_level;
    the target keeps the traditional 10^7 figure in int16-sample units)."""
    return x * np.sqrt(target / _speech_band_power(x))


def _envelope_delay(ref, deg, hop=64):
    """Global delay estimate via cross-correlation of log energy envelopes."""
    n = min(len(ref), len(deg)) // hop * hop
    e = lambda x: np.log1p(
        (x[:n].reshape(-1, hop).astype(np.float64) ** 2).sum(axis=1)
    )
    er, ed = e(ref), e(deg)
    er = er - er.mean()
    ed = ed - ed.mean()
    corr = np.correlate(ed, er, mode="full")
    lag = int(np.argmax(corr)) - (len(er) - 1)
    return lag * hop  # samples by which deg lags ref


def _frames(x):
    n = max((len(x) - FRAME) // SHIFT + 1, 1)
    idx = np.arange(FRAME)[None, :] + SHIFT * np.arange(n)[:, None]
    pad = np.zeros(max(0, idx.max() + 1 - len(x)), x.dtype)
    xp = np.concatenate([x, pad])
    return xp[idx] * np.hanning(FRAME)[None, :]


def _pitch_power_density(x):
    """[n_frames, N_BANDS] band intensities, scaled so active speech sits at
    ACTIVE_SPEECH_SPL dB SPL total."""
    frames = _frames(x)
    psd = np.abs(np.fft.rfft(frames, axis=1)) ** 2 / (FRAME * 0.375) ** 2
    bands = np.zeros((len(frames), N_BANDS))
    valid = _BAND_OF_BIN >= 0
    np.add.at(bands.T, _BAND_OF_BIN[valid], psd[:, valid].T)
    total = bands.sum(axis=1)
    active = total > total.max() * 1e-4
    mean_active = total[active].mean() if active.any() else total.mean() + 1e-20
    k = 10.0 ** (ACTIVE_SPEECH_SPL / 10.0) / (mean_active + 1e-20)
    return bands * k


def _zwicker_loudness(p):
    """Bark-band intensity -> specific loudness (Zwicker power law 0.23)."""
    thr = _ABS_THRESH[None, :]
    s = (thr / 0.5) ** 0.23 * ((0.5 + 0.5 * p / thr) ** 0.23 - 1.0)
    return np.where(p > thr, s, 0.0)


# ---------------------------------------------------------------------------
# Main estimator
# ---------------------------------------------------------------------------

def _disturbances(clean: np.ndarray, degraded: np.ndarray,
                  sr: int = 16000) -> tuple:
    """(symmetric, asymmetric) aggregate disturbances — the two numbers the
    final score is an affine+sigmoid function of."""
    from fullsubnet_plus_tpu.data.wav import resample

    ref = np.asarray(clean, np.float64)
    deg = np.asarray(degraded, np.float64)
    if sr != FS:
        ref = resample(ref.astype(np.float32), sr, FS).astype(np.float64)
        deg = resample(deg.astype(np.float32), sr, FS).astype(np.float64)

    ref = _level_align(_highpass_100hz(ref))
    deg = _level_align(_highpass_100hz(deg))

    # Global time alignment
    lag = _envelope_delay(ref, deg)
    if lag > 0:
        deg = deg[lag:]
    elif lag < 0:
        ref = ref[-lag:]
    n = min(len(ref), len(deg))
    ref, deg = ref[:n], deg[:n]
    if n < FRAME:
        return np.inf, np.inf  # too short to score: worst case

    p_ref = _pitch_power_density(ref)
    p_deg = _pitch_power_density(deg)

    total_ref = p_ref.sum(axis=1)
    speech_active = total_ref > 10.0 ** ((ACTIVE_SPEECH_SPL - 30.0) / 10.0)
    if not speech_active.any():
        speech_active = total_ref >= np.median(total_ref)

    # Partial frequency compensation: correct the REFERENCE by the
    # band-wise deg/ref ratio averaged over active frames, clipped ±20 dB.
    num = p_deg[speech_active].mean(axis=0) + 1e3
    den = p_ref[speech_active].mean(axis=0) + 1e3
    band_ratio = np.clip(num / den, 0.01, 100.0)
    p_ref = p_ref * band_ratio[None, :]

    # Short-term gain compensation: correct the DEGRADED frame-by-frame by
    # the smoothed total-power ratio, clipped [3e-4, 5].
    raw_gain = (p_ref.sum(axis=1) + 5e4) / (p_deg.sum(axis=1) + 5e4)
    gain = np.empty_like(raw_gain)
    g = 1.0
    for i, r in enumerate(raw_gain):  # first-order smoother, 0.8 memory
        g = 0.8 * g + 0.2 * r
        gain[i] = g
    p_deg = p_deg * np.clip(gain, 3e-4, 5.0)[:, None]

    l_ref = _zwicker_loudness(p_ref)
    l_deg = _zwicker_loudness(p_deg)

    # Masked symmetric disturbance
    d = l_deg - l_ref
    m = 0.25 * np.minimum(l_deg, l_ref)
    d = np.sign(d) * np.maximum(np.abs(d) - m, 0.0)

    # Asymmetry factor: additive (noise) disturbances weigh more than
    # omissions; below 3 it is zeroed, above 12 clipped (P.862 shape).
    asym = ((p_deg + 50.0) / (p_ref + 50.0)) ** 1.2
    asym = np.where(asym < 3.0, 0.0, np.minimum(asym, 12.0))

    w = _WIDTH_BARK[None, :]
    d_frame = np.sqrt(((np.abs(d) * w) ** 2).sum(axis=1) / w.sum())
    a_frame = (np.abs(d) * asym * w).sum(axis=1) / w.sum()

    # Emphasize frames with audible reference energy (h weighting)
    h = ((total_ref + 1e5) / 1e7) ** 0.04
    h = np.clip(h, 1e-2, 10.0)
    d_frame = d_frame / h
    a_frame = a_frame / h

    def _two_stage(values, p_inner):
        """Lp over 20-frame 'syllables' (hop 10), then L2 over syllables.
        A final tail-anchored window guarantees the last frames are always
        aggregated (otherwise distortion in the trailing ~150 ms of an
        utterance would be invisible)."""
        if len(values) < 20:
            chunks = values[None, :]
        else:
            starts = list(np.arange(0, len(values) - 19, 10))
            if starts[-1] != len(values) - 20:
                starts.append(len(values) - 20)
            chunks = np.stack([values[s : s + 20] for s in starts])
        inner = (np.mean(chunks ** p_inner, axis=1)) ** (1.0 / p_inner)
        return float(np.sqrt(np.mean(inner**2)))

    return _two_stage(d_frame, 6.0), _two_stage(a_frame, 1.0)


def wb_pesq_estimator(clean: np.ndarray, degraded: np.ndarray,
                      sr: int = 16000) -> float:
    """MOS-LQO in [~1.0, 4.64]. See module docstring for scope and caveats."""
    d_total, a_total = _disturbances(clean, degraded, sr)
    if not np.isfinite(d_total):
        return 1.0
    raw = 4.5 - D_WEIGHT * d_total**D_POWER - A_WEIGHT * a_total**D_POWER
    raw = float(np.clip(raw, -0.5, 4.5))
    # P.862.2-style sigmoid mapping to MOS-LQO
    return float(0.999 + 4.0 / (1.0 + np.exp(-1.3669 * raw + 3.8224)))
