"""Golden metric vectors (VERDICT r1 item 8): freeze today's STOI / SI-SDR /
WB_PESQ_EST behavior on a deterministic degradation suite, so refactors of
eval/stoi.py or eval/pesq_estimator.py cannot silently shift checkpoint
ranking (these metrics feed the best-model gate, eval/metrics.py
validation_score, when the licensed pesq wheel is absent). Values were
computed at introduction (2026-08-20) on CPU float64/float32 numpy.

Also extends the estimator's property suite with the reverberant and
band-limited degradation families the round-1 suite lacked.
"""

import numpy as np
import pytest

from fullsubnet_plus_tpu.eval.metrics import nb_pesq_est, si_sdr, stoi, wb_pesq_est

SR = 16000


def speech_shaped(seed=9, seconds=2.0):
    """Broadband modulated pink-ish noise: energy in every third-octave band
    (tonal signals leave silent bands whose envelope correlation is
    noise-dominated — STOI and the estimator both saturate there, a known
    property of the metrics, not of our implementations)."""
    n = int(SR * seconds)
    rng = np.random.default_rng(seed)
    w = rng.standard_normal(n).astype(np.float64)
    acc = np.zeros(n)
    a = 0.0
    for i in range(n):
        a = 0.9 * a + w[i]
        acc[i] = a
    env = 0.3 + 0.7 * (np.sin(2 * np.pi * 3 * np.arange(n) / SR) > 0)
    return (acc / np.abs(acc).max() * env * 0.3).astype(np.float32)


def add_noise(x, snr_db, seed=1):
    r = np.random.default_rng(seed)
    noise = r.standard_normal(len(x)).astype(np.float32)
    scale = np.linalg.norm(x) / (np.linalg.norm(noise) * 10 ** (snr_db / 20))
    return (x + scale * noise).astype(np.float32)


def reverb(x, t60_s, seed=3):
    r = np.random.default_rng(seed)
    ir = r.standard_normal(int(0.25 * SR)).astype(np.float32)
    ir *= np.exp(-3.0 * np.arange(ir.size) / (t60_s * SR)).astype(np.float32)
    ir[0] = 1.0
    y = np.convolve(x, ir)[: len(x)]
    return (y / np.abs(y).max() * 0.3).astype(np.float32)


def lowpass(x, cutoff_hz):
    X = np.fft.rfft(x)
    f = np.fft.rfftfreq(len(x), 1 / SR)
    X[f > cutoff_hz] = 0
    return np.fft.irfft(X, len(x)).astype(np.float32)


# (SI_SDR dB, STOI, WB_PESQ_EST) — frozen 2026-08-20
GOLDEN = {
    "identity": (160.18767195, 1.00000000, 4.64388875),
    "snr20": (20.00281788, 0.99781712, 4.56648269),
    "snr10": (10.00880976, 0.97521961, 4.10939134),
    "snr0": (0.02773055, 0.77259807, 3.08376493),
    "reverb_t60_0.3": (-25.12752575, 0.44513205, 2.39886482),
    "reverb_t60_0.8": (-28.67450785, 0.12675314, 2.01487781),
    "lowpass_4k": (14.27765643, 0.99907235, 4.23307004),
    "lowpass_2k": (10.17579891, 0.96494887, 3.98025920),
}


# NB_PESQ_EST — frozen 2026-08-20. Narrow-band: lowpass_4k ≈ identity by
# design (nothing above the 4 kHz Nyquist is audible to an 8 kHz metric).
GOLDEN_NB = {
    "identity": 4.54863832,
    "snr20": 4.40607743,
    "snr10": 3.82192078,
    "snr0": 2.41245627,
    "reverb_t60_0.3": 1.74910555,
    "reverb_t60_0.8": 1.45439178,
    "lowpass_4k": 4.54070871,
    "lowpass_2k": 3.69371658,
}


def _cases():
    clean = speech_shaped()
    return clean, {
        "identity": clean,
        "snr20": add_noise(clean, 20),
        "snr10": add_noise(clean, 10),
        "snr0": add_noise(clean, 0),
        "reverb_t60_0.3": reverb(clean, 0.3),
        "reverb_t60_0.8": reverb(clean, 0.8),
        "lowpass_4k": lowpass(clean, 4000),
        "lowpass_2k": lowpass(clean, 2000),
    }


def test_golden_vectors_exact():
    clean, cases = _cases()
    for name, deg in cases.items():
        want_sdr, want_stoi, want_pesq = GOLDEN[name]
        np.testing.assert_allclose(si_sdr(clean, deg), want_sdr,
                                   rtol=1e-5, atol=1e-6, err_msg=name)
        np.testing.assert_allclose(stoi(clean, deg), want_stoi,
                                   rtol=1e-5, atol=1e-6, err_msg=name)
        np.testing.assert_allclose(wb_pesq_est(clean, deg), want_pesq,
                                   rtol=1e-5, atol=1e-6, err_msg=name)
        np.testing.assert_allclose(nb_pesq_est(clean, deg), GOLDEN_NB[name],
                                   rtol=1e-5, atol=1e-6, err_msg=name)


def test_ranking_monotone_within_each_family():
    """The best-model gate only needs correct ORDERING; pin it per family:
    more noise, longer reverb tail, and lower cutoff must each score worse
    on every metric."""
    clean, cases = _cases()

    for metric in (si_sdr, stoi, wb_pesq_est, nb_pesq_est):
        noise = [metric(clean, cases[k]) for k in
                 ("identity", "snr20", "snr10", "snr0")]
        assert noise == sorted(noise, reverse=True), (metric.__name__, noise)
        rev = [metric(clean, cases[k]) for k in
               ("identity", "reverb_t60_0.3", "reverb_t60_0.8")]
        assert rev == sorted(rev, reverse=True), (metric.__name__, rev)
        lp = [metric(clean, cases[k]) for k in
              ("identity", "lowpass_4k", "lowpass_2k")]
        assert lp == sorted(lp, reverse=True), (metric.__name__, lp)


def test_estimator_band_limit_vs_noise_distinct_regimes():
    """A 2 kHz band-limit and 0 dB white noise are different impairment
    classes; the estimator must not collapse them to one score (both near
    3.x-4.x but distinguishable, and each below a mild 20 dB-SNR case)."""
    clean, cases = _cases()
    s_lp = wb_pesq_est(clean, cases["lowpass_2k"])
    s_n0 = wb_pesq_est(clean, cases["snr0"])
    s_n20 = wb_pesq_est(clean, cases["snr20"])
    assert abs(s_lp - s_n0) > 0.2
    assert s_n20 > max(s_lp, s_n0)
