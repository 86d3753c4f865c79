"""Invariant tests for the from-scratch WB-PESQ-style estimator
(eval/pesq_estimator.py). There is no conformant PESQ in this image to
compare against (the reference is in the same boat — it only consumes the
licensed wheel, audio_zen/metrics.py:92-100), so the estimator is pinned by
the properties checkpoint ranking actually needs: fixed point at identity,
strict monotonicity in SNR, level invariance, delay robustness, bounds."""

import numpy as np
import pytest

from fullsubnet_plus_tpu.eval.pesq_estimator import wb_pesq_estimator


def speech_shaped(seconds=4.0, seed=0):
    rng = np.random.default_rng(seed)
    n = int(seconds * 16000)
    spec = np.fft.rfft(rng.standard_normal(n))
    f = np.fft.rfftfreq(n, 1 / 16000)
    shape = 1.0 / np.sqrt(np.maximum(f, 60.0))
    shape *= np.exp(-np.maximum(f - 500, 0) / 2500.0)
    x = np.fft.irfft(spec * shape, n)
    t = np.arange(n) / 16000
    x = x * (0.55 + 0.45 * np.sin(2 * np.pi * 4.0 * t))
    i = int(1.5 * 16000)
    x[i : i + 8000] *= 0.02  # a pause
    return (x / np.abs(x).max() * 0.5).astype(np.float64)


@pytest.fixture(scope="module")
def ref():
    return speech_shaped()


def _with_noise(ref, snr_db, seed=99):
    rng = np.random.default_rng(seed)
    noise = rng.standard_normal(len(ref))
    npow = (ref**2).mean() / (10 ** (snr_db / 10))
    return ref + noise * np.sqrt(npow / (noise**2).mean())


def test_identity_scores_max(ref):
    s = wb_pesq_estimator(ref, ref.copy())
    assert s > 4.5, s


def test_monotone_in_snr(ref):
    scores = [wb_pesq_estimator(ref, _with_noise(ref, snr)) for snr in (0, 5, 10, 20, 30)]
    assert all(b > a for a, b in zip(scores, scores[1:])), scores
    assert scores[0] < 2.0 and scores[-1] > 3.3, scores


def test_bounds(ref):
    worst = wb_pesq_estimator(ref, _with_noise(ref, -20.0))
    assert 0.99 <= worst <= 1.6, worst
    best = wb_pesq_estimator(ref, ref)
    assert best <= 4.65


def test_level_invariance(ref):
    deg = _with_noise(ref, 15.0)
    a = wb_pesq_estimator(ref, deg)
    b = wb_pesq_estimator(ref, 0.25 * deg)
    assert abs(a - b) < 0.05, (a, b)


def test_delay_robustness(ref):
    deg = _with_noise(ref, 15.0)
    a = wb_pesq_estimator(ref, deg)
    shifted = np.concatenate([np.zeros(320), deg])[: len(deg) + 160]
    b = wb_pesq_estimator(ref, shifted)
    assert abs(a - b) < 0.25, (a, b)


def test_registry_and_gate():
    from fullsubnet_plus_tpu.eval.metrics import (
        compute_metric,
        metric_available,
        validation_score,
    )

    assert metric_available("WB_PESQ_EST")
    r = speech_shaped(2.0)
    s = compute_metric("WB_PESQ_EST", r, _with_noise(r, 20.0))
    assert 1.0 <= s <= 4.65
    gated = validation_score({"STOI": 0.9, "WB_PESQ_EST": 3.0})
    assert gated == (0.9 + (3.0 + 0.5) / 5.0) / 2
    # conformant WB_PESQ, when present, still wins
    both = validation_score({"STOI": 0.9, "WB_PESQ": 2.0, "WB_PESQ_EST": 3.0})
    assert both == (0.9 + (2.0 + 0.5) / 5.0) / 2


def test_nb_properties(ref):
    """The narrow-band sibling (P.862/P.862.1 structure at 8 kHz) carries
    the same ranking properties."""
    from fullsubnet_plus_tpu.eval.pesq_estimator import nb_pesq_estimator

    assert nb_pesq_estimator(ref, ref.copy()) > 4.45
    scores = [nb_pesq_estimator(ref, _with_noise(ref, snr))
              for snr in (0, 5, 10, 20, 30)]
    assert all(b > a for a, b in zip(scores, scores[1:])), scores
    assert scores[0] < 2.2 and scores[-1] > 3.3, scores
    assert 0.99 <= nb_pesq_estimator(ref, _with_noise(ref, -20.0)) <= 1.8
    deg = _with_noise(ref, 15.0)
    assert abs(nb_pesq_estimator(ref, deg) - nb_pesq_estimator(ref, 0.25 * deg)) < 0.05


def test_nb_blind_above_4k(ref):
    """Distortion confined above 4 kHz must be invisible to the 8 kHz
    metric but visible to the wideband one."""
    from fullsubnet_plus_tpu.eval.pesq_estimator import nb_pesq_estimator

    rng = np.random.default_rng(11)
    noise = rng.standard_normal(len(ref))
    spec = np.fft.rfft(noise)
    f = np.fft.rfftfreq(len(ref), 1 / 16000)
    spec[f < 4500.0] = 0.0
    hf = np.fft.irfft(spec, len(ref))
    deg = ref + hf * np.sqrt((ref**2).mean() / (hf**2).mean())  # 0 dB SNR, HF-only
    nb_clean = nb_pesq_estimator(ref, ref)
    nb_shift = abs(nb_pesq_estimator(ref, deg) - nb_clean)
    wb_drop = wb_pesq_estimator(ref, ref) - wb_pesq_estimator(ref, deg)
    # The 8 kHz decimator's transition band leaks a little of the 4.5 kHz+
    # noise, so "invisible" means a small residual, dwarfed by the WB drop.
    assert nb_shift < 0.25, nb_shift
    assert wb_drop > 0.5, wb_drop
    assert nb_shift < wb_drop / 3, (nb_shift, wb_drop)


def test_nb_registry():
    from fullsubnet_plus_tpu.eval.metrics import compute_metric, metric_available

    assert metric_available("NB_PESQ_EST")
    r = speech_shaped(2.0)
    assert 1.0 <= compute_metric("NB_PESQ_EST", r, _with_noise(r, 20.0)) <= 4.56


def test_tail_distortion_detected(ref):
    """Distortion confined to the final ~150 ms must lower the score (the
    aggregation includes a tail-anchored window)."""
    rng = np.random.default_rng(7)
    deg = ref.copy()
    deg[-2400:] += rng.standard_normal(2400) * np.sqrt((ref**2).mean()) * 2.0
    clean_score = wb_pesq_estimator(ref, ref)
    tail_score = wb_pesq_estimator(ref, deg)
    assert tail_score < clean_score - 0.05, (clean_score, tail_score)
