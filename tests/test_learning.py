"""End-to-end learning smoke test: a tiny FullSubNet+ trained on synthetic
tonal speech + white noise must actually improve SI-SDR over the noisy input.
This validates the full loop (STFT -> cIRM target -> drop_band -> forward ->
Adam) *learns*, not just that the loss decreases on one batch.
"""

import jax
import numpy as np
import pytest

from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS
from fullsubnet_plus_tpu.models.fullsubnet_plus import FullSubNetPlusConfig
from fullsubnet_plus_tpu.train.loss import mse_loss
from fullsubnet_plus_tpu.train.step import (
    make_optimizer,
    make_train_step,
    make_eval_step,
    init_train_state,
)
from fullsubnet_plus_tpu.eval.metrics import si_sdr

SR = 16000
CFG = FullSubNetPlusConfig(
    num_freqs=33, sb_num_neighbors=4, fb_model_hidden_size=32, sb_model_hidden_size=24
)
ACOUSTICS = dict(n_fft=64, hop_length=32, win_length=64)


def _bandlimit(rng, shape, band):
    """White noise restricted to an rFFT bin range (over the signal length)."""
    spec = rng.standard_normal((shape[0], shape[1] // 2 + 1)) + 1j * rng.standard_normal(
        (shape[0], shape[1] // 2 + 1)
    )
    mask = np.zeros(shape[1] // 2 + 1)
    mask[band[0] : band[1]] = 1.0
    y = np.fft.irfft(spec * mask, n=shape[1], axis=-1)
    return (y / (np.abs(y).max(axis=-1, keepdims=True) + 1e-9)).astype(np.float32)


def _make_batch(rng, batch=8, seconds=0.5):
    """Spectrally disjoint clean (low band) and noise (high band): the ideal
    cIRM is ~1 on clean bins and ~0 on noise bins — learnable in a few steps,
    with a large achievable SI-SDR gain."""
    n = int(seconds * SR)
    lo = n // 16  # keep clear of DC
    split = n // 4
    clean = 0.3 * _bandlimit(rng, (batch, n), (lo, split))
    noise = 0.1 * _bandlimit(rng, (batch, n), (split, n // 2))
    return clean + noise, clean


@pytest.mark.slow
def test_training_improves_si_sdr(rng):
    """Overfit one fixed batch, then verify the model actually denoises it
    (SI-SDR of the enhanced output beats the noisy input by >3 dB)."""
    optimizer = make_optimizer(lr=2e-3)
    state = init_train_state(FULLSUBNET_PLUS.init(jax.random.PRNGKey(0), CFG), optimizer)
    step = make_train_step(FULLSUBNET_PLUS, CFG, optimizer, mse_loss, **ACOUSTICS)

    noisy, clean = _make_batch(rng, batch=6, seconds=0.375)
    first_loss = last_loss = None
    for _ in range(60):
        state, metrics = step(state, noisy, clean)
        if first_loss is None:
            first_loss = float(metrics["loss"])
        last_loss = float(metrics["loss"])
    assert last_loss < 0.5 * first_loss, (first_loss, last_loss)

    eval_step = make_eval_step(FULLSUBNET_PLUS, CFG, mse_loss, **ACOUSTICS)
    gains = []
    for b in range(3):
        _, enhanced = eval_step(state.params, noisy[b : b + 1], clean[b : b + 1])
        before = si_sdr(clean[b], noisy[b])
        after = si_sdr(clean[b], np.asarray(enhanced[0]))
        gains.append(after - before)
    mean_gain = float(np.mean(gains))
    assert mean_gain > 3.0, f"expected >3 dB SI-SDR gain, got {mean_gain:.2f} ({gains})"

    # The int8-recurrent serving mode must preserve the TRAINED model's
    # denoising quality, not just agree on random weights (the claim behind
    # making int8 the serving default — docs/PERFORMANCE.md). Force the
    # Pallas kernel in interpret mode on CPU.
    import fullsubnet_plus_tpu.nn.sequence as seq
    from fullsubnet_plus_tpu.enhance import Enhancer

    old = seq.FORCE_PALLAS_INTERPRET
    seq.FORCE_PALLAS_INTERPRET = True
    try:
        e8 = Enhancer(
            FULLSUBNET_PLUS, CFG, state.params, compute_dtype="int8", **ACOUSTICS
        )
        out8 = e8.enhance_batch(noisy[:3])
    finally:
        seq.FORCE_PALLAS_INTERPRET = old
    gains8 = [
        si_sdr(clean[b], out8[b]) - si_sdr(clean[b], noisy[b]) for b in range(3)
    ]
    mean_gain8 = float(np.mean(gains8))
    assert mean_gain8 > mean_gain - 0.5, (
        f"int8 serving lost denoising quality: {mean_gain8:.2f} vs fp32 "
        f"{mean_gain:.2f} dB gain"
    )
