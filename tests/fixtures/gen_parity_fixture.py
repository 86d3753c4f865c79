"""Generate the committed checkpoint-parity fixture (tests/fixtures/
parity_fixture.npz) from the LIVE torch reference at a pinned seed.

The released best_model.tar is unreachable in this image (network egress is
blocked), so the strongest committable evidence is: build the reference
FullSubNet_Plus with the shipped hyperparameters at a pinned torch seed, run
its exact shipped inference pipeline (mag_complex_full_band_crm_mask,
fullsubnet_plus/inferencer/inferencer.py:141-165, plus the 0.8-peak rescale
of base_inferencer.py:151-152) on a deterministic input, and commit the
enhanced waveform. cli/verify_parity.py then reproduces the same waveform
through OUR pipeline offline, on any future revision — drift in the model,
converter, STFT, or mask math fails the comparison.

Run from the repo root (writes tests/fixtures/parity_fixture.npz):

    python tests/fixtures/gen_parity_fixture.py
"""

import os
import sys
import types

import numpy as np

SEED = 7
SR = 16000
DURATION_S = 2.0
REFERENCE = "/root/reference/speech_enhance"

# the shipped hyperparameters, config/train.toml:73-91 (SURVEY.md §2.6)
SHIPPED_MODEL_ARGS = dict(
    num_freqs=257, look_ahead=2, sequence_model="LSTM",
    fb_num_neighbors=0, sb_num_neighbors=15,
    fb_output_activate_function="ReLU", sb_output_activate_function=False,
    fb_model_hidden_size=512, sb_model_hidden_size=384,
    channel_attention_model="TSSE", norm_type="offline_laplace_norm",
    num_groups_in_drop_band=2, kersize=[3, 5, 10], subband_num=1,
    weight_init=False,
)

# FullSubNet baseline (BASELINE config #1): the canonical hyperparameters of
# fullsubnet/model/fullsubnet.py:12-118, served via full_band_crm_mask
# (fullsubnet_plus/inferencer/inferencer.py:116-138).
BASELINE_MODEL_ARGS = dict(
    num_freqs=257, look_ahead=2, sequence_model="LSTM",
    fb_num_neighbors=0, sb_num_neighbors=15,
    fb_output_activate_function="ReLU", sb_output_activate_function=False,
    fb_model_hidden_size=512, sb_model_hidden_size=384,
    norm_type="offline_laplace_norm", num_groups_in_drop_band=2,
    weight_init=False,
)


def make_input() -> np.ndarray:
    """Deterministic speech-shaped test signal: an AM harmonic stack over
    pink-ish noise (pure tones under-exercise the sub-band LSTM)."""
    rng = np.random.default_rng(2024)
    n = int(SR * DURATION_S)
    t = np.arange(n) / SR
    f0 = 140.0 + 40.0 * np.sin(2 * np.pi * 0.7 * t)  # slow pitch wobble
    phase = 2 * np.pi * np.cumsum(f0) / SR
    voiced = sum(
        (0.5 ** k) * np.sin((k + 1) * phase) for k in range(6)
    ) * (0.55 + 0.45 * np.sin(2 * np.pi * 2.3 * t))
    noise = rng.standard_normal(n)
    # crude pink-ish shaping: cumulative leaky integrator
    pink = np.empty(n)
    acc = 0.0
    for i in range(n):
        acc = 0.92 * acc + noise[i]
        pink[i] = acc
    pink /= np.abs(pink).max()
    y = 0.25 * voiced / np.abs(voiced).max() + 0.12 * pink
    return y.astype(np.float32)


def torch_reference_enhance(model, noisy: np.ndarray, n_inputs: int = 3) -> np.ndarray:
    """The shipped inference pipeline, verbatim math (inferencer.py:141-160 +
    base_inferencer.py:151-152's 0.8-peak rescale, pre-int16). n_inputs=1 is
    the baseline's full_band_crm_mask (inferencer.py:116-138): mag only."""
    import torch

    sys.path[:0] = [p for p in (REFERENCE, "/root/reference") if p not in sys.path]
    from audio_zen.acoustics.mask import decompress_cIRM

    with torch.no_grad():
        y = torch.from_numpy(noisy)[None]
        win = torch.hann_window(512)
        noisy_complex = torch.stft(y, 512, 256, 512, window=win, return_complex=True)
        noisy_mag = noisy_complex.abs().unsqueeze(1)
        if n_inputs == 3:
            pred_crm = model(
                noisy_mag, noisy_complex.real.unsqueeze(1), noisy_complex.imag.unsqueeze(1)
            )
        else:
            pred_crm = model(noisy_mag)
        pred_crm = pred_crm.permute(0, 2, 3, 1)
        pred_crm = decompress_cIRM(pred_crm)
        enhanced_real = pred_crm[..., 0] * noisy_complex.real - pred_crm[..., 1] * noisy_complex.imag
        enhanced_imag = pred_crm[..., 1] * noisy_complex.real + pred_crm[..., 0] * noisy_complex.imag
        enhanced = torch.istft(
            torch.complex(enhanced_real, enhanced_imag), 512, 256, 512,
            window=win, length=y.shape[-1],
        )[0].numpy()
    return (0.8 * enhanced / np.max(np.abs(enhanced))).astype(np.float32)


def main():
    import torch

    sys.modules.setdefault("librosa", types.ModuleType("librosa"))
    sys.path[:0] = [p for p in (REFERENCE, "/root/reference") if p not in sys.path]
    from fullsubnet_plus.model.fullsubnet_plus import FullSubNet_Plus

    from fullsubnet.model.fullsubnet import Model as FullSubNet

    torch.manual_seed(SEED)
    model = FullSubNet_Plus(**SHIPPED_MODEL_ARGS).eval()
    noisy = make_input()
    enhanced = torch_reference_enhance(model, noisy)

    torch.manual_seed(SEED)
    baseline = FullSubNet(**BASELINE_MODEL_ARGS).eval()
    enhanced_fsn = torch_reference_enhance(baseline, noisy, n_inputs=1)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "parity_fixture.npz")
    np.savez_compressed(
        out,
        noisy=noisy,
        enhanced_ref=enhanced,
        enhanced_ref_fullsubnet=enhanced_fsn,
        seed=np.int64(SEED),
        sr=np.int64(SR),
        torch_version=np.bytes_(torch.__version__.encode()),
    )
    print(f"wrote {out}: noisy {noisy.shape}, enhanced {enhanced.shape}, "
          f"baseline {enhanced_fsn.shape}, seed {SEED}, torch {torch.__version__}")


if __name__ == "__main__":
    main()
