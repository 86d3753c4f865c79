"""fullsubnet_plus_tpu — a TPU-native (JAX/XLA/Pallas/pjit) speech-enhancement framework.

A from-scratch re-design of the capabilities of FullSubNet+ (ICASSP 2022,
reference implementation RookieJunChen/FullSubNet-plus): STFT feature
extraction, MulCA multi-scale channel attention over magnitude/real/imag
spectrogram branches, TCN full-band extractors, the sub-band unfold-and-stack
folded-batch LSTM, cIRM mask prediction, and iSTFT resynthesis — plus the
DNS-Challenge dynamic-mixing training pipeline, evaluation metrics, and
multi-chip scaling via jax.sharding meshes.

Layers (see SURVEY.md §7):
    dsp/       pure-jnp DSP: STFT/iSTFT, cIRM masks, norms, unfold, drop_band
    nn/        parameterized pure functions: LSTM/GRU scan, TCN, MulCA zoo
    models/    FullSubNet and FullSubNet+ forward passes + registry
    ops/       Pallas TPU kernels for the hot ops
    parallel/  mesh construction and sharding specs
    data/      per-host dynamic-mixing input pipeline, WAV I/O
    train/     optax-based training step, losses, trainer loop
    io/        checkpointing + PyTorch checkpoint converter
    eval/      SI-SDR / STOI / PESQ metric registry
    cli/       train / enhance / evaluate entry points (TOML-configured)
"""

__version__ = "0.1.0"
