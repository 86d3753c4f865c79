"""Numerical constants shared across the framework.

Mirrors the semantics of the reference's constant table
(/root/reference/speech_enhance/audio_zen/constant.py:1-9) so that masks,
norms, and losses are bit-compatible with the released checkpoint.
"""

import math

import numpy as np

# float32 machine epsilon — used as the denominator guard in cIRM construction
# and cumulative norms (reference audio_zen/constant.py:8).
EPSILON = float(np.finfo(np.float32).eps)

NEG_INF = float(np.finfo(np.float32).min)
PI = math.pi
SOUND_SPEED = 343  # m/s
MAX_INT16 = int(np.iinfo(np.int16).max)

# Shipped acoustic configuration (reference config/train.toml:10-14).
SR = 16000
N_FFT = 512
WIN_LENGTH = 512
HOP_LENGTH = 256
NUM_FREQS = N_FFT // 2 + 1  # 257
