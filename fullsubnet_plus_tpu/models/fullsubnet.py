"""FullSubNet (baseline) — magnitude-only full-band + sub-band model.

Reference: fullsubnet/model/fullsubnet.py:12-118. Full-band LSTM(512)x2 over
257 bins → unfold (15 neighbors/side) → concat with unfolded full-band output
→ sub-band LSTM(384)x2 → cIRM [B, 2, F, T]. Same look-ahead pad/slice and
drop_band training path as FullSubNet+.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from fullsubnet_plus_tpu.dsp.norms import get_norm, time_mask
from fullsubnet_plus_tpu.dsp.unfold import freq_unfold, drop_band
from fullsubnet_plus_tpu.nn.sequence import sequence_model_init, sequence_model_apply


@dataclasses.dataclass(frozen=True)
class FullSubNetConfig:
    num_freqs: int = 257
    look_ahead: int = 2
    sequence_model: str = "LSTM"
    fb_num_neighbors: int = 0
    sb_num_neighbors: int = 15
    fb_output_activate_function: str | bool = "ReLU"
    sb_output_activate_function: str | bool = False
    fb_model_hidden_size: int = 512
    sb_model_hidden_size: int = 384
    norm_type: str = "offline_laplace_norm"
    num_groups_in_drop_band: int = 2
    # Serving-only int8-recurrent LSTMs (ops/lstm_pallas.py); forward-only.
    quantized_lstm: bool = False

    @property
    def sb_input_size(self) -> int:
        return (self.sb_num_neighbors * 2 + 1) + (self.fb_num_neighbors * 2 + 1)


def init(key, config: FullSubNetConfig = FullSubNetConfig(), dtype=jnp.float32):
    assert config.sequence_model in ("GRU", "LSTM")
    k_fb, k_sb = jax.random.split(key)
    return {
        "fb_model": sequence_model_init(
            k_fb,
            input_size=config.num_freqs,
            output_size=config.num_freqs,
            hidden_size=config.fb_model_hidden_size,
            num_layers=2,
            bidirectional=False,
            sequence_model=config.sequence_model,
            dtype=dtype,
        ),
        "sb_model": sequence_model_init(
            k_sb,
            input_size=config.sb_input_size,
            output_size=2,
            hidden_size=config.sb_model_hidden_size,
            num_layers=2,
            bidirectional=False,
            sequence_model=config.sequence_model,
            dtype=dtype,
        ),
    }


def apply(
    params,
    noisy_mag: jnp.ndarray,
    config: FullSubNetConfig = FullSubNetConfig(),
    *,
    training: bool = False,
    valid_frames=None,
) -> jnp.ndarray:
    """[B, 1, F, T] -> compressed cIRM [B, 2, F(, /groups if training), T].

    `valid_frames` ([B] int32, serving only): masked offline-norm statistics
    for bucket-padded batches (see fullsubnet_plus.apply); the LSTMs are
    causal so only the two norms need it here."""
    assert noisy_mag.ndim == 4
    norm = get_norm(config.norm_type)
    noisy_mag = jnp.pad(noisy_mag, [(0, 0)] * 3 + [(0, config.look_ahead)])
    batch_size, num_channels, num_freqs, num_frames = noisy_mag.shape
    assert num_channels == 1

    valid = None
    if valid_frames is not None:
        assert not training, "valid_frames is a serving-path feature"
        # entry mask zeroes beyond the DATA frames; the stats count includes
        # the look_ahead zeros (see fullsubnet_plus.apply)
        data_valid = jnp.minimum(valid_frames, num_frames)
        valid = jnp.minimum(valid_frames + config.look_ahead, num_frames)
        entry_mask = time_mask(num_frames, data_valid, noisy_mag.dtype)[
            :, None, None, :
        ]
        noisy_mag = noisy_mag * entry_mask

    fb_input = norm(noisy_mag, valid=valid).reshape(batch_size, num_freqs, num_frames)
    fb_output = sequence_model_apply(
        params["fb_model"],
        fb_input,
        sequence_model=config.sequence_model,
        output_activate_function=config.fb_output_activate_function,
        fast=True,  # Pallas kernel on TPU; custom VJP covers training
        quantized=config.quantized_lstm and not training,
    ).reshape(batch_size, 1, num_freqs, num_frames)

    fb_w = config.fb_num_neighbors * 2 + 1
    sb_w = config.sb_num_neighbors * 2 + 1
    fb_unf = freq_unfold(fb_output, config.fb_num_neighbors).reshape(
        batch_size, num_freqs, fb_w, num_frames
    )
    mag_unf = freq_unfold(noisy_mag, config.sb_num_neighbors).reshape(
        batch_size, num_freqs, sb_w, num_frames
    )
    sb_input = norm(jnp.concatenate([mag_unf, fb_unf], axis=2), valid=valid)

    if training:
        sb_input = drop_band(
            jnp.transpose(sb_input, (0, 2, 1, 3)), config.num_groups_in_drop_band
        )
        sb_input = jnp.transpose(sb_input, (0, 2, 1, 3))
    num_freqs_out = sb_input.shape[1]

    sb_input = sb_input.reshape(batch_size * num_freqs_out, config.sb_input_size, num_frames)
    sb_mask = sequence_model_apply(
        params["sb_model"],
        sb_input,
        sequence_model=config.sequence_model,
        output_activate_function=config.sb_output_activate_function,
        fast=True,  # Pallas kernel on TPU; custom VJP covers training
        quantized=config.quantized_lstm and not training,
    )
    sb_mask = jnp.transpose(
        sb_mask.reshape(batch_size, num_freqs_out, 2, num_frames), (0, 2, 1, 3)
    )
    return sb_mask[:, :, :, config.look_ahead :]
