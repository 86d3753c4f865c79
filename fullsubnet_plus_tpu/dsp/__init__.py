"""Pure-jnp DSP layer: STFT/iSTFT, cIRM masks, norms, sub-band unfold, drop_band."""

from fullsubnet_plus_tpu.dsp.stft import stft, istft, mag_phase, stft_split
from fullsubnet_plus_tpu.dsp.mask import (
    build_ideal_ratio_mask,
    build_complex_ideal_ratio_mask,
    compress_cirm,
    decompress_cirm,
    complex_mul,
)
from fullsubnet_plus_tpu.dsp.norms import (
    offline_laplace_norm,
    cumulative_laplace_norm,
    offline_gaussian_norm,
    cumulative_layer_norm,
    forgetting_norm,
    hybrid_norm,
    get_norm,
)
from fullsubnet_plus_tpu.dsp.unfold import freq_unfold, drop_band
