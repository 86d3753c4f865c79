// mixkit — native helpers for the per-host dynamic-mixing input pipeline.
//
// The TPU compute path is JAX/XLA/Pallas; this library accelerates the
// HOST-side hot loop that keeps the chips fed (SURVEY.md §7 "Dynamic mixing
// throughput"): PCM16 WAV decode and the SNR-mixing waveform math
// (norm_amplitude → tailor_dB_FS → SNR scale → loudness retarget → de-clip,
// the same equations as fullsubnet_plus_tpu/data/mixing.py and the
// reference dataset_train.py:129-182).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// Built by native/build.sh into libmixkit.so; data/mixing.py falls back to
// numpy when the library is absent.

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Decode interleaved PCM16 little-endian samples to float32 in [-1, 1),
// averaging channels to mono. Returns number of frames written.
int64_t mixkit_pcm16_to_float(const int16_t* samples, int64_t num_frames,
                              int32_t num_channels, float* out) {
  const float scale = 1.0f / 32768.0f;
  if (num_channels == 1) {
    for (int64_t i = 0; i < num_frames; ++i) out[i] = samples[i] * scale;
    return num_frames;
  }
  const float inv_ch = 1.0f / static_cast<float>(num_channels);
  for (int64_t i = 0; i < num_frames; ++i) {
    float acc = 0.0f;
    const int16_t* frame = samples + i * num_channels;
    for (int32_t c = 0; c < num_channels; ++c) acc += frame[c] * scale;
    out[i] = acc * inv_ch;
  }
  return num_frames;
}

static double rms(const float* y, int64_t n) {
  double acc = 0.0;
  for (int64_t i = 0; i < n; ++i) acc += static_cast<double>(y[i]) * y[i];
  return std::sqrt(acc / static_cast<double>(n));
}

static float peak(const float* y, int64_t n) {
  float m = 0.0f;
  for (int64_t i = 0; i < n; ++i) {
    float a = std::fabs(y[i]);
    if (a > m) m = a;
  }
  return m;
}

// In-place peak normalization followed by RMS loudness targeting
// (norm_amplitude + tailor_dB_FS, feature.py:98-109).
void mixkit_normalize_loudness(float* y, int64_t n, float target_db_fs,
                               float eps) {
  const float p = peak(y, n) + eps;
  const float inv_p = 1.0f / p;
  for (int64_t i = 0; i < n; ++i) y[i] *= inv_p;
  const double r = rms(y, n);
  const float scalar =
      static_cast<float>(std::pow(10.0, target_db_fs / 20.0) / (r + eps));
  for (int64_t i = 0; i < n; ++i) y[i] *= scalar;
}

// Full SNR mix (dataset_train.py:153-182, post-RIR). clean and noise are
// modified in place (already loudness-normalized by the caller or here);
// noisy is written out. noisy_target_db_fs is the pre-drawn random target.
// Returns the final scalar applied to clean (for diagnostics).
float mixkit_snr_mix(float* clean, float* noise, float* noisy, int64_t n,
                     float snr_db, float target_db_fs,
                     float noisy_target_db_fs, float eps) {
  mixkit_normalize_loudness(clean, n, target_db_fs, eps);
  mixkit_normalize_loudness(noise, n, target_db_fs, eps);
  const double clean_rms = rms(clean, n);
  const double noise_rms = rms(noise, n);
  const float snr_scalar = static_cast<float>(
      clean_rms / std::pow(10.0, snr_db / 20.0) / (noise_rms + eps));
  for (int64_t i = 0; i < n; ++i) {
    noise[i] *= snr_scalar;
    noisy[i] = clean[i] + noise[i];
  }
  const double noisy_rms = rms(noisy, n);
  const float noisy_scalar = static_cast<float>(
      std::pow(10.0, noisy_target_db_fs / 20.0) / (noisy_rms + eps));
  float total = noisy_scalar;
  for (int64_t i = 0; i < n; ++i) {
    noisy[i] *= noisy_scalar;
    clean[i] *= noisy_scalar;
  }
  const float p = peak(noisy, n);
  if (p > 0.999f) {
    const float declip = p / (0.99f - eps);
    const float inv = 1.0f / declip;
    for (int64_t i = 0; i < n; ++i) {
      noisy[i] *= inv;
      clean[i] *= inv;
    }
    total *= inv;
  }
  return total;
}

// Direct-form FIR convolution of clean with an RIR, truncated to len(clean)
// (the fftconvolve[:len] in dataset_train.py:151 — direct form is faster
// here for typical RIR lengths at 16 kHz given the truncation).
void mixkit_rir_convolve(const float* clean, int64_t n, const float* rir,
                         int64_t rir_len, float* out) {
  for (int64_t i = 0; i < n; ++i) {
    double acc = 0.0;
    const int64_t kmax = (i + 1 < rir_len) ? i + 1 : rir_len;
    for (int64_t k = 0; k < kmax; ++k) {
      acc += static_cast<double>(clean[i - k]) * rir[k];
    }
    out[i] = static_cast<float>(acc);
  }
}

}  // extern "C"
