"""Enhancement engine: every inference mode of the reference Inferencer.

Re-design of fullsubnet_plus/inferencer/inferencer.py:52-256 +
audio_zen/inferencer/base_inferencer.py:134-160 as jitted pure functions.
The shipped default mode is `mag_complex_full_band_crm_mask`
(config/inference.toml:10).

TPU-first notes:
  * Each mode is one jitted program: STFT → model → mask application →
    iSTFT, no host round-trips.
  * Utterances are right-padded to a shared bucket length so XLA compiles a
    handful of shapes, and whole *batches* of utterances are enhanced per
    call — the throughput path the reference lacks (it loops file by file at
    batch 1).
  * For multi-chip batched enhancement, the batch dim shards over the mesh's
    'data' axis (batch entries are independent).
  * The final 0.8·int16-peak rescale (base_inferencer.py:151-152) changes
    absolute level and is replicated for waveform parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fullsubnet_plus_tpu.dsp.stft import stft_split, istft
from fullsubnet_plus_tpu.dsp.mask import decompress_cirm
from fullsubnet_plus_tpu.dsp.unfold import freq_unfold


def _crm_to_wave(crm, noisy_real, noisy_imag, length, n_fft, hop, win,
                 valid_frames=None):
    """decompress cIRM -> complex multiply -> iSTFT (inferencer.py:154-158).

    `valid_frames` (bucket-padded batches): frames beyond each utterance's
    own count are zeroed HERE (they hold boundary leakage × a post-sequence
    CRM the exact-length run never produces — the iSTFT only masks its
    window-ENVELOPE denominator, not the OLA numerator, so without this the
    invalid frames leak into the last n_fft valid samples; regression:
    test_length_masked_small_gap_and_fullsubnet drops 124 dB -> 41 dB) and
    the iSTFT normalizes with the per-utterance window envelope."""
    crm = decompress_cirm(crm)
    enhanced_real = crm[..., 0] * noisy_real - crm[..., 1] * noisy_imag
    enhanced_imag = crm[..., 1] * noisy_real + crm[..., 0] * noisy_imag
    if valid_frames is not None:
        from fullsubnet_plus_tpu.dsp.norms import time_mask

        mask = time_mask(
            enhanced_real.shape[-1], valid_frames, enhanced_real.dtype
        )[:, None, :]
        enhanced_real = enhanced_real * mask
        enhanced_imag = enhanced_imag * mask
    return istft((enhanced_real, enhanced_imag), n_fft, hop, win, length=length,
                 valid_frames=valid_frames)


def _reflect_fix_tail(noisy, lengths, n_fft, hop):
    """Extend the bucket by one reflect-fixed region so every valid STFT
    frame reads the exact-length run's center=True reflect padding bitwise
    (torch.stft pads y[L..L+p) with y[2L-2-p]).

    Returns a [B, Lp + pad_ext] array: extending (rather than rewriting in
    place) matters when an utterance ends within n_fft//2 of the bucket
    edge — there the bucket's own reflect pad would otherwise reach into
    the last valid frame with a reflection-of-the-reflection. The caller
    keeps `length=Lp` for the final waveform cut; the extra trailing frames
    are beyond every row's valid count and masked.

    Built from per-row fixed-size dynamic slices, NOT a whole-array gather —
    a [B, 160k] take_along_axis costs ~100 ms on v5e; this form is ~2 ms."""
    pad = n_fft // 2
    pad_ext = -(-pad // hop) * hop  # keep the frame grid aligned
    ext = jnp.pad(noisy, ((0, 0), (0, pad_ext)))
    # tail[j] = y[L-pad-1+j]; reversed gives y[L-2-j] = the reflection.
    starts = jnp.maximum(lengths - pad - 1, 0)
    tails = jax.vmap(
        lambda row, s: jax.lax.dynamic_slice(row, (s,), (pad,))
    )(noisy, starts)
    reflect = tails[:, ::-1]
    # pad_ext >= pad by construction, so a full-length row's update lands
    # entirely inside the (masked, then cut) extension.
    ext = jax.vmap(
        lambda row, r, s: jax.lax.dynamic_update_slice(row, r, (s,))
    )(ext, reflect, lengths)
    return ext[:, : noisy.shape[1] + pad_ext]


def _attach_int8_prepared(params):
    """Quantize every 2-layer-LSTM sequence model's recurrent weights at
    ENGINE BUILD TIME (ops/lstm_pallas.py prepare_quantized_lstm) and
    attach them under the seq dict's "int8_prepared" key, where the
    quantized serving kernel finds them — the int8 weights/scales then
    enter the jitted program as plain inputs instead of a per-call
    quantize chain serialized ahead of the kernel (r5, VERDICT r4 #3).
    Walks the tree so both FullSubNet+ (sb_model) and the baseline
    FullSubNet (fb_model AND sb_model LSTMs) get covered."""
    from fullsubnet_plus_tpu.ops.lstm_pallas import prepare_quantized_lstm

    def is_lstm2(seq):
        layers = seq.get("layers") if isinstance(seq, dict) else None
        if not isinstance(layers, (list, tuple)) or len(layers) != 2:
            return False
        l1 = layers[0]
        return (
            isinstance(l1, dict) and "w_hh" in l1
            and l1["w_hh"].shape[-1] == 4 * l1["w_hh"].shape[0]  # LSTM gates
        )

    def walk(tree):
        if not isinstance(tree, dict):
            return tree
        out = {k: walk(v) for k, v in tree.items()}
        seq = out.get("seq")
        if is_lstm2(seq):
            out["seq"] = dict(seq)
            out["seq"]["int8_prepared"] = {
                k: jnp.asarray(v)
                for k, v in prepare_quantized_lstm(seq).items()
            }
        return out

    return walk(params)


class Enhancer:
    """Batched, jit-cached enhancement over a model definition.

    Parameters mirror the reference inferencer's config surface: model
    definition + config, acoustics, and the inference `type` string
    dispatched exactly like BaseInferencer (base_inferencer.py:134-136).
    """

    def __init__(self, model_def, model_config, params, *, inference_type="mag_complex_full_band_crm_mask",
                 n_fft=512, hop_length=256, win_length=512, sr=16000, n_neighbor=15,
                 mesh=None, compute_dtype=None, inference_args=None):
        self.model_def = model_def
        self.model_config = model_config
        # compute_dtype="bfloat16" casts weights + model activations for the
        # forward pass (MXU runs bf16 at 4x the fp32 rate on v5e); the STFT,
        # mask decompression, and iSTFT stay fp32 for waveform fidelity.
        # compute_dtype="int8" additionally runs the sub-band LSTM's
        # recurrent products on the int8 MXU (ops/lstm_pallas.py
        # stacked_lstm2_quantized) — the fastest serving mode; ~42 dB kernel
        # SNR vs fp32 (docs/PERFORMANCE.md), NOT the parity path.
        self.compute_dtype = None
        if compute_dtype in ("bfloat16", jnp.bfloat16, "int8"):
            self.compute_dtype = jnp.bfloat16
            params = jax.tree_util.tree_map(
                lambda p: p.astype(jnp.bfloat16), params
            )
            if compute_dtype == "int8":
                import dataclasses

                model_config = dataclasses.replace(model_config, quantized_lstm=True)
                self.model_config = model_config
                params = _attach_int8_prepared(params)
        self.params = params
        self.inference_type = inference_type
        self.n_fft, self.hop, self.win = n_fft, hop_length, win_length
        self.sr = sr
        self.n_neighbor = n_neighbor
        self.mesh = mesh
        # the reference's per-mode [inferencer.args] table (e.g. chunk_length
        # in seconds for overlapped_chunk, inferencer.py:197)
        self.inference_args = dict(inference_args or {})
        if not hasattr(self, self.inference_type):
            raise NotImplementedError(f"Unknown inference type {inference_type}")
        self._jitted = {}

    # Modes that accept per-utterance true lengths for bucket-padded
    # batches (masked statistics through the model — see models/*.apply
    # `valid_frames`). docs/PARITY.md has the per-mode scope rationale.
    LENGTH_AWARE_MODES = (
        "mag_complex_full_band_crm_mask",
        "full_band_crm_mask",
        "sub_band_crm_mask",
    )

    # -- public API ---------------------------------------------------------

    def enhance_batch(self, noisy: np.ndarray, lengths=None, *,
                      blocking: bool = True):
        """[B, L] noisy float32 -> [B, L] enhanced float32 (no rescale).

        `lengths` ([B] true sample counts): when the batch is zero-padded to
        a shared bucket length, pass each utterance's real length so the
        model's global-over-time statistics ignore the padding — otherwise
        a short utterance's output diverges from its exact-length result
        (docs/PERFORMANCE.md "Batched serving correctness"). Raises for
        inference types that cannot honor it (silent padding contamination
        would defeat the point of passing lengths).

        `blocking=False` returns the device array without waiting — the
        dispatch is asynchronous, so callers can pipeline the device→host
        fetch (np.asarray) against the next batch's dispatch (see
        cli/enhance.py)."""
        fn = getattr(self, self.inference_type)
        if lengths is not None:
            if self.inference_type not in self.LENGTH_AWARE_MODES:
                raise ValueError(
                    f"inference type {self.inference_type!r} cannot honor "
                    f"`lengths` (only {self.LENGTH_AWARE_MODES}); pad-free "
                    "exact-length batches or drop the argument explicitly"
                )
            out = fn(jnp.asarray(noisy), lengths=np.asarray(lengths))
        else:
            out = fn(jnp.asarray(noisy))
        return out if not blocking else np.asarray(out)

    def enhance(self, noisy: np.ndarray) -> np.ndarray:
        """Single utterance [L] -> [L], with the reference's output rescale
        to 0.8 of int16 peak (base_inferencer.py:148-152)."""
        enhanced = self.enhance_batch(noisy[None])[0]
        peak = np.max(np.abs(enhanced))
        if peak > 1.0:
            pass  # reference only warns; the rescale below normalizes anyway
        enhanced = enhanced / (peak + 1e-12) * 0.8
        return enhanced.astype(np.float32)

    # -- modes (each returns [B, L]) ---------------------------------------

    def _jit(self, name, fn):
        if name not in self._jitted:
            masked = name.endswith("_masked")
            if self.mesh is not None:
                from fullsubnet_plus_tpu.parallel.mesh import data_sharding

                shardings = (data_sharding(self.mesh, 2),)
                if masked:  # the [B] valid_frames vector shards with batch
                    shardings += (data_sharding(self.mesh, 1),)
                jitted = jax.jit(fn, in_shardings=shardings)
                mesh = self.mesh

                def run(*args, _jitted=jitted, _mesh=mesh):
                    with jax.set_mesh(_mesh):
                        return _jitted(*args)

                self._jitted[name] = run
            else:
                self._jitted[name] = jax.jit(fn)
        return self._jitted[name]

    def mag_complex_full_band_crm_mask(self, noisy, lengths=None):
        """Shipped default: 3-view model -> full-band cIRM (inferencer.py:140-165).

        `lengths`: true per-utterance sample counts for bucket-padded
        batches. The masked path (a) rewrites the padded tail with the
        reflection torch.stft's center padding would see, (b) masks every
        global-over-time statistic in the model to the valid frames, and
        (c) normalizes the iSTFT with a per-utterance window envelope — so
        each row matches its exact-length run."""

        def fn(noisy, lengths=None):
            length = noisy.shape[-1]  # before the reflect-fix extension
            valid_frames = None
            if lengths is not None:
                noisy = _reflect_fix_tail(noisy, lengths, self.n_fft, self.hop)
                valid_frames = (1 + lengths // self.hop).astype(jnp.int32)
            mag, real, imag = stft_split(noisy, self.n_fft, self.hop, self.win)
            if self.compute_dtype is not None:
                m_in, r_in, i_in = (
                    x.astype(self.compute_dtype) for x in (mag, real, imag)
                )
            else:
                m_in, r_in, i_in = mag, real, imag
            kw = {} if valid_frames is None else {"valid_frames": valid_frames}
            crm = self.model_def.apply(
                self.params, m_in[:, None], r_in[:, None], i_in[:, None],
                self.model_config, training=False, **kw,
            ).astype(jnp.float32)
            crm = jnp.transpose(crm, (0, 2, 3, 1))
            return _crm_to_wave(crm, real, imag, length, self.n_fft, self.hop,
                                self.win, valid_frames=valid_frames)

        if lengths is None:
            return self._jit("mag_complex", fn)(noisy)
        return self._jit("mag_complex_masked", fn)(
            noisy, jnp.asarray(lengths, jnp.int32)
        )

    def full_band_crm_mask(self, noisy, lengths=None):
        """Magnitude-only model -> full-band cIRM (inferencer.py:116-138)."""

        def fn(noisy, lengths=None):
            length = noisy.shape[-1]  # before the reflect-fix extension
            valid_frames = None
            if lengths is not None:
                noisy = _reflect_fix_tail(noisy, lengths, self.n_fft, self.hop)
                valid_frames = (1 + lengths // self.hop).astype(jnp.int32)
            mag, real, imag = stft_split(noisy, self.n_fft, self.hop, self.win)
            kw = {} if valid_frames is None else {"valid_frames": valid_frames}
            crm = self.model_def.apply(
                self.params, mag[:, None], self.model_config, training=False, **kw
            )
            crm = jnp.transpose(crm, (0, 2, 3, 1))
            return _crm_to_wave(crm, real, imag, length, self.n_fft, self.hop,
                                self.win, valid_frames=valid_frames)

        if lengths is None:
            return self._jit("full_band", fn)(noisy)
        return self._jit("full_band_masked", fn)(
            noisy, jnp.asarray(lengths, jnp.int32)
        )

    def complex_full_band_crm_mask(self, noisy):
        """Stacked real/imag 2-channel input variant (inferencer.py:167-189)."""

        def fn(noisy):
            length = noisy.shape[-1]
            _, real, imag = stft_split(noisy, self.n_fft, self.hop, self.win)
            noisy_input = jnp.stack([real, imag], axis=1)
            crm = self.model_def.apply(
                self.params, noisy_input, self.model_config, training=False
            )
            crm = jnp.transpose(crm, (0, 2, 3, 1))
            return _crm_to_wave(crm, real, imag, length, self.n_fft, self.hop, self.win)

        return self._jit("complex_full_band", fn)(noisy)

    def mag(self, noisy):
        """Magnitude mask + noisy phase resynthesis (inferencer.py:56-66)."""

        def fn(noisy):
            length = noisy.shape[-1]
            mag, real, imag = stft_split(noisy, self.n_fft, self.hop, self.win)
            phase = jnp.arctan2(imag, real)
            enhanced_mag = self.model_def.apply(
                self.params, mag[:, None], self.model_config, training=False
            )[:, 0]
            return istft(
                (enhanced_mag, phase), self.n_fft, self.hop, self.win,
                length=length, use_mag_phase=True,
            )

        return self._jit("mag", fn)(noisy)

    def scaled_mask(self, noisy):
        """Real-valued scaling mask on the complex spectrum (inferencer.py:68-82)."""

        def fn(noisy):
            length = noisy.shape[-1]
            mag, real, imag = stft_split(noisy, self.n_fft, self.hop, self.win)
            mask = self.model_def.apply(
                self.params, mag[:, None], self.model_config, training=False
            )
            mask = jnp.transpose(mask, (0, 2, 3, 1))
            enhanced_real = real * mask[..., 0]
            enhanced_imag = imag * mask[..., 0]
            return istft(
                (enhanced_real, enhanced_imag), self.n_fft, self.hop, self.win,
                length=length,
            )

        return self._jit("scaled_mask", fn)(noisy)

    def sub_band_crm_mask(self, noisy, lengths=None):
        """Per-frequency batched sub-band model (inferencer.py:84-114):
        unfold the magnitude into [F, 31, T] and run the model on that
        folded batch directly. [inferencer.args] pad_mode selects the
        unfold's edge handling (inferencer.py:86).

        `lengths` (bucket-padded batches): the per-utterance valid frame
        counts repeat per frequency row of the fold, so the model's
        global-over-time statistics ignore padding; the model's apply must
        accept `valid_frames` (as models/*.apply do)."""
        pad_mode = self.inference_args.get("pad_mode", "reflect")

        def fn(noisy, lengths=None):
            length = noisy.shape[-1]  # before the reflect-fix extension
            valid_frames = None
            if lengths is not None:
                noisy = _reflect_fix_tail(noisy, lengths, self.n_fft, self.hop)
                valid_frames = (1 + lengths // self.hop).astype(jnp.int32)
            mag, real, imag = stft_split(noisy, self.n_fft, self.hop, self.win)
            batch, num_freqs, frames = mag.shape
            unfolded = freq_unfold(
                mag[:, None], self.n_neighbor, pad_mode
            )  # [B, F, 1, W, T]
            unfolded = unfolded.reshape(
                batch * num_freqs, self.n_neighbor * 2 + 1, frames
            )
            kw = {}
            if valid_frames is not None:
                # each utterance's frame count applies to all its fold rows
                kw["valid_frames"] = jnp.repeat(valid_frames, num_freqs)
            crm = self.model_def.apply(
                self.params, unfolded, self.model_config, training=False, **kw
            )  # [B*F, 2, T]
            crm = crm.reshape(batch, num_freqs, 2, frames)
            crm = jnp.transpose(crm, (0, 1, 3, 2))  # [B, F, T, 2]
            # this mode hand-rolls decompression with lim=9.99 instead of the
            # shared 9.9 (inferencer.py:104-106) — replicate exactly
            lim = 9.99
            crm = jnp.clip(crm, -lim, lim)
            crm = -10.0 * jnp.log((10.0 - crm) / (10.0 + crm))
            enhanced_real = crm[..., 0] * real - crm[..., 1] * imag
            enhanced_imag = crm[..., 1] * real + crm[..., 0] * imag
            if valid_frames is not None:
                # zero the invalid frames before OLA — see _crm_to_wave's
                # docstring (the iSTFT masks only its envelope denominator)
                from fullsubnet_plus_tpu.dsp.norms import time_mask

                mask = time_mask(frames, valid_frames, enhanced_real.dtype)[
                    :, None, :
                ]
                enhanced_real = enhanced_real * mask
                enhanced_imag = enhanced_imag * mask
            return istft(
                (enhanced_real, enhanced_imag), self.n_fft, self.hop, self.win,
                length=length, valid_frames=valid_frames,
            )

        if lengths is None:
            return self._jit("sub_band", fn)(noisy)
        return self._jit("sub_band_masked", fn)(
            noisy, jnp.asarray(lengths, jnp.int32)
        )

    def overlapped_chunk(self, noisy, chunk_seconds: int | None = None,
                         chunk_batch: int = 8):
        """Streaming Hann-overlap-add chunks for unbounded-length audio
        (inferencer.py:191-250, single-channel form): each chunk gets 256
        samples of noisy pre-context, and halves are cross-faded 50%.

        TPU-first shape discipline: every chunk is dispatched at ONE fixed
        shape [chunk_batch, 256 + chunk_length] through the length-masked
        base mode — the tail chunk is zero-padded and carries its true
        length, and partial final groups repeat row 0 (outputs dropped). One
        compiled XLA program therefore serves any utterance length, and
        chunks ride the chip in batches instead of one ~25 ms host
        round-trip each (the round-1 form recompiled per distinct tail
        length; docs/PERFORMANCE.md has the measured streaming RTF)."""
        if chunk_seconds is None:  # config surface: [inferencer.args] chunk_length
            chunk_seconds = self.inference_args.get("chunk_length", 4)
        noisy = np.asarray(noisy)
        assert noisy.ndim == 2 and noisy.shape[0] == 1, "streaming mode is per-utterance"
        y = noisy[0]
        sr = self.sr
        chunk_length = sr * chunk_seconds
        hop = chunk_length // 2
        num_chunks = int(len(y) / hop) + 1
        window = np.hanning(chunk_length + 1)[:chunk_length].astype(np.float32)

        base = getattr(self, "mag_complex_full_band_crm_mask"
                       if self.model_def.n_inputs == 3 else "full_band_crm_mask")
        in_len = 256 + chunk_length

        # host-side chunk table (reference loop structure, single-channel)
        rows, lens = [], []
        for idx in range(num_chunks):
            start = idx * hop
            content = y[start : start + chunk_length]
            if len(content) == 0:  # pad-only tail: reference yields nothing
                break
            row = np.zeros(in_len, np.float32)
            if idx > 0:
                row[:256] = y[start - 256 : start]
            row[256 : 256 + len(content)] = content
            rows.append(row)
            lens.append(256 + len(content))

        # fixed-shape batched dispatch through the masked mode
        enhanced_rows = []
        for s in range(0, len(rows), chunk_batch):
            group = rows[s : s + chunk_batch]
            group_lens = lens[s : s + chunk_batch]
            n_real = len(group)
            while len(group) < chunk_batch:  # repeat row 0; outputs dropped
                group.append(rows[0])
                group_lens.append(lens[0])
            out = np.asarray(
                base(jnp.asarray(np.stack(group)),
                     lengths=np.asarray(group_lens, np.int64))
            )
            for j in range(n_real):
                enhanced_rows.append(out[j, 256 : lens[s + j]])

        # Hann OLA assembly, exactly the reference's math (inferencer.py:
        # 218-243): first chunk's first half passes through unwindowed; every
        # later chunk is windowed and its first half cross-fades with the
        # saved second half of the previous chunk.
        prev = None
        out_segs = []
        for idx, enhanced in enumerate(enhanced_rows):
            if idx == 0:
                cur = enhanced[:hop]
                prev = enhanced[hop:] * window[hop:][: max(0, len(enhanced) - hop)]
            else:
                enhanced = enhanced * window[: len(enhanced)]
                tmp = enhanced[:hop]
                n = min(len(tmp), len(prev))
                cur = tmp[:n] + prev[:n]
                prev = enhanced[hop:]
            out_segs.append(cur)
        enhanced_full = np.concatenate(out_segs) if out_segs else np.zeros_like(y)
        return jnp.asarray(enhanced_full[: len(y)][None])

    def time_domain(self, noisy):
        """Direct waveform-to-waveform models (inferencer.py:252-256)."""

        def fn(noisy):
            return self.model_def.apply(self.params, noisy, self.model_config,
                                        training=False)

        return self._jit("time_domain", fn)(noisy)
