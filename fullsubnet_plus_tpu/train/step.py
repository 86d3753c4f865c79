"""Jitted training / evaluation steps (the reference trainer's hot loop).

Reproduces Trainer_Finetune's per-step math (fullsubnet_plus/trainer/
trainer.py:322-351): STFT both waveforms on device, build + compress the
cIRM target, drop_band the target, model forward (training=True applies the
matching drop_band inside), MSE, global-norm-10 gradient clip, Adam update.

TPU-first details:
  * The whole step — STFT included — is one jitted program; there is no
    host↔device traffic besides the input waveform batch.
  * Under a mesh, the batch shards over the 'data' axis and XLA inserts the
    gradient all-reduce over ICI (replacing DDP/gloo).
  * `donate` on the train state buffers so params/opt state update in place.
  * `compute_dtype=bfloat16` casts params + activations for the forward/
    backward while keeping fp32 master weights and fp32 Adam moments.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from fullsubnet_plus_tpu.dsp.stft import stft_split
from fullsubnet_plus_tpu.dsp.mask import build_complex_ideal_ratio_mask
from fullsubnet_plus_tpu.dsp.unfold import drop_band
from fullsubnet_plus_tpu.parallel.mesh import data_sharding, replicated


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-3, beta1: float = 0.9, beta2: float = 0.999,
                   clip_grad_norm: float = 10.0):
    """Adam + global-norm clip (config/train.toml:22-25, trainer.train:96)."""
    return optax.chain(
        optax.clip_by_global_norm(clip_grad_norm),
        optax.adam(lr, b1=beta1, b2=beta2),
    )


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


def _forward_fullsubnet_plus(model_def, config, params, noisy_mag, noisy_real,
                             noisy_imag, training, valid_frames=None):
    kw = {} if valid_frames is None else {"valid_frames": valid_frames}
    return model_def.apply(
        params,
        noisy_mag[:, None],
        noisy_real[:, None],
        noisy_imag[:, None],
        config,
        training=training,
        **kw,
    )


def _forward_fullsubnet(model_def, config, params, noisy_mag, noisy_real,
                        noisy_imag, training, valid_frames=None):
    del noisy_real, noisy_imag
    kw = {} if valid_frames is None else {"valid_frames": valid_frames}
    return model_def.apply(params, noisy_mag[:, None], config,
                           training=training, **kw)


def _model_forward(model_def):
    return (
        _forward_fullsubnet_plus if model_def.n_inputs == 3 else _forward_fullsubnet
    )


def make_train_step(
    model_def,
    config,
    optimizer,
    loss_fn,
    *,
    n_fft: int = 512,
    hop_length: int = 256,
    win_length: int = 512,
    compute_dtype=jnp.float32,
    mesh=None,
    remat: bool = False,
    skip_nonfinite: bool = True,
):
    """Build the jitted (state, noisy, clean) -> (state, metrics) step.

    `remat=True` wraps the model forward in jax.checkpoint, trading FLOPs
    for activation memory (lets the per-chip batch grow past HBM limits).

    `skip_nonfinite=True` (default) is on-device failure detection the
    reference lacks (SURVEY.md §5: its only guard is a manual check_nan
    helper): when the loss or gradient global-norm is NaN/Inf — a corrupt
    batch, an overflow — the whole update (params AND optimizer moments) is
    rejected with a branchless jnp.where select, the step counter still
    advances, and metrics["skipped"] reports 1.0 so the trainer can count
    and log it. When everything is finite the step is bit-identical to the
    unguarded one, so loss parity is unaffected.
    """
    forward = _model_forward(model_def)
    if remat:
        base_forward = forward
        forward = jax.checkpoint(
            lambda md, cfg, p, m, r, i, t: base_forward(md, cfg, p, m, r, i, t),
            static_argnums=(0, 1, 6),
        )
    num_groups = config.num_groups_in_drop_band

    def loss_and_grads_input(params, noisy, clean):
        noisy_mag, noisy_real, noisy_imag = stft_split(
            noisy, n_fft, hop_length, win_length
        )
        clean_mag, clean_real, clean_imag = stft_split(
            clean, n_fft, hop_length, win_length
        )
        del clean_mag
        ground_truth_cirm = build_complex_ideal_ratio_mask(
            noisy_real, noisy_imag, clean_real, clean_imag
        )  # [B, F, T, 2]
        ground_truth_cirm = jnp.transpose(
            drop_band(
                jnp.transpose(ground_truth_cirm, (0, 3, 1, 2)), num_groups
            ),
            (0, 2, 3, 1),
        )

        if compute_dtype != jnp.float32:
            params = jax.tree_util.tree_map(lambda p: p.astype(compute_dtype), params)
            noisy_mag = noisy_mag.astype(compute_dtype)
            noisy_real = noisy_real.astype(compute_dtype)
            noisy_imag = noisy_imag.astype(compute_dtype)
        crm = forward(
            model_def, config, params, noisy_mag, noisy_real, noisy_imag, True
        )
        crm = jnp.transpose(crm, (0, 2, 3, 1)).astype(jnp.float32)
        return loss_fn(ground_truth_cirm, crm)

    def train_step(state: TrainState, noisy, clean):
        loss, grads = jax.value_and_grad(loss_and_grads_input)(
            state.params, noisy, clean
        )
        grads = jax.tree_util.tree_map(lambda g: g.astype(jnp.float32), grads)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
        }
        if skip_nonfinite:
            # The update itself must be finite too: Adam's m/(sqrt(v)+eps)
            # can overflow from finite grads (tiny v), and applying a NaN
            # update would poison params forever while loss stays "finite".
            ok = (
                jnp.isfinite(loss)
                & jnp.isfinite(grad_norm)
                & jnp.isfinite(optax.global_norm(updates))
            )
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new, old
            )
            params = keep(params, state.params)
            opt_state = keep(opt_state, state.opt_state)
            metrics["skipped"] = 1.0 - ok.astype(jnp.float32)
        return TrainState(params, opt_state, state.step + 1), metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))
    # Batch shards over 'data'; the state keeps its placement (the caller
    # device_puts it replicated via parallel.replicated(mesh)). The jitted fn
    # runs under the ambient mesh so in-model sharding constraints (e.g.
    # config.fold_sharding) can name its axes.
    batch_sharding = data_sharding(mesh, ndim=2)
    jitted = jax.jit(
        train_step,
        donate_argnums=(0,),
        in_shardings=(None, batch_sharding, batch_sharding),
    )

    def run(state, noisy, clean):
        with jax.set_mesh(mesh):
            return jitted(state, noisy, clean)

    return run


def make_joint_mask_train_step(
    forward_fn,
    optimizer,
    loss_fn,
    *,
    alpha: float = 1.0,
    num_groups: int = 2,
    n_fft: int = 512,
    hop_length: int = 256,
    win_length: int = 512,
):
    """Reference `Trainer` variant (fullsubnet_plus/trainer/trainer.py:14-73):
    joint loss α·MSE(cIRM, cRM) + (1-α)·MSE(IRM, RM) for models whose
    forward returns the pair (RM, cRM) as [B,1,F,T] / [B,2,F,T].

    forward_fn(params, noisy_mag, noisy_real, noisy_imag) -> (RM, cRM).
    """
    from fullsubnet_plus_tpu.dsp.mask import build_ideal_ratio_mask

    def loss_value(params, noisy, clean):
        noisy_mag, noisy_real, noisy_imag = stft_split(noisy, n_fft, hop_length, win_length)
        clean_mag, clean_real, clean_imag = stft_split(clean, n_fft, hop_length, win_length)
        gt_irm = build_ideal_ratio_mask(noisy_mag, clean_mag)  # [B, F, T, 1]
        gt_cirm = build_complex_ideal_ratio_mask(noisy_real, noisy_imag, clean_real, clean_imag)
        gt_cirm = jnp.transpose(
            drop_band(jnp.transpose(gt_cirm, (0, 3, 1, 2)), num_groups), (0, 2, 3, 1)
        )
        rm, crm = forward_fn(params, noisy_mag, noisy_real, noisy_imag)
        rm = jnp.transpose(rm, (0, 2, 3, 1))
        crm = jnp.transpose(crm, (0, 2, 3, 1))
        return alpha * loss_fn(gt_cirm, crm) + (1.0 - alpha) * loss_fn(gt_irm, rm)

    def train_step(state: TrainState, noisy, clean):
        loss, grads = jax.value_and_grad(loss_value)(state.params, noisy, clean)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), {"loss": loss}

    return jax.jit(train_step, donate_argnums=(0,))


def make_residual_train_step(
    forward_fn,
    optimizer,
    loss_fn,
    *,
    alpha: float = 1.0,
    n_fft: int = 512,
    hop_length: int = 256,
    win_length: int = 512,
):
    """Reference `Residual_Trainer` (trainer.py:160-225): joint loss
    α·MSE(clean complex spectrum, enhanced complex) + (1-α)·MSE(cIRM, cIRM̂)
    for models returning (cIRM, enhanced_complex), each [B,2,F,T]. No
    drop_band (the reference comments it out for this variant).
    """

    def loss_value(params, noisy, clean):
        noisy_mag, noisy_real, noisy_imag = stft_split(noisy, n_fft, hop_length, win_length)
        _, clean_real, clean_imag = stft_split(clean, n_fft, hop_length, win_length)
        gt_cirm = build_complex_ideal_ratio_mask(noisy_real, noisy_imag, clean_real, clean_imag)
        gt_complex = jnp.stack([clean_real, clean_imag], axis=-1)  # [B, F, T, 2]
        cirm, enhanced_complex = forward_fn(params, noisy_mag, noisy_real, noisy_imag)
        cirm = jnp.transpose(cirm, (0, 2, 3, 1))
        enhanced_complex = jnp.transpose(enhanced_complex, (0, 2, 3, 1))
        return alpha * loss_fn(gt_complex, enhanced_complex) + (1.0 - alpha) * loss_fn(
            gt_cirm, cirm
        )

    def train_step(state: TrainState, noisy, clean):
        loss, grads = jax.value_and_grad(loss_value)(state.params, noisy, clean)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), {"loss": loss}

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(
    model_def,
    config,
    loss_fn,
    *,
    n_fft: int = 512,
    hop_length: int = 256,
    win_length: int = 512,
):
    """Validation: loss without drop_band + enhanced waveform (trainer.py:364-427)."""
    from fullsubnet_plus_tpu.dsp.mask import decompress_cirm
    from fullsubnet_plus_tpu.dsp.stft import istft

    forward = _model_forward(model_def)

    @jax.jit
    def eval_step(params, noisy, clean):
        noisy_mag, noisy_real, noisy_imag = stft_split(
            noisy, n_fft, hop_length, win_length
        )
        _, clean_real, clean_imag = stft_split(clean, n_fft, hop_length, win_length)
        cirm = build_complex_ideal_ratio_mask(
            noisy_real, noisy_imag, clean_real, clean_imag
        )
        crm = forward(
            model_def, config, params, noisy_mag, noisy_real, noisy_imag, False
        )
        crm = jnp.transpose(crm, (0, 2, 3, 1))
        loss = loss_fn(cirm, crm)
        crm_d = decompress_cirm(crm)
        enhanced_real = crm_d[..., 0] * noisy_real - crm_d[..., 1] * noisy_imag
        enhanced_imag = crm_d[..., 1] * noisy_real + crm_d[..., 0] * noisy_imag
        enhanced = istft(
            (enhanced_real, enhanced_imag),
            n_fft,
            hop_length,
            win_length,
            length=noisy.shape[-1],
        )
        return loss, enhanced

    return eval_step


def make_bucketed_eval_step(
    model_def,
    config,
    loss_fn,
    *,
    n_fft: int = 512,
    hop_length: int = 256,
    win_length: int = 512,
    mesh=None,
):
    """Batched, length-masked validation step for bucket-padded utterances.

    The reference validates one utterance at a time at its natural length
    (trainer.py:383 asserts batch_size == 1) — on TPU that is a fresh XLA
    compile per distinct length and a near-idle chip at batch 1. This step
    takes a [B, Lp] bucket-padded batch plus each row's true sample count and
    reproduces, per row, the exact-length batch-1 result:

      * the padded tail is rewritten with the reflection torch.stft's
        center=True padding would produce (enhance._reflect_fix_tail), for
        BOTH noisy and clean, so every valid STFT frame is bitwise the
        exact run's;
      * the model runs with `valid_frames` masking (models/*.apply), so its
        global-over-time statistics see only the real frames;
      * the loss is per-row over the valid frames — identical to the exact
        run's full-tensor value, returned as a [B] vector. Any
        mean-of-pointwise loss (mse_loss, l1_loss) is supported exactly:
        the masked region contributes pointwise-loss(0,0)=0 to the sum, so
        rescaling the padded mean by T_padded/T_valid reproduces the
        exact-length mean;
      * the enhanced waveform uses the per-row window-envelope iSTFT
        normalization (dsp/stft.istft valid_frames).

    Returns (losses [B], enhanced [B, Lp]); callers slice each row to its
    true length. Under a mesh the batch shards over the 'data' axis.
    """
    from fullsubnet_plus_tpu.dsp.norms import time_mask
    from fullsubnet_plus_tpu.enhance import _crm_to_wave, _reflect_fix_tail

    forward = _model_forward(model_def)

    def eval_step(params, noisy, clean, lengths):
        length = noisy.shape[-1]  # before the reflect-fix extension
        valid_frames = (1 + lengths // hop_length).astype(jnp.int32)
        noisy_e = _reflect_fix_tail(noisy, lengths, n_fft, hop_length)
        clean_e = _reflect_fix_tail(clean, lengths, n_fft, hop_length)
        noisy_mag, noisy_real, noisy_imag = stft_split(
            noisy_e, n_fft, hop_length, win_length
        )
        _, clean_real, clean_imag = stft_split(
            clean_e, n_fft, hop_length, win_length
        )
        cirm = build_complex_ideal_ratio_mask(
            noisy_real, noisy_imag, clean_real, clean_imag
        )  # [B, F, T, 2]
        crm = forward(
            model_def, config, params, noisy_mag, noisy_real, noisy_imag,
            False, valid_frames=valid_frames,
        )
        crm = jnp.transpose(crm, (0, 2, 3, 1))
        tmask = time_mask(crm.shape[2], valid_frames, crm.dtype)[
            :, None, :, None
        ]
        # per-row loss_fn over masked tensors, rescaled from the padded mean
        # to the valid-frame mean (exact for mean-of-pointwise losses)
        losses = jax.vmap(loss_fn)(cirm * tmask, crm * tmask) * (
            crm.shape[2] / valid_frames.astype(crm.dtype)
        )
        enhanced = _crm_to_wave(
            crm, noisy_real, noisy_imag, length, n_fft, hop_length,
            win_length, valid_frames=valid_frames,
        )
        return losses, enhanced

    if mesh is None:
        return jax.jit(eval_step)
    batch2 = data_sharding(mesh, ndim=2)
    batch1 = data_sharding(mesh, ndim=1)
    jitted = jax.jit(eval_step, in_shardings=(None, batch2, batch2, batch1))

    def run(params, noisy, clean, lengths):
        with jax.set_mesh(mesh):
            return jitted(params, noisy, clean, lengths)

    run._jitted = jitted  # expose for compile-count assertions
    return run
