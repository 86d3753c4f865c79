"""Differential train-step time breakdown on the real chip.

Where does the 91 ms batch-36 bf16 training step (0.56 MFU,
docs/PERFORMANCE.md "Train-step MFU") actually go? The jax profiler's
device timeline is unreliable over the axon tunnel, so this measures the
way the serving breakdown was measured: time nested sub-programs as their
own jitted dispatches (queue-ahead, scalar tap per iteration, interleaved
A/B in one process per CLAUDE.md benchmarking rules) and difference them:

  F      forward only: STFT x2 -> cIRM target -> drop_band -> model -> MSE
  FB     value_and_grad of the same (adds the backward sweep + weight grads)
  FB_sb  grads wrt the sub-band LSTM params only (drops the TCN/attention
         backward and their weight grads — isolates the fb-branch backward)
  FULL   the shipped make_train_step (adds clip/Adam/non-finite guard)

Prints one JSON line with the per-iteration times and the derived splits.

    python scripts/train_breakdown.py [--batch 36] [--iters 16]

KNOWN LIMITATION (2026-08-21): over the axon tunnel the remote compile
service produces executables for the forward-only (F/FB/FB_sb)
sub-programs that fail at dispatch with backend
INVALID_ARGUMENT/FAILED_PRECONDITION, while the FULL step program compiles
and runs fine (bench.py --mode train) and the same sub-programs execute
correctly on CPU. Use on a locally-attached TPU; on axon rely on the
analytic MFU in bench.py (docs/PERFORMANCE.md "Train-step MFU").
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args_fn, iters, warmup=3):
    """Queue-ahead wall time per iteration; every tap fetched in-region."""
    for i in range(warmup):
        float(fn(*args_fn(i)))
    t0 = time.perf_counter()
    taps = [fn(*args_fn(warmup + i)) for i in range(iters)]
    for tap in taps:
        float(tap)
    return (time.perf_counter() - t0) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=36)
    parser.add_argument("--iters", type=int, default=16)
    parser.add_argument("--rounds", type=int, default=3,
                        help="interleaved rounds; min is reported")
    args = parser.parse_args()

    from fullsubnet_plus_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from fullsubnet_plus_tpu.dsp.mask import build_complex_ideal_ratio_mask
    from fullsubnet_plus_tpu.dsp.stft import stft_split
    from fullsubnet_plus_tpu.dsp.unfold import drop_band
    from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS
    from fullsubnet_plus_tpu.models.fullsubnet_plus import FullSubNetPlusConfig
    from fullsubnet_plus_tpu.train.loss import mse_loss
    from fullsubnet_plus_tpu.train.step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    samples = 49152
    config = FullSubNetPlusConfig()
    params = FULLSUBNET_PLUS.init(jax.random.PRNGKey(0), config)
    optimizer = make_optimizer()
    state = init_train_state(params, optimizer)

    def loss_of(params, sb_params, noisy, clean):
        """The step's loss math (train/step.py loss_and_grads_input) with
        the sub-band params split out so FB_sb can differentiate them
        alone."""
        params = dict(params, sb_model=sb_params)
        noisy_mag, noisy_real, noisy_imag = stft_split(noisy, 512, 256, 512)
        _, clean_real, clean_imag = stft_split(clean, 512, 256, 512)
        gt = build_complex_ideal_ratio_mask(
            noisy_real, noisy_imag, clean_real, clean_imag
        )
        gt = jnp.transpose(
            drop_band(jnp.transpose(gt, (0, 3, 1, 2)), 2), (0, 2, 3, 1)
        )
        cast = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)
        crm = FULLSUBNET_PLUS.apply(
            cast,
            noisy_mag.astype(jnp.bfloat16)[:, None],
            noisy_real.astype(jnp.bfloat16)[:, None],
            noisy_imag.astype(jnp.bfloat16)[:, None],
            config,
            training=True,
        )
        crm = jnp.transpose(crm, (0, 2, 3, 1)).astype(jnp.float32)
        return mse_loss(gt, crm)

    sb = params["sb_model"]
    rest = {k: v for k, v in params.items() if k != "sb_model"}

    f_fwd = jax.jit(loss_of)
    f_fb = jax.jit(
        lambda p, s, n, c: jax.value_and_grad(loss_of, argnums=(0, 1))(
            p, s, n, c
        )[0]
    )
    f_fb_sb = jax.jit(
        lambda p, s, n, c: jax.value_and_grad(loss_of, argnums=1)(p, s, n, c)[0]
    )
    step = make_train_step(
        FULLSUBNET_PLUS, config, optimizer, mse_loss,
        compute_dtype=jnp.bfloat16,
    )

    rng = np.random.default_rng(0)
    noisy = jnp.asarray(
        (rng.standard_normal((args.batch, samples)) * 0.1).astype(np.float32)
    )
    clean = noisy * 0.8
    perturb = jax.jit(lambda x, s: x + s)

    def a(i):
        return (rest, sb, perturb(noisy, jnp.float32(i) * 1e-9), clean)

    full_state = [state]

    def full(*fargs):
        # same state-chained dispatch as bench_train
        s, metrics = step(full_state[0], fargs[2], fargs[3])
        full_state[0] = s
        return metrics["loss"]

    results = {k: float("inf") for k in ("F", "FB", "FB_sb", "FULL")}
    for _ in range(args.rounds):  # interleave: tunnel noise is large
        results["F"] = min(results["F"], timed(f_fwd, a, args.iters))
        results["FB"] = min(results["FB"], timed(f_fb, a, args.iters))
        results["FB_sb"] = min(results["FB_sb"], timed(f_fb_sb, a, args.iters))
        results["FULL"] = min(results["FULL"], timed(full, a, args.iters))

    out = {f"{k}_ms": round(v * 1e3, 2) for k, v in results.items()}
    out["backward_ms"] = round((results["FB"] - results["F"]) * 1e3, 2)
    out["fb_branch_backward_ms"] = round(
        (results["FB"] - results["FB_sb"]) * 1e3, 2
    )
    out["optimizer_ms"] = round((results["FULL"] - results["FB"]) * 1e3, 2)
    out["batch"] = args.batch
    print(json.dumps(out))


if __name__ == "__main__":
    main()
