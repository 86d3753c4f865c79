"""HISTORICAL PROBE (r4) — the TIME_MAJOR_FOLD construction path this
script A/B-tested was measured SLOWER end-to-end and DELETED in r5
(VERDICT r4 weak #3); the measured record lives in docs/PERFORMANCE.md
"Fold-construction probe". Run the r4 tree (git log -S TIME_MAJOR_FOLD)
to reproduce. Kept as the probe record only.

"""
raise SystemExit(__doc__)

"""Construction-only A/B for the sub-band fold (serving shape, int8 dtype
irrelevant here — bf16 arrays): which formulation writes the kernel's
[T, 48, Npad] input cheapest?

Variants (all produce the kernel-wrapper input, padded [T, 48, 25088]):
  ch        — the r3/r4 default: channel-major unfold/concat/norm/reshape
              then the wrapper's transpose+pad (_feature_major).
  tm_stack  — the naive time-major stack: [T, 34, B, F] 4D intermediate
              (F=257 minor pads physically to 384; the reshape to
              [T, 34, B*F] is a real relayout — measured SLOWER end-to-end).
  tm_slices — per-window compact slice+reshape: each of the 31 mag windows
              is a [T, B, F] slice of the reflect-padded compact transpose,
              reshaped to [T, B*F] while still ~31 MB, then one stack.
              Norm statistics are computed from the COMPACT sources with
              window-multiplicity weights (exact same addend multiset as the
              materialized-unfold mean — np.bincount of the unfold index
              table), so no full-fold reduce pass; the scale and the D/N
              padding fuse into the single stack write.
All variants are checked against `ch` numerically before timing.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from fullsubnet_plus_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()

from fullsubnet_plus_tpu.dsp.unfold import freq_unfold, _unfold_indices

B, F, T = 96, 257, 630
NSB = 15
D = 2 * NSB + 1 + 3  # 34
D_PAD, N_PAD = 48, 25088  # bf16 sublane tile, row tile 512
DTYPE = jnp.bfloat16


def construct_ch(mag, fb, fbr, fbi):
    """Today's path: channel-major unfold + concat + laplace norm + reshape,
    then the wrapper's transpose+pad (ops/lstm_pallas.py _feature_major)."""
    unf1 = lambda y: freq_unfold(y[:, None], 0).reshape(B, F, 1, T)
    mag_unf = freq_unfold(mag[:, None], NSB).reshape(B, F, 2 * NSB + 1, T)
    sb = jnp.concatenate([mag_unf, unf1(fb), unf1(fbr), unf1(fbi)], axis=2)
    mu = jnp.mean(sb, axis=(1, 2, 3), keepdims=True)
    sb = sb / (mu + 1e-5)
    x = sb.reshape(B * F, D, T)
    x_tm = jnp.transpose(x, (2, 1, 0))
    return jnp.pad(x_tm, ((0, 0), (0, D_PAD - D), (0, N_PAD - B * F)))


def construct_tm_stack(mag, fb, fbr, fbi):
    """The first time-major attempt (4D stack; known-slow, kept as the
    measured negative result)."""
    tm = lambda y: jnp.transpose(y, (2, 0, 1))  # [T, B, F]
    mag_tm = tm(mag)
    xp = jnp.pad(mag_tm, ((0, 0), (0, 0), (NSB, NSB)), mode="reflect")
    feats = [xp[:, :, w : w + F] for w in range(2 * NSB + 1)]
    feats += [tm(fb), tm(fbr), tm(fbi)]
    sb = jnp.stack(feats, axis=1)  # [T, 34, B, F]
    mu = jnp.mean(sb, axis=(0, 1, 3), keepdims=True)
    sb = sb / (mu + 1e-5)
    x_tm = sb.reshape(T, D, B * F)
    return jnp.pad(x_tm, ((0, 0), (0, D_PAD - D), (0, N_PAD - B * F)))


def _window_weights():
    """Multiplicity of each source bin across the 31 reflect windows —
    mean over the materialized unfold == weighted mean over the compact
    source with these weights (same addend multiset, different order)."""
    idx = _unfold_indices(F, NSB, "reflect")
    return np.bincount(np.asarray(idx).ravel(), minlength=F).astype(np.float32)


def construct_tm_slices(mag, fb, fbr, fbi):
    # Stats from the compact sources (fp32 accumulate), no full-fold passes.
    w = jnp.asarray(_window_weights())
    s_mag = jnp.sum(mag.astype(jnp.float32) * w[None, :, None], axis=(1, 2))
    s_rest = (fb + fbr + fbi).astype(jnp.float32).sum(axis=(1, 2))
    mu = ((s_mag + s_rest) / (D * F * T)).astype(mag.dtype)  # [B]
    inv = (1.0 / (mu + 1e-5)).astype(mag.dtype)

    tm = lambda y: jnp.transpose(y, (2, 0, 1))  # [T, B, F] compact
    scale3 = inv[None, :, None]
    mag_tm = tm(mag) * scale3
    xp = jnp.pad(mag_tm, ((0, 0), (0, 0), (NSB, NSB)), mode="reflect")
    pad_n = ((0, 0), (0, N_PAD - B * F))
    feats = [
        jnp.pad(xp[:, :, w_ : w_ + F].reshape(T, B * F), pad_n)
        for w_ in range(2 * NSB + 1)
    ]
    feats += [
        jnp.pad((tm(y) * scale3).reshape(T, B * F), pad_n) for y in (fb, fbr, fbi)
    ]
    feats += [jnp.zeros((T, N_PAD), mag.dtype)] * (D_PAD - D)
    return jnp.stack(feats, axis=1)  # [T, 48, 25088] in one write


VARIANTS = {
    "ch": construct_ch,
    "tm_stack": construct_tm_stack,
    "tm_slices": construct_tm_slices,
}

rng = np.random.default_rng(0)
mag = jnp.asarray(np.abs(rng.standard_normal((B, F, T))).astype(np.float32)).astype(DTYPE)
fb = jnp.asarray(rng.standard_normal((B, F, T)).astype(np.float32)).astype(DTYPE)
fbr = jnp.asarray(rng.standard_normal((B, F, T)).astype(np.float32)).astype(DTYPE)
fbi = jnp.asarray(rng.standard_normal((B, F, T)).astype(np.float32)).astype(DTYPE)

ref = None
steps = {}
for name, fn in VARIANTS.items():
    step = jax.jit(lambda a, b, c, d, s, f=fn: f(a + s, b, c, d).astype(jnp.float32).sum())
    full = jax.jit(fn)
    t0 = time.perf_counter()
    out = np.asarray(full(mag, fb, fbr, fbi), np.float32)
    if ref is None:
        ref = out
    else:
        err = np.max(np.abs(out - ref)) / max(np.max(np.abs(ref)), 1e-9)
        print(f"{name}: rel maxdiff vs ch = {err:.2e}", flush=True)
        assert err < 2e-2, name  # bf16 + reduction-order differences
    float(step(mag, fb, fbr, fbi, jnp.bfloat16(0)))
    print(f"{name}: compiled in {time.perf_counter() - t0:.1f}s", flush=True)
    steps[name] = step

ITERS, ROUNDS = 8, 5
best = {n: float("inf") for n in steps}
k = 1
for r in range(ROUNDS):
    for name, step in steps.items():
        t0 = time.perf_counter()
        taps = []
        for _ in range(ITERS):
            taps.append(step(mag, fb, fbr, fbi, jnp.bfloat16(k * 1e-9)))
            k += 1
        for tap in taps:
            float(tap)
        el = time.perf_counter() - t0
        best[name] = min(best[name], el)
        print(f"round {r} {name}: {el / ITERS * 1000:.2f} ms", flush=True)

for name, el in best.items():
    print(f"BEST {name}: {el / ITERS * 1000:.2f} ms/construction", flush=True)
