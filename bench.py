"""Benchmark: batched offline enhancement throughput on the real TPU chip.

Metric (BASELINE.json): audio-seconds of 16 kHz audio enhanced per wall
second per chip, on the shipped FullSubNet+ architecture (8.67 M params,
mag_complex_full_band_crm_mask path: STFT → 3-branch MulCA/TCN → folded
sub-band LSTM → cIRM → iSTFT, all one jitted program).

Baseline denominator: the reference publishes no numbers; its only concrete
datapoint is the commented model-only timing in
fullsubnet/model/fullsubnet.py:141-144 (16 s audio → 5.65 s ⇒ 2.83
audio-s/s on the author's unstated hardware). BASELINE.json's target is
"≥8× A100 audio-seconds/s/chip"; lacking a published A100 number we report
vs_baseline against 8 × 2.83 = 22.6 audio-s/s — i.e. vs_baseline ≥ 1 means
the per-chip target against the only measurable reference datapoint is met.

Default config is the TPU serving configuration: batch 160, bfloat16 model
compute with fp32 STFT/cIRM/iSTFT math, and the sub-band LSTM's recurrent
products on the int8 MXU (ops/lstm_pallas.py stacked_lstm2_quantized).
int8 costs NO additional waveform error over bf16 at the full model size:
both agree with the fp32 waveform at 21.9 dB / 21.8 dB respectively
(docs/PERFORMANCE.md), because h is bounded (-1,1) and per-column weight
scales keep the quantization noise under the bf16 mantissa noise already
present. Measured on v5e with the feature-sublane-major input layout
(ops/lstm_pallas.py _feature_major, r4): int8 batch-96 ≈2748, batch-64
≈2720, batch-128 ≈2735, bf16 batch-64 ≈2194 audio-s/s/chip (pre-layout:
int8-64 2340, bf16-64 2082; batch 96+ used to OOM outright). r5 adds
feature-major OUTPUT blocks (O=2 on sublanes instead of lane-padded
2->128): int8 batch-96 ≈3027 (+9.8 %, spread 0.08 %), and the freed HBM
moves the knee to batch 160 ≈3081 (the new default). `--dtype
bfloat16` / `--dtype float32 --batch 32` reproduce the other rows.

Dispatch discipline: iterations are queued ahead (dispatched back-to-back,
one fused jit program per iteration) and completion of EVERY iteration is
forced by fetching its scalar tap after the loop, inside the timed region.
The device still executes the iterations serially; queue-ahead only
overlaps the ~25 ms axon-tunnel dispatch latency with device compute, which
is how a real serving loop drives the chip. `--sync-every-iter` restores
the old fetch-per-iteration behavior (measures latency, not throughput).

Noise discipline: run-to-run variance over the axon tunnel is large
(±4 % observed on identical code, docs/PERFORMANCE.md), so the headline
is measured as `--rounds` (default 5) independently timed regions in ONE
process and the reported value is the MAX-round throughput (= min elapsed
time — the round least polluted by tunnel stalls; every round did
identical device work). The JSON also reports `spread` (max/min round
throughput − 1) and the per-round values so a scoreboard move can be told
apart from tunnel luck.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode",
                        choices=["enhance", "train", "data", "streaming",
                                 "serve"],
                        default="enhance",
                        help="train: full train-step throughput at the "
                             "reference batch (18 x 3.072 s); data: host-side "
                             "dynamic-mixing pipeline throughput (no TPU); "
                             "streaming: overlapped_chunk Hann-OLA latency "
                             "path (one utterance at a time); serve: "
                             "multi-stream real-time capacity (one chunk per "
                             "live stream per tick, --batch = streams/tick)")
    parser.add_argument("--mesh", default=None, metavar="DxF",
                        help="run under a ('data', 'freq') device mesh, e.g. "
                             "2x1 or 4x2 — the one-command multi-chip "
                             "throughput/scaling report (BASELINE config #5) "
                             "for when hardware exists; the folded sub-band "
                             "batch shards over both axes")
    parser.add_argument("--batch", type=int, default=None)
    parser.add_argument("--seconds", type=float, default=10.0)
    parser.add_argument("--iters", type=int, default=None,
                        help="default: 4 (enhance) / 16 (train)")
    parser.add_argument("--rounds", type=int, default=5,
                        help="independently timed regions (enhance/train); "
                             "the reported value is the best round and "
                             "`spread` reports max/min-1 across rounds "
                             "(tunnel-noise discipline, CLAUDE.md)")
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--dtype", choices=["float32", "bfloat16", "int8"],
                        default=None,
                        help="default: int8 (enhance; the int8-recurrent "
                             "serving mode) / bfloat16 (train)")
    parser.add_argument("--remat", action="store_true",
                        help="train mode: jax.checkpoint the forward "
                             "(activation memory for FLOPs — larger batches)")
    parser.add_argument("--sync-every-iter", action="store_true",
                        help="fetch each iteration's scalar before dispatching "
                             "the next (latency mode; default is queue-ahead)")
    parser.add_argument("--profile-dir", default=None,
                        help="write a jax.profiler trace here")
    parser.add_argument("--workers", type=int, default=None,
                        help="data mode: loader worker threads (default: CPU count)")
    args = parser.parse_args()
    if args.mode == "data":
        return bench_data(args)
    # Warm starts: compiles happen in warmup, never inside the timed region.
    from fullsubnet_plus_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    if args.mode == "train":
        if args.dtype == "int8":
            raise SystemExit("--dtype int8 is a serving mode (enhance only)")
        args.dtype = "bfloat16" if args.dtype is None else args.dtype
        args.iters = 16 if args.iters is None else args.iters
        return bench_train(args)
    if args.mode == "streaming":
        return bench_streaming(args)
    if args.mode == "serve":
        return bench_serve(args)
    args.dtype = "int8" if args.dtype is None else args.dtype
    # 160 is the measured knee on the r5 out-block tree (96: 3030,
    # 128: 3044, 160: 3081, 192: 2998, 256: 2956 a-s/s — the feature-major
    # out blocks freed the HBM the old knee was pinned by).
    args.batch = 160 if args.batch is None else args.batch
    args.iters = 4 if args.iters is None else args.iters

    import jax
    import jax.numpy as jnp

    from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS
    from fullsubnet_plus_tpu.models.fullsubnet_plus import FullSubNetPlusConfig
    from fullsubnet_plus_tpu.enhance import Enhancer

    devices = jax.devices()
    n_chips = len(devices)

    config = FullSubNetPlusConfig()
    mesh = _make_mesh_arg(args.mesh)
    if mesh is not None:
        import dataclasses

        config = dataclasses.replace(config, fold_sharding=("data", "freq"))
        n_chips = mesh.devices.size
        assert args.batch % mesh.shape["data"] == 0, (
            f"--batch {args.batch} must divide the mesh data axis "
            f"{mesh.shape['data']}"
        )
    params = FULLSUBNET_PLUS.init(jax.random.PRNGKey(0), config)

    enhancer = Enhancer(
        FULLSUBNET_PLUS, config, params,
        compute_dtype=args.dtype if args.dtype != "float32" else None,
        mesh=mesh,
    )

    sr = 16000
    length = int(args.seconds * sr)
    rng = np.random.default_rng(0)
    noisy = (rng.standard_normal((args.batch, length)) * 0.1).astype(np.float32)
    if mesh is None:
        noisy_dev = jax.device_put(jnp.asarray(noisy))
    else:
        from fullsubnet_plus_tpu.parallel.mesh import data_sharding

        noisy_dev = jax.device_put(jnp.asarray(noisy), data_sharding(mesh, 2))
    noisy_dev.block_until_ready()

    # Measurement hygiene for the tunneled (axon) runtime: perturb the input
    # on-device each iteration so no layer can serve a cached result, and
    # force completion by fetching a scalar reduced from the output
    # (block_until_ready alone can return before remote execution finishes).
    # Perturbation + enhancement + scalar tap are ONE jitted dispatch per
    # iteration (jit-of-jit traces through the enhancer's cached program).
    if mesh is None:
        step = jax.jit(
            lambda x, s: enhancer.mag_complex_full_band_crm_mask(x + s)[0, 0]
        )

        def run(i):
            return step(noisy_dev, jnp.float32(i) * 1e-9)
    else:
        # under a mesh: perturb in a sharding-preserving jitted add, then
        # dispatch the enhancer's own sharded program; tap one scalar
        perturb = jax.jit(lambda x, s: x + s)

        def run(i):
            x = perturb(noisy_dev, jnp.float32(i) * 1e-9)
            return enhancer.mag_complex_full_band_crm_mask(x)[0, 0]

    for i in range(args.warmup):
        float(run(i))

    from fullsubnet_plus_tpu.utils.profiling import device_trace

    audio_seconds = args.batch * args.seconds * args.iters
    with device_trace(args.profile_dir):
        elapsed_rounds = _timed_rounds(run, args)

    per_round = [audio_seconds / e / n_chips for e in elapsed_rounds]
    value = max(per_round)  # best round = least tunnel pollution
    baseline = 8.0 * 2.83  # see module docstring
    print(
        json.dumps(
            {
                "metric": "enhance_audio_seconds_per_second_per_chip",
                "value": round(value, 3),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(value / baseline, 3),
                "spread": round(max(per_round) / min(per_round) - 1.0, 4),
                "rounds": [round(v, 1) for v in per_round],
            }
        )
    )


def _timed_rounds(run, args):
    """`args.rounds` independently timed regions of `args.iters` iterations
    each, all in one process (CLAUDE.md noise methodology). Every round does
    identical device work with fresh perturbed inputs; queue-ahead within a
    round, full completion forced before the round's clock stops."""
    elapsed = []
    step = args.warmup
    for _ in range(max(1, args.rounds)):
        t0 = time.perf_counter()
        if args.sync_every_iter:
            for _ in range(args.iters):
                float(run(step))
                step += 1
        else:
            taps = []
            for _ in range(args.iters):
                taps.append(run(step))
                step += 1
            for tap in taps:  # force completion of every iteration
                float(tap)
        elapsed.append(time.perf_counter() - t0)
    return elapsed


def _make_mesh_arg(spec):
    """'DxF' -> ('data', 'freq') mesh over the first D*F devices, or None."""
    if not spec:
        return None
    import jax

    from fullsubnet_plus_tpu.parallel import make_mesh

    d, f = (int(v) for v in spec.lower().split("x"))
    n = len(jax.devices())
    if d * f > n:
        raise SystemExit(
            f"--mesh {spec} needs {d * f} devices, only {n} attached; on a "
            "single chip use --mesh 1x1 (or omit), on CPU set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N"
        )
    return make_mesh(data=d, freq=f)


def bench_streaming(args):
    """Streaming (overlapped_chunk) RTF + live-serving latency on the real
    chip.

    Three measurements (one JSON line):
      1. Throughput: one utterance through the fixed-shape Hann-OLA pipeline
         (enhance.py overlapped_chunk — 4 s chunks, 50 % overlap, chunks
         ride the chip in batches of 8 through ONE compiled length-masked
         program); host OLA assembly and device round trips inside the
         timed region.
      2. Single live stream: one 4 s chunk at a time, batch-1, paced as a
         real stream pays it — H2D, compute, D2H, host cross-fade per
         chunk. Reports per-chunk wall p50/p99; the p50 is the added
         latency between a chunk's audio being available and its enhanced
         first half being emitted (the reference OLA emits the first hop
         right after chunk 0, inferencer.py:218-226).
      3. Cross-stream batching: 8 CONCURRENT streams, one chunk each per
         tick, through one [8, 256+4 s] masked program — the actual
         live-serving shape (bench --mode serve scales the same shape to
         capacity). Reports per-tick wall p50/p99 and whether p99 meets the
         2 s hop deadline.
    """
    import jax
    import jax.numpy as jnp

    from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS
    from fullsubnet_plus_tpu.models.fullsubnet_plus import FullSubNetPlusConfig
    from fullsubnet_plus_tpu.enhance import Enhancer

    # int8 default (r5): with build-time quantization + the feature-major
    # out blocks, int8 wins the single-stream latency path outright
    # (34.3 vs 35.7 ms p50 — docs/PERFORMANCE.md), matching the daemon's
    # default. `--dtype bfloat16`/`float32` remain for the parity story.
    args.dtype = "int8" if args.dtype is None else args.dtype
    args.iters = 3 if args.iters is None else args.iters
    seconds = 60.0 if args.seconds == 10.0 else args.seconds  # longer default

    config = FullSubNetPlusConfig()
    params = FULLSUBNET_PLUS.init(jax.random.PRNGKey(0), config)
    enhancer = Enhancer(
        FULLSUBNET_PLUS, config, params,
        inference_type="overlapped_chunk",
        compute_dtype=args.dtype if args.dtype != "float32" else None,
    )

    sr = 16000
    rng = np.random.default_rng(0)
    base = (rng.standard_normal(int(seconds * sr)) * 0.1).astype(np.float32)

    def run(i):  # fresh input each round: no layer can serve a cached result
        y = base + np.float32(i) * 1e-9
        out = np.asarray(enhancer.overlapped_chunk(y[None], chunk_seconds=4))
        assert np.isfinite(out).all()

    for i in range(args.warmup):
        run(i)
    # run-to-run noise is large over the axon tunnel: take the best round
    best = float("inf")
    for i in range(args.iters):
        t0 = time.perf_counter()
        run(args.warmup + i)
        best = min(best, time.perf_counter() - t0)

    # -- latency: single live stream (batch-1) and 8 concurrent streams ----
    mode = enhancer.mag_complex_full_band_crm_mask
    chunk, hop = 4 * sr, 2 * sr
    in_len = 256 + chunk
    window = np.hanning(chunk + 1)[:chunk].astype(np.float32)

    def chunk_walls(streams: int, n_ticks: int):
        rows = (rng.standard_normal((streams, in_len)) * 0.1).astype(np.float32)
        lens = np.full((streams,), in_len, np.int64)
        prev = np.zeros((streams, hop), np.float32)
        walls = []
        for i in range(args.warmup + n_ticks):
            fresh = rows + np.float32(i) * 1e-9  # new audio each tick (H2D)
            t0 = time.perf_counter()
            out = np.asarray(mode(jnp.asarray(fresh), lengths=lens))  # D2H
            faded = out[:, 256:] * window[None, :]
            emit = faded[:, :hop] + prev  # host cross-fade, then emit
            prev = faded[:, hop:]
            assert np.isfinite(emit).all()
            if i >= args.warmup:
                walls.append(time.perf_counter() - t0)
        return np.asarray(walls)

    single = chunk_walls(1, 24)
    xstream = chunk_walls(8, 24)

    value = seconds / best / len(jax.devices())
    baseline = 8.0 * 2.83  # as in the enhance mode docstring
    hop_s = hop / sr
    print(
        json.dumps(
            {
                "metric": "streaming_enhance_audio_seconds_per_second_per_chip",
                "value": round(value, 3),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(value / baseline, 3),
                "single_stream_chunk_wall_p50_s": round(float(np.percentile(single, 50)), 4),
                "single_stream_chunk_wall_p99_s": round(float(np.percentile(single, 99)), 4),
                "first_output_added_latency_s": round(float(np.percentile(single, 50)), 4),
                "xstream8_tick_wall_p50_s": round(float(np.percentile(xstream, 50)), 4),
                "xstream8_tick_wall_p99_s": round(float(np.percentile(xstream, 99)), 4),
                "xstream8_realtime_p99": bool(np.percentile(xstream, 99) <= hop_s),
            }
        )
    )


def bench_serve(args):
    """Multi-stream live-serving capacity on the real chip.

    Model of a streaming server: S live streams each produce a 4 s chunk
    every hop=2 s (50 % Hann OLA, enhance.py overlapped_chunk math). A
    serving tick batches one chunk from EVERY stream through the single
    fixed-shape length-masked program ([S, 256 + 4 s]) and pays the real
    costs a server pays per tick: audio H2D in, enhanced audio D2H out,
    host cross-fade. A group of S streams is real-time iff the steady-state
    tick wall <= hop; the chip executes independent groups serially, so
    capacity extrapolates linearly: streams = S * hop / tick_wall.

    Reported metric: concurrent real-time streams per chip (floor), with
    the per-chunk added latency (= tick wall) in the JSON for the latency
    story. --batch sets S (default 64, the serving batch).

    r5: the same min-over-rounds discipline as the enhance/train modes —
    `--rounds` independently timed regions in one process, best round
    reported, spread in the JSON (single-region runs measured 158-209
    streams on identical code purely from tunnel noise)."""
    import jax

    from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS
    from fullsubnet_plus_tpu.models.fullsubnet_plus import FullSubNetPlusConfig
    from fullsubnet_plus_tpu.enhance import Enhancer

    if args.mesh:
        raise SystemExit(
            "serve mode measures a single chip's stream capacity; --mesh is "
            "not wired here (run one server per chip — capacity is per-chip)"
        )
    args.dtype = "int8" if args.dtype is None else args.dtype
    streams = 64 if args.batch is None else args.batch
    ticks = 12 if args.iters is None else args.iters
    sr, chunk_s = 16000, 4
    chunk, hop = sr * chunk_s, sr * chunk_s // 2
    in_len = 256 + chunk

    config = FullSubNetPlusConfig()
    params = FULLSUBNET_PLUS.init(jax.random.PRNGKey(0), config)
    enhancer = Enhancer(
        FULLSUBNET_PLUS, config, params,
        compute_dtype=args.dtype if args.dtype != "float32" else None,
    )
    base = enhancer.mag_complex_full_band_crm_mask

    rng = np.random.default_rng(0)
    batch = (rng.standard_normal((streams, in_len)) * 0.1).astype(np.float32)
    lens = np.full((streams,), in_len, np.int64)
    window = np.hanning(chunk + 1)[:chunk].astype(np.float32)
    prev_half = np.zeros((streams, hop), np.float32)

    def finish(out):
        nonlocal prev_half
        faded = np.asarray(out)[:, 256:] * window[None, :]  # D2H + host OLA
        emit = faded[:, :hop] + prev_half
        prev_half = faded[:, hop:]
        assert np.isfinite(emit).all()

    def run(n, start, window_depth=3):
        # A real server pipelines: dispatch tick i+1..i+W while tick i's
        # enhanced audio is still in flight — the async dispatch queue
        # overlaps H2D/compute/D2H instead of paying them serially.
        pending = []
        for i in range(n):
            fresh = batch + np.float32(start + i) * 1e-9  # new audio (H2D)
            pending.append(base(fresh, lengths=lens))
            if len(pending) > window_depth:
                finish(pending.pop(0))
        while pending:
            finish(pending.pop(0))

    run(args.warmup, 0)
    walls = []
    start = args.warmup
    for _ in range(max(1, args.rounds)):
        t0 = time.perf_counter()
        run(ticks, start)
        walls.append((time.perf_counter() - t0) / ticks)
        start += ticks
    tick_wall = min(walls)  # best round = least tunnel pollution

    hop_s = hop / sr
    # Per-chip number: the measured work ran on one device, so no scaling by
    # device count (a fleet runs one serving loop per chip).
    capacity = int(streams * hop_s / tick_wall)
    print(
        json.dumps(
            {
                "metric": "serve_concurrent_realtime_streams_per_chip",
                "value": capacity,
                "unit": "streams (4 s chunks, 50% OLA)",
                "tick_wall_s": round(tick_wall, 4),
                "streams_per_tick": streams,
                "added_latency_s": round(tick_wall, 4),
                "spread": round(max(walls) / min(walls) - 1.0, 4),
                "rounds": [round(streams * hop_s / w, 1) for w in walls],
                # same denominator as the other modes, in stream units:
                # 8 x 2.83 audio-s/s = 22.6 concurrent real-time streams
                "vs_baseline": round(capacity / 22.6, 2),
            }
        )
    )


def train_step_flops(batch, samples, n_fft=512, hop=256, num_freqs=257,
                     drop_groups=2, look_ahead=2, sb_hidden=384, sb_input=34,
                     tcn_hidden=512, tcn_blocks=8):
    """Analytic FLOP count of one training step (fwd + bwd) at the shipped
    FullSubNet+ architecture.

    Counted: the 3 full-band TCN stacks + output Linears, the MulCA grouped
    convs, the sub-band 2-layer LSTM on the drop_band fold + its fused
    output Linear, and the noisy/clean rDFT STFTs. Backward is costed at 2x
    the forward matmul FLOPs (each GEMM spawns dL/dx and dL/dW GEMMs of the
    same size — exact for the LSTM custom VJP's sweeps). Elementwise ops,
    norms, and the attention FCs are excluded (<2 % of the total), so the
    reported MFU is slightly conservative. Hand-counting is necessary
    because XLA's cost_analysis cannot see inside the Pallas custom call
    that holds ~90 % of the FLOPs (ops/lstm_pallas.py)."""
    frames = 1 + samples // hop
    t_model = frames + look_ahead
    mm = 0.0
    # 3 full-band branches: 8 TCN blocks (conv1x1 F->512, depthwise k=3,
    # sconv 512->F) + Linear F->F
    per_block_t = 2 * (num_freqs * tcn_hidden * 2 + tcn_hidden * 3)
    mm += 3 * batch * t_model * (tcn_blocks * per_block_t
                                 + 2 * num_freqs * num_freqs)
    # 3 MulCA attentions: grouped convs k=3,5,10 over [F, frames]
    mm += 3 * batch * 2 * num_freqs * (3 + 5 + 10) * frames
    # sub-band LSTM on the drop_band fold: layer1 34->4H + layer2 384->4H
    # input projections, both layers' recurrent H->4H, fused Linear H->2
    fold = batch * (num_freqs // drop_groups)
    mm += 2 * fold * t_model * (sb_input + 3 * sb_hidden) * 4 * sb_hidden
    mm += 2 * fold * t_model * sb_hidden * 2
    fwd_bwd = 3.0 * mm
    stft = 2 * 2 * batch * frames * n_fft * (n_fft + 2)  # no grad through it
    return fwd_bwd + stft


# v5e MXU peak; fp32 runs through multi-pass bf16 at ~1/4 rate.
PEAK_TFLOPS = {"bfloat16": 197.0, "float32": 49.0}


def bench_train(args):
    """Full training-step throughput (STFT → forward → MSE → backward →
    clip → Adam) on the reference config: batch 18 × 3.072 s
    (config/train.toml:51,57), drop_band groups 2. The sub-band LSTM runs
    forward AND backward through the Pallas custom-VJP kernel
    (docs/PERFORMANCE.md: bf16 ≈1397 audio-s/s/chip at batch 36 with the
    fused-weight-grad backward and the queue-ahead
    loop below vs ≈411 via autodiff-of-scan with per-step sync; fp32 via
    scan OOMs HBM). Steps are dispatched back-to-back — the state chain
    keeps device execution serialized — and every step's loss is fetched
    inside the timed region."""
    import jax
    import jax.numpy as jnp

    from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS
    from fullsubnet_plus_tpu.models.fullsubnet_plus import FullSubNetPlusConfig
    from fullsubnet_plus_tpu.train.loss import mse_loss
    from fullsubnet_plus_tpu.train.step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    batch = 18 if args.batch is None else args.batch
    samples = 49152  # 3.072 s at 16 kHz
    config = FullSubNetPlusConfig()
    mesh = _make_mesh_arg(args.mesh)
    if mesh is not None:
        import dataclasses

        config = dataclasses.replace(config, fold_sharding=("data", "freq"))
        assert batch % mesh.shape["data"] == 0, (
            f"--batch {batch} must divide the mesh data axis"
        )
    optimizer = make_optimizer()
    state = init_train_state(
        FULLSUBNET_PLUS.init(jax.random.PRNGKey(0), config), optimizer
    )
    if mesh is not None:
        from fullsubnet_plus_tpu.parallel import replicated

        state = jax.device_put(state, replicated(mesh))
    step = make_train_step(
        FULLSUBNET_PLUS, config, optimizer, mse_loss, mesh=mesh,
        compute_dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        remat=getattr(args, "remat", False),
    )
    rng = np.random.default_rng(0)
    noisy = jnp.asarray(rng.standard_normal((batch, samples)).astype(np.float32) * 0.1)
    clean = noisy * 0.8
    perturb = jax.jit(lambda x, s: x + s)

    def run(state, i):
        state, metrics = step(state, perturb(noisy, jnp.float32(i) * 1e-9), clean)
        return state, metrics["loss"]

    for i in range(args.warmup):
        state, loss = run(state, i)
        float(loss)
    elapsed_rounds = []
    i = args.warmup
    for _ in range(max(1, args.rounds)):
        t0 = time.perf_counter()
        if args.sync_every_iter:
            for _ in range(args.iters):
                state, loss = run(state, i)
                i += 1
                float(loss)
        else:
            losses = []
            for _ in range(args.iters):
                state, loss = run(state, i)
                i += 1
                losses.append(loss)
            for loss in losses:  # force completion of every step
                float(loss)
        elapsed_rounds.append(time.perf_counter() - t0)
    elapsed = min(elapsed_rounds)  # best round = least tunnel pollution

    audio_seconds = batch * (samples / 16000) * args.iters
    n_chips = mesh.devices.size if mesh is not None else len(jax.devices())
    value = audio_seconds / elapsed / n_chips
    # Baseline as in the enhance mode docstring: the reference publishes no
    # training throughput; report raw audio-s/s/chip with the same 8x-RTF
    # denominator for a comparable vs_baseline scale.
    baseline = 8.0 * 2.83
    step_time = elapsed / args.iters
    # Per-chip FLOPs = global step FLOPs / total devices — the fold shards
    # over ('data','freq'), so dividing by the data axis alone would
    # overstate MFU on meshes with a freq axis.
    flops = train_step_flops(batch, samples) / n_chips
    peak = PEAK_TFLOPS[args.dtype] * 1e12
    mfu = flops / step_time / peak
    print(
        json.dumps(
            {
                "metric": "train_audio_seconds_per_second_per_chip",
                "value": round(value, 3),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(value / baseline, 3),
                "spread": round(max(elapsed_rounds) / min(elapsed_rounds) - 1.0, 4),
                "step_time_s": round(step_time, 4),
                "step_flops_T": round(flops / 1e12, 2),
                "mfu": round(mfu, 3),
                # wall-clock multiple of the FLOP speed-of-light step
                "sol_headroom_x": round(1.0 / mfu, 2),
            }
        )
    )


def bench_data(args):
    """Host-side dynamic-mixing pipeline throughput (no TPU involved).

    Synthesizes a small on-disk corpus, then measures the full training
    input path — wav decode, noise concatenation, RIR fftconvolve (75 % of
    items), SNR mixing, loudness retarget, batch stacking — through the
    threaded BatchLoader exactly as the trainer consumes it.
    vs_baseline divides by the measured bf16 train-step consumption rate
    (≈1397 audio-s/s/chip, docs/PERFORMANCE.md): the value is how many
    chips one host like this one can feed. Scales with host CPU count
    (this is the reference's DataLoader(num_workers=24) axis, SURVEY §3.4).
    """
    import os
    import tempfile

    from fullsubnet_plus_tpu.data.datasets import TrainDataset
    from fullsubnet_plus_tpu.data.loader import BatchLoader
    from fullsubnet_plus_tpu.data.wav import write_wav

    sr = 16000
    batch = 18 if args.batch is None else args.batch
    workers = args.workers or (os.cpu_count() or 4)
    iters = 24 if args.iters is None else args.iters
    rng = np.random.default_rng(0)

    with tempfile.TemporaryDirectory() as tmp:
        clean_paths, noise_paths, rir_paths = [], [], []
        for i in range(48):  # 6 s clean utterances
            path = os.path.join(tmp, f"clean_{i}.wav")
            write_wav(path, (0.2 * np.sin(2 * np.pi * (200 + 7 * i) *
                      np.arange(6 * sr) / sr)).astype(np.float32), sr)
            clean_paths.append(path)
        for i in range(16):  # 8 s noise files
            path = os.path.join(tmp, f"noise_{i}.wav")
            write_wav(path, (0.1 * rng.standard_normal(8 * sr)).astype(np.float32), sr)
            noise_paths.append(path)
        for i in range(4):  # 0.3 s exponential-decay RIRs
            path = os.path.join(tmp, f"rir_{i}.wav")
            ir = rng.standard_normal(int(0.3 * sr)).astype(np.float32)
            ir *= np.exp(-np.arange(ir.size) / (0.05 * sr)).astype(np.float32)
            write_wav(path, 0.5 * ir / np.abs(ir).max(), sr)
            rir_paths.append(path)
        lists = {}
        for name, paths in (("clean", clean_paths), ("noise", noise_paths),
                            ("rir", rir_paths)):
            lists[name] = os.path.join(tmp, f"{name}.txt")
            with open(lists[name], "w") as f:
                f.write("\n".join(paths) + "\n")

        dataset = TrainDataset(lists["clean"], lists["noise"], lists["rir"])
        loader = BatchLoader(dataset, batch, num_workers=workers,
                             prefetch=4, seed=0)

        def consume(n, epoch):
            done = 0
            while done < n:
                for noisy, clean in loader.epoch(epoch):
                    assert noisy.shape == (batch, 49152)
                    done += 1
                    if done >= n:
                        break
                epoch += 1
            return epoch

        epoch = consume(2, 0)  # warm page cache / thread pools
        t0 = time.perf_counter()
        consume(iters, epoch)
        elapsed = time.perf_counter() - t0

    value = iters * batch * 3.072 / elapsed
    baseline = 1397.0  # measured bf16 train-step audio-s/s/chip (fused wgrad)
    print(
        json.dumps(
            {
                "metric": "train_data_pipeline_audio_seconds_per_second_per_host",
                "value": round(value, 3),
                "unit": "audio-s/s/host",
                "vs_baseline": round(value / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
