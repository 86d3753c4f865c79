"""Serving-daemon capacity through the REAL product path on the chip.

`bench.py --mode serve` models a pipelined server with inline arithmetic;
this measures the same steady-state through `serve.StreamingEngine` — the
object `cli.serve` actually runs — so the capacity claim covers the product
code (per-stream OLA state, chunk table, pipelined dispatch window), not a
bench re-implementation.

S live streams are fed one hop of fresh audio before every tick (the
steady-state arrival pattern), and each tick batches one ready chunk per
stream through the fixed-shape masked program. Reports per-tick wall
p50/p99 and the extrapolated real-time capacity  streams = S * hop_s /
tick_wall_p50  (ticks of independent groups execute serially on the chip).

    python scripts/measure_serve_engine.py [--streams 64] [--ticks 12]
        [--dtype int8] [--pipeline-depth 3]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--streams", type=int, default=64)
    parser.add_argument("--ticks", type=int, default=12)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--dtype", default="int8",
                        choices=["float32", "bfloat16", "int8"])
    parser.add_argument("--pipeline-depth", type=int, default=3)
    args = parser.parse_args()

    from fullsubnet_plus_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from fullsubnet_plus_tpu.enhance import Enhancer
    from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS
    from fullsubnet_plus_tpu.models.fullsubnet_plus import FullSubNetPlusConfig
    from fullsubnet_plus_tpu.serve import StreamingEngine

    config = FullSubNetPlusConfig()
    params = FULLSUBNET_PLUS.init(jax.random.PRNGKey(0), config)
    enhancer = Enhancer(
        FULLSUBNET_PLUS, config, params,
        compute_dtype=None if args.dtype == "float32" else args.dtype,
    )
    engine = StreamingEngine(enhancer, slots=args.streams,
                             pipeline_depth=args.pipeline_depth)
    engine.warmup()

    rng = np.random.default_rng(0)
    hop = engine.hop
    sids = [engine.open() for _ in range(args.streams)]
    # prime each stream with one full chunk so every tick has work
    for sid in sids:
        engine.feed(sid, (0.1 * rng.standard_normal(engine.chunk)).astype(np.float32))

    # warmup ticks fill the pipeline window; 2 cooldown ticks after the
    # timed region keep the flush of the last in-flight dispatches out of
    # the steady-state percentiles (they represent work already overlapped
    # with the NEXT ticks in a live server).
    cooldown = 2
    walls = []
    for i in range(args.warmup + args.ticks + cooldown):
        fresh = (0.1 * rng.standard_normal((args.streams, hop))).astype(np.float32)
        t0 = time.perf_counter()
        for j, sid in enumerate(sids):
            engine.feed(sid, fresh[j])
        n = engine.tick()
        for sid in sids:
            engine.pull(sid)  # drain host-side (a server would send these)
        wall = time.perf_counter() - t0
        assert n == args.streams, f"tick {i} processed {n}"
        if args.warmup <= i < args.warmup + args.ticks:
            walls.append(wall)
    engine._collect(block=True)

    walls = np.asarray(walls)
    hop_s = hop / enhancer.sr
    p50 = float(np.percentile(walls, 50))
    p99 = float(np.percentile(walls, 99))
    print(json.dumps({
        "metric": "serve_engine_concurrent_realtime_streams_per_chip",
        "value": int(args.streams * hop_s / p50),
        "unit": f"streams ({engine.chunk // enhancer.sr} s chunks, 50% OLA)",
        "tick_wall_p50_s": round(p50, 4),
        "tick_wall_p99_s": round(p99, 4),
        "streams_per_tick": args.streams,
        "pipeline_depth": args.pipeline_depth,
        "dtype": args.dtype,
    }))


if __name__ == "__main__":
    main()
