"""Live streaming-enhancement server over TCP (production serving surface).

    python -m fullsubnet_plus_tpu.cli.serve -C config/inference.toml \
        -M checkpoint(.npz|.tar|.pth) [--port 7860] [--slots 8] \
        [--dtype int8] [--chunk-seconds 4] [--tick 0.1]

No reference counterpart (its closest surface is the offline
overlapped_chunk loop, inferencer.py:191-250) — this is the serving story
the benches measure (`bench.py --mode serve` capacity, docs/PERFORMANCE.md
"Live-stream latency") as an actual daemon: N concurrent client streams,
one fixed-shape length-masked program on the chip, reference-exact Hann-OLA
per stream (serve.py StreamingEngine). One server == one chip; scale
horizontally.

Wire protocol (stdlib-only, length-prefixed frames `[u32 big-endian
len][payload]`):

  client -> server:  frame 0: JSON header, e.g. {"sr": 16000}
                     frames 1..: raw float32 PCM (any sizes)
                     empty frame: end of stream
  server -> client:  raw float32 PCM frames of enhanced audio as chunks
                     complete; empty frame after the last sample, then EOF.

A ~2 s added latency is inherent to the 4 s/50 % chunk geometry (audio must
arrive before it can be enhanced); the compute adds only the tick wall
(42-181 ms p50-p99 measured, docs/PERFORMANCE.md).
"""

from __future__ import annotations

import argparse
import json
import socket
import struct
import threading
import time

import numpy as np


def _send_frame(conn: socket.socket, payload: bytes) -> None:
    conn.sendall(struct.pack(">I", len(payload)) + payload)


def _recv_frame(conn: socket.socket):
    header = _recv_exact(conn, 4)
    if header is None:
        return None
    (length,) = struct.unpack(">I", header)
    if length == 0:
        return b""
    return _recv_exact(conn, length)


def _recv_exact(conn: socket.socket, n: int):
    buf = b""
    while len(buf) < n:
        part = conn.recv(n - len(buf))
        if not part:
            return None
        buf += part
    return buf


class StreamServer:
    """TCP front-end around a serve.StreamingEngine.

    One reader thread per client feeds the engine; a single ticker thread
    dispatches batched chunks and pushes enhanced audio back. All engine
    access is serialized by one lock — the device executes serially anyway,
    and the host work per tick is microseconds.
    """

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 7860,
                 tick_interval: float = 0.1, log=print):
        self.engine = engine
        self.tick_interval = tick_interval
        self.log = log
        self._lock = threading.Lock()
        self._conns: dict[int, socket.socket] = {}  # sid -> client conn
        self._stop = threading.Event()
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(64)
        self.port = self._sock.getsockname()[1]  # resolved if port was 0
        self._threads: list[threading.Thread] = []

    # -- lifecycle ----------------------------------------------------------

    def start(self) -> None:
        for target in (self._accept_loop, self._tick_loop):
            t = threading.Thread(target=target, daemon=True)
            t.start()
            self._threads.append(t)
        self.log(f"[serve] listening on :{self.port} "
                 f"(slots={self.engine.slots}, chunk={self.engine.chunk})")

    def stop(self) -> None:
        self._stop.set()
        try:
            self._sock.close()
        except OSError:
            pass
        for t in self._threads:
            t.join(timeout=10)

    def serve_forever(self) -> None:
        self.start()
        try:
            while not self._stop.is_set():
                time.sleep(0.2)
        except KeyboardInterrupt:
            pass
        finally:
            self.stop()

    # -- internals ----------------------------------------------------------

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, addr = self._sock.accept()
            except OSError:
                return  # socket closed by stop()
            t = threading.Thread(target=self._client_loop, args=(conn, addr),
                                 daemon=True)
            t.start()
            self._threads.append(t)

    def _client_loop(self, conn: socket.socket, addr) -> None:
        sid = None
        try:
            header = _recv_frame(conn)
            if header is None:
                conn.close()
                return
            meta = json.loads(header.decode() or "{}")
            with self._lock:
                sid = self.engine.open()
                self._conns[sid] = conn
            self.log(f"[serve] stream {sid} from {addr} sr={meta.get('sr')}")
            while True:
                frame = _recv_frame(conn)
                if frame is None or frame == b"":
                    break
                samples = np.frombuffer(frame, np.float32)
                with self._lock:
                    self.engine.feed(sid, samples)
            with self._lock:
                self.engine.close(sid)
        except Exception as e:  # a bad client must not kill the server
            self.log(f"[serve] client {addr} error: {e!r}")
            if sid is not None:
                # reap the half-open stream: a long-running daemon with
                # flaky clients must not accumulate dead engine streams
                with self._lock:
                    self.engine.abort(sid)
                    self._conns.pop(sid, None)
            try:
                conn.close()
            except OSError:
                pass

    def _tick_loop(self) -> None:
        while not self._stop.is_set():
            t0 = time.perf_counter()
            try:
                with self._lock:
                    self.engine.tick()
                    finished = []
                    for sid, conn in list(self._conns.items()):
                        out = self.engine.pull(sid)
                        done = self.engine.is_done(sid)
                        if len(out) or done:
                            finished.append((sid, conn, out, done))
                    for sid, conn, out, done in finished:
                        if done:
                            del self._conns[sid]
            except Exception as e:
                # The ticker must survive transient backend errors (the
                # same JaxRuntimeError class the trainer recovers from) —
                # a dead ticker would leave every client waiting forever
                # while the accept loop keeps taking new ones.
                self.log(f"[serve] tick error (continuing): {e!r}")
                self._stop.wait(self.tick_interval)
                continue
            # sends happen outside the engine lock
            for sid, conn, out, done in finished:
                try:
                    if len(out):
                        _send_frame(conn, out.astype(np.float32).tobytes())
                    if done:
                        _send_frame(conn, b"")
                        conn.close()
                        self.log(f"[serve] stream {sid} complete")
                except OSError:
                    pass  # client went away; engine state already reaped
            elapsed = time.perf_counter() - t0
            self._stop.wait(max(0.0, self.tick_interval - elapsed))


def build_engine(config: dict, checkpoint_path: str, slots: int,
                 compute_dtype: str | None, chunk_seconds: float,
                 pipeline_depth: int = 2):
    from fullsubnet_plus_tpu.enhance import Enhancer
    from fullsubnet_plus_tpu.io.checkpoint import (
        load_flat,
        load_torch_checkpoint,
        nested_from_flat,
    )
    from fullsubnet_plus_tpu.models import get_model
    from fullsubnet_plus_tpu.serve import StreamingEngine

    model_name = config["model"]["path"]
    model_def = get_model(model_name)
    model_config = model_def.make_config(config["model"]["args"])
    if checkpoint_path.endswith((".tar", ".pth")):
        params = load_torch_checkpoint(checkpoint_path, model_name)
    else:
        flat, _ = load_flat(checkpoint_path)
        params = nested_from_flat(
            {k.removeprefix("params/"): v for k, v in flat.items()
             if k.startswith("params/")} or flat
        )
    acoustics = config.get("acoustics", {})
    inferencer_cfg = config.get("inferencer", {})
    # compute_dtype=None means "unset — fall back to the config"; an
    # explicit "float32" must NOT be silently overridden by a config that
    # names int8/bf16.
    if compute_dtype is None:
        compute_dtype = inferencer_cfg.get("args", {}).get("compute_dtype")
    if compute_dtype == "float32":
        compute_dtype = None
    enhancer = Enhancer(
        model_def, model_config, params,
        n_fft=acoustics.get("n_fft", 512),
        hop_length=acoustics.get("hop_length", 256),
        win_length=acoustics.get("win_length", 512),
        sr=acoustics.get("sr", 16000),
        compute_dtype=compute_dtype,
        inference_args=inferencer_cfg.get("args", {}),
    )
    return StreamingEngine(
        enhancer, slots=slots,
        chunk_samples=int(chunk_seconds * enhancer.sr),
        pipeline_depth=pipeline_depth,
    )


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("-C", "--configuration", required=True)
    parser.add_argument("-M", "--checkpoint", required=True)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=7860)
    parser.add_argument("--slots", type=int, default=8,
                        help="streams per device dispatch (fixed shape)")
    parser.add_argument("--dtype", choices=["float32", "bfloat16", "int8"],
                        default=None,
                        help="default: the config's compute_dtype, else "
                             "int8 — the fastest serving mode "
                             "(docs/PERFORMANCE.md)")
    parser.add_argument("--chunk-seconds", type=float, default=4.0)
    parser.add_argument("--tick", type=float, default=0.1,
                        help="engine tick interval in seconds (a tick with "
                             "no ready chunks costs nothing)")
    parser.add_argument("--pipeline-depth", type=int, default=2,
                        help="in-flight dispatch window: overlaps H2D/"
                             "compute/D2H across ticks under load; 0 "
                             "fetches inline (lowest latency)")
    args = parser.parse_args(argv)

    from fullsubnet_plus_tpu.utils.config import load_config
    from fullsubnet_plus_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    config = load_config(args.configuration)
    if (args.dtype is None
            and "compute_dtype" not in config.get("inferencer", {}).get("args", {})):
        args.dtype = "int8"  # serving default when nothing is configured
    engine = build_engine(
        config, args.checkpoint, args.slots, args.dtype, args.chunk_seconds,
        pipeline_depth=args.pipeline_depth,
    )
    print("[serve] warming the device program (first compile/load can take "
          "minutes on a remote backend) ...", flush=True)
    engine.warmup()
    StreamServer(engine, args.host, args.port, args.tick).serve_forever()


if __name__ == "__main__":
    main()
