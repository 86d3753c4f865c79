"""Live streaming-enhancement server over TCP (production serving surface).

    python -m fullsubnet_plus_tpu.cli.serve -C config/inference.toml \
        -M checkpoint(.npz|.tar|.pth) [--port 7860] [--slots 8] \
        [--dtype int8] [--chunk-seconds 4] [--tick 0.1] \
        [--max-tick-failures 5] [--stall-timeout 300] [--supervise N] \
        [--watch SECS]
    python -m fullsubnet_plus_tpu.cli.serve --stats [--host H --port P]
    python -m fullsubnet_plus_tpu.cli.serve --reload CKPT [--host H --port P]

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

Observability: a header of {"stats": true} instead returns ONE JSON frame
of serving stats (active/completed/aborted streams, chunks and audio
seconds enhanced, busy-tick latency p50/p90/p99, tick failure totals) and
the completion frame — `python -m fullsubnet_plus_tpu.cli.serve --stats
[--host H --port P]` is the bundled query client.

Zero-downtime model update: a header of {"reload": "<ckpt-path>"} makes
the daemon build and warm a NEW program for that checkpoint in the
requesting client's thread (serving continues on the old model throughout
— minutes on a cold remote backend), then atomically hot-swap it. Live
streams keep flowing and pick up the new model from their next chunk, the
Hann cross-fade smoothing the seam. `--reload CKPT` is the bundled client;
the ack frame reports warmup seconds and live streams kept. `--watch SECS`
polls the -M checkpoint file instead and auto-swaps whenever it changes —
point it at a live training run's atomically-published latest/best
checkpoint and the daemon follows the run.

A ~2 s added latency is inherent to the 4 s/50 % chunk geometry (audio must
arrive before it can be enhanced); the compute adds only the tick wall
(42-181 ms p50-p99 measured, docs/PERFORMANCE.md).

Shutdown: SIGTERM (or Ctrl-C) drains gracefully — in-flight device work
finalizes, every live stream's enhanced audio flushes, completed streams
get the completion frame and the rest the protocol's clean abort (EOF
without it), and the daemon exits 0. `--watch`/hot-swap restarts driven by
an operator's `kill <pid>` therefore never cut a client mid-frame, and a
`--supervise` wrapper treats the exit as clean (no relaunch).
"""

from __future__ import annotations

import argparse
import collections
import json
import socket
import struct
import subprocess
import sys
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


def _abort_conn(conn: socket.socket) -> None:
    """Tear a client connection down so the CLIENT observes EOF now.

    `close()` alone does not wake a peer (or our own reader thread) blocked
    in recv on the same socket — `shutdown()` sends the FIN and unblocks
    both sides immediately."""
    try:
        conn.shutdown(socket.SHUT_RDWR)
    except OSError:
        pass
    try:
        conn.close()
    except OSError:
        pass


class StreamServer:
    """TCP front-end around a serve.StreamingEngine.

    One reader thread per client feeds the engine; a single ticker thread
    dispatches batched chunks and pushes enhanced audio back. All engine
    access is serialized by one lock — the device executes serially anyway,
    and the host work per tick is microseconds.

    Failure policy (the trainer's dead-backend discipline,
    train/trainer.py): a tick exception is survivable once — transient axon
    errors happen — but `max_tick_failures` CONSECUTIVE failures mean the
    backend is poisoned (the documented axon failure mode: every later
    transfer fails until the process dies), so the daemon closes every
    client connection and exits nonzero for a supervisor to relaunch. A
    ticker that stops completing iterations altogether (wedged inside a
    device fetch that never returns) is caught by the `stall_timeout`
    watchdog in serve_forever. Streams do NOT survive a restart — a client
    sees EOF without the empty completion frame and must reconnect.
    """

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 7860,
                 tick_interval: float = 0.1, log=print,
                 max_tick_failures: int = 5, stall_timeout: float = 300.0,
                 reload_fn=None, checkpoint_path: str | None = None,
                 allow_remote_reload: bool = False):
        self.engine = engine
        self.tick_interval = tick_interval
        self.log = log
        self.max_tick_failures = max_tick_failures
        self.stall_timeout = stall_timeout
        # Checkpoint hot-swap (`{"reload": path}` header): reload_fn builds
        # a fresh engine for a checkpoint path; the server warms it in the
        # REQUESTING client's thread (serving continues on the old program)
        # and then swaps the enhancer atomically under the serving lock.
        self.reload_fn = reload_fn
        self.checkpoint_path = checkpoint_path
        self.reloads = 0
        self._reload_lock = threading.Lock()
        # The reload header is an unauthenticated control plane (any client
        # that can reach the port can make the daemon load a server-side
        # checkpoint path and hold the reload lock for minutes). Safe on the
        # loopback default; when binding a non-loopback interface, reload
        # requests are restricted to the -M checkpoint's own directory
        # unless the operator passes --allow-remote-reload (r4 advisor
        # finding).
        self._reload_restricted = (
            not allow_remote_reload
            and host not in ("127.0.0.1", "localhost", "::1")
        )
        self.exit_code = 0
        self._lock = threading.Lock()
        self._conns: dict[int, socket.socket] = {}  # sid -> client conn
        self._stop = threading.Event()
        self._term = threading.Event()  # graceful-shutdown request (SIGTERM)
        self._last_tick = time.monotonic()
        # Stats surface (`{"stats": true}` header, see module docstring):
        # lifetime totals plus a rolling window of BUSY-tick engine
        # latencies (ticks that dispatched at least one chunk — idle ticks
        # would drown the percentiles in no-op timings).
        self._t_start = time.monotonic()
        self.ticks_total = 0
        self.tick_failures_total = 0
        self._busy_tick_s = collections.deque(maxlen=512)
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(64)
        self.port = self._sock.getsockname()[1]  # resolved if port was 0
        # Only the accept + tick threads are tracked/joined; per-client
        # reader threads are daemonic and untracked — tracking one Thread
        # object per connection ever served grows without bound in a
        # long-running daemon (r3 advisor finding).
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

    def request_shutdown(self) -> None:
        """Ask serve_forever to drain and exit 0 (the SIGTERM handler's
        body; also callable directly, e.g. from tests or an embedding
        process). Idempotent and safe from any thread/signal context."""
        self._term.set()

    def serve_forever(self) -> int:
        """Run until stopped; returns the process exit code (0 = clean
        shutdown, nonzero = the failure policy tripped).

        SIGTERM (and Ctrl-C) trigger a GRACEFUL shutdown — the trainer's
        preemption discipline (train/trainer.py), applied to serving: stop
        accepting, finalize in-flight device work, flush each live stream's
        enhanced audio, then close every connection with the protocol's
        clean abort (EOF without the completion frame) instead of cutting
        sockets mid-frame. Exit code 0, so a supervisor treats an operator
        kill (and a `--watch`/hot-swap restart driven by one) as a clean
        stop, not a crash to relaunch."""
        self.start()
        import signal

        prev_term = None
        in_main = threading.current_thread() is threading.main_thread()
        if in_main:  # signal handlers may only be installed in main
            prev_term = signal.signal(
                signal.SIGTERM, lambda *_: self.request_shutdown()
            )
        try:
            while not self._stop.is_set():
                if self._term.is_set():
                    self._graceful_drain()
                    self._stop.set()
                    break
                time.sleep(0.2)
                stalled = time.monotonic() - self._last_tick
                if self.stall_timeout and stalled > self.stall_timeout:
                    # The ticker has not completed an iteration in
                    # stall_timeout seconds — wedged inside a device call
                    # that will never return. It cannot be interrupted;
                    # close everything and exit (threads are daemonic).
                    self.log(f"[serve] ticker stalled {stalled:.0f}s > "
                             f"{self.stall_timeout:.0f}s: shutting down for "
                             "supervisor restart")
                    self.exit_code = 2
                    self._disconnect_all()
                    self._stop.set()
        except KeyboardInterrupt:
            self._graceful_drain()
        finally:
            if prev_term is not None:
                signal.signal(signal.SIGTERM, prev_term)
            self.stop()
        return self.exit_code

    def _graceful_drain(self, join_timeout: float = 10.0) -> None:
        """Drain and release every live stream cleanly (SIGTERM path).

        1. Close the listening socket — no new streams.
        2. Stop and JOIN the ticker (it sends on client sockets outside
           the engine lock; flushing concurrently would interleave two
           sendall()s on one connection and corrupt the framing).
        3. Run the engine dry: finalize the pipelined in-flight dispatches
           and enhance every chunk that is already ready
           (serve.StreamingEngine.drain), then pull each stream's output.
        4. Send each client its remaining enhanced frames; a stream whose
           audio fully completed gets the true completion frame, every
           other gets the protocol's clean abort (EOF WITHOUT the
           completion frame) — never a mid-frame cut.

        If the ticker is WEDGED inside a device call (the stall-watchdog
        scenario — it may hold the serving lock forever), the bounded join
        fails and we fall back to aborting every connection without
        touching the engine: SIGTERM must always terminate the daemon
        (the old pre-drain guarantee)."""
        self.log("[serve] graceful shutdown: draining in-flight work")
        try:
            self._sock.close()
        except OSError:
            pass
        self._stop.set()  # ends the ticker loop at its next wait
        ticker_dead = True
        for t in self._threads:
            t.join(timeout=join_timeout)
            if t.is_alive():
                ticker_dead = False
        if not ticker_dead or not self._lock.acquire(timeout=join_timeout):
            # Ticker wedged in a device call (possibly holding the lock):
            # no clean drain is possible — abort every client now so the
            # daemon still dies (threads are daemonic).
            self.log("[serve] ticker wedged during shutdown: aborting "
                     "streams without drain")
            conns = list(self._conns.items())
            self._conns.clear()
            for _sid, conn in conns:
                _abort_conn(conn)
            return
        try:
            try:
                self.engine.drain()
            except Exception as e:  # poisoned backend mid-drain: still
                self.log(f"[serve] drain failed (flushing what we have): "
                         f"{e!r}")
            conns = list(self._conns.items())
            self._conns.clear()
            flushes = [
                (sid, conn, self.engine.pull(sid), self.engine.is_done(sid))
                for sid, conn in conns
            ]
        finally:
            self._lock.release()
        for sid, conn, out, done in flushes:
            try:
                if len(out):
                    _send_frame(conn, out.astype(np.float32).tobytes())
                if done:
                    _send_frame(conn, b"")  # stream truly completed
            except OSError:
                pass
            _abort_conn(conn)
        if flushes:
            done_n = sum(1 for f in flushes if f[3])
            self.log(f"[serve] released {len(flushes)} live stream(s) "
                     f"({done_n} completed, {len(flushes) - done_n} cleanly "
                     "aborted)")

    def _disconnect_all(self) -> None:
        """Close every client connection WITHOUT the completion frame —
        clients observe an aborted stream, not a completed one."""
        with self._lock:
            conns = list(self._conns.items())
            self._conns.clear()
        for sid, conn in conns:
            _abort_conn(conn)
        if conns:
            self.log(f"[serve] aborted {len(conns)} client stream(s)")

    # -- observability ------------------------------------------------------

    def stats(self) -> dict:
        """Point-in-time serving stats (JSON-serializable). Served to any
        client whose header frame is `{"stats": true}` — production
        observability for a daemon whose only other surface is the log
        (the trainer's equivalent is the TB event stream)."""
        with self._lock:
            e = self.engine
            lat = sorted(self._busy_tick_s)
            pct = lambda p: (
                round(lat[min(len(lat) - 1, int(p * len(lat)))] * 1000, 2)
                if lat else None
            )
            return {
                "uptime_s": round(time.monotonic() - self._t_start, 1),
                "active_streams": len(self._conns),
                "slots": e.slots,
                "chunk_samples": e.chunk,
                "mode": e.mode,
                "pipeline_depth": e.pipeline_depth,
                "streams_opened": e.streams_opened,
                "streams_completed": e.streams_completed,
                "streams_aborted": e.streams_aborted,
                "streams_failed": e.streams_failed,
                "chunks_enhanced": e.chunks_enhanced,
                "audio_seconds_out": round(e.samples_out / e.enhancer.sr, 1),
                "ticks": self.ticks_total,
                "tick_failures": self.tick_failures_total,
                "busy_tick_ms": {
                    "p50": pct(0.50), "p90": pct(0.90), "p99": pct(0.99),
                    "window": len(lat),
                },
                "checkpoint": self.checkpoint_path,
                "reloads": self.reloads,
            }

    def watch_checkpoint(self, path: str, interval: float = 10.0):
        """Poll `path` and hot-swap whenever the file changes — the
        train→serve continuous-deployment loop: the trainer atomically
        publishes latest/best checkpoints (io/checkpoint.py os.replace),
        and a `--watch` daemon follows them with zero downtime. Reuses the
        explicit-reload path (build + warm in the watcher thread, swap
        under the lock), so the serving tick never waits; a failed reload
        (e.g. a checkpoint deleted mid-poll) is logged and watching
        continues. Returns the started daemon thread."""
        import os

        def _sig():
            try:
                st = os.stat(path)
                return (st.st_mtime_ns, st.st_size)
            except OSError:
                return None

        def _loop(last=_sig()):
            failures = 0
            while not self._stop.wait(
                interval * min(2 ** failures, 32)  # exp backoff on failure
            ):
                sig = _sig()
                if sig is None or sig == last:
                    continue
                resp = self._handle_reload(path)
                if "error" in resp:
                    # Do NOT advance `last`: a transiently failed reload
                    # (backend hiccup, checkpoint replaced mid-load) retries
                    # on a later poll instead of silently serving a stale
                    # model until the NEXT publish (r4 advisor finding).
                    # Exponential backoff (capped 32x): a PERSISTENTLY bad
                    # checkpoint must not hammer the remote compile service
                    # with a minutes-long build+warmup every poll while
                    # holding the reload lock.
                    failures += 1
                    retry_s = interval * min(2 ** failures, 32)
                    self.log(f"[serve] watch: reload failed, still serving "
                             f"the previous model (retry in {retry_s:g}s): "
                             f"{resp['error']}")
                    continue
                failures = 0
                # `sig` is the PRE-reload stat: if the file changed again
                # mid-reload, the next poll sees a newer signature and
                # reloads again rather than skipping that publish.
                last = sig

        t = threading.Thread(target=_loop, daemon=True)
        t.start()
        self.log(f"[serve] watching {path} (every {interval:g}s)")
        return t

    def _handle_reload(self, path: str) -> dict:
        """Zero-downtime checkpoint hot-swap. Build + warm the new model's
        program while the ticker keeps serving the old one, then swap under
        the serving lock. Live streams continue on the new model from their
        next chunk (serve.py swap_enhancer). One reload at a time."""
        if self.reload_fn is None:
            return {"error": "reload not enabled on this server"}
        if self._reload_restricted:
            import os

            if not self.checkpoint_path:
                # No checkpoint to anchor the restriction to: refuse
                # outright rather than deriving a base from "" (realpath("")
                # is the CWD — for a daemon with cwd=/ that would allow ANY
                # path, silently voiding the guard).
                return {"error": "reload refused: daemon is bound to a "
                        "non-loopback interface and has no serving "
                        "checkpoint path to restrict reloads to"}
            base = os.path.dirname(os.path.realpath(self.checkpoint_path))
            target = os.path.realpath(path)
            try:
                inside = base and os.path.commonpath([base, target]) == base
            except ValueError:  # different drives / mixed abs-rel
                inside = False
            if not inside:
                return {
                    "error": "reload refused: daemon is bound to a "
                    "non-loopback interface, so reload paths are restricted "
                    f"to the serving checkpoint's directory ({base or '?'}); "
                    "pass --allow-remote-reload to disable this guard"
                }
        with self._reload_lock:
            t0 = time.perf_counter()
            self.log(f"[serve] reload requested -> {path}: building + "
                     "warming the new program (serving continues)")
            try:
                fresh = self.reload_fn(path)
                fresh.warmup()
            except Exception as e:
                self.log(f"[serve] reload failed: {e!r}")
                return {"error": repr(e)}
            with self._lock:
                self.engine.swap_enhancer(fresh.enhancer)
                self.checkpoint_path = path
                self.reloads += 1
                kept = len(self._conns)
            dt = round(time.perf_counter() - t0, 1)
            self.log(f"[serve] hot-swapped checkpoint -> {path} "
                     f"({dt}s build+warmup, {kept} live stream(s) kept)")
            return {"ok": True, "checkpoint": path, "warmup_s": dt,
                    "streams_kept": kept}

    # -- internals ----------------------------------------------------------

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, addr = self._sock.accept()
            except OSError:
                return  # socket closed by stop()
            threading.Thread(target=self._client_loop, args=(conn, addr),
                             daemon=True).start()

    def _client_loop(self, conn: socket.socket, addr) -> None:
        sid = None
        try:
            header = _recv_frame(conn)
            if header is None:
                conn.close()
                return
            meta = json.loads(header.decode() or "{}")
            if meta.get("stats"):
                # Observability request: one JSON frame, then the normal
                # completion frame. No engine stream is opened.
                _send_frame(conn, json.dumps(self.stats()).encode())
                _send_frame(conn, b"")
                conn.close()
                return
            if meta.get("reload"):
                # Control request: hot-swap to the named checkpoint (a path
                # on the SERVER's filesystem). Runs in this client thread —
                # the build/compile never blocks the serving tick.
                resp = self._handle_reload(str(meta["reload"]))
                _send_frame(conn, json.dumps(resp).encode())
                _send_frame(conn, b"")
                conn.close()
                return
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
        failures = 0  # consecutive ticks with a device error or a lost stream
        while not self._stop.is_set():
            t0 = time.perf_counter()
            aborted, finished, error = [], [], None
            try:
                with self._lock:
                    n_work = self.engine.tick()
                    if n_work:
                        self._busy_tick_s.append(time.perf_counter() - t0)
                    for sid, conn in list(self._conns.items()):
                        if self.engine.is_failed(sid):
                            # device fetch for this stream died (engine
                            # _finalize): abort — close WITHOUT the
                            # completion frame so the client sees an error
                            aborted.append((sid, conn))
                            del self._conns[sid]
                            self.engine.abort(sid)
                            continue
                        out = self.engine.pull(sid)
                        done = self.engine.is_done(sid)
                        if len(out) or done:
                            finished.append((sid, conn, out, done))
                    for sid, conn, out, done in finished:
                        if done:
                            del self._conns[sid]
            except Exception as e:
                error = e
            # Survive a transient backend error (the same JaxRuntimeError
            # class the trainer recovers from) — but `max_tick_failures`
            # CONSECUTIVE ticks that raised or killed a stream mean a
            # poisoned backend that will fail every later transfer: exit
            # for a supervisor restart instead of spinning while streams
            # silently stall (r3 verdict #4).
            self.ticks_total += 1
            if error is not None or aborted:
                failures += 1
                self.tick_failures_total += 1
                why = repr(error) if error is not None else "stream fetch died"
                self.log(f"[serve] tick failure "
                         f"({failures}/{self.max_tick_failures}): {why}")
            else:
                failures = 0
            self._close_aborted(aborted)
            if failures >= self.max_tick_failures:
                self.log("[serve] persistent tick failures: shutting "
                         "down for supervisor restart")
                self.exit_code = 1
                self._disconnect_all()
                self._stop.set()
                return
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
            self._last_tick = time.monotonic()
            elapsed = time.perf_counter() - t0
            self._stop.wait(max(0.0, self.tick_interval - elapsed))

    def _close_aborted(self, aborted) -> None:
        for sid, conn in aborted:
            _abort_conn(conn)
            self.log(f"[serve] stream {sid} aborted (device failure)")


def build_engine(config: dict, checkpoint_path: str, slots: int,
                 compute_dtype: str | None, chunk_seconds: float,
                 pipeline_depth: int = 2, log=print):
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
    # Honor the config's inferencer type when it names a length-aware
    # per-chunk mode (r3 advisor finding: a config specifying
    # sub_band_crm_mask must not silently be served via
    # full_band_crm_mask). "overlapped_chunk" (and unset) mean the engine's
    # own default — the engine IS the live form of that mode.
    mode = None
    configured = inferencer_cfg.get("type")
    if configured and configured != "overlapped_chunk":
        if configured in Enhancer.LENGTH_AWARE_MODES:
            mode = configured
        else:
            log(f"[serve] config inferencer.type={configured!r} is not a "
                f"length-aware per-chunk mode ({Enhancer.LENGTH_AWARE_MODES})"
                " — serving the model family's default full-band cIRM mode")
    return StreamingEngine(
        enhancer, slots=slots,
        chunk_samples=int(chunk_seconds * enhancer.sr),
        pipeline_depth=pipeline_depth,
        mode=mode,
    )


def query_stats(host: str, port: int, timeout: float = 10.0) -> dict:
    """Fetch a running daemon's stats over the normal wire protocol
    (header `{"stats": true}` -> one JSON frame -> completion frame)."""
    return _control_request(host, port, {"stats": True}, timeout)


def request_reload(host: str, port: int, checkpoint: str,
                   timeout: float = 3600.0) -> dict:
    """Ask a running daemon to hot-swap to `checkpoint` (a path on the
    DAEMON's filesystem). Blocks until the new program is built, warmed,
    and swapped — minutes on a cold remote backend — while the daemon
    keeps serving the old model throughout."""
    return _control_request(host, port, {"reload": checkpoint}, timeout)


def _control_request(host, port, header: dict, timeout: float) -> dict:
    conn = socket.create_connection((host, port), timeout=timeout)
    try:
        _send_frame(conn, json.dumps(header).encode())
        frame = _recv_frame(conn)
        return json.loads(frame.decode()) if frame else {}
    finally:
        conn.close()


def supervise_serve(child_argv, max_restarts: int = 3, log=print,
                    launcher=None) -> int:
    """Serving counterpart of train/supervisor.py: relaunch the daemon while
    it exits nonzero (poisoned backend, ticker stall), up to `max_restarts`
    times. A clean exit (0 — operator shutdown) ends supervision. Unlike
    training there is no state to resume: streams are LOST across a restart
    (clients observe EOF without the completion frame and must reconnect);
    the relaunched daemon re-warms the device program before accepting.

    Kill discipline per CLAUDE.md: the supervisor never signals by pattern;
    it only ever waits on the exact child it spawned. A SIGTERM sent to
    the SUPERVISOR forwards to that exact child pid, so `kill <pid>` on
    the process the operator launched drives the daemon's graceful drain
    and the supervisor exits with the child's clean 0 — instead of dying
    around a still-serving orphan that holds the port."""
    import signal
    import threading as _threading

    attempt = 0
    prefix = launcher or [sys.executable, "-m", "fullsubnet_plus_tpu.cli.serve"]
    live = {"child": None}

    def _forward(signum, frame):
        c = live["child"]
        if c is not None and c.poll() is None:
            c.send_signal(signal.SIGTERM)  # exact pid only

    prev_term = None
    if _threading.current_thread() is _threading.main_thread():
        prev_term = signal.signal(signal.SIGTERM, _forward)
    try:
        while True:
            child = subprocess.Popen(list(prefix) + list(child_argv))
            live["child"] = child
            log(f"[serve-supervisor] attempt {attempt}: launched pid "
                f"{child.pid}")
            rc = child.wait()
            if rc == 0:
                log("[serve-supervisor] clean shutdown")
                return 0
            if attempt >= max_restarts:
                log(f"[serve-supervisor] giving up after {attempt} "
                    f"restart(s) (exit {rc})")
                return rc
            attempt += 1
            log(f"[serve-supervisor] exit {rc}: relaunching "
                f"({attempt}/{max_restarts})")
    finally:
        if prev_term is not None:
            signal.signal(signal.SIGTERM, prev_term)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("-C", "--configuration")
    parser.add_argument("-M", "--checkpoint")
    parser.add_argument("--stats", action="store_true",
                        help="query a RUNNING daemon at --host/--port, "
                             "print its stats JSON, and exit (no -C/-M "
                             "needed)")
    parser.add_argument("--reload", metavar="CKPT",
                        help="tell a RUNNING daemon at --host/--port to "
                             "hot-swap to this checkpoint (a path on the "
                             "daemon's filesystem) with zero downtime, "
                             "print the ack JSON, and exit (no -C/-M "
                             "needed)")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=7860)
    parser.add_argument("--slots", type=int, default=8,
                        help="streams per device dispatch (fixed shape); "
                             "8 favors light-load latency — raise toward "
                             "64 (the measured per-dispatch knee, "
                             "docs/PERFORMANCE.md) for heavily loaded "
                             "daemons")
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
    parser.add_argument("--max-tick-failures", type=int, default=5,
                        help="consecutive tick failures before the daemon "
                             "aborts all streams and exits nonzero "
                             "(poisoned-backend escape; pair with "
                             "--supervise)")
    parser.add_argument("--stall-timeout", type=float, default=300.0,
                        help="seconds without a completed tick before the "
                             "daemon assumes the backend wedged a device "
                             "call forever and exits (0 disables)")
    parser.add_argument("--allow-remote-reload", action="store_true",
                        help="when bound to a non-loopback --host, allow "
                             "{'reload': path} requests for ANY server-side "
                             "path (default: restricted to the -M "
                             "checkpoint's directory; loopback binds are "
                             "always unrestricted)")
    parser.add_argument("--watch", type=float, default=None, metavar="SECS",
                        help="poll the -M checkpoint file every SECS "
                             "seconds and hot-swap with zero downtime "
                             "whenever it changes (follow a live training "
                             "run's published checkpoints)")
    parser.add_argument("--supervise", type=int, default=None, metavar="N",
                        help="run under a supervisor that relaunches the "
                             "daemon up to N times when it exits nonzero "
                             "(streams are lost across a restart: clients "
                             "see EOF without the completion frame and must "
                             "reconnect)")
    args = parser.parse_args(argv)
    if args.stats:
        print(json.dumps(query_stats(args.host, args.port)))
        return
    if args.reload:
        resp = request_reload(args.host, args.port, args.reload)
        print(json.dumps(resp))
        if "error" in resp:
            raise SystemExit(1)
        return
    if args.configuration is None or args.checkpoint is None:
        parser.error("-C/--configuration and -M/--checkpoint are required "
                     "(unless --stats/--reload)")
    if args.supervise is not None:
        child_argv = list(argv) if argv is not None else sys.argv[1:]
        for i, a in enumerate(child_argv):
            if a == "--supervise":
                del child_argv[i : i + 2]
                break
            if a.startswith("--supervise="):
                del child_argv[i]
                break
        raise SystemExit(supervise_serve(child_argv, args.supervise))

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
    server = StreamServer(
        engine, args.host, args.port, args.tick,
        max_tick_failures=args.max_tick_failures,
        stall_timeout=args.stall_timeout,
        reload_fn=lambda path: build_engine(
            config, path, args.slots, args.dtype, args.chunk_seconds,
            pipeline_depth=args.pipeline_depth,
        ),
        checkpoint_path=args.checkpoint,
        allow_remote_reload=args.allow_remote_reload,
    )
    if args.watch:
        server.watch_checkpoint(args.checkpoint, args.watch)
    rc = server.serve_forever()
    if rc:
        raise SystemExit(rc)


if __name__ == "__main__":
    main()
