"""Live streaming serving (serve.StreamingEngine + cli.serve TCP server).

The engine must be chunk-for-chunk equivalent to the offline
overlapped_chunk mode (enhance.py, itself pinned against the reference OLA
loop inferencer.py:191-250) — a user switching from offline to live serving
must get the same waveform.
"""

import json
import socket
import struct
import threading

import jax
import numpy as np
import pytest

from fullsubnet_plus_tpu.enhance import Enhancer
from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS
from fullsubnet_plus_tpu.models.fullsubnet_plus import FullSubNetPlusConfig
from fullsubnet_plus_tpu.serve import StreamingEngine
from fullsubnet_plus_tpu.cli.serve import StreamServer, _send_frame, _recv_frame

ACOUSTICS = dict(n_fft=64, hop_length=32, win_length=64)
SMALL = FullSubNetPlusConfig(
    num_freqs=33, sb_num_neighbors=4, fb_model_hidden_size=16,
    sb_model_hidden_size=16,
)

_SERVE_TOML = """
[acoustics]
n_fft = 64
win_length = 64
sr = 1000
hop_length = 32

[inferencer]
type = "mag_complex_full_band_crm_mask"
[inferencer.args]
n_neighbor = 4

[model]
path = "fullsubnet_plus.model.fullsubnet_plus.FullSubNet_Plus"
[model.args]
sb_num_neighbors = 4
fb_num_neighbors = 0
num_freqs = 33
look_ahead = 2
sequence_model = "LSTM"
fb_output_activate_function = "ReLU"
sb_output_activate_function = false
channel_attention_model = "TSSE"
fb_model_hidden_size = 16
sb_model_hidden_size = 16
weight_init = false
norm_type = "offline_laplace_norm"
num_groups_in_drop_band = 2
kersize = [3, 5, 10]
subband_num = 1
"""


def _enhancer():
    params = FULLSUBNET_PLUS.init(jax.random.PRNGKey(0), SMALL)
    # sr=1000 keeps the 4 s chunk at 4000 samples — CPU-sized sequences
    return Enhancer(FULLSUBNET_PLUS, SMALL, params, sr=1000, **ACOUSTICS)


def _utt(n, seed):
    rng = np.random.default_rng(seed)
    return (0.1 * rng.standard_normal(n)).astype(np.float32)


def test_engine_matches_overlapped_chunk_all_at_once():
    """Feed a whole utterance, drain: output must equal the offline
    overlapped_chunk mode sample-for-sample (same [8, in_len] masked
    program, same Hann-OLA math)."""
    e = _enhancer()
    engine = StreamingEngine(e, slots=8, chunk_samples=4000)
    y = _utt(9000, 1)
    offline = np.asarray(e.overlapped_chunk(y[None], chunk_seconds=4))[0]

    sid = engine.open()
    engine.feed(sid, y)
    engine.close(sid)
    engine.drain()
    live = engine.pull(sid)
    assert live.shape == offline.shape == y.shape
    np.testing.assert_allclose(live, offline, atol=1e-6)
    assert engine.is_done(sid) and engine.active == 0


@pytest.mark.parametrize("depth", [0, 2])
def test_engine_incremental_feed_matches(depth):
    """Live pacing: audio arrives in irregular pieces with a tick after
    each — chunks process as they become ready (partial device batches,
    fixed shape) and the final waveform is identical. depth=2 exercises
    the pipelined dispatch window (fetch deferred until ready/overflow)."""
    e = _enhancer()
    engine = StreamingEngine(e, slots=8, chunk_samples=4000,
                             pipeline_depth=depth)
    y = _utt(11000, 2)
    offline = np.asarray(e.overlapped_chunk(y[None], chunk_seconds=4))[0]

    sid = engine.open()
    out = []
    cuts = [0, 1700, 4096, 4100, 9000, 11000]
    for a, b in zip(cuts, cuts[1:]):
        engine.feed(sid, y[a:b])
        engine.tick()
        out.append(engine.pull(sid))
    engine.close(sid)
    engine.drain()
    out.append(engine.pull(sid))
    live = np.concatenate(out)
    np.testing.assert_allclose(live, offline, atol=1e-6)


@pytest.mark.parametrize("depth", [0, 3])
def test_engine_concurrent_streams(depth):
    """3 interleaved streams of different lengths each match their own
    offline result — per-stream OLA state does not cross-contaminate, and
    chunks from different streams share device batches (pipelined and
    inline fetch modes)."""
    e = _enhancer()
    engine = StreamingEngine(e, slots=8, chunk_samples=4000,
                             pipeline_depth=depth)
    utts = {0: _utt(9000, 10), 1: _utt(4500, 11), 2: _utt(12500, 12)}
    offline = {
        k: np.asarray(e.overlapped_chunk(y[None], chunk_seconds=4))[0]
        for k, y in utts.items()
    }
    sids = {k: engine.open() for k in utts}
    # interleave feeds in 3000-sample slices
    pos = {k: 0 for k in utts}
    outs = {k: [] for k in utts}
    while any(pos[k] < len(utts[k]) for k in utts):
        for k in utts:
            if pos[k] < len(utts[k]):
                engine.feed(sids[k], utts[k][pos[k] : pos[k] + 3000])
                pos[k] += 3000
                if pos[k] >= len(utts[k]):
                    engine.close(sids[k])
        engine.tick()
        for k in utts:
            outs[k].append(engine.pull(sids[k]))
    engine.drain()
    for k in utts:
        outs[k].append(engine.pull(sids[k]))
        live = np.concatenate(outs[k])
        np.testing.assert_allclose(live, offline[k], atol=1e-6,
                                   err_msg=f"stream {k}")


def test_engine_buffer_stays_bounded():
    """A genuinely live stream must not accumulate its whole history
    host-side: the consumed prefix is trimmed as chunks dispatch (r3
    review), keeping the buffer O(chunk), not O(stream length)."""
    e = _enhancer()
    engine = StreamingEngine(e, slots=8, chunk_samples=4000)
    y = _utt(40000, 40)
    offline = np.asarray(e.overlapped_chunk(y[None], chunk_seconds=4))[0]
    sid = engine.open()
    out = []
    for start in range(0, len(y), 2000):
        engine.feed(sid, y[start : start + 2000])
        engine.tick()
        out.append(engine.pull(sid))
        buf = engine._streams[sid].buffer
        assert len(buf) <= 3 * engine.chunk, len(buf)
    engine.close(sid)
    engine.drain()
    out.append(engine.pull(sid))
    np.testing.assert_allclose(np.concatenate(out), offline, atol=1e-6)


def test_engine_abort_reaps_stream():
    """abort() (client gone) drops the stream immediately; other streams
    keep working and no state lingers."""
    e = _enhancer()
    engine = StreamingEngine(e, slots=8, chunk_samples=4000)
    dead = engine.open()
    engine.feed(dead, _utt(6000, 41))
    live = engine.open()
    y = _utt(4500, 42)
    offline = np.asarray(e.overlapped_chunk(y[None], chunk_seconds=4))[0]
    engine.feed(live, y)
    engine.tick()
    engine.abort(dead)
    assert engine.is_done(dead)
    engine.close(live)
    engine.drain()
    np.testing.assert_allclose(engine.pull(live), offline, atol=1e-6)
    assert engine.active == 0


def _client(port, audio, result, idx, frame_size=2048):
    conn = socket.create_connection(("127.0.0.1", port), timeout=60)
    try:
        _send_frame(conn, json.dumps({"sr": 1000}).encode())
        for start in range(0, len(audio), frame_size):
            _send_frame(conn, audio[start : start + frame_size].tobytes())
        _send_frame(conn, b"")  # end of stream
        chunks = []
        while True:
            frame = _recv_frame(conn)
            if frame is None or frame == b"":
                break
            chunks.append(np.frombuffer(frame, np.float32))
        result[idx] = (np.concatenate(chunks)
                       if chunks else np.zeros(0, np.float32))
    finally:
        conn.close()


def test_tcp_server_end_to_end():
    """cli.serve: two concurrent TCP clients stream audio in frames and get
    back exactly the offline overlapped_chunk waveform."""
    e = _enhancer()
    engine = StreamingEngine(e, slots=8, chunk_samples=4000)
    server = StreamServer(engine, port=0, tick_interval=0.02,
                          log=lambda *_: None)
    server.start()
    try:
        utts = [_utt(9000, 20), _utt(6500, 21)]
        offline = [
            np.asarray(e.overlapped_chunk(y[None], chunk_seconds=4))[0]
            for y in utts
        ]
        results = {}
        threads = [
            threading.Thread(target=_client,
                             args=(server.port, utts[i], results, i))
            for i in range(2)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert sorted(results) == [0, 1], f"clients missing: {results.keys()}"
        for i in range(2):
            assert results[i].shape == offline[i].shape
            np.testing.assert_allclose(results[i], offline[i], atol=1e-6,
                                       err_msg=f"client {i}")
    finally:
        server.stop()
    assert engine.active == 0


class _PoisonFetch:
    """Mimics a device array whose D2H fetch always fails (the documented
    poisoned-axon-backend mode: dispatch appears to succeed, every transfer
    raises)."""

    def __array__(self, *a, **k):
        raise RuntimeError("UNIMPLEMENTED: poisoned backend")

    def is_ready(self):
        return True


def test_engine_finalize_failure_aborts_stream():
    """A failed D2H fetch must not leave the stream hanging with a stuck
    inflight count (r3 advisor): the chunk's streams are marked failed/done
    so the server can abort their connections, and the error propagates to
    the ticker's failure policy."""
    e = _enhancer()
    engine = StreamingEngine(e, slots=8, chunk_samples=4000)
    engine._base = lambda *a, **k: _PoisonFetch()
    sid = engine.open()
    engine.feed(sid, _utt(6000, 50))
    with pytest.raises(RuntimeError, match="poisoned"):
        engine.tick()
    assert engine.is_failed(sid)
    s = engine._streams[sid]
    assert s.done and s.inflight == 0 and not s.out
    engine.abort(sid)
    assert engine.active == 0


def test_engine_mode_selection():
    """The engine honors an explicit length-aware mode and rejects modes
    that cannot mask the zero-padded tail chunk (r3 advisor: the configured
    inference type was silently ignored)."""
    e = _enhancer()
    assert StreamingEngine(e, chunk_samples=4000).mode == \
        "mag_complex_full_band_crm_mask"
    eng = StreamingEngine(e, chunk_samples=4000,
                          mode="mag_complex_full_band_crm_mask")
    assert eng.mode == "mag_complex_full_band_crm_mask"
    with pytest.raises(ValueError, match="length-aware"):
        StreamingEngine(e, chunk_samples=4000, mode="overlapped_chunk")


def test_server_poisoned_backend_exits_nonzero():
    """VERDICT r4 ask #4: N consecutive failed ticks => the daemon closes
    every client connection (EOF without the completion frame) and
    serve_forever returns nonzero for a supervisor to relaunch."""
    e = _enhancer()
    engine = StreamingEngine(e, slots=8, chunk_samples=4000)
    server = StreamServer(engine, port=0, tick_interval=0.01,
                          log=lambda *_: None, max_tick_failures=3)
    rc_box = {}
    runner = threading.Thread(target=lambda: rc_box.setdefault(
        "rc", server.serve_forever()), daemon=True)
    runner.start()
    try:
        conn = socket.create_connection(("127.0.0.1", server.port), timeout=30)
        _send_frame(conn, json.dumps({"sr": 1000}).encode())

        # poison the backend AFTER the client is in, then feed a chunk:
        # every dispatch now raises (the chunk stays ready, so every tick
        # fails again — the permanently-raising-enhancer scenario)
        def boom(*a, **k):
            raise RuntimeError("UNIMPLEMENTED: poisoned backend")

        engine._base = boom
        _send_frame(conn, _utt(6000, 51).tobytes())
        # ticks now fail every iteration; after max_tick_failures the
        # daemon disconnects us: recv sees EOF with NO empty frame first
        conn.settimeout(30)
        got_eof_without_completion = False
        while True:
            frame = _recv_frame(conn)
            if frame is None:
                got_eof_without_completion = True
                break
            if frame == b"":
                break  # completion frame — would be a lie here
        assert got_eof_without_completion
        runner.join(timeout=30)
        assert not runner.is_alive()
        assert rc_box["rc"] == 1 and server.exit_code == 1
    finally:
        conn.close()
        server.stop()


def test_server_stall_watchdog_exits():
    """A ticker wedged inside a device call that never returns (the axon
    failure mode exceptions cannot surface from) trips the serve_forever
    stall watchdog: clients are disconnected and the exit code is 2."""
    e = _enhancer()
    engine = StreamingEngine(e, slots=8, chunk_samples=4000)
    wedge = threading.Event()
    engine.tick = lambda: wedge.wait(5)  # "never" completes (test-sized)
    server = StreamServer(engine, port=0, tick_interval=0.01,
                          log=lambda *_: None, stall_timeout=1.0)
    try:
        rc = server.serve_forever()
        assert rc == 2 and server.exit_code == 2
    finally:
        wedge.set()
        server.stop()


def test_supervise_serve_relaunches_and_new_client_connects(tmp_path):
    """The serve supervisor relaunches a daemon that exited nonzero; a new
    client can connect to the relaunched instance. The child here is a stub
    daemon: attempt 0 dies (poisoned backend), attempt 1 serves one TCP
    connection and exits 0."""
    import sys as _sys
    from fullsubnet_plus_tpu.cli.serve import supervise_serve

    stub = tmp_path / "stub_daemon.py"
    port_file = tmp_path / "port"
    stub.write_text(
        "import socket, sys, os\n"
        "state = sys.argv[1]\n"
        "if not os.path.exists(state):\n"
        "    open(state, 'w').write('died once')\n"
        "    sys.exit(1)  # first launch: poisoned backend\n"
        "s = socket.socket()\n"
        "s.bind(('127.0.0.1', 0))\n"
        "s.listen(1)\n"
        f"open({str(port_file)!r} + '.tmp', 'w').write(str(s.getsockname()[1]))\n"
        f"os.replace({str(port_file)!r} + '.tmp', {str(port_file)!r})\n"
        "conn, _ = s.accept()\n"
        "conn.sendall(b'relaunched')\n"
        "conn.close()\n"
        "sys.exit(0)\n"
    )
    state = tmp_path / "state"
    logs = []
    result = {}
    t = threading.Thread(target=lambda: result.setdefault("rc", supervise_serve(
        [str(state)], max_restarts=2, log=logs.append,
        launcher=[_sys.executable, str(stub)])), daemon=True)
    t.start()
    # wait for the relaunched instance to publish its port, then connect
    import time as _time
    deadline = _time.monotonic() + 30
    while not port_file.exists() and _time.monotonic() < deadline:
        _time.sleep(0.05)
    assert port_file.exists(), f"relaunch never served: {logs}"
    conn = socket.create_connection(("127.0.0.1", int(port_file.read_text())),
                                    timeout=10)
    assert conn.recv(64) == b"relaunched"
    conn.close()
    t.join(timeout=30)
    assert result["rc"] == 0
    assert any("relaunching" in str(m) for m in logs)


def test_bad_client_does_not_kill_server():
    """A client sending garbage (no valid header frame) must be dropped
    without affecting a concurrent good client."""
    e = _enhancer()
    engine = StreamingEngine(e, slots=8, chunk_samples=4000)
    server = StreamServer(engine, port=0, tick_interval=0.02,
                          log=lambda *_: None)
    server.start()
    try:
        bad = socket.create_connection(("127.0.0.1", server.port), timeout=10)
        bad.sendall(b"\xff\xff")  # truncated length prefix
        bad.close()

        y = _utt(4500, 30)
        offline = np.asarray(e.overlapped_chunk(y[None], chunk_seconds=4))[0]
        results = {}
        _client(server.port, y, results, 0)
        np.testing.assert_allclose(results[0], offline, atol=1e-6)
    finally:
        server.stop()


def test_serve_cli_daemon_end_to_end(tmp_path):
    """The full `cli.serve` argv surface as a user runs it — config + npz
    checkpoint -> daemon under `--supervise 1` -> TCP client streams audio
    and gets the full-length enhanced waveform back. (The in-process tests
    above cover the engine/server objects; this pins main(): config/mode
    resolution, checkpoint load, warmup, supervisor wrapper.)"""
    import os
    import re
    import subprocess
    import sys
    import time

    import jax as _jax
    from fullsubnet_plus_tpu.io.checkpoint import save_pytree
    from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS

    params = FULLSUBNET_PLUS.init(_jax.random.PRNGKey(0), SMALL)
    ckpt = tmp_path / "model.npz"
    save_pytree(str(ckpt), {"params": params}, {"epoch": 0})
    cfg = tmp_path / "serve.toml"
    cfg.write_text(_SERVE_TOML)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    child = subprocess.Popen(
        [sys.executable, "-m", "fullsubnet_plus_tpu.cli.serve",
         "-C", str(cfg), "-M", str(ckpt), "--port", "0",
         "--dtype", "float32", "--tick", "0.02", "--supervise", "1"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        port, deadline = None, time.monotonic() + 180
        while port is None and time.monotonic() < deadline:
            line = child.stdout.readline()
            if not line:
                time.sleep(0.1)
                continue
            m = re.search(r"listening on :(\d+)", line)
            if m:
                port = int(m.group(1))
        assert port, "daemon never reported its port"
        y = _utt(9000, 60)
        results = {}
        _client(port, y, results, 0)
        assert results[0].shape == y.shape
        assert np.isfinite(results[0]).all()
    finally:
        child.terminate()  # exact pid only (CLAUDE.md kill discipline)
        try:
            child.wait(timeout=20)
        except subprocess.TimeoutExpired:
            child.kill()
            child.wait()


def test_stats_surface():
    """The daemon's observability surface: a `{"stats": true}` header
    returns one JSON frame of serving stats over the normal wire protocol
    (cli/serve.py StreamServer.stats / query_stats), without opening an
    engine stream. Counters must reflect real traffic: after two streamed
    utterances, opened == completed == 2, chunks/audio totals are positive,
    and the busy-tick latency window is populated."""
    from fullsubnet_plus_tpu.cli.serve import query_stats

    e = _enhancer()
    engine = StreamingEngine(e, slots=8, chunk_samples=4000)
    server = StreamServer(engine, port=0, tick_interval=0.02,
                          log=lambda *_: None)
    server.start()
    try:
        # Stats before traffic: zeroed, no stream opened by the query.
        s0 = query_stats("127.0.0.1", server.port)
        assert s0["streams_opened"] == 0 and s0["active_streams"] == 0
        assert s0["slots"] == 8 and s0["chunk_samples"] == 4000
        assert s0["mode"] in Enhancer.LENGTH_AWARE_MODES

        utts = [_utt(9000, 30), _utt(6500, 31)]
        results = {}
        threads = [
            threading.Thread(target=_client,
                             args=(server.port, utts[i], results, i))
            for i in range(2)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert sorted(results) == [0, 1]

        s1 = query_stats("127.0.0.1", server.port)
        assert s1["streams_opened"] == 2
        assert s1["streams_completed"] == 2
        assert s1["streams_aborted"] == 0 and s1["streams_failed"] == 0
        assert s1["active_streams"] == 0
        assert s1["chunks_enhanced"] >= 2 * 3  # ceil(9000/2000), ceil(6500/2000)
        expected_s = (len(utts[0]) + len(utts[1])) / e.sr
        assert abs(s1["audio_seconds_out"] - round(expected_s, 1)) <= 0.2
        assert s1["ticks"] > 0 and s1["tick_failures"] == 0
        assert s1["busy_tick_ms"]["window"] > 0
        assert s1["busy_tick_ms"]["p50"] is not None
        assert s1["busy_tick_ms"]["p99"] >= s1["busy_tick_ms"]["p50"]
    finally:
        server.stop()


def test_checkpoint_hot_swap():
    """Zero-downtime model update (cli/serve.py `{"reload": path}` /
    `--reload`): the daemon builds + warms a new program while serving the
    old one, then swaps atomically. A stream served BEFORE the swap must
    match the old model's offline output; a stream served AFTER must match
    the new model's — and stats must record the reload."""
    from fullsubnet_plus_tpu.cli.serve import query_stats, request_reload

    def make_enhancer(seed):
        params = FULLSUBNET_PLUS.init(jax.random.PRNGKey(seed), SMALL)
        return Enhancer(FULLSUBNET_PLUS, SMALL, params, sr=1000, **ACOUSTICS)

    e_old, e_new = make_enhancer(0), make_enhancer(1)
    engine = StreamingEngine(e_old, slots=8, chunk_samples=4000)
    built = {}

    def reload_fn(path):
        built["path"] = path
        return StreamingEngine(e_new, slots=8, chunk_samples=4000)

    server = StreamServer(engine, port=0, tick_interval=0.02,
                          log=lambda *_: None, reload_fn=reload_fn,
                          checkpoint_path="old.npz")
    server.start()
    try:
        utt = _utt(9000, 40)
        offline_old = np.asarray(
            e_old.overlapped_chunk(utt[None], chunk_seconds=4))[0]
        offline_new = np.asarray(
            e_new.overlapped_chunk(utt[None], chunk_seconds=4))[0]
        assert not np.allclose(offline_old, offline_new)  # models differ

        results = {}
        _client(server.port, utt, results, 0)
        np.testing.assert_allclose(results[0], offline_old, atol=1e-6)

        ack = request_reload("127.0.0.1", server.port, "new.npz", timeout=60)
        assert ack.get("ok") is True and ack["checkpoint"] == "new.npz"
        assert built["path"] == "new.npz"

        _client(server.port, utt, results, 1)
        np.testing.assert_allclose(results[1], offline_new, atol=1e-6)

        s = query_stats("127.0.0.1", server.port)
        assert s["reloads"] == 1 and s["checkpoint"] == "new.npz"
        assert s["streams_completed"] == 2
    finally:
        server.stop()


def test_reload_disabled_and_failed():
    """A server constructed without reload_fn refuses the request with an
    error frame; a reload whose build raises reports the error and leaves
    the old model serving."""
    from fullsubnet_plus_tpu.cli.serve import request_reload

    e = _enhancer()
    engine = StreamingEngine(e, slots=8, chunk_samples=4000)
    server = StreamServer(engine, port=0, tick_interval=0.02,
                          log=lambda *_: None)
    server.start()
    try:
        resp = request_reload("127.0.0.1", server.port, "x.npz", timeout=30)
        assert "error" in resp
    finally:
        server.stop()

    def boom(path):
        raise FileNotFoundError(path)

    server = StreamServer(engine, port=0, tick_interval=0.02,
                          log=lambda *_: None, reload_fn=boom)
    server.start()
    try:
        resp = request_reload("127.0.0.1", server.port, "x.npz", timeout=30)
        assert "error" in resp and "x.npz" in resp["error"]
        # old model still serves
        utt = _utt(6500, 41)
        offline = np.asarray(e.overlapped_chunk(utt[None], chunk_seconds=4))[0]
        results = {}
        _client(server.port, utt, results, 0)
        np.testing.assert_allclose(results[0], offline, atol=1e-6)
        assert server.reloads == 0
    finally:
        server.stop()


def test_watch_checkpoint_auto_reload(tmp_path):
    """`--watch`: the daemon polls the checkpoint file and hot-swaps when it
    changes (follow a live training run). Each rewrite of the file triggers
    exactly one reload; a vanished file is tolerated."""
    import time as _time

    ckpt = tmp_path / "latest.npz"
    ckpt.write_bytes(b"v0")

    e = _enhancer()
    engine = StreamingEngine(e, slots=8, chunk_samples=4000)
    calls = []

    def reload_fn(path):
        calls.append(path)
        return StreamingEngine(e, slots=8, chunk_samples=4000)

    server = StreamServer(engine, port=0, tick_interval=0.02,
                          log=lambda *_: None, reload_fn=reload_fn,
                          checkpoint_path=str(ckpt))
    server.start()
    try:
        server.watch_checkpoint(str(ckpt), interval=0.05)
        _time.sleep(0.3)
        assert calls == []  # unchanged file: no reload

        ckpt.write_bytes(b"v1-longer")  # mtime+size change
        deadline = _time.monotonic() + 30
        while server.reloads < 1 and _time.monotonic() < deadline:
            _time.sleep(0.05)
        assert server.reloads == 1 and len(calls) == 1

        ckpt.unlink()  # vanished: tolerated, no crash, no reload
        _time.sleep(0.3)
        assert len(calls) == 1

        ckpt.write_bytes(b"v2-even-longer")
        deadline = _time.monotonic() + 30
        while server.reloads < 2 and _time.monotonic() < deadline:
            _time.sleep(0.05)
        assert server.reloads == 2 and len(calls) == 2
    finally:
        server.stop()


def test_graceful_shutdown_mid_stream():
    """VERDICT r5 ask #5: a shutdown request mid-stream drains in-flight
    work and releases clients cleanly — the client receives every enhanced
    frame that was ready, then EOF WITHOUT the completion frame (the
    protocol's clean abort), and serve_forever returns 0."""
    e = _enhancer()
    engine = StreamingEngine(e, slots=8, chunk_samples=4000,
                             pipeline_depth=2)
    server = StreamServer(engine, port=0, tick_interval=0.02,
                          log=lambda *_: None)
    rc_box = {}
    runner = threading.Thread(target=lambda: rc_box.setdefault(
        "rc", server.serve_forever()), daemon=True)
    runner.start()
    conn = socket.create_connection(("127.0.0.1", server.port), timeout=30)
    try:
        _send_frame(conn, json.dumps({"sr": 1000}).encode())
        # 9000 samples, stream left OPEN: chunks 0-2 are ready, the tail is
        # not — a live stream caught mid-flight.
        y = _utt(9000, 70)
        _send_frame(conn, y.tobytes())
        # wait until the engine has enhanced something for this stream
        deadline = __import__("time").monotonic() + 30
        while engine.chunks_enhanced == 0 and \
                __import__("time").monotonic() < deadline:
            __import__("time").sleep(0.02)
        assert engine.chunks_enhanced > 0

        server.request_shutdown()
        conn.settimeout(30)
        frames, completion = [], False
        while True:
            frame = _recv_frame(conn)
            if frame is None:
                break  # EOF
            if frame == b"":
                completion = True  # would be a lie for an open stream
                break
            frames.append(np.frombuffer(frame, np.float32))
        assert not completion, "open stream must get a clean abort, not a " \
                               "completion frame"
        got = np.concatenate(frames) if frames else np.zeros(0, np.float32)
        # drained output is a PREFIX of the offline result (every ready
        # chunk was enhanced and flushed before the abort)
        offline = np.asarray(e.overlapped_chunk(y[None], chunk_seconds=4))[0]
        assert len(got) > 0
        np.testing.assert_allclose(got, offline[: len(got)], atol=1e-6)
        runner.join(timeout=30)
        assert not runner.is_alive()
        assert rc_box["rc"] == 0 and server.exit_code == 0
    finally:
        conn.close()
        server.stop()


def test_sigterm_daemon_drains_cleanly(tmp_path):
    """The real daemon process under SIGTERM (the signal a supervisor or
    operator `kill` sends): a client mid-stream observes its flushed
    frames then a clean abort — not a cut socket — and the daemon exits 0
    (cli/serve.py serve_forever SIGTERM handler)."""
    import os
    import re
    import signal
    import subprocess
    import sys
    import time

    import jax as _jax
    from fullsubnet_plus_tpu.io.checkpoint import save_pytree

    params = FULLSUBNET_PLUS.init(_jax.random.PRNGKey(0), SMALL)
    ckpt = tmp_path / "model.npz"
    save_pytree(str(ckpt), {"params": params}, {"epoch": 0})
    cfg = tmp_path / "serve.toml"
    cfg.write_text(_SERVE_TOML)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    child = subprocess.Popen(
        [sys.executable, "-m", "fullsubnet_plus_tpu.cli.serve",
         "-C", str(cfg), "-M", str(ckpt), "--port", "0",
         "--dtype", "float32", "--tick", "0.02"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        port, deadline = None, time.monotonic() + 180
        while port is None and time.monotonic() < deadline:
            line = child.stdout.readline()
            if not line:
                time.sleep(0.1)
                continue
            m = re.search(r"listening on :(\d+)", line)
            if m:
                port = int(m.group(1))
        assert port, "daemon never reported its port"
        conn = socket.create_connection(("127.0.0.1", port), timeout=60)
        _send_frame(conn, json.dumps({"sr": 1000}).encode())
        y = _utt(9000, 71)
        _send_frame(conn, y.tobytes())  # stream stays OPEN (mid-stream)
        conn.settimeout(60)
        first = _recv_frame(conn)  # wait for real enhanced audio
        assert first not in (None, b"")

        child.send_signal(signal.SIGTERM)  # exact pid (CLAUDE.md)
        frames, completion = [np.frombuffer(first, np.float32)], False
        while True:
            frame = _recv_frame(conn)
            if frame is None:
                break
            if frame == b"":
                completion = True
                break
            frames.append(np.frombuffer(frame, np.float32))
        conn.close()
        assert not completion  # clean abort for the open stream
        assert sum(len(f) for f in frames) > 0
        assert child.wait(timeout=60) == 0  # graceful => exit 0
    finally:
        if child.poll() is None:
            child.kill()
            child.wait()


def test_reload_restricted_on_non_loopback_bind(tmp_path):
    """Binding a non-loopback interface restricts the unauthenticated
    reload control plane to the serving checkpoint's directory (r4 advisor
    finding); allow_remote_reload=True lifts the guard."""
    from fullsubnet_plus_tpu.cli.serve import request_reload

    e = _enhancer()
    inside = tmp_path / "best_model.npz"
    inside.write_bytes(b"x")
    reload_fn = lambda p: StreamingEngine(e, slots=8, chunk_samples=4000)

    engine = StreamingEngine(e, slots=8, chunk_samples=4000)
    server = StreamServer(engine, host="0.0.0.0", port=0, tick_interval=0.02,
                          log=lambda *_: None, reload_fn=reload_fn,
                          checkpoint_path=str(tmp_path / "serving.npz"))
    server.start()
    try:
        resp = request_reload("127.0.0.1", server.port, "/etc/passwd",
                              timeout=30)
        assert "error" in resp and "restricted" in resp["error"]
        assert server.reloads == 0
        resp = request_reload("127.0.0.1", server.port, str(inside),
                              timeout=30)
        assert resp.get("ok") is True and server.reloads == 1
    finally:
        server.stop()

    # loopback bind (the default): unrestricted, as before
    server = StreamServer(StreamingEngine(e, slots=8, chunk_samples=4000),
                          port=0, tick_interval=0.02, log=lambda *_: None,
                          reload_fn=reload_fn, checkpoint_path="a.npz")
    server.start()
    try:
        resp = request_reload("127.0.0.1", server.port, "/anywhere/x.npz",
                              timeout=30)
        assert resp.get("ok") is True
    finally:
        server.stop()

    # explicit opt-out lifts the guard on a non-loopback bind
    server = StreamServer(StreamingEngine(e, slots=8, chunk_samples=4000),
                          host="0.0.0.0", port=0, tick_interval=0.02,
                          log=lambda *_: None, reload_fn=reload_fn,
                          checkpoint_path="a.npz", allow_remote_reload=True)
    server.start()
    try:
        resp = request_reload("127.0.0.1", server.port, "/anywhere/x.npz",
                              timeout=30)
        assert resp.get("ok") is True
    finally:
        server.stop()


def test_graceful_drain_wedged_ticker_still_exits():
    """If the ticker is wedged inside a device call (possibly holding the
    serving lock — the stall-watchdog scenario), SIGTERM must STILL
    terminate the daemon: the drain's bounded join fails and it falls back
    to aborting every client without touching the engine (r5 review
    finding: the drain used to block forever on the lock)."""
    e = _enhancer()
    engine = StreamingEngine(e, slots=8, chunk_samples=4000)
    wedge = threading.Event()
    server = StreamServer(engine, port=0, tick_interval=0.01,
                          log=lambda *_: None, stall_timeout=0)
    server.start()
    conn = socket.create_connection(("127.0.0.1", server.port), timeout=30)
    try:
        _send_frame(conn, json.dumps({"sr": 1000}).encode())
        import time as _time
        deadline = _time.monotonic() + 30
        while engine.active == 0 and _time.monotonic() < deadline:
            _time.sleep(0.02)  # wait until the stream is registered
        assert engine.active == 1
        engine.tick = lambda: (wedge.wait(60), 0)[1]  # wedge inside lock
        _time.sleep(0.2)  # let the ticker enter the wedged tick
        t0 = _time.monotonic()
        server._graceful_drain(join_timeout=0.5)
        assert _time.monotonic() - t0 < 10  # returned despite the wedge
        conn.settimeout(10)
        assert _recv_frame(conn) is None  # aborted: EOF, no completion
    finally:
        wedge.set()
        conn.close()
        server.stop()


def test_reload_refused_without_checkpoint_anchor():
    """Non-loopback bind + no checkpoint_path: the restricted reload guard
    must refuse outright, not derive its base directory from "" (which is
    the CWD — for a daemon at / that would allow ANY path; r5 review
    finding)."""
    from fullsubnet_plus_tpu.cli.serve import request_reload

    e = _enhancer()
    server = StreamServer(
        StreamingEngine(e, slots=8, chunk_samples=4000),
        host="0.0.0.0", port=0, tick_interval=0.02, log=lambda *_: None,
        reload_fn=lambda p: StreamingEngine(e, slots=8, chunk_samples=4000),
        checkpoint_path=None,
    )
    server.start()
    try:
        resp = request_reload("127.0.0.1", server.port, "/etc/passwd",
                              timeout=30)
        assert "error" in resp and server.reloads == 0
    finally:
        server.stop()


def test_supervisor_forwards_sigterm(tmp_path):
    """SIGTERM sent to the SUPERVISOR process forwards to its exact child:
    the child gets to exit cleanly (0) and the supervisor exits 0 too —
    no still-serving orphan (r5 review finding)."""
    import os
    import signal
    import subprocess
    import sys
    import time

    stub = tmp_path / "stub_child.py"
    stub.write_text(
        "import signal, sys, time, os\n"
        "mark = sys.argv[1]\n"
        "signal.signal(signal.SIGTERM,\n"
        "              lambda *_: (open(mark, 'w').write('drained'),\n"
        "                          sys.exit(0)))\n"
        "open(mark + '.up', 'w').write(str(os.getpid()))\n"
        "while True:\n"
        "    time.sleep(0.1)\n"
    )
    runner = tmp_path / "run_supervisor.py"
    runner.write_text(
        "import sys\n"
        "sys.path.insert(0, %r)\n"
        "from fullsubnet_plus_tpu.cli.serve import supervise_serve\n"
        "rc = supervise_serve([sys.argv[2]], max_restarts=1,\n"
        "                     launcher=[sys.executable, sys.argv[1]])\n"
        "sys.exit(rc)\n" % os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))
    )
    mark = tmp_path / "mark"
    sup = subprocess.Popen(
        [sys.executable, str(runner), str(stub), str(mark)])
    try:
        deadline = time.monotonic() + 30
        while not (tmp_path / "mark.up").exists() and \
                time.monotonic() < deadline:
            time.sleep(0.05)
        assert (tmp_path / "mark.up").exists(), "child never started"
        sup.send_signal(signal.SIGTERM)  # kill the SUPERVISOR's pid
        assert sup.wait(timeout=30) == 0  # child drained -> clean exit
        assert mark.read_text() == "drained"  # child got the forward
    finally:
        if sup.poll() is None:
            sup.kill()
            sup.wait()


def test_watch_retries_failed_reload(tmp_path):
    """A transiently failed --watch reload must retry on the next poll
    WITHOUT another file change (r4 advisor finding: `last` advanced before
    the reload, so a hiccup meant serving a stale model until the next
    publish)."""
    import time as _time

    ckpt = tmp_path / "latest.npz"
    ckpt.write_bytes(b"v0")
    e = _enhancer()
    engine = StreamingEngine(e, slots=8, chunk_samples=4000)
    calls = []

    def flaky_reload(path):
        calls.append(path)
        if len(calls) == 1:
            raise RuntimeError("transient backend hiccup")
        return StreamingEngine(e, slots=8, chunk_samples=4000)

    server = StreamServer(engine, port=0, tick_interval=0.02,
                          log=lambda *_: None, reload_fn=flaky_reload,
                          checkpoint_path=str(ckpt))
    server.start()
    try:
        server.watch_checkpoint(str(ckpt), interval=0.05)
        ckpt.write_bytes(b"v1-longer")  # ONE change; first reload fails
        deadline = _time.monotonic() + 30
        while server.reloads < 1 and _time.monotonic() < deadline:
            _time.sleep(0.05)
        assert server.reloads == 1 and len(calls) == 2  # failed, retried
    finally:
        server.stop()


def test_stats_and_reload_cli_paths(capsys):
    """`cli.serve --stats` / `--reload` argparse paths: main() acts as the
    query client against a running daemon and prints the JSON reply."""
    from fullsubnet_plus_tpu.cli import serve as cli

    e = _enhancer()
    engine = StreamingEngine(e, slots=8, chunk_samples=4000)
    server = StreamServer(
        engine, port=0, tick_interval=0.02, log=lambda *_: None,
        reload_fn=lambda p: StreamingEngine(e, slots=8, chunk_samples=4000),
        checkpoint_path="a.npz",
    )
    server.start()
    try:
        cli.main(["--stats", "--port", str(server.port)])
        out = json.loads(capsys.readouterr().out.strip())
        assert out["checkpoint"] == "a.npz" and out["reloads"] == 0

        cli.main(["--reload", "b.npz", "--port", str(server.port)])
        out = json.loads(capsys.readouterr().out.strip())
        assert out.get("ok") is True and out["checkpoint"] == "b.npz"
        assert server.reloads == 1
    finally:
        server.stop()

    # --reload against a daemon with reload disabled exits nonzero
    server = StreamServer(engine, port=0, tick_interval=0.02,
                          log=lambda *_: None)
    server.start()
    try:
        with pytest.raises(SystemExit):
            cli.main(["--reload", "b.npz", "--port", str(server.port)])
    finally:
        server.stop()
