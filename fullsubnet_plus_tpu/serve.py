"""Live multi-stream serving engine: the production form of the serving
model measured by `bench.py --mode serve`.

The reference has no serving daemon — its closest surface is the offline
`overlapped_chunk` inference loop (fullsubnet_plus/inferencer/
inferencer.py:191-250). This engine runs the SAME chunk/Hann-OLA math
(equivalence pinned by tests/test_serve.py against enhance.py
`overlapped_chunk`, which is itself pinned against the reference loop) but
for many CONCURRENT live streams:

  * Each tick batches one ready 4 s chunk from every active stream into the
    single fixed-shape length-masked program ([slots, 256 + chunk]) — the
    shape whose p50/p99 tick wall is measured in docs/PERFORMANCE.md
    ("Live-stream latency"). More ready streams than slots simply take
    multiple dispatches per tick.
  * Fixed shapes only: partial batches repeat row 0 (outputs dropped), the
    tail chunk is zero-padded and carries its true length — one compiled
    XLA program serves every stream forever (CLAUDE.md: never dispatch a
    new shape mid-serve).
  * All stream state (pre-context, OLA halves) is host-side numpy; the
    device sees only the batched chunk tensor.

`cli/serve.py` exposes this over a TCP socket; the engine itself is
synchronous and single-threaded by design — run one engine per chip and
scale horizontally (capacity: `bench.py --mode serve`).
"""

from __future__ import annotations

import numpy as np


class _Stream:
    def __init__(self):
        self.buffer = np.zeros(0, np.float32)  # un-chunked input audio
        self.base = 0              # absolute index of buffer[0] (prefix trimmed)
        self.received = 0          # total samples fed
        self.next_chunk = 0        # chunk index to DISPATCH next
        self.emitted_chunks = 0    # chunks whose output has been OLA'd
        self.inflight = 0          # chunks dispatched but not yet emitted
        self.prev_half = None      # windowed second half awaiting cross-fade
        self.out = []              # enhanced segments ready to pull
        self.closed = False
        self.done = False
        self.failed = False        # a device fetch for this stream's chunk died


class StreamingEngine:
    """Chunked Hann-OLA enhancement for concurrent live streams.

    Parameters: `enhancer` (an enhance.Enhancer; its length-masked base
    mode is used), `slots` (device batch rows per dispatch), and the chunk
    geometry (`chunk_samples` defaults to 4 s at the enhancer's sample
    rate; 50 % overlap, 256 samples of noisy pre-context per chunk —
    inferencer.py:197-217).
    """

    PRE_CONTEXT = 256  # noisy samples of left context per chunk

    def __init__(self, enhancer, slots: int = 8, chunk_samples: int | None = None,
                 pipeline_depth: int = 0, mode: str | None = None):
        self.enhancer = enhancer
        self.slots = int(slots)
        self.chunk = int(chunk_samples or 4 * enhancer.sr)
        assert self.chunk % 2 == 0
        self.hop = self.chunk // 2
        self.in_len = self.PRE_CONTEXT + self.chunk
        self.window = np.hanning(self.chunk + 1)[: self.chunk].astype(np.float32)
        # `mode` selects the per-chunk base enhancement mode; it must be
        # length-aware (the tail chunk is zero-padded with a true length).
        # Default: the model family's full-band cIRM mode, matching the
        # offline overlapped_chunk loop this engine is the live form of.
        if mode is None:
            mode = ("mag_complex_full_band_crm_mask"
                    if enhancer.model_def.n_inputs == 3
                    else "full_band_crm_mask")
        if mode not in enhancer.LENGTH_AWARE_MODES:
            raise ValueError(
                f"serving mode {mode!r} is not length-aware "
                f"({enhancer.LENGTH_AWARE_MODES}); the engine's zero-padded "
                "tail chunks need masked statistics"
            )
        self.mode = mode
        self._base = getattr(enhancer, mode)
        self._streams: dict[int, _Stream] = {}
        self._next_id = 0
        # Lifetime counters for the daemon's stats surface (cli/serve.py):
        # cheap monotonic totals, never reset.
        self.streams_opened = 0
        self.streams_completed = 0
        self.streams_aborted = 0
        self.streams_failed = 0
        self.chunks_enhanced = 0
        self.samples_out = 0
        # pipeline_depth > 0: dispatches are queued (device arrays, not
        # fetched) and collected when ready or when the window overflows —
        # H2D/compute/D2H overlap across ticks exactly as bench.py
        # --mode serve models a pipelined server. Depth 0 fetches inline
        # (lowest latency; the next chunk of a live stream is 2 s away
        # anyway, so depth mainly matters under many-streams load).
        self.pipeline_depth = int(pipeline_depth)
        self._pending: list = []  # (device_out, [(stream, true_len), ...])

    def swap_enhancer(self, enhancer) -> None:
        """Serve a new model from the next dispatched chunk on (checkpoint
        hot-swap, cli/serve.py `--reload`). Per-stream state is host-side
        OLA bookkeeping only, so live streams continue seamlessly: chunks
        already in flight finalize from the old program's outputs, later
        chunks run the new model, and the Hann cross-fade smooths the seam.
        The caller must hold the serving lock and must have WARMED the new
        enhancer's program first (warmup() on a scratch engine) — otherwise
        the next tick pays the compile while clients wait."""
        assert enhancer.sr == self.enhancer.sr, "sample rate changed across reload"
        self.enhancer = enhancer
        self._base = getattr(enhancer, self.mode)

    def warmup(self) -> None:
        """Compile/load the fixed-shape program and run it once, BEFORE
        accepting traffic: over the remote backend the first dispatch costs
        minutes (compile 90 s-24 min, cache-hit load ~4 min — CLAUDE.md),
        which must not happen inside the serving tick while clients wait."""
        import jax.numpy as jnp

        rows = np.zeros((self.slots, self.in_len), np.float32)
        lens = np.full((self.slots,), self.in_len, np.int64)
        np.asarray(self._base(jnp.asarray(rows), lengths=lens))

    # -- stream lifecycle ---------------------------------------------------

    def open(self) -> int:
        sid = self._next_id
        self._next_id += 1
        self._streams[sid] = _Stream()
        self.streams_opened += 1
        return sid

    def feed(self, sid: int, samples: np.ndarray) -> None:
        s = self._streams[sid]
        assert not s.closed, "feed() after close()"
        samples = np.asarray(samples, np.float32).reshape(-1)
        # Trim the consumed prefix first: only chunk `next_chunk` onward is
        # ever read again (plus its pre-context), so an unbounded live
        # stream must not accumulate its whole history host-side
        # (~230 MB/h/stream at 16 kHz) nor make feed() O(total-received).
        keep_from = max(0, s.next_chunk * self.hop - self.PRE_CONTEXT - s.base)
        if keep_from > 0:
            s.buffer = s.buffer[keep_from:]
            s.base += keep_from
        s.buffer = np.concatenate([s.buffer, samples])
        s.received += len(samples)

    def close(self, sid: int) -> None:
        """No more audio will arrive; remaining chunks flush on next tick."""
        self._streams[sid].closed = True

    def abort(self, sid: int) -> None:
        """Drop a stream outright (client gone): no further chunks are
        dispatched and the state is reaped now. In-flight chunks finalize
        into the orphaned object and are garbage-collected with it."""
        s = self._streams.pop(sid, None)
        if s is not None:
            s.closed = True
            s.done = True
            s.out = []
            self.streams_aborted += 1

    def pull(self, sid: int) -> np.ndarray:
        """Drain enhanced audio produced so far (FIFO; may be empty). A
        finished stream is reaped once fully drained."""
        s = self._streams.get(sid)
        if s is None:
            return np.zeros(0, np.float32)
        out = (np.concatenate(s.out) if s.out else np.zeros(0, np.float32))
        s.out = []
        if s.done:
            del self._streams[sid]
        return out

    def is_done(self, sid: int) -> bool:
        s = self._streams.get(sid)
        return s is None or (s.done and not s.out)

    def is_failed(self, sid: int) -> bool:
        """True if a device fetch for this stream's chunk raised: its output
        is incomplete and will never finish — the server must abort it (close
        the client connection WITHOUT the completion frame) rather than let
        the client wait forever (r3 advisor finding)."""
        s = self._streams.get(sid)
        return s is not None and s.failed

    @property
    def active(self) -> int:
        return len(self._streams)

    # -- the serving tick ---------------------------------------------------

    def _ready_chunk(self, s: _Stream):
        """The next chunk's input row + true length, or None if not ready.

        Chunk i covers y[i*hop : i*hop + chunk] with 256 samples of noisy
        pre-context (zeros for chunk 0) — inferencer.py:197-217. A chunk is
        ready when its full content has arrived, or the stream is closed
        (the partial tail). A closed stream whose next chunk would start at
        or past the end yields nothing (the reference loop stops there
        too — pad-only tails produce no new output).
        """
        start = s.next_chunk * self.hop
        if start >= s.received:
            return None
        content_end = start + self.chunk
        if content_end > s.received:
            if not s.closed:
                return None
            content_end = s.received
        row = np.zeros(self.in_len, np.float32)
        rel = start - s.base  # buffer holds [base, received)
        if s.next_chunk > 0:
            row[: self.PRE_CONTEXT] = s.buffer[rel - self.PRE_CONTEXT : rel]
        row[self.PRE_CONTEXT : self.PRE_CONTEXT + (content_end - start)] = (
            s.buffer[rel : content_end - s.base]
        )
        return row, self.PRE_CONTEXT + (content_end - start)

    def _emit(self, s: _Stream, enhanced: np.ndarray) -> None:
        """Reference Hann-OLA (inferencer.py:218-243): first chunk's first
        half passes through unwindowed; later chunks window and cross-fade
        with the saved second half."""
        if s.emitted_chunks == 0:
            s.out.append(enhanced[: self.hop].copy())
            tail = enhanced[self.hop :]
            s.prev_half = tail * self.window[self.hop :][: len(tail)]
        else:
            enhanced = enhanced * self.window[: len(enhanced)]
            tmp = enhanced[: self.hop]
            n = min(len(tmp), len(s.prev_half))
            s.out.append(tmp[:n] + s.prev_half[:n])
            s.prev_half = enhanced[self.hop :]
        s.emitted_chunks += 1
        self.samples_out += len(s.out[-1])

    def tick(self) -> int:
        """Dispatch one ready chunk from every stream that has one (batched
        `slots` rows per dispatch). Returns the number of chunks dispatched.
        Call every hop seconds in live operation — one tick's wall time is
        the added latency (docs/PERFORMANCE.md "Live-stream latency")."""
        import jax.numpy as jnp

        self._collect(block=False)
        work = []  # (stream, row, true_len)
        for s in self._streams.values():
            if s.done:
                continue
            ready = self._ready_chunk(s)
            if ready is not None:
                work.append((s, *ready))
            elif s.closed and s.inflight == 0:
                self._finish(s)
        for group_start in range(0, len(work), self.slots):
            group = work[group_start : group_start + self.slots]
            rows = [w[1] for w in group]
            lens = [w[2] for w in group]
            while len(rows) < self.slots:  # fixed shape: repeat row 0
                rows.append(rows[0])
                lens.append(lens[0])
            out = self._base(jnp.asarray(np.stack(rows)),
                             lengths=np.asarray(lens, np.int64))
            for s, _, _ in group:
                s.next_chunk += 1
                s.inflight += 1
            entry = (out, [(g[0], g[2]) for g in group])
            if self.pipeline_depth == 0:
                self._finalize(entry)  # fetch inline: lowest latency
            else:
                self._pending.append(entry)
                while len(self._pending) > self.pipeline_depth:
                    self._finalize(self._pending.pop(0))
        self._collect(block=False)
        return len(work)

    def _collect(self, block: bool) -> None:
        """Finalize queued dispatches, in order; non-blocking mode stops at
        the first result the device hasn't produced yet."""
        while self._pending:
            out, _ = self._pending[0]
            if not block and not out.is_ready():
                return
            self._finalize(self._pending.pop(0))

    def _finalize(self, entry) -> None:
        out, refs = entry
        try:
            arr = np.asarray(out)  # D2H
        except Exception:
            # The fetch died (e.g. a poisoned remote backend where every
            # later transfer fails — CLAUDE.md). The chunk is lost; without
            # this the stream's inflight count never reaches zero and its
            # client hangs forever. Mark every affected stream failed (no
            # further dispatches, reaped by the server) and re-raise so the
            # ticker's failure policy counts the error.
            for s, _ in refs:
                s.inflight -= 1
                s.failed = True
                s.done = True
                s.out = []
                self.streams_failed += 1
            raise
        for j, (s, true_len) in enumerate(refs):
            self._emit(s, arr[j, self.PRE_CONTEXT : true_len])
            s.inflight -= 1
            self.chunks_enhanced += 1
            if (s.closed and s.inflight == 0
                    and self._ready_chunk(s) is None):
                self._finish(s)

    def _finish(self, s: _Stream) -> None:
        """End of stream. The emitted segments already total the stream's
        length (every chunk contributes exactly its new-content samples),
        so the saved OLA half is discarded — the reference's assembly does
        the same (`enhanced_audio[:, :num_samples]`, inferencer.py:243)."""
        s.prev_half = None
        s.done = True
        self.streams_completed += 1

    def drain(self) -> None:
        """Tick until no stream has work left (offline completion)."""
        while self.tick():
            pass
        self._collect(block=True)
        for s in self._streams.values():
            if s.closed and not s.done and s.inflight == 0:
                self._finish(s)
