"""Multi-session streaming vocoder server: concurrent utterances, one kernel.

The reference serves one utterance at a time (ref: gen_wavernn.py main loop,
models/fatchord_version.py:169-264 batched generate); Generator.stream
already turns one utterance into a low-latency chunk stream.  This module
multiplexes MANY concurrent streams onto a single chip: each scheduling step
decodes fold rows drawn from every active session in ONE decoder launch —
the per-step cost of the AR kernel is dominated by its fixed floor
(~4 us + ~0.13 us/fold on v5e, docs/ROADMAP.md), so co-batching N sessions'
folds costs far less than N separate launches — then finalizes each
session's newly-final audio with the same incremental crossfade as
Generator.stream.

Backend mechanics:

* pallas — sessions are packed bf16 conditioning streams written into
  equal-size slots of ONE shared device buffer (an in-place
  dynamic_update_slice; the buffer is donated so adds don't copy it).
  A launch gathers every selected fold's conditioning window from the
  shared buffer by row offset (slot base + fold*stride) — the same
  gather_cond the single-stream path uses, so programs are identical in
  shape across steps and sessions.
* scan — sessions hold host-resident folded conditioning; a launch stacks
  the selected rows into one batch for the scan decoder.

Scheduling is least-progress-first: every step, sessions with the fewest
decoded folds contribute up to ``group`` folds each until ``width`` rows are
filled, so late-joining sessions catch up to their realtime deadline instead
of queueing behind finished-soon streams.

Determinism: with ``Generator(deterministic=True)`` the server's output for
each session is sample-for-sample identical to that session's own
``Generator.stream`` — asserted by tests/test_stream_server.py and the TPU
probe tools/stream_server_probe.py.  (Stochastic decode draws per-launch
keys, so sampled outputs depend on batch composition, as any co-batching
server's do.)

:class:`TTSStreamServer` layers the Tacotron stage on top: concurrent
text→speech sessions, each text's mel decode dispatched asynchronously on
admission and its vocoding co-batched with every other session's.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from wavernn_tpu.infer.pipeline import mel_from_linear
from wavernn_tpu.ops.decode import Generator, _IncrementalUnfold, _round_up


class _Session:
    """Internal per-session record."""

    def __init__(self, sid: int, sess, fin: _IncrementalUnfold,
                 slot: Optional[int]):
        self.sid = sid
        self.sess = sess          # ops.decode.StreamSession
        self.fin = fin            # incremental finalizer (owns progress)
        self.slot = slot          # pallas slot index (None on scan)
        self.dispatched = 0       # folds already in a dispatched launch


class StreamServer:
    """Serve many concurrent mel→waveform streams through one Generator.

    Parameters
    ----------
    gen : Generator
        The decode runtime (scan or pallas backend).  With
        ``output_dtype='int16'`` chunks arrive as device-faded 16-bit PCM
        (crossfade, global tail fade, and quantization all in the finalize
        program — the bandwidth-lean serving path); otherwise float64,
        matching ``Generator.stream``.
    target, overlap : int
        Fold geometry, shared by every session (ref batched generate).
    mu_law : bool
        RAW-mode mu-law expansion (ignored in MOL mode).
    group : int
        Max folds ONE session contributes per step (= chunk cadence).
    width : int
        Max total fold rows per launch; 64 fills one kernel tile on v5e.
    capacity : int
        Max concurrent sessions (pallas: slots in the shared buffer).
    slot_seconds : float
        Pallas only — audio seconds of conditioning each slot can hold;
        admission fails for longer utterances.
    seed : int
        Base for per-launch PRNG keys (stochastic decode).
    """

    def __init__(self, gen: Generator, target: int, overlap: int,
                 mu_law: bool, group: int = 16, width: int = 64,
                 capacity: int = 4, slot_seconds: float = 30.0,
                 seed: int = 0):
        self.gen = gen
        self.target = target
        self.overlap = overlap
        self.mu_law = mu_law if gen.cfg.mode == "RAW" else False
        self.group = group
        self.width = width
        self.capacity = capacity
        self.seed = seed
        self.fold_T = target + 2 * overlap

        self._sessions: Dict[int, _Session] = {}
        self._next_sid = 0
        self._launches = 0
        # one decode launch kept in flight ahead of the launch being
        # finalized: step() dispatches the NEXT launch before draining the
        # current one, so the host's fetch/finalize round-trips hide behind
        # device decode compute (the round-3 relay-bound fix).  Scheduling
        # uses each session's DISPATCHED fold count, so the lookahead never
        # double-decodes a fold.
        self._inflight = None     # (items, device rows) or None

        if gen.backend == "pallas":
            from wavernn_tpu.ops import pallas_decode

            self.T_pad = _round_up(self.fold_T, pallas_decode.CHUNK)
            # a slot must hold an utterance's packed rows: ~samples plus the
            # last fold's chunk-aligned window
            self.slot_len = _round_up(
                int(slot_seconds * gen.cfg.sample_rate) + self.T_pad,
                pallas_decode.CHUNK,
            )
            self._free_slots = list(range(capacity))
            self._buffer = jnp.zeros(
                (capacity * self.slot_len, pallas_decode.SEG), jnp.bfloat16)
            self._write = jax.jit(
                lambda buf, rows, base: jax.lax.dynamic_update_slice(
                    buf, rows, (base, 0)),
                donate_argnums=0,
            )
            self._group_fn = gen._get_stream_group()

    # -- session lifecycle -------------------------------------------------

    def add(self, mels) -> int:
        """Admit an utterance; returns its session id.  Raises RuntimeError
        when at capacity and ValueError when the utterance exceeds the
        slot size."""
        if len(self._sessions) >= self.capacity:
            raise RuntimeError(
                f"server at capacity ({self.capacity} sessions); call "
                f"step() until one finishes"
            )
        pad_to = self.slot_len if self.gen.backend == "pallas" else None
        sess = self.gen.open_stream_session(
            mels, self.target, self.overlap, pad_to=pad_to, host_rows=True)
        if sess.needed_folds == 0:  # sub-hop utterance: no audio to serve
            raise ValueError("utterance too short to produce any samples")
        slot = None
        if self.gen.backend == "pallas":
            slot = self._free_slots.pop()
            self._buffer = self._write(
                self._buffer, sess.packed,
                jnp.asarray(slot * self.slot_len, jnp.int32))
            sess.packed = None  # rows now live in the shared buffer
        fin = _IncrementalUnfold(
            self.gen, sess.needed_folds, sess.stride, sess.wave_len,
            self.overlap, self.mu_law)
        sid = self._next_sid
        self._next_sid += 1
        self._sessions[sid] = _Session(sid, sess, fin, slot)
        return sid

    @property
    def active(self) -> List[int]:
        return sorted(self._sessions)

    @property
    def launches(self) -> int:
        """Decoder launches issued so far — the co-batching observable:
        with N concurrent sessions this grows ~N× slower than the sum of
        the sessions' solo chunk counts."""
        return self._launches

    def reset(self) -> None:
        """Drop every in-flight session and free all slots — crash
        recovery after a failed :meth:`step` (a mid-launch error can leave
        session progress inconsistent; the slot buffer needs no clearing
        since admissions overwrite their slot)."""
        self._sessions.clear()
        self._inflight = None
        if self.gen.backend == "pallas":
            self._free_slots = list(range(self.capacity))

    # -- scheduling --------------------------------------------------------

    def _schedule(self):
        """Pick (session, g0, g1) work items: least-progress sessions first,
        up to ``group`` folds each, ``width`` rows total.  Progress is the
        DISPATCHED fold count (not yet-finalized), so the one-launch
        lookahead never schedules a fold twice."""
        order = sorted(self._sessions.values(),
                       key=lambda s: (s.dispatched, s.sid))
        items, used = [], 0
        for s in order:
            if used >= self.width:
                break
            g0 = s.dispatched
            g1 = min(g0 + self.group, s.sess.needed_folds,
                     g0 + (self.width - used))
            if g1 > g0:
                items.append((s, g0, g1))
                used += g1 - g0
        return items, used

    def _dispatch(self):
        """Schedule and dispatch ONE multiplexed decode launch (plus the
        async device→host copy of its rows); returns (items, device rows)
        or None when no session has undispatched folds."""
        items, used = self._schedule()
        if not items:
            return None
        key = jax.random.PRNGKey(self.seed * 1000003 + self._launches)
        self._launches += 1

        if self.gen.backend == "pallas":
            n_pad = self.gen._kernel_fold_pad(used)
            starts = np.zeros(n_pad, np.int32)
            o = 0
            for s, g0, g1 in items:
                base = s.slot * self.slot_len
                starts[o: o + g1 - g0] = (
                    base + np.arange(g0, g1, dtype=np.int32) * s.sess.stride)
                o += g1 - g0
            # adaptive int8_ff: a multiplexed launch wide enough for the
            # policy pays the one-time calibration on the first live
            # session's conditioning rows (ops/decode.py FF_AUTO_MIN_KERNEL_B)
            ffs = None
            if self.gen._ff_policy(n_pad):
                b0 = items[0][0].slot * self.slot_len
                ffs = self.gen._calibrate_ff(self._buffer[b0:])
            rows = self._group_fn(
                self.gen.weights, self._buffer, jnp.asarray(starts), key,
                ffs,
                fold_T=self.fold_T, T_pad=self.T_pad,
            )
        else:
            n_pad = self.gen._pad_folds(used)
            mf = np.concatenate([s.sess.mels_f[g0:g1] for s, g0, g1 in items])
            af = np.concatenate([s.sess.aux_f[g0:g1] for s, g0, g1 in items])
            mf = np.pad(mf, ((0, n_pad - used), (0, 0), (0, 0)))
            af = np.pad(af, ((0, n_pad - used), (0, 0), (0, 0)))
            rows = self.gen._decode(
                self.gen.weights, jnp.asarray(mf), jnp.asarray(af), key)
        # rows stay DEVICE-RESIDENT: each session's finalize slices its
        # rows in place (feed_async_dev) — only finished audio transfers
        for s, _, g1 in items:
            s.dispatched = g1
        return items, rows

    def step(self) -> Dict[int, np.ndarray]:
        """Serve ONE multiplexed launch and return each served session's
        newly-final audio chunk (sessions that finished this step release
        their slot).  Empty dict when idle.

        Pipelined: the NEXT launch is dispatched before this one's rows are
        drained, and every session's finalize program is dispatched before
        any chunk is fetched — so in steady state the device decodes
        continuously while the host handles transfers.  With deterministic
        decode the served audio is identical to the unpipelined server (and
        to each session's solo stream): fold rows and feed order per
        session are unchanged; only dispatch timing moves.
        """
        if self._inflight is None:
            self._inflight = self._dispatch()
            if self._inflight is None:
                return {}
        items, rows_dev = self._inflight
        self._inflight = self._dispatch()  # queue next before draining

        chunks: Dict[int, np.ndarray] = {}
        tokens, o = [], 0
        for s, g0, g1 in items:
            tokens.append(
                (s, s.fin.feed_async_dev(rows_dev, g1 - g0, offset=o)))
            o += g1 - g0
        for s, token in tokens:
            chunk = s.fin.collect(token)
            if len(chunk):
                chunks[s.sid] = chunk
            if s.fin.done:
                if s.slot is not None:
                    self._free_slots.append(s.slot)
                del self._sessions[s.sid]
        return chunks

    def run(self, mels_list) -> List[np.ndarray]:
        """Convenience batch driver: admit every utterance (waiting for free
        slots as sessions finish), step until all complete, and return the
        concatenated waveform per utterance in input order."""
        pieces: Dict[int, List[np.ndarray]] = {}
        sids: List[int] = []
        pending = list(mels_list)
        while pending or self._sessions:
            while pending and len(self._sessions) < self.capacity:
                sid = self.add(pending.pop(0))
                sids.append(sid)
                pieces[sid] = []
            for sid, chunk in self.step().items():
                pieces[sid].append(chunk)
        return [np.concatenate(pieces[sid]) for sid in sids]


class TTSStreamServer:
    """Multi-session TWO-STAGE streaming server: concurrent text→speech
    sessions on one chip, audio chunks out as they decode.

    Composes the async Tacotron decode (``TTSGenerator.submit`` — the whole
    text→mel decode is one device-queued program) with the vocoder
    :class:`StreamServer` (concurrent sessions' fold rows co-batched into
    one decoder launch per step).  A session admitted with :meth:`add` has
    its text→mel decode dispatched immediately; :meth:`step` drains finished
    mel decodes into vocoder slots as capacity frees, then serves one
    co-batched vocoder launch, returning each session's newly-final audio.

    The reference's closest surface synthesizes one utterance at a time,
    end to end, with no streaming (ref: gen_tacotron.py:139-166).

    Notes
    -----
    * Collecting a finished TTS decode blocks on its device→host mel
      transfer (~tens of ms over a relay); the admit phase only collects
      the OLDEST pending decode and only when a vocoder slot is free, so
      the hiccup is bounded and paid once per session.
    * A text whose mel is too short to produce audio (the model stops
      immediately) completes with a single empty chunk rather than raising.
    * ``deterministic`` generators make each session's audio identical to
      the unmultiplexed two-stage path (asserted by
      tests/test_stream_server.py).
    """

    def __init__(self, pipeline, target: int, overlap: int, mu_law: bool,
                 group: int = 16, width: int = 64, capacity: int = 4,
                 slot_seconds: float = 30.0, seed: int = 0):
        from wavernn_tpu.infer.pipeline import TTSPipeline

        assert isinstance(pipeline, TTSPipeline), type(pipeline)
        self.pipeline = pipeline
        self.server = StreamServer(
            pipeline.voc, target=target, overlap=overlap, mu_law=mu_law,
            group=group, width=width, capacity=capacity,
            slot_seconds=slot_seconds, seed=seed)
        self._tts_pending: "List[tuple]" = []   # (sid, tts handle), FIFO
        self._voc_to_sid: Dict[int, int] = {}
        self._next_sid = 0
        # empty-chunk dtype follows the vocoder's serving dtype
        self._zero = np.zeros(
            0, pipeline.voc.output_np_dtype
            if pipeline.voc.packed_output else np.float64)

    def add(self, text: str) -> int:
        """Admit a text; its text→mel decode is dispatched immediately.
        Returns the session id."""
        from wavernn_tpu.text import text_to_sequence

        seq = text_to_sequence(text.strip(), self.pipeline.cleaners)
        handle = self.pipeline.tts.submit(seq, r=self.pipeline.r)
        sid = self._next_sid
        self._next_sid += 1
        self._tts_pending.append((sid, handle))
        return sid

    @property
    def active(self) -> List[int]:
        return sorted([sid for sid, _ in self._tts_pending]
                      + list(self._voc_to_sid.values()))

    @property
    def active_count(self) -> int:
        """In-flight session count — len() reads only, safe to call from
        other threads while the scheduler thread mutates the maps."""
        return len(self._tts_pending) + len(self._voc_to_sid)

    def reset(self) -> None:
        """Drop every in-flight session (pending mel decodes are abandoned;
        their device programs finish harmlessly) — crash recovery after a
        failed :meth:`step`."""
        self._tts_pending.clear()
        self._voc_to_sid.clear()
        self.server.reset()

    def step(self) -> Dict[int, np.ndarray]:
        """Admit finished mel decodes into free vocoder slots, then decode
        ONE co-batched vocoder launch.  Returns each served session's
        newly-final audio (an empty array marks a session whose mel was too
        short to produce any; an ``Exception`` value marks a session that
        failed admission — e.g. its utterance exceeds ``slot_seconds`` —
        and is terminal for that session only)."""
        out: Dict[int, np.ndarray] = {}
        while (self._tts_pending
               and len(self.server._sessions) < self.server.capacity):
            sid, handle = self._tts_pending.pop(0)
            _, m_linear, _ = self.pipeline.tts.collect(handle)
            mel = mel_from_linear(m_linear)
            if mel.shape[-1] < 2:  # sub-hop mel: nothing to vocode
                out[sid] = self._zero
                continue
            try:
                voc_sid = self.server.add(mel)
            except ValueError as e:
                # e.g. the utterance exceeds slot_seconds: fail THIS session
                # only — the exception is routed to its consumer as the
                # session's (terminal) result instead of being swallowed
                # into silent empty audio or killing the other sessions
                out[sid] = e
                continue
            self._voc_to_sid[voc_sid] = sid
        served = self.server.step()
        for voc_sid in list(self._voc_to_sid):
            sid = self._voc_to_sid[voc_sid]
            if voc_sid in served:
                out[sid] = served[voc_sid]
            if voc_sid not in self.server._sessions:  # finished: unmap,
                # and surface completion even on an empty final chunk
                del self._voc_to_sid[voc_sid]
                out.setdefault(sid, self._zero)
        return out

    def run(self, texts) -> List[np.ndarray]:
        """Convenience driver: admit every text, step until all sessions
        complete, return each text's full waveform in input order.  A
        session-level failure (e.g. an utterance exceeding ``slot_seconds``)
        raises."""
        sids = [self.add(t) for t in texts]
        pieces: Dict[int, List[np.ndarray]] = {sid: [] for sid in sids}
        while self.active:
            for sid, chunk in self.step().items():
                if isinstance(chunk, Exception):
                    raise chunk
                pieces[sid].append(chunk)
        return [np.concatenate(pieces[sid]) if pieces[sid]
                else self._zero for sid in sids]
