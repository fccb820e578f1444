"""HTTP serving front-end: text in, audio out, over plain HTTP/1.1.

A network serving surface the reference never had (its closest analog is
the one-shot ``gen_tacotron.py`` CLI, ref: gen_tacotron.py:139-166).  Built
on :class:`~wavernn_tpu.infer.stream_server.TTSStreamServer`, so concurrent
requests are CO-BATCHED: every in-flight session's vocoder fold rows share
one decode launch per scheduling step, and each response streams out as its
audio becomes final.

Endpoints
---------
* ``GET  /health``      → JSON ``{"ok": true, "active": N, ...}``
* ``POST /synthesize``  → body ``{"text": "..."}`` → complete ``audio/wav``
* ``POST /stream``      → same body → chunked ``audio/wav`` whose PCM
  arrives incrementally while the utterance is still decoding (the WAV
  header carries the 0xFFFFFFFF unknown-length sizes streaming players
  expect)

Threading model: JAX device work is single-queue, so ALL model calls run on
ONE scheduler thread (:class:`SynthesisService._loop`); HTTP handler
threads only enqueue texts and drain per-session chunk queues.  stdlib
only — no web framework dependency.
"""

from __future__ import annotations

import json
import queue
import struct
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Iterator, Optional

import numpy as np

_STOP = object()
_VOC_HANDLE = object()  # tags a dispatched one-shot's (sentinel, handle)
_UNKNOWN = 0xFFFFFFFF


def pcm16(x: np.ndarray) -> np.ndarray:
    """float waveform → little-endian int16 PCM, quantized exactly as
    dsp/wavio.save_wav and the device int16 path do (scale then clip, so
    -32768 stays reachable).  Already-int16 input (a device-quantized
    chunk) passes through untouched.  uint8 input is the mulaw8 wire
    format (Generator output_dtype='mulaw8'): expanded to float via the
    dsp.audio mu-law convention on the host — the bandwidth-limited
    device→host hop shipped one byte per sample; this expansion is a
    local table-speed op."""
    x = np.asarray(x)
    if x.dtype == np.int16:
        return x.astype("<i2", copy=False)
    if x.dtype == np.uint8:
        from wavernn_tpu.dsp.audio import decode_mu_law

        x = decode_mu_law(x.astype(np.float64), 256, from_labels=True)
    return np.round(np.clip(x.astype(np.float64) * 32767.0,
                            -32768.0, 32767.0)).astype("<i2")


def wav_header(sample_rate: int, n_bytes: Optional[int] = None) -> bytes:
    """44-byte mono 16-bit RIFF/WAVE header (same layout dsp/wavio.py
    writes).  ``n_bytes=None`` emits the 0xFFFFFFFF unknown-size variant
    used for live streams, where the payload length isn't known yet."""
    data = _UNKNOWN if n_bytes is None else n_bytes
    riff = _UNKNOWN if n_bytes is None else 36 + n_bytes
    return b"".join([
        b"RIFF", struct.pack("<I", riff), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                             sample_rate * 2, 2, 16),
        b"data", struct.pack("<I", data),
    ])


class SynthesisService:
    """Thread-safe text→audio sessions over a single-device scheduler.

    ``submit(text)`` may be called from any thread; it returns an iterator
    of float64 audio chunks.  One daemon thread owns every model/device
    *dispatch*: it admits queued texts and routes each session's chunks to
    its consumer queue.

    Two session kinds, two decode paths:

    * ``stream=True``: incremental chunks through the underlying
      :class:`TTSStreamServer` — concurrent streams' fold rows co-batch
      into one decode launch per scheduling step, audio arrives while the
      utterance decodes.
    * ``stream=False`` (the one-shot fast path): the whole mel→wave decode
      is ONE fused device program (``Generator.submit`` + ``prefetch``) —
      no per-group launch round trips, so a non-streaming request costs a
      single dispatch.  The scheduler only dispatches; the consumer's own
      thread blocks on the ready-result transfer (``collect``), which
      needs no device dispatch and is thread-safe.
    """

    def __init__(self, pipeline, target: int = 11_000, overlap: int = 550,
                 mu_law: bool = True, group: int = 16, width: int = 64,
                 capacity: int = 4, slot_seconds: float = 30.0,
                 seed: int = 0, chunk_timeout: float = 600.0):
        from wavernn_tpu.infer.stream_server import TTSStreamServer

        self.sample_rate = pipeline.voc.cfg.sample_rate
        self.target, self.overlap, self.mu_law = target, overlap, mu_law
        self.server = TTSStreamServer(
            pipeline, target=target, overlap=overlap, mu_law=mu_law,
            group=group, width=width, capacity=capacity,
            slot_seconds=slot_seconds, seed=seed)
        self.chunk_timeout = chunk_timeout
        self._requests: "queue.Queue" = queue.Queue()
        self._queues: Dict[int, "queue.Queue"] = {}
        self._oneshots: list = []   # (tts handle, consumer queue), FIFO
        self._seed = seed
        self.served_sessions = 0      # completed sessions (both kinds)
        self.served_samples = 0       # audio samples handed to consumers
        self._stopped = False
        self._thread = threading.Thread(
            target=self._loop, name="synthesis-scheduler", daemon=True)
        self._thread.start()

    # -- client side ------------------------------------------------------

    def submit(self, text: str, stream: bool = True) -> Iterator[np.ndarray]:
        """Enqueue a text; returns an iterator yielding audio chunks until
        the utterance completes (a one-shot session yields exactly one).
        Raises the scheduler-side exception (e.g. an unknown-symbol text)
        from the iterator."""
        if self._stopped:
            raise RuntimeError("service is closed")
        out: "queue.Queue" = queue.Queue()
        self._requests.put((text, out, stream))
        return self._drain(out)

    def _drain(self, out: "queue.Queue") -> Iterator[np.ndarray]:
        while True:
            try:
                item = out.get(timeout=self.chunk_timeout)
            except queue.Empty:
                raise RuntimeError(
                    f"no audio chunk within {self.chunk_timeout:.0f}s — "
                    "scheduler stalled or session lost") from None
            if item is None:
                return
            if isinstance(item, Exception):
                raise item
            if isinstance(item, tuple) and item[0] is _VOC_HANDLE:
                # one-shot fast path: the scheduler dispatched the fused
                # decode + async host copy; block HERE (consumer thread) on
                # the transfer so the scheduler never waits on our result.
                # The blocking fetch runs under a watchdog: a device failure
                # that bricked this program must not hang the handler thread
                # forever after the scheduler has already recovered.
                yield self._collect_oneshot(item[1])
                continue
            yield item

    def _collect_oneshot(self, handle) -> np.ndarray:
        """Resolve a one-shot vocoder handle with a bounded wait: the
        device→host transfer itself cannot be interrupted, so it runs on a
        daemon thread and this caller gives up after ``chunk_timeout``."""
        result: dict = {}

        def fetch():
            try:
                result["wav"] = self.server.pipeline.voc.collect(handle)
            except Exception as e:  # noqa: BLE001 — routed to the consumer
                result["err"] = e

        t = threading.Thread(target=fetch, daemon=True,
                             name="oneshot-collect")
        t.start()
        t.join(self.chunk_timeout)
        if t.is_alive():
            raise RuntimeError(
                f"one-shot result transfer stalled >{self.chunk_timeout:.0f}s"
                " — device failure while the program was in flight?")
        if "err" in result:
            raise result["err"]
        return result["wav"]

    @property
    def active(self) -> int:
        # Called from HTTP handler threads while the scheduler mutates the
        # session maps: active_count is len() reads only (atomic under the
        # GIL) — never iterate the scheduler's dicts from here.
        return (self.server.active_count
                + len(self._oneshots) + self._requests.qsize())

    def close(self):
        """Stop accepting new texts and wait for in-flight sessions to
        finish serving (consumers are never left hanging: a session that
        cannot complete gets a service-closed error instead)."""
        if not self._stopped:
            self._stopped = True
            self._requests.put(_STOP)
            self._thread.join()

    # -- scheduler thread --------------------------------------------------

    def _admit(self, item) -> bool:
        """Admit one queued request; returns False on the stop sentinel."""
        if item is _STOP:
            return False
        text, out, stream = item
        try:
            if stream:
                sid = self.server.add(text)
                self._queues[sid] = out
            else:
                # one-shot: dispatch the text→mel decode now; promotion to
                # the fused vocoder program happens in the loop
                from wavernn_tpu.text import text_to_sequence

                pipe = self.server.pipeline
                seq = text_to_sequence(text.strip(), pipe.cleaners)
                self._oneshots.append((pipe.tts.submit(seq, r=pipe.r), out))
        except Exception as e:  # bad text: fail that session only
            out.put(e)
        return True

    def _promote_oneshot(self):
        """Finish the oldest one-shot's mel decode and dispatch its fused
        vocoder program + async result copy.  The blocking mel transfer is
        bounded and paid once per session (same policy as the stream
        server's admit phase)."""
        handle, out = self._oneshots.pop(0)
        pipe = self.server.pipeline
        try:
            from wavernn_tpu.infer.pipeline import mel_from_linear

            _, m_linear, _ = pipe.tts.collect(handle)
            mel = mel_from_linear(m_linear)
            if mel.shape[-1] < 2:  # sub-hop mel: no audio to decode
                self.served_sessions += 1
                out.put(None)
                return
            self._seed += 1
            vh = pipe.voc.submit(mel, True, self.target, self.overlap,
                                 self.mu_law, seed=self._seed)
            pipe.voc.prefetch(vh)
            self.served_sessions += 1
            self.served_samples += (mel.shape[-1] - 1) * pipe.voc.cfg.hop_length
            out.put((_VOC_HANDLE, vh))
            out.put(None)
        except Exception as e:
            out.put(e)

    def _loop(self):
        running = True
        while running or self.server.active or self._oneshots:
            # Block only when idle; otherwise drain admissions non-blocking
            # so waiting sessions keep decoding.
            if running and not self.server.active and not self._oneshots:
                items = [self._requests.get()]
            else:
                items = []
            while True:
                try:
                    items.append(self._requests.get_nowait())
                except queue.Empty:
                    break
            for item in items:
                if not self._admit(item):
                    running = False
            if self._oneshots:
                self._promote_oneshot()
            if not self.server.active:
                continue
            try:
                served = self.server.step()
            except Exception as e:  # noqa: BLE001 — a dead scheduler
                # thread would brick the daemon: fail every in-flight
                # session, reset the server's session state, keep serving
                for q in self._queues.values():
                    q.put(e)
                self._queues.clear()
                self.server.reset()
                continue
            for sid, chunk in served.items():
                q = self._queues.get(sid)
                if q is None:
                    continue
                if isinstance(chunk, Exception):
                    # terminal per-session failure (e.g. utterance exceeds
                    # the server's slot_seconds): raised by the consumer
                    self.served_sessions += 1
                    self._queues.pop(sid).put(chunk)
                elif len(chunk):
                    self.served_samples += len(chunk)
                    q.put(np.asarray(chunk))
            for sid in set(self._queues) - set(self.server.active):
                self.served_sessions += 1
                self._queues.pop(sid).put(None)
        # closed with sessions still queued/in flight: unblock consumers
        for q in self._queues.values():
            q.put(RuntimeError("service closed mid-session"))
        while True:
            try:
                item = self._requests.get_nowait()
            except queue.Empty:
                break
            if item is not _STOP:
                item[1].put(RuntimeError("service is closed"))


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    service: SynthesisService = None  # set by make_http_server
    quiet = True

    def log_message(self, fmt, *args):  # noqa: D102
        if not self.quiet:
            super().log_message(fmt, *args)

    # -- helpers ----------------------------------------------------------

    def _json(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        try:
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        except (BrokenPipeError, ConnectionResetError):
            self.close_connection = True  # client left; nothing to answer

    def _read_text(self) -> Optional[str]:
        try:
            n = int(self.headers.get("Content-Length", "0"))
            req = json.loads(self.rfile.read(n) or b"{}")
            text = req.get("text", "")
        except (ValueError, json.JSONDecodeError):
            text = ""
        if not isinstance(text, str) or not text.strip():
            self._json(400, {"error": "body must be JSON with a non-empty "
                                      "'text' field"})
            return None
        return text

    def _chunk(self, data: bytes):
        self.wfile.write(b"%x\r\n" % len(data) + data + b"\r\n")

    # -- endpoints ---------------------------------------------------------

    def do_GET(self):
        if self.path == "/health":
            svc = self.service
            self._json(200, {
                "ok": True, "active": svc.active,
                "sample_rate": svc.sample_rate,
                "launches": svc.server.server.launches,
                "served_sessions": svc.served_sessions,
                "served_audio_seconds": round(
                    svc.served_samples / svc.sample_rate, 2),
            })
        else:
            self._json(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        if self.path not in ("/synthesize", "/stream"):
            self._json(404, {"error": f"unknown path {self.path}"})
            return
        text = self._read_text()
        if text is None:
            return
        try:
            session = self.service.submit(text,
                                          stream=self.path == "/stream")
            if self.path == "/synthesize":
                chunks = [pcm16(c) for c in session]
                pcm = (np.concatenate(chunks) if chunks
                       else np.zeros(0, "<i2")).tobytes()
                try:
                    self.send_response(200)
                    self.send_header("Content-Type", "audio/wav")
                    self.send_header(
                        "Content-Length", str(44 + len(pcm)))
                    self.end_headers()
                    self.wfile.write(wav_header(self.service.sample_rate,
                                                len(pcm)) + pcm)
                except (BrokenPipeError, ConnectionResetError):
                    self.close_connection = True
            else:
                # pull the first chunk BEFORE committing to a 200, so a
                # failed session still gets a clean JSON error
                it = iter(session)
                try:
                    first = next(it)
                except StopIteration:
                    first = None
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()
                self._chunk(wav_header(self.service.sample_rate, None))
                try:
                    if first is not None:
                        self._chunk(pcm16(first).tobytes())
                        for c in it:
                            self._chunk(pcm16(c).tobytes())
                    self.wfile.write(b"0\r\n\r\n")
                except (BrokenPipeError, ConnectionResetError):
                    for _ in it:  # client left: drain, free the slot
                        pass
                except Exception:
                    # mid-stream failure after the 200: terminate the
                    # chunked body and drop the connection
                    self.close_connection = True
                    try:
                        self.wfile.write(b"0\r\n\r\n")
                    except OSError:
                        pass
        except Exception as e:  # noqa: BLE001 — surface as a 500, not a hang
            try:
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
            except (BrokenPipeError, ConnectionResetError):
                pass


def make_http_server(service: SynthesisService, host: str = "127.0.0.1",
                     port: int = 8000, quiet: bool = True) -> ThreadingHTTPServer:
    """Bind a ThreadingHTTPServer serving ``service``.  Call
    ``serve_forever()`` on the result (and ``service.close()`` after
    ``shutdown()``)."""
    handler = type("Handler", (_Handler,),
                   {"service": service, "quiet": quiet})
    return ThreadingHTTPServer((host, port), handler)
