"""HTTP serving front-end (infer/http_server.py).

Spins the real ThreadingHTTPServer on a loopback port over the tiny
two-stage pipeline and drives it with stdlib http.client: health probe,
one-shot /synthesize WAV, chunked /stream parity with the one-shot body,
concurrent requests, and the error paths.  Scan backend (CPU tier); the
co-batched vocoder economics under the kernel are covered by the TPU-tier
stream-server probes.
"""

import http.client
import json
import struct
import threading

import numpy as np
import pytest

from tests.test_stream_server import TARGET, OVERLAP, _tiny_pipeline


@pytest.fixture(scope="module")
def server():
    from wavernn_tpu.infer.http_server import (SynthesisService,
                                               make_http_server)

    service = SynthesisService(
        _tiny_pipeline(), target=TARGET, overlap=OVERLAP, mu_law=True,
        group=2, width=8, capacity=2, chunk_timeout=120.0)
    httpd = make_http_server(service, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address[1], service
    httpd.shutdown()
    httpd.server_close()
    service.close()


def _post(port, path, body, timeout=120):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("POST", path, body=json.dumps(body).encode(),
                 headers={"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    status, ctype = resp.status, resp.getheader("Content-Type")
    conn.close()
    return status, ctype, data


def _parse_wav(data):
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    assert data[12:16] == b"fmt "
    _, fmt, ch, sr, _, _, bits = struct.unpack("<IHHIIHH", data[16:36])
    assert (fmt, ch, bits) == (1, 1, 16)
    assert data[36:40] == b"data"
    return sr, np.frombuffer(data[44:], "<i2")


def test_health(server):
    port, service = server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/health")
    resp = conn.getresponse()
    payload = json.loads(resp.read())
    conn.close()
    assert resp.status == 200
    assert payload["ok"] is True
    assert payload["sample_rate"] == service.sample_rate
    assert payload["served_sessions"] == service.served_sessions
    assert payload["served_audio_seconds"] == round(
        service.served_samples / service.sample_rate, 2)


def test_synthesize_returns_wav(server):
    port, service = server
    status, ctype, data = _post(port, "/synthesize", {"text": "hello world"})
    assert status == 200 and ctype == "audio/wav"
    sr, pcm = _parse_wav(data)
    assert sr == service.sample_rate
    # declared data size must match the actual payload (not the streaming
    # 0xFFFFFFFF variant)
    assert struct.unpack("<I", data[40:44])[0] == 2 * len(pcm)
    assert len(pcm) > 0 and np.abs(pcm.astype(np.int32)).max() > 0


def test_synthesize_matches_direct_pipeline(server):
    """/synthesize rides the one-shot fast path (one fused vocoder program
    per request): its PCM must equal the direct TTSPipeline one-shot
    computed outside the service (deterministic decode)."""
    from wavernn_tpu.infer.http_server import pcm16
    from wavernn_tpu.text import text_to_sequence

    port, _ = server
    _, _, got = _post(port, "/synthesize", {"text": "ok then"})

    pipe = _tiny_pipeline()
    seq = text_to_sequence("ok then", ["english_cleaners"])
    _, m_linear, _ = pipe.tts(seq, r=pipe.r)
    mel = np.clip((m_linear + 4) / 8, 0, 1)
    want = pipe.voc(mel, batched=True, target=TARGET, overlap=OVERLAP,
                    mu_law=True)
    assert got[44:] == pcm16(want).tobytes()


def test_stream_is_chunked_and_deterministic(server):
    """/stream carries the unknown-length WAV header, produces audio of the
    same duration as /synthesize for the same text, and repeats
    byte-identically (deterministic pipeline).  NB: stream and one-shot are
    different XLA programs whose f32 upsample rounding differs by ULPs, and
    an AR sampler can cascade a single flipped draw — so cross-path parity
    is duration-level, not byte-level (the stream path's byte-level oracle
    is tests/test_stream_server.py)."""
    port, _ = server
    _, _, want = _post(port, "/synthesize", {"text": "ok then"})
    status, ctype, got = _post(port, "/stream", {"text": "ok then"})
    assert status == 200 and ctype == "audio/wav"
    assert struct.unpack("<I", got[40:44])[0] == 0xFFFFFFFF
    assert len(got[44:]) == len(want[44:]) > 0
    _, _, again = _post(port, "/stream", {"text": "ok then"})
    assert again[44:] == got[44:]


def test_mixed_stream_and_oneshot_sessions(server):
    """A streaming session and a one-shot session in flight together both
    complete with their solo bytes."""
    port, _ = server
    results = {}

    def run(path, key):
        results[key] = _post(port, path, {"text": "hello world"})

    threads = [threading.Thread(target=run, args=("/stream", "s")),
               threading.Thread(target=run, args=("/synthesize", "o"))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    _, _, solo_stream = _post(port, "/stream", {"text": "hello world"})
    _, _, solo_one = _post(port, "/synthesize", {"text": "hello world"})
    assert results["s"][2][44:] == solo_stream[44:]
    assert results["o"][2][44:] == solo_one[44:]


def test_concurrent_requests_share_the_service(server):
    port, service = server
    texts = ["hello world", "hi there", "ok then", "more text here"]
    results = {}

    def run(i):
        results[i] = _post(port, "/synthesize", {"text": texts[i]})

    threads = [threading.Thread(target=run, args=(i,))
               for i in range(len(texts))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # co-batched concurrent serving must hand every request the same bytes
    # a solo request gets (deterministic pipeline).  NB: with an untrained
    # model the audio content barely depends on the text, so cross-text
    # difference is not assertable here — solo-parity is the real contract
    # (and the per-session routing is exercised because all four sessions
    # are in flight together).
    for i in range(len(texts)):
        status, _, data = results[i]
        assert status == 200
        _, pcm = _parse_wav(data)
        assert len(pcm) > 0 and np.abs(pcm.astype(np.int32)).max() > 0
        _, _, solo = _post(port, "/synthesize", {"text": texts[i]})
        assert data[44:] == solo[44:], texts[i]
    assert service.active == 0


def test_error_paths(server):
    port, _ = server
    status, _, data = _post(port, "/synthesize", {"no_text": 1})
    assert status == 400 and b"text" in data
    status, _, _ = _post(port, "/synthesize", {"text": "   "})
    assert status == 400
    status, _, _ = _post(port, "/nonsense", {"text": "x"})
    assert status == 404
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/nonsense")
    assert conn.getresponse().status == 404
    conn.close()


def test_service_close_drains_in_flight_sessions():
    """close() stops admissions but lets in-flight sessions finish: the
    consumer still receives the full utterance, byte-for-byte what an
    undisturbed session gets, and submit() afterwards raises."""
    from wavernn_tpu.infer.http_server import SynthesisService

    svc = SynthesisService(_tiny_pipeline(), target=TARGET, overlap=OVERLAP,
                           mu_law=True, group=2, width=8, capacity=2,
                           chunk_timeout=120.0)
    want = np.concatenate(list(svc.submit("hello world")))

    it = svc.submit("hello world")
    closer = threading.Thread(target=svc.close)
    closer.start()
    got = np.concatenate(list(it))
    closer.join()
    np.testing.assert_array_equal(got, want)
    with pytest.raises(RuntimeError):
        svc.submit("more")


def test_service_survives_scheduler_step_failure():
    """An exception escaping the co-batched decode (device error, XLA OOM)
    must not kill the scheduler thread: the in-flight session's consumer
    receives the error, and the service keeps serving subsequent requests.
    Regression: the step() call used to be unguarded, so one failure
    bricked the daemon (every later submit hung until chunk_timeout)."""
    from wavernn_tpu.infer.http_server import SynthesisService

    svc = SynthesisService(_tiny_pipeline(), target=TARGET, overlap=OVERLAP,
                           mu_law=True, group=2, width=8, capacity=2,
                           chunk_timeout=120.0)
    try:
        want = np.concatenate(list(svc.submit("hello world")))

        real_step = svc.server.step

        def bad_step():
            raise RuntimeError("injected device failure")

        # the scheduler is idle (blocked on its request queue), so the
        # patch is in place before the next session's first step
        svc.server.step = bad_step
        it = svc.submit("hello world")
        with pytest.raises(RuntimeError, match="injected device failure"):
            list(it)

        svc.server.step = real_step
        got = np.concatenate(list(svc.submit("hello world")))
        np.testing.assert_array_equal(got, want)
    finally:
        svc.close()


def test_service_oneshot_with_mesh_matches_without():
    """Multi-chip serving from the daemon: a service over a mesh-sharded
    pipeline (vocoder folds over the 'data' axis, as serve.py --mesh wires
    it) produces the same one-shot audio as the unmeshed service."""
    from wavernn_tpu.infer.http_server import SynthesisService
    from wavernn_tpu.parallel.mesh import make_mesh

    def run(**kw):
        svc = SynthesisService(_tiny_pipeline(**kw), target=TARGET,
                               overlap=OVERLAP, mu_law=True, group=2,
                               width=8, capacity=2, chunk_timeout=120.0)
        wav = np.concatenate(list(svc.submit("hello world", stream=False)))
        svc.close()
        return wav

    want = run()
    got = run(mesh=make_mesh())  # 8 virtual devices (conftest)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_int16_service_stream_matches_oneshot_bytes():
    """An int16 pipeline serves DEVICE-quantized PCM end to end: /stream's
    chunked payload must byte-match /synthesize's one-shot payload under
    deterministic decode (the chunked path's device fade/quantization is
    the same math as the fused one-shot program, to 1 LSB)."""
    import numpy as np

    from wavernn_tpu.infer.http_server import (SynthesisService,
                                               make_http_server)

    service = SynthesisService(
        _tiny_pipeline(output_dtype="int16"), target=TARGET,
        overlap=OVERLAP, mu_law=True, group=2, width=8, capacity=2,
        chunk_timeout=120.0)
    httpd = make_http_server(service, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        body = {"text": "hello world"}
        code, _, oneshot = _post(port, "/synthesize", body)
        assert code == 200
        code, _, streamed = _post(port, "/stream", body)
        assert code == 200
        a = np.frombuffer(oneshot[44:], "<i2")
        b = np.frombuffer(streamed[44:], "<i2")
        assert a.shape == b.shape and len(a) > 1000
        np.testing.assert_allclose(a.astype(np.int32), b.astype(np.int32),
                                   atol=1)
        # vast majority exact (only fp-order rounding ties may differ)
        assert (a == b).mean() > 0.99
    finally:
        httpd.shutdown()
        httpd.server_close()
        service.close()
