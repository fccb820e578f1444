"""Drive the HTTP serving daemon on the real TPU (pallas backends).

Builds the full-size two-stage pipeline (random weights, deterministic
decode), binds the real ThreadingHTTPServer on a loopback port, and issues
genuine HTTP requests: health, one /synthesize warm-up (pays both kernels'
compiles), then N concurrent /synthesize requests and one /stream, timing
the concurrent batch and asserting stream PCM == one-shot PCM for the same
text.  Exercises the one-scheduler-thread device discipline under real
HTTP handler threads and the relay.

Run on TPU:  python tools/http_serve_probe.py [n_concurrent] [tts_steps]
"""

import http.client
import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def post(port, path, text, timeout=600):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("POST", path, body=json.dumps({"text": text}).encode())
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    assert resp.status == 200, (resp.status, data[:200])
    return data


def main():
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.infer.http_server import (SynthesisService,
                                               make_http_server)
    from wavernn_tpu.infer.pipeline import TTSPipeline
    from wavernn_tpu.models.tacotron import Tacotron, TacotronConfig
    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.text.symbols import symbols

    n_conc = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    tts_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 400

    print("device:", jax.devices()[0])
    tts_cfg = TacotronConfig(num_chars=len(symbols))
    tts_vars = Tacotron(tts_cfg).init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16), jnp.int32), jnp.zeros((1, 10, tts_cfg.n_mels)),
        2, True)
    voc_cfg = WaveRNNConfig()
    voc_vars = WaveRNN(voc_cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, voc_cfg.hop_length)),
        jnp.zeros((1, 1 + 2 * voc_cfg.pad, voc_cfg.feat_dims)), True)

    pipe = TTSPipeline(tts_cfg, tts_vars, voc_cfg, voc_vars,
                       cleaner_names=["english_cleaners"], r=2,
                       backend="pallas", tts_steps=tts_steps,
                       deterministic=True,
                       output_dtype="int16")  # the serve.py default
    service = SynthesisService(pipe, group=16, capacity=max(4, n_conc))
    httpd = make_http_server(service, "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", "/health")
    print("health:", json.loads(conn.getresponse().read()))
    conn.close()

    text = "the quick brown fox jumps over the lazy dog"
    t0 = time.time()
    warm = post(port, "/synthesize", text)
    print(f"warm-up /synthesize: {len(warm) - 44} PCM bytes "
          f"({(len(warm) - 44) / 2 / voc_cfg.sample_rate:.2f} s audio) "
          f"in {time.time() - t0:.1f} s (incl. compiles)")

    results = {}

    def run(i):
        results[i] = post(port, "/synthesize", f"{text} take {i}")

    t0 = time.time()
    threads = [threading.Thread(target=run, args=(i,)) for i in range(n_conc)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.time() - t0
    total_s = sum((len(v) - 44) / 2 for v in results.values()) / voc_cfg.sample_rate
    print(f"{n_conc} concurrent /synthesize: {total_s:.2f} s audio in "
          f"{dt:.2f} s wall = {total_s / dt:.1f}x realtime aggregate")

    t0 = time.time()
    streamed = post(port, "/stream", text)
    print(f"/stream: {len(streamed) - 44} PCM bytes in {time.time() - t0:.2f} s "
          f"(same duration as one-shot: {len(streamed) == len(warm)})")
    # /synthesize now rides the fused one-shot program — a different XLA
    # program from the stream path whose f32 upsample ULPs can flip an AR
    # draw, so cross-path parity is duration-level; repeatability is exact:
    assert len(streamed) == len(warm)
    streamed2 = post(port, "/stream", text)
    assert streamed2[44:] == streamed[44:], "stream not deterministic"

    # -- /stream time-to-first-audio through the whole HTTP stack --------
    # (http.client decodes chunked transfer incrementally, so the first
    # nonempty read beyond the 44-byte WAV header marks first PCM arrival)
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    t0 = time.time()
    conn.request("POST", "/stream", body=json.dumps({"text": text}).encode())
    resp = conn.getresponse()
    got, ttfb = 0, None
    while True:
        blk = resp.read(65536)
        if not blk:
            break
        got += len(blk)
        if ttfb is None and got > 44:
            ttfb = time.time() - t0
    total = time.time() - t0
    conn.close()
    secs = (got - 44) / 2 / voc_cfg.sample_rate
    print(f"/stream TTFB (first PCM through HTTP): {ttfb * 1e3:.0f} ms; "
          f"{secs:.2f} s audio in {total:.2f} s ({secs / total:.1f}x RT)")

    httpd.shutdown()
    httpd.server_close()
    service.close()
    print("OK")


if __name__ == "__main__":
    main()
