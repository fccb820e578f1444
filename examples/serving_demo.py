"""Serving-mode walkthrough: the three ways to synthesize many utterances.

Beyond the reference's one-at-a-time ``generate`` (ref: gen_tacotron.py,
models/fatchord_version.py:169), this framework serves requests three ways:

  1. ``TTSPipeline(texts)``        — batch both stages (max throughput),
  2. ``pipe.stream_synthesize``    — pipelined two-stage streaming: each
     waveform yields as soon as it's ready while later utterances are
     still decoding on the device,
  3. ``tts.submit``/``voc.submit`` — raw async handles for custom serving
     loops (dispatches queue in order; the host overlaps transfers).

Runs in ~2 minutes on CPU with untrained tiny models — the point is the
API surface and the equality of the three paths, not audio quality.

Usage: python examples/serving_demo.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

# tiny-model CPU demo; this environment's sitecustomize pre-selects the
# TPU platform, so pin CPU before any backend initialization
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from wavernn_tpu.infer.pipeline import TTSPipeline
from wavernn_tpu.models.tacotron import Tacotron, TacotronConfig
from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
from wavernn_tpu.text import text_to_sequence
from wavernn_tpu.text.symbols import symbols


def tiny_models():
    tts_cfg = TacotronConfig(
        embed_dims=16, num_chars=len(symbols), encoder_dims=16,
        decoder_dims=32, n_mels=80, fft_bins=80, postnet_dims=16,
        encoder_K=3, lstm_dims=32, postnet_K=3, num_highways=2,
    )
    tts = Tacotron(tts_cfg)
    tts_vars = tts.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 8), jnp.int32), jnp.zeros((1, 10, 80)), 5, True,
    )
    voc_cfg = WaveRNNConfig(
        rnn_dims=32, fc_dims=32, bits=9, pad=2, upsample_factors=(5, 5, 11),
        feat_dims=80, compute_dims=16, res_out_dims=16, res_blocks=1,
        mode="RAW",
    )
    voc = WaveRNN(voc_cfg)
    voc_vars = voc.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 275)), jnp.zeros((1, 5, 80)), True
    )
    return tts_cfg, tts_vars, voc_cfg, voc_vars


def main():
    tts_cfg, tts_vars, voc_cfg, voc_vars = tiny_models()
    pipe = TTSPipeline(tts_cfg, tts_vars, voc_cfg, voc_vars,
                       cleaner_names=["english_cleaners"], r=5,
                       backend="scan", tts_steps=20)
    texts = ["hello world", "three serving modes", "all equal"]
    kw = dict(target=2750, overlap=550)

    # 1. batch: both stages batched across utterances
    t0 = time.time()
    batched = pipe(texts, **kw)
    print(f"batch:   {len(batched)} wavs in {time.time() - t0:.1f}s "
          f"(includes compile)")

    # 2. streaming: audio yields per utterance while later ones decode
    t0 = time.time()
    first = None
    streamed = []
    for w in pipe.stream_synthesize(texts, **kw):
        first = first or time.time() - t0
        streamed.append(w)
    print(f"stream:  first audio after {first:.1f}s, "
          f"all {len(streamed)} in {time.time() - t0:.1f}s")

    # 3. raw async handles: custom serving loop over both stages
    t0 = time.time()
    seqs = [text_to_sequence(t, ["english_cleaners"]) for t in texts]
    tts_handles = [pipe.tts.submit(s, r=5) for s in seqs]
    voc_handles, mels = [], []
    for i, h in enumerate(tts_handles):
        _, linear, _ = pipe.tts.collect(h)
        mel = np.clip((linear + 4) / 8, 0, 1)
        mels.append(mel)
        voc_handles.append(pipe.voc.submit(mel, True, 2750, 550, True, i))
    manual = [pipe.voc.collect(h) for h in voc_handles]
    print(f"handles: {len(manual)} wavs in {time.time() - t0:.1f}s")

    # streaming and the manual loop use the same per-utterance seeds:
    # outputs are bit-identical; the batch path shares one seed per batch
    for a, b in zip(streamed, manual):
        np.testing.assert_array_equal(a, b)
    assert all(np.isfinite(w).all() and w.ndim == 1 for w in batched)
    print("OK: stream == manual handles; all waveforms finite")

    # 4. multi-session streaming server: concurrent utterances co-batched
    #    into shared decoder launches; with deterministic decode each
    #    session's audio equals its own solo Generator.stream exactly
    from wavernn_tpu.infer.stream_server import StreamServer
    from wavernn_tpu.ops.decode import Generator

    det = Generator(voc_cfg, voc_vars, backend="scan", deterministic=True)
    t0 = time.time()
    srv = StreamServer(det, target=2750, overlap=550, mu_law=True,
                       group=2, width=8, capacity=4)
    served = srv.run(mels)
    solo = [np.concatenate(list(det.stream(
        m, target=2750, overlap=550, mu_law=True, group=2))) for m in mels]
    for a, b in zip(served, solo):
        np.testing.assert_allclose(a, b, atol=1e-6)
    print(f"server:  {len(served)} concurrent sessions in "
          f"{srv.launches} co-batched launches, {time.time() - t0:.1f}s; "
          f"per-session audio == solo stream")

    # 5. the HTTP daemon over the same pipeline: /synthesize rides the
    #    fused one-shot fast path, /stream the co-batched scheduler
    import http.client
    import json
    import threading

    from wavernn_tpu.infer.http_server import (SynthesisService,
                                               make_http_server)

    service = SynthesisService(pipe, target=2750, overlap=550, mu_law=True,
                               group=2, width=8, capacity=4)
    httpd = make_http_server(service, "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    t0 = time.time()
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
    conn.request("POST", "/synthesize",
                 body=json.dumps({"text": texts[0]}).encode())
    wav_bytes = conn.getresponse().read()
    conn.request("GET", "/health")
    health = json.loads(conn.getresponse().read())
    conn.close()
    assert wav_bytes[:4] == b"RIFF" and len(wav_bytes) > 44
    assert health["served_sessions"] == 1
    print(f"http:    POST /synthesize -> {len(wav_bytes)} WAV bytes in "
          f"{time.time() - t0:.1f}s; health: {health}")
    httpd.shutdown()
    httpd.server_close()
    service.close()


if __name__ == "__main__":
    main()
