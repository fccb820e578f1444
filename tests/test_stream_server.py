"""Multi-session streaming server (infer/stream_server.py).

The server co-batches fold rows from MANY concurrent utterances into one
decoder launch; with deterministic decode its per-session output must be
sample-for-sample identical to each session's own Generator.stream (same
conditioning rows, same incremental crossfade).  Scan backend here; the
pallas slot-buffer path runs in the TPU tier (tools/stream_server_probe.py
via tests/test_stream_tpu.py).
"""

import numpy as np
import pytest

from tests.test_wavernn import init_model, tiny_cfg

TARGET, OVERLAP = 2750, 550


def _make(deterministic=True):
    from wavernn_tpu.ops.decode import Generator

    cfg = tiny_cfg("RAW")
    model, variables, _, _ = init_model(cfg)
    gen = Generator(cfg, variables, backend="scan", frame_bucket=16,
                    fold_bucket=4, deterministic=deterministic)
    return cfg, gen


def _mel(cfg, frames, seed):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, (cfg.feat_dims, frames)).astype(np.float32)


def test_server_matches_individual_streams():
    """3 concurrent sessions of different lengths == each utterance's own
    stream, and scheduling interleaves them into shared launches."""
    from wavernn_tpu.infer.stream_server import StreamServer

    cfg, gen = _make()
    mels = [_mel(cfg, f, i) for i, f in enumerate([120, 80, 150])]

    solo = [np.concatenate(list(gen.stream(
        m, target=TARGET, overlap=OVERLAP, mu_law=True, group=2)))
        for m in mels]

    srv = StreamServer(gen, target=TARGET, overlap=OVERLAP, mu_law=True,
                       group=2, width=8, capacity=4)
    served = srv.run(mels)

    assert srv.launches < sum(-(-len(s) // (TARGET + OVERLAP) // 2) + 1
                               for s in solo) + 3  # co-batched, not serial
    for got, want in zip(served, solo):
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_server_staggered_add_and_capacity():
    """Sessions admitted mid-serving still match their solo stream; at
    capacity add() refuses until a slot frees; run() drains a backlog
    through limited capacity."""
    from wavernn_tpu.infer.stream_server import StreamServer

    cfg, gen = _make()
    m1, m2 = _mel(cfg, 120, 10), _mel(cfg, 100, 11)
    solo1 = np.concatenate(list(gen.stream(
        m1, target=TARGET, overlap=OVERLAP, mu_law=True, group=2)))
    solo2 = np.concatenate(list(gen.stream(
        m2, target=TARGET, overlap=OVERLAP, mu_law=True, group=2)))

    srv = StreamServer(gen, target=TARGET, overlap=OVERLAP, mu_law=True,
                       group=2, width=8, capacity=1)
    sid1 = srv.add(m1)
    with pytest.raises(RuntimeError):
        srv.add(m2)  # capacity 1
    got = {sid1: []}
    # serve session 1 partway, then free it and admit session 2
    while sid1 in srv._sessions:
        for sid, ch in srv.step().items():
            got.setdefault(sid, []).append(ch)
    sid2 = srv.add(m2)
    got[sid2] = []
    while srv.active:
        for sid, ch in srv.step().items():
            got[sid].append(ch)
    np.testing.assert_allclose(np.concatenate(got[sid1]), solo1, atol=1e-5)
    np.testing.assert_allclose(np.concatenate(got[sid2]), solo2, atol=1e-5)


def test_server_least_progress_scheduling():
    """A late-joining session is served ahead of an almost-done one."""
    from wavernn_tpu.infer.stream_server import StreamServer

    cfg, gen = _make()
    srv = StreamServer(gen, target=TARGET, overlap=OVERLAP, mu_law=True,
                       group=2, width=2, capacity=2)
    srv.add(_mel(cfg, 150, 0))
    srv.step()  # session 0 progresses
    srv.add(_mel(cfg, 150, 1))
    items, _ = srv._schedule()
    assert items[0][0].sid == 1  # the fresh session goes first


def _tiny_pipeline(**pipeline_kw):
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.infer.pipeline import TTSPipeline
    from wavernn_tpu.models.tacotron import Tacotron, TacotronConfig
    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.text.symbols import symbols

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
    return TTSPipeline(tts_cfg, tts_vars, voc_cfg, voc_vars,
                       cleaner_names=["english_cleaners"], r=5,
                       backend="scan", tts_steps=20, deterministic=True,
                       **pipeline_kw)


def test_tts_stream_server_matches_unmultiplexed_two_stage():
    """Concurrent text→speech sessions: each session's chunk-concatenated
    audio equals the unmultiplexed two-stage path (tts → mel →
    Generator.stream) with deterministic decode, and the vocoder launches
    are co-batched across sessions."""
    from wavernn_tpu.infer.stream_server import TTSStreamServer
    from wavernn_tpu.text import text_to_sequence

    pipe = _tiny_pipeline()
    texts = ["hello world", "hi there", "ok then"]

    solo = []
    for t in texts:
        seq = text_to_sequence(t.strip(), ["english_cleaners"])
        _, m_linear, _ = pipe.tts(seq, r=5)
        mel = np.clip((m_linear + 4) / 8, 0, 1)
        solo.append(np.concatenate(list(pipe.voc.stream(
            mel, target=TARGET, overlap=OVERLAP, mu_law=True, group=2))))

    srv = TTSStreamServer(pipe, target=TARGET, overlap=OVERLAP, mu_law=True,
                          group=2, width=8, capacity=2)
    served = srv.run(texts)

    assert srv.server.launches > 0
    for got, want in zip(served, solo):
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5)
    assert not srv.active


def test_tts_server_surfaces_admission_failure_per_session(monkeypatch):
    """A vocoder-admission failure (e.g. an utterance exceeding the pallas
    slot size) must be routed to THAT session as a terminal Exception value
    — not swallowed into silent empty audio, and not fatal to concurrent
    sessions.  Regression: a bare `except ValueError` used to complete such
    sessions with a 0-sample waveform."""
    from wavernn_tpu.infer.stream_server import TTSStreamServer

    pipe = _tiny_pipeline()
    srv = TTSStreamServer(pipe, target=TARGET, overlap=OVERLAP, mu_law=True,
                          group=2, width=8, capacity=2)

    boom = ValueError("utterance needs 99 conditioning rows but the slot "
                      "holds 1 — raise the server's slot_seconds")
    healthy_add = srv.server.add
    calls = {"n": 0}

    def add(mel):
        # vocoder admissions happen FIFO inside step(): fail the 2nd (and
        # the 3rd, for the run() assertion below), keep the 1st healthy
        calls["n"] += 1
        if calls["n"] in (2, 3):
            raise boom
        return healthy_add(mel)

    monkeypatch.setattr(srv.server, "add", add)

    ok_sid = srv.add("hello world")
    bad_sid = srv.add("hi there")

    out, pieces = {}, []
    while srv.active:
        for sid, chunk in srv.step().items():
            if sid == ok_sid and not isinstance(chunk, Exception):
                pieces.append(chunk)
            else:
                out[sid] = chunk
    assert out[bad_sid] is boom           # surfaced, not silent audio
    assert bad_sid not in srv.active      # terminal for that session
    assert len(np.concatenate(pieces)) > 0  # the healthy session completed

    # run() raises the failure instead of returning empty audio
    with pytest.raises(ValueError, match="slot"):
        srv.run(["ok then"])


def test_int16_stream_matches_quantized_float():
    """output_dtype='int16' streaming: device-faded/quantized PCM chunks
    from Generator.stream and StreamServer must match quantizing the float
    path's stream, to 1 LSB (the device does the crossfade, GLOBAL tail
    fade, and wavio-parity quantization in the finalize program)."""
    from wavernn_tpu.infer.stream_server import StreamServer
    from wavernn_tpu.ops.decode import Generator

    cfg = tiny_cfg("RAW")
    _, variables, _, _ = init_model(cfg)
    mels = [_mel(cfg, f, i) for i, f in enumerate([100, 70])]

    kw = dict(backend="scan", frame_bucket=16, fold_bucket=4,
              deterministic=True)
    gen_f = Generator(cfg, variables, **kw)
    gen_i = Generator(cfg, variables, output_dtype="int16", **kw)

    solo_i16 = []
    for m in mels:
        f64 = np.concatenate(list(gen_f.stream(
            m, target=TARGET, overlap=OVERLAP, mu_law=True, group=2)))
        i16 = np.concatenate(list(gen_i.stream(
            m, target=TARGET, overlap=OVERLAP, mu_law=True, group=2)))
        solo_i16.append(i16)
        assert i16.dtype == np.int16 and i16.shape == f64.shape
        expect = np.round(np.clip(f64 * 32767.0, -32768, 32767))
        np.testing.assert_allclose(i16.astype(np.float64), expect, atol=1.0)
        # the vast majority must match exactly (only rounding ties differ)
        assert (i16.astype(np.float64) == expect).mean() > 0.99

    # the multi-session server carries the same int16 path per session
    srv = StreamServer(gen_i, target=TARGET, overlap=OVERLAP, mu_law=True,
                       group=2, width=8, capacity=4)
    for got, want in zip(srv.run(mels), solo_i16):
        assert got.dtype == np.int16 and got.shape == want.shape
        np.testing.assert_allclose(got.astype(np.float64),
                                   want.astype(np.float64), atol=1.0)


def test_tts_stream_server_int16_chunks():
    """A TTSStreamServer over an int16 pipeline serves device-quantized PCM
    chunks end to end (including the empty-chunk dtype)."""
    from wavernn_tpu.infer.stream_server import TTSStreamServer

    pipe = _tiny_pipeline(output_dtype="int16")
    srv = TTSStreamServer(pipe, target=TARGET, overlap=OVERLAP, mu_law=True,
                          group=2, width=8, capacity=2)
    waves = srv.run(["hello world", "ok then"])
    assert all(w.dtype == np.int16 for w in waves)
    assert any(len(w) and np.abs(w.astype(np.int32)).max() > 0
               for w in waves)


def test_mulaw8_stream_server_matches_solo_streams():
    """output_dtype='mulaw8' through the multi-session StreamServer: each
    session's uint8 wire bytes must equal its solo Generator.stream bytes
    exactly (same fold-group PRNG schedule), and a TTSStreamServer over a
    mulaw8 pipeline serves uint8 end to end."""
    from wavernn_tpu.infer.stream_server import StreamServer, TTSStreamServer
    from wavernn_tpu.ops.decode import Generator

    cfg = tiny_cfg("RAW")
    _, variables, _, _ = init_model(cfg)
    mels = [_mel(cfg, f, i) for i, f in enumerate([100, 70])]

    gen = Generator(cfg, variables, backend="scan", frame_bucket=16,
                    fold_bucket=4, deterministic=True,
                    output_dtype="mulaw8")
    solo = [np.concatenate(list(gen.stream(
        m, target=TARGET, overlap=OVERLAP, mu_law=True, group=2)))
        for m in mels]
    assert all(s.dtype == np.uint8 for s in solo)

    srv = StreamServer(gen, target=TARGET, overlap=OVERLAP, mu_law=True,
                       group=2, width=8, capacity=4)
    for got, want in zip(srv.run(mels), solo):
        assert got.dtype == np.uint8
        np.testing.assert_array_equal(got, want)

    pipe = _tiny_pipeline(output_dtype="mulaw8")
    tts = TTSStreamServer(pipe, target=TARGET, overlap=OVERLAP, mu_law=True,
                          group=2, width=8, capacity=2)
    waves = tts.run(["hello world"])
    assert all(w.dtype == np.uint8 for w in waves)
    assert len(waves[0]) and np.ptp(waves[0].astype(np.int32)) > 0
