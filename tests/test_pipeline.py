"""Unified TTS pipeline test: text strings → waveforms, both stages batched."""

import numpy as np
import jax
import jax.numpy as jnp


def test_tts_pipeline_end_to_end():
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

    pipe = TTSPipeline(tts_cfg, tts_vars, voc_cfg, voc_vars,
                       cleaner_names=["english_cleaners"], r=5,
                       backend="scan", tts_steps=20)
    wavs = pipe(["hello world", "hi"], target=2750, overlap=550)
    assert len(wavs) == 2
    for w in wavs:
        assert w.ndim == 1 and len(w) > 0
        assert np.isfinite(w).all()


def test_tts_pipeline_stream_synthesize_matches_sequential():
    """Pipelined two-stage serving == per-utterance sequential synthesis
    (same per-utterance seeds, deterministic)."""
    from wavernn_tpu.infer.pipeline import TTSPipeline
    from wavernn_tpu.models.tacotron import Tacotron, TacotronConfig
    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.text import text_to_sequence
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
    pipe = TTSPipeline(tts_cfg, tts_vars, voc_cfg, voc_vars,
                       cleaner_names=["english_cleaners"], r=5,
                       backend="scan", tts_steps=20)

    texts = ["hello world", "hi there", "ok"]
    streamed = list(pipe.stream_synthesize(texts, target=2750, overlap=550))
    assert len(streamed) == len(texts)

    # sequential reference with the same per-utterance seeds
    for i, t in enumerate(texts):
        seq = text_to_sequence(t.strip(), ["english_cleaners"])
        _, m_linear, _ = pipe.tts(seq, r=5)
        mel = np.clip((m_linear + 4) / 8, 0, 1)
        ref = pipe.voc(mel, True, 2750, 550, True, seed=i)
        np.testing.assert_array_equal(streamed[i], ref)

def test_tts_pipeline_uint8_ingress_plumbs_to_vocoder():
    """serve.py --input_dtype uint8 reaches the vocoder Generator: the
    staged wire bytes are uint8 and the decode runs end-to-end (the
    bit-exactness of the u8 wire itself is pinned in test_wavernn.py)."""
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
    pipe = TTSPipeline(tts_cfg, tts_vars, voc_cfg, voc_vars,
                       cleaner_names=["english_cleaners"], r=5,
                       backend="scan", tts_steps=20, input_dtype="uint8")
    assert pipe.voc.input_dtype == "uint8"
    mel = np.random.default_rng(0).uniform(0, 1, (80, 20)).astype(np.float32)
    staged = pipe.voc.prestage(mel, batched=True, target=2750, overlap=550)
    assert staged.mels_dev.dtype == np.uint8
    wavs = pipe(["hi"], target=2750, overlap=550)
    assert len(wavs) == 1 and np.isfinite(wavs[0]).all()
