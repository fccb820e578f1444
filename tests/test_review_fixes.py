"""Regression tests for code-review findings: extensible WAV decoding,
huge-number verbalization, TTSGenerator steps override, resume LR injection,
generator cache variable swap."""

import struct

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_wave_format_extensible_float32(tmp_path):
    """A float32 WAVE_FORMAT_EXTENSIBLE file must decode as float, not be
    misread as int PCM."""
    from wavernn_tpu.dsp import wavio

    sr = 22050
    x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype("<f4")
    raw = x.tobytes()
    # KSDATAFORMAT_SUBTYPE_IEEE_FLOAT GUID
    subformat = struct.pack("<H", 3) + bytes.fromhex(
        "0000" + "0000" + "10" + "00" + "80" + "00" + "00" + "AA"
        + "00" + "38" + "9B" + "71"
    )
    fmt_body = struct.pack("<HHIIHH", 0xFFFE, 1, sr, sr * 4, 4, 32)
    fmt_body += struct.pack("<HHI", 22, 32, 4) + subformat
    header = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt_body) + 8 + len(raw))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(raw))
    )
    p = tmp_path / "ext.wav"
    p.write_bytes(header + raw)

    y, got_sr = wavio.read_wav_raw(p)
    assert got_sr == sr
    np.testing.assert_allclose(y, x, atol=1e-6)


def test_number_to_words_huge_numbers_dont_crash():
    from wavernn_tpu.text.cleaners import english_cleaners
    from wavernn_tpu.text.numbers import number_to_words

    # named scales up to decillion
    assert "sextillion" in number_to_words(10 ** 21)
    # beyond named scales: digit reading, no crash
    out = number_to_words(10 ** 40)
    assert out.startswith("one zero zero")
    # through the full cleaner pipeline
    cleaned = english_cleaners("the id is 1000000000000000000000000000000000000000.")
    assert "one zero" in cleaned


def test_tts_generator_steps_override():
    from wavernn_tpu.infer.tacotron import TTSGenerator
    from wavernn_tpu.models.tacotron import Tacotron, TacotronConfig

    cfg = TacotronConfig(
        embed_dims=16, num_chars=148, encoder_dims=16, decoder_dims=32,
        n_mels=20, fft_bins=20, postnet_dims=16, encoder_K=3, lstm_dims=32,
        postnet_K=3, num_highways=2,
    )
    model = Tacotron(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 8), jnp.int32), jnp.zeros((1, 10, 20)), 5, True,
    )
    gen = TTSGenerator(cfg, variables, steps=40, text_bucket=8)
    seq = list(np.random.default_rng(0).integers(1, 140, 6))
    mel_default, _, _ = gen(seq, r=5)
    mel_short, _, _ = gen(seq, r=5, steps=20)
    assert mel_default.shape[1] <= 40
    assert mel_short.shape[1] <= 20


def test_voc_train_loop_injects_lr(hp_tiny):
    """A resumed optimizer state must pick up the configured LR."""
    from wavernn_tpu.training.state import make_optimizer, new_train_state
    from wavernn_tpu.training.wavernn import voc_train_loop
    from wavernn_tpu.models.wavernn import WaveRNNConfig, WaveRNN
    from wavernn_tpu.paths import Paths

    cfg = WaveRNNConfig(
        rnn_dims=16, fc_dims=16, bits=8, pad=2, upsample_factors=(2, 2),
        feat_dims=8, compute_dims=8, res_out_dims=8, res_blocks=1,
        hop_length=4, sample_rate=1000, mode="RAW",
    )
    model = WaveRNN(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16)), jnp.zeros((1, 8, 8)), True
    )
    opt = make_optimizer(1e-4, None)
    state = new_train_state(variables["params"], variables["batch_stats"], opt)

    import tempfile
    from pathlib import Path as P

    def find_lr(node):
        if hasattr(node, "hyperparams"):
            return float(node.hyperparams["learning_rate"])
        if isinstance(node, (tuple, list)):
            for c in node:
                v = find_lr(c)
                if v is not None:
                    return v
        return None

    with tempfile.TemporaryDirectory() as d:
        paths = Paths(P(d) / "data", "v", "t", base=d)
        voc_train_loop(paths, cfg, state, opt, [], [], total_steps=0,
                       lr=5e-4, gen_at_checkpoint=False)
    assert find_lr(state.opt_state) == pytest.approx(5e-4)


def test_generator_cache_swaps_variables():
    from wavernn_tpu.infer import wavernn as infer_wavernn
    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.training.state import make_optimizer, new_train_state

    cfg = WaveRNNConfig(
        rnn_dims=16, fc_dims=16, bits=8, pad=2, upsample_factors=(2, 2),
        feat_dims=8, compute_dims=8, res_out_dims=8, res_blocks=1,
        hop_length=4, sample_rate=1000, mode="RAW",
    )
    model = WaveRNN(cfg)
    v1 = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)),
                    jnp.zeros((1, 8, 8)), True)
    v2 = model.init(jax.random.PRNGKey(9), jnp.zeros((1, 16)),
                    jnp.zeros((1, 8, 8)), True)
    opt = make_optimizer(1e-4, None)
    s1 = new_train_state(v1["params"], v1["batch_stats"], opt)
    s2 = new_train_state(v2["params"], v2["batch_stats"], opt)

    g1 = infer_wavernn.make_generator(cfg, s1, backend="scan")
    g2 = infer_wavernn.make_generator(cfg, s2, backend="scan")
    assert g1 is g2  # cached instance reused
    # and the weights actually changed
    a = np.asarray(g1.weights.I_w) if g1 is g2 else None
    np.testing.assert_array_equal(
        np.asarray(g2.weights.I_w), np.asarray(v2["params"]["I"]["kernel"])
    )
