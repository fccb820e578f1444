"""Golden-file regression tests: the DSP feature definitions are checkpoint
compatibility contracts — any change to the mel/mu-law math silently breaks
every trained model, so exact outputs are pinned."""

from pathlib import Path

import numpy as np

GOLDEN = Path(__file__).parent / "golden"


def _two_tone():
    sr = 22050
    t = np.arange(sr // 4) / sr
    return (0.5 * np.sin(2 * np.pi * 440 * t)
            + 0.25 * np.sin(2 * np.pi * 1320 * t)).astype(np.float32)


def test_mel_pipeline_pinned(hp_default):
    from wavernn_tpu.dsp import audio

    mel = audio.melspectrogram(_two_tone()).astype(np.float32)
    want = np.load(GOLDEN / "mel_two_tone.npy")
    np.testing.assert_allclose(mel, want, atol=1e-6)


def test_mulaw_pinned(hp_default):
    from wavernn_tpu.dsp import audio

    labels = audio.encode_mu_law(_two_tone(), 512).astype(np.int16)[:500]
    want = np.load(GOLDEN / "mulaw_two_tone.npy")
    np.testing.assert_array_equal(labels, want)


def test_generator_short_mel_edge(hp_default):
    """Very short utterances (few mel frames) must still generate."""
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.ops.decode import Generator

    cfg = WaveRNNConfig(
        rnn_dims=16, fc_dims=16, bits=8, pad=2, upsample_factors=(5, 5, 11),
        feat_dims=80, compute_dims=8, res_out_dims=8, res_blocks=1,
        mode="RAW",
    )
    model = WaveRNN(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 275)),
                           jnp.zeros((1, 5, 80)), True)
    gen = Generator(cfg, variables, backend="scan", frame_bucket=8)
    mel = np.random.default_rng(0).uniform(0, 1, (80, 3)).astype(np.float32)
    wav = gen(mel, batched=True, target=2750, overlap=550, mu_law=True)
    assert wav.shape == (2 * 275,)
    assert np.isfinite(wav).all()
