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


def test_trained_tacotron_golden_decode_pinned(hp_default):
    """TTS golden-decode regression: load the committed TRAINED tiny
    Tacotron and replay the free-running eval decode on CPU/XLA; the mel
    must match the pinned capture and the attention-quality gates must
    hold.  This pins the text→encode→LSA-decode→postnet stack — the role
    the reference's pretrained Tacotron zip plays (ref: quick_start.py:
    12-21, README.md:88; attention criterion ref: train_tacotron.py:
    163-166).  bench.py replays the same decode through the pallas TTS
    kernel on TPU, gated against the meta pinned here."""
    import json
    import sys

    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    from train_golden import taco_eval_decode

    meta = json.loads((GOLDEN / "tiny_tacotron_meta.json").read_text())
    pinned = meta["pinned_gates_cpu_xla"]
    mel, attn, gates = taco_eval_decode("xla")

    assert gates["attn_monotone"] >= 0.9, gates
    assert gates["attn_coverage"] >= 0.7, gates
    assert 0.6 < gates["tempo"] < 1.5, gates
    want = np.load(GOLDEN / "tiny_tacotron_mel.npy")
    assert mel.shape == want.shape, (mel.shape, want.shape)
    # f32 decode pinned on CPU; tolerance covers library-version jitter
    np.testing.assert_allclose(mel, want, atol=1e-3)
    assert abs(gates["mel_gt_l1"] - pinned["mel_gt_l1"]) < 0.05


def test_trained_golden_checkpoint_decode_pinned(hp_default):
    """Golden-audio regression: load the committed TRAINED tiny checkpoint
    and replay a deterministic batched decode; the waveform must match the
    pinned capture.  This pins the whole load→upsample→decode→crossfade
    stack against drift — the role the reference's pretrained zips play
    (ref: quick_start.py:12-21) — with a self-trained artifact
    (tools/train_golden.py --which tiny, CPU-pinned f32 numerics)."""
    import jax

    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.ops.decode import Generator
    from wavernn_tpu.utils.checkpoints import load_pytree

    cfg = WaveRNNConfig(
        rnn_dims=32, fc_dims=32, bits=9, pad=2, upsample_factors=(5, 5, 11),
        feat_dims=80, compute_dims=16, res_out_dims=16, res_blocks=2,
        hop_length=275, sample_rate=22050, mode="RAW",
    )
    model = WaveRNN(cfg)
    import jax.numpy as jnp

    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.hop_length)),
        jnp.zeros((1, 1 + 2 * cfg.pad, cfg.feat_dims)), True,
    )
    blob = load_pytree(
        {"params": template["params"],
         "batch_stats": template["batch_stats"], "step": np.asarray(0)},
        GOLDEN / "tiny_wavernn_raw.msgpack",
    )
    assert int(np.asarray(blob["step"])) == 300  # trained, not random

    gen = Generator(
        cfg, {"params": blob["params"], "batch_stats": blob["batch_stats"]},
        backend="scan", frame_bucket=16, fold_bucket=4, deterministic=True,
    )
    mel = np.load(GOLDEN / "tiny_wavernn_raw_mel.npy")
    wav = gen(mel, batched=True, target=2750, overlap=550, mu_law=True)
    want = np.load(GOLDEN / "tiny_wavernn_raw_wav.npy").astype(np.float64)
    assert wav.shape == want.shape
    # f32 decode pinned on CPU; tolerance covers library-version jitter
    np.testing.assert_allclose(wav, want, atol=1e-4)
    # and it must be real signal, not silence
    assert np.std(wav) > 0.01
