"""Coverage for small host utilities: display formatting, wav bit depths,
config collision handling, file listing."""

import numpy as np
import pytest


def test_progbar_and_stream(capsys):
    from wavernn_tpu.utils.display import progbar, stream

    bar = progbar(5, 10, size=10)
    assert len(bar) == 10
    assert "█" in bar and "░" in bar
    stream("hello")
    assert "hello" in capsys.readouterr().out


def test_simple_table(capsys):
    from wavernn_tpu.utils.display import simple_table

    simple_table([("A", 1), ("Long Heading", "x")])
    out = capsys.readouterr().out
    assert "| " in out and "A" in out and "Long Heading" in out


def test_time_since():
    import time

    from wavernn_tpu.utils.display import time_since

    s = time_since(time.time() - 3700)
    assert "h" in s


def test_save_attention_and_spectrogram(tmp_path):
    from wavernn_tpu.utils.display import save_attention, save_spectrogram

    attn = np.random.default_rng(0).uniform(0, 1, (20, 30))
    save_attention(attn, tmp_path / "a")
    save_spectrogram(attn, tmp_path / "s", length=10)
    assert (tmp_path / "a.png").exists() or (tmp_path / "a_attention.npy").exists()


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_wav_pcm_depths(tmp_path, bits):
    """Our reader must handle every common PCM depth."""
    import struct

    from wavernn_tpu.dsp import wavio

    sr = 8000
    x = (0.5 * np.sin(2 * np.pi * 100 * np.arange(800) / sr))
    if bits == 8:
        raw = ((x * 127) + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        raw = (x * 32767).astype("<i2").tobytes()
    elif bits == 24:
        v = (x * (2 ** 23 - 1)).astype(np.int32)
        b = np.zeros((len(v), 3), np.uint8)
        b[:, 0] = v & 0xFF
        b[:, 1] = (v >> 8) & 0xFF
        b[:, 2] = (v >> 16) & 0xFF
        raw = b.tobytes()
    else:
        raw = (x * (2 ** 31 - 1)).astype("<i4").tobytes()

    block = bits // 8
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(raw), b"WAVE",
        b"fmt ", 16, 1, 1, sr, sr * block, block, bits,
        b"data", len(raw),
    )
    p = tmp_path / f"t{bits}.wav"
    p.write_bytes(header + raw)
    y, got_sr = wavio.read_wav_raw(p)
    assert got_sr == sr
    np.testing.assert_allclose(y, x, atol=2.0 / (2 ** (min(bits, 16) - 1)))


def test_stereo_downmix(tmp_path):
    import struct

    from wavernn_tpu.dsp import wavio

    sr = 8000
    left = np.ones(100, np.float32) * 0.5
    right = np.zeros(100, np.float32)
    inter = np.empty(200, np.float32)
    inter[0::2], inter[1::2] = left, right
    raw = (inter * 32767).astype("<i2").tobytes()
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(raw), b"WAVE",
        b"fmt ", 16, 1, 2, sr, sr * 4, 4, 16,
        b"data", len(raw),
    )
    p = tmp_path / "st.wav"
    p.write_bytes(header + raw)
    y = wavio.load_wav(p, sr=sr, mono=True)
    np.testing.assert_allclose(y, 0.25, atol=1e-3)


def test_config_collision_rejected(tmp_path):
    from wavernn_tpu.config import _HParams

    cfg = tmp_path / "c.py"
    cfg.write_text("sample_rate = 1\n")
    hp = _HParams()
    hp.configure_from_dict({"sample_rate": 22050})
    with pytest.raises(RuntimeError):
        hp.configure(cfg)  # reconfigure forbidden


def test_hp_get_default():
    from wavernn_tpu.config import _HParams

    hp = _HParams()
    hp.configure_from_dict({"a": 1})
    assert hp.get("a") == 1
    assert hp.get("missing", 7) == 7


def test_get_files_sorted(tmp_path):
    from wavernn_tpu.utils.files import get_files

    for name in ("b.wav", "a.wav", "c.txt"):
        (tmp_path / name).write_bytes(b"")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "d.wav").write_bytes(b"")
    files = get_files(tmp_path, ".wav")
    assert [f.name for f in files] == ["a.wav", "b.wav", "d.wav"]


def test_paths_tree_layout(tmp_path):
    """Pin the artifact-tree layout (reference compat: utils/paths.py)."""
    from wavernn_tpu.paths import Paths

    p = Paths(tmp_path / "data", "vocid", "ttsid", base=tmp_path)
    assert p.voc_checkpoints == tmp_path / "checkpoints" / "vocid.wavernn"
    assert p.tts_checkpoints == tmp_path / "checkpoints" / "ttsid.tacotron"
    assert p.voc_latest_weights.name == "latest_weights.msgpack"
    assert p.voc_latest_optim.name == "latest_optim.msgpack"
    assert p.tts_output == tmp_path / "model_outputs" / "ttsid.tacotron"
    assert p.tts_attention == p.tts_checkpoints / "attention"
    assert p.tts_mel_plot == p.tts_checkpoints / "mel_plots"
    assert p.voc_log == p.voc_checkpoints / "log.txt"
    assert p.voc_step == p.voc_checkpoints / "step.npy"
    assert p.quant == (tmp_path / "data" / "quant").resolve()
    assert p.get_voc_named_weights("wave_step5K").name == "wave_step5K_weights.msgpack"
    assert p.get_tts_named_optim("taco_step2K").name == "taco_step2K_optim.msgpack"
    # the whole tree is created
    for d in (p.quant, p.mel, p.gta, p.voc_checkpoints, p.voc_output,
              p.tts_checkpoints, p.tts_output, p.tts_attention, p.tts_mel_plot):
        assert d.is_dir()
    import pytest as _pytest
    with _pytest.raises(AttributeError):
        p.voc_nonexistent
