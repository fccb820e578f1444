"""Config system tests (capability parity with ref utils/__init__.py:40-104)."""

import pytest

from wavernn_tpu.config import _HParams, default_hparams_path


def make_hp():
    return _HParams()


def test_unconfigured_access_raises():
    hp = make_hp()
    with pytest.raises(AttributeError):
        _ = hp.sample_rate


def test_configure_from_file():
    hp = make_hp()
    hp.configure(default_hparams_path())
    assert hp.sample_rate == 22050
    assert hp.hop_length == 275
    assert hp.voc_mode in ("RAW", "MOL")


def test_reconfigure_raises():
    hp = make_hp()
    hp.configure(default_hparams_path())
    with pytest.raises(RuntimeError):
        hp.configure(default_hparams_path())


def test_overrides():
    hp = make_hp()
    hp.configure(default_hparams_path(), voc_rnn_dims=64)
    assert hp.voc_rnn_dims == 64


def test_validation_bad_upsample(tmp_path):
    hp = make_hp()
    with pytest.raises(ValueError):
        hp.configure(default_hparams_path(), voc_upsample_factors=(2, 2))


def test_missing_file_raises():
    hp = make_hp()
    with pytest.raises(FileNotFoundError):
        hp.configure("/nonexistent/hparams.py")


def test_snapshot_roundtrip():
    hp = make_hp()
    hp.configure(default_hparams_path())
    snap = hp.snapshot()
    hp2 = make_hp()
    hp2.configure_from_dict(snap)
    assert hp2.sample_rate == hp.sample_rate
    assert hp2.tts_schedule == hp.tts_schedule
