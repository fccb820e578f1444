"""Mel-feature parity check (BASELINE.md: MCD < 0.1 dB vs the reference).

Computes MCD between this framework's two mel implementations (numpy host
pipeline vs fused JAX device pipeline) on real or synthetic audio, and — when
librosa is installed (e.g. on a dev machine) — against librosa itself with
the reference's exact calls.

Usage:
  python tools/check_mel_parity.py [wav ...]     # defaults to synthetic audio
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from wavernn_tpu.config import hp, default_hparams_path
from wavernn_tpu.dsp import audio
from wavernn_tpu.dsp.metrics import mcd


def synth_signals():
    rng = np.random.default_rng(0)
    sr = 22050
    t = np.arange(sr * 2) / sr
    return {
        "tone440": (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32),
        "chirp": (0.5 * np.sin(2 * np.pi * (200 + 1500 * t / t[-1]) * t)).astype(np.float32),
        "noise": rng.uniform(-0.5, 0.5, sr * 2).astype(np.float32),
    }


def main():
    if not hp.is_configured():
        hp.configure(default_hparams_path())

    signals = {}
    for arg in sys.argv[1:]:
        signals[Path(arg).stem] = audio.load_wav(arg)
    if not signals:
        signals = synth_signals()

    try:
        import librosa  # noqa
        has_librosa = True
    except ImportError:
        has_librosa = False

    from wavernn_tpu.dsp import jax_audio

    worst_np_jax = worst_lib = 0.0
    for name, y in signals.items():
        m_np = audio.melspectrogram(y)
        m_jax = np.asarray(jax_audio.melspectrogram_hp(y))
        d = mcd(m_np, m_jax)
        worst_np_jax = max(worst_np_jax, d)
        line = f"{name:10s} numpy-vs-jax MCD = {d:.4f} dB"
        if has_librosa:
            import librosa

            D = librosa.stft(y=y, n_fft=hp.n_fft, hop_length=hp.hop_length,
                             win_length=hp.win_length)
            S = librosa.feature.melspectrogram(
                S=np.abs(D), sr=hp.sample_rate, n_fft=hp.n_fft,
                n_mels=hp.num_mels, fmin=hp.fmin)
            m_lib = audio.normalize(audio.amp_to_db(S))
            d2 = mcd(m_np, m_lib)
            worst_lib = max(worst_lib, d2)
            line += f" | numpy-vs-librosa MCD = {d2:.4f} dB"
        print(line)

    print(f"\nworst numpy-vs-jax MCD: {worst_np_jax:.4f} dB (gate: < 0.1)")
    if has_librosa:
        print(f"worst numpy-vs-librosa MCD: {worst_lib:.4f} dB (gate: < 0.1)")
    else:
        print("librosa not installed here; the numpy pipeline reimplements its "
              "documented conventions (centered reflect STFT, periodic Hann, "
              "Slaney mel + Slaney norm) — see tests/test_dsp.py goldens.")
    assert worst_np_jax < 0.1, "numpy/JAX mel pipelines diverge!"


if __name__ == "__main__":
    main()
