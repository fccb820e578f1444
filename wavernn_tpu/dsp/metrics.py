"""Audio quality metrics — MCD (mel cepstral distortion), the BASELINE.md
parity gate between this framework's features and the reference pipeline."""

from __future__ import annotations

import numpy as np
from scipy.fftpack import dct


def mel_to_cepstra(mel_db: np.ndarray, n_mfcc: int = 13) -> np.ndarray:
    """dB-scale mel spectrogram (n_mels, T) → cepstra (n_mfcc, T) via DCT-II
    with ortho norm (the standard MFCC construction)."""
    return dct(mel_db, type=2, axis=0, norm="ortho")[:n_mfcc]


def mcd(mel_a: np.ndarray, mel_b: np.ndarray, n_mfcc: int = 13,
        skip_c0: bool = True) -> float:
    """Mean mel-cepstral distortion in dB between two aligned normalized mel
    spectrograms (n_mels, T) in [0, 1].

    Uses the standard 10*sqrt(2)/ln(10) scaling over cepstra 1..n_mfcc-1
    (c0 = overall energy skipped by convention)."""
    assert mel_a.shape == mel_b.shape, (mel_a.shape, mel_b.shape)
    # [0,1] normalized → dB relative scale (min_level_db = -100 convention)
    a_db = np.asarray(mel_a, np.float64) * 100.0
    b_db = np.asarray(mel_b, np.float64) * 100.0
    ca = mel_to_cepstra(a_db, n_mfcc)
    cb = mel_to_cepstra(b_db, n_mfcc)
    if skip_c0:
        ca, cb = ca[1:], cb[1:]
    k = 10.0 * np.sqrt(2.0) / np.log(10.0)
    return float(np.mean(k * np.sqrt(np.sum((ca - cb) ** 2, axis=0))))
