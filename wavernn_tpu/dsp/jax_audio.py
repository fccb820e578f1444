"""On-device (JAX) DSP: jittable STFT/mel pipeline + Griffin-Lim vocoder.

Same conventions as :mod:`wavernn_tpu.dsp.audio`; the numpy versions are the
golden references in tests.  The Griffin-Lim stack replaces the reference's
``librosa.feature.inverse.mel_to_stft`` + ``librosa.griffinlim`` fallback
(ref: utils/dsp.py:105-116) with XLA-compiled projected-gradient NNLS and
momentum Griffin-Lim — the whole mel→waveform fallback runs on-chip.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from wavernn_tpu.config import hp
from wavernn_tpu.dsp import audio


# ---------------------------------------------------------------------------
# STFT / iSTFT
# ---------------------------------------------------------------------------


def _window(win_length: int, n_fft: int) -> jnp.ndarray:
    return jnp.asarray(audio.padded_window(win_length, n_fft), dtype=jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "center"))
def stft(y: jnp.ndarray, n_fft: int, hop_length: int, win_length: int,
         center: bool = True) -> jnp.ndarray:
    """Complex STFT (1 + n_fft//2, n_frames); librosa-compatible framing."""
    y = jnp.asarray(y, dtype=jnp.float32)
    if center:
        y = jnp.pad(y, n_fft // 2, mode="reflect")
    n_frames = 1 + (y.shape[0] - n_fft) // hop_length
    idx = jnp.arange(n_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    frames = y[idx] * _window(win_length, n_fft)[None, :]
    return jnp.fft.rfft(frames, axis=-1).T


@functools.partial(jax.jit, static_argnames=("hop_length", "win_length", "center", "length"))
def istft(D: jnp.ndarray, hop_length: int, win_length: int, center: bool = True,
          length: Optional[int] = None) -> jnp.ndarray:
    """Inverse STFT via overlap-add with window-sum-square normalization."""
    n_fft = 2 * (D.shape[0] - 1)
    window = _window(win_length, n_fft)
    frames = jnp.fft.irfft(D.T, n=n_fft, axis=-1) * window[None, :]
    n_frames = D.shape[1]
    expected = n_fft + hop_length * (n_frames - 1)

    starts = jnp.arange(n_frames) * hop_length
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    y = jnp.zeros(expected, dtype=frames.dtype).at[idx.reshape(-1)].add(frames.reshape(-1))
    wss = jnp.zeros(expected, dtype=frames.dtype).at[idx.reshape(-1)].add(
        jnp.tile(window ** 2, (n_frames,))
    )
    y = y / jnp.maximum(wss, 1e-10)
    if center:
        y = y[n_fft // 2: expected - n_fft // 2]
    if length is not None:
        y = y[:length] if y.shape[0] >= length else jnp.pad(y, (0, length - y.shape[0]))
    return y


# ---------------------------------------------------------------------------
# Mel features on device
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("sample_rate", "n_fft", "hop_length", "win_length",
                     "num_mels", "fmin", "min_level_db"),
)
def melspectrogram(y: jnp.ndarray, *, sample_rate: int, n_fft: int,
                   hop_length: int, win_length: int, num_mels: int,
                   fmin: float, min_level_db: float) -> jnp.ndarray:
    """Fused on-device wav→normalized-mel pipeline (XLA kernel of the whole
    preprocessing hot loop; numpy twin is audio.melspectrogram)."""
    basis = jnp.asarray(
        audio.mel_filterbank(sample_rate, n_fft, num_mels, fmin=fmin),
        dtype=jnp.float32,
    )
    D = stft(y, n_fft, hop_length, win_length)
    S = basis @ jnp.abs(D)
    S_db = 20.0 * jnp.log10(jnp.maximum(1e-5, S))
    return jnp.clip((S_db - min_level_db) / -min_level_db, 0.0, 1.0)


def melspectrogram_hp(y) -> jnp.ndarray:
    """hp-bound convenience wrapper for the on-device mel pipeline."""
    return melspectrogram(
        jnp.asarray(y), sample_rate=hp.sample_rate, n_fft=hp.n_fft,
        hop_length=hp.hop_length, win_length=hp.win_length,
        num_mels=hp.num_mels, fmin=hp.fmin, min_level_db=hp.min_level_db,
    )


# ---------------------------------------------------------------------------
# Griffin-Lim fallback vocoder (mel -> linear -> waveform)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_steps",))
def _nnls_project(basis: jnp.ndarray, M: jnp.ndarray, n_steps: int = 60) -> jnp.ndarray:
    """Projected-gradient non-negative least squares: argmin_{X>=0} |BX - M|^2.

    Replaces librosa's block L-BFGS NNLS in mel_to_stft; initialized at the
    clipped pseudo-inverse solution, stepped at 1/L with L = ||B^T B||_2
    estimated by power iteration.
    """
    pinv = jnp.linalg.pinv(basis)
    X = jnp.maximum(0.0, pinv @ M)

    BtB = basis.T @ basis
    v = jnp.ones((BtB.shape[0],), dtype=BtB.dtype)

    def power_iter(v, _):
        v = BtB @ v
        return v / (jnp.linalg.norm(v) + 1e-12), None

    v, _ = jax.lax.scan(power_iter, v, None, length=16)
    L = jnp.dot(v, BtB @ v) + 1e-6
    BtM = basis.T @ M

    def step(X, _):
        grad = BtB @ X - BtM
        return jnp.maximum(0.0, X - grad / L), None

    X, _ = jax.lax.scan(step, X, None, length=n_steps)
    return X


@functools.partial(
    jax.jit,
    static_argnames=("n_iter", "hop_length", "win_length", "momentum", "length"),
)
def griffinlim(S: jnp.ndarray, key: jax.Array, n_iter: int, hop_length: int,
               win_length: int, momentum: float = 0.99,
               length: Optional[int] = None) -> jnp.ndarray:
    """Momentum Griffin-Lim phase reconstruction from a magnitude STFT."""
    phase = jax.random.uniform(key, S.shape, minval=0.0, maxval=2 * jnp.pi)
    angles = jnp.exp(1j * phase).astype(jnp.complex64)
    S = S.astype(jnp.float32)

    def body(carry, _):
        angles, rebuilt_prev = carry
        inverse = istft(S * angles, hop_length, win_length, length=length)
        n_fft = 2 * (S.shape[0] - 1)
        rebuilt = stft(inverse, n_fft, hop_length, win_length)
        angles = rebuilt - (momentum / (1 + momentum)) * rebuilt_prev
        angles = angles / (jnp.abs(angles) + 1e-16)
        return (angles, rebuilt), None

    (angles, _), _ = jax.lax.scan(
        body, (angles, jnp.zeros_like(angles)), None, length=n_iter
    )
    return istft(S * angles, hop_length, win_length, length=length)


def reconstruct_waveform(mel, n_iter: int = 32, seed: int = 0) -> np.ndarray:
    """Normalized mel [0,1] → waveform via NNLS mel inversion + Griffin-Lim
    (the no-neural-vocoder fallback path; ref: utils/dsp.py:105-116)."""
    mel = jnp.asarray(mel, dtype=jnp.float32)
    denorm = jnp.clip(mel, 0, 1) * -hp.min_level_db + hp.min_level_db
    amp_mel = jnp.power(10.0, denorm * 0.05)
    basis = jnp.asarray(
        audio.mel_filterbank(hp.sample_rate, hp.n_fft, hp.num_mels, fmin=hp.fmin),
        dtype=jnp.float32,
    )
    S = _nnls_project(basis, amp_mel)
    wav = griffinlim(
        S, jax.random.PRNGKey(seed), n_iter=n_iter,
        hop_length=hp.hop_length, win_length=hp.win_length,
    )
    return np.asarray(wav, dtype=np.float32)
