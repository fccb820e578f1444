"""Fold-with-overlap batched generation + equal-power crossfade unfold.

The reference's intra-utterance parallelism mechanism (ref:
models/fatchord_version.py:281-405): a long conditioning sequence is chopped
into overlapping windows decoded as a batch, then crossfaded back to 1-D
audio.  On TPU the fold axis is also the natural sharding axis for
sequence-parallel generation across chips (SURVEY.md §5).

All functions are pure jnp with shapes resolved at trace time, so they fuse
into the surrounding jitted generation graph.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def pad_tensor(x: jnp.ndarray, pad: int, side: str = "both") -> jnp.ndarray:
    """Zero-pad a (B, T, C) tensor along time."""
    if side == "both":
        widths = ((0, 0), (pad, pad), (0, 0))
    elif side == "before":
        widths = ((0, 0), (pad, 0), (0, 0))
    elif side == "after":
        widths = ((0, 0), (0, pad), (0, 0))
    else:
        raise ValueError(f"bad side {side!r}")
    return jnp.pad(x, widths)


def fold_shape(total_len: int, target: int, overlap: int) -> Tuple[int, int]:
    """(num_folds, padding) for folding a sequence of total_len samples."""
    num_folds = (total_len - overlap) // (target + overlap)
    extended_len = num_folds * (overlap + target) + overlap
    remaining = total_len - extended_len
    padding = 0
    if remaining != 0:
        num_folds += 1
        padding = target + 2 * overlap - remaining
    return num_folds, padding


def fold_with_overlap(x: jnp.ndarray, target: int, overlap: int) -> jnp.ndarray:
    """(1, T, C) → (num_folds, target + 2*overlap, C) overlapping windows.

    Eg. target=2, overlap=1, T=10:
        [[h1..h4], [h4..h7], [h7..h10]]
    """
    _, total_len, features = x.shape
    num_folds, padding = fold_shape(total_len, target, overlap)
    if padding:
        x = pad_tensor(x, padding, side="after")

    length = target + 2 * overlap
    starts = np.arange(num_folds) * (target + overlap)
    idx = starts[:, None] + np.arange(length)[None, :]
    return x[0][jnp.asarray(idx)]  # (num_folds, length, C) gather


def xfade_envelopes(overlap: int, dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Equal-power crossfade envelopes with an RNN-warmup silence prefix.

    fade_in  = [zeros(overlap//2), sqrt-ramp-up]
    fade_out = [ones(overlap//2),  sqrt-ramp-down]
    """
    silence_len = overlap // 2
    fade_len = overlap - silence_len
    t = jnp.linspace(-1.0, 1.0, fade_len, dtype=dtype)
    fade_in = jnp.sqrt(0.5 * (1.0 + t))
    fade_out = jnp.sqrt(0.5 * (1.0 - t))
    fade_in = jnp.concatenate([jnp.zeros(silence_len, dtype), fade_in])
    fade_out = jnp.concatenate([jnp.ones(silence_len, dtype), fade_out])
    return fade_in, fade_out


def xfade_and_unfold(y: jnp.ndarray, overlap: int) -> jnp.ndarray:
    """(num_folds, target + 2*overlap) samples → crossfaded 1-D audio.

    Applies the gain envelopes to both overlap ends and overlap-adds the
    staggered folds:  [f1_in, f1_mid, (f1_out + f2_in), f2_mid, ...]
    """
    num_folds, length = y.shape
    target = length - 2 * overlap
    total_len = num_folds * (target + overlap) + overlap

    fade_in, fade_out = xfade_envelopes(overlap, y.dtype)
    y = y.at[:, :overlap].multiply(fade_in)
    y = y.at[:, -overlap:].multiply(fade_out)

    starts = np.arange(num_folds) * (target + overlap)
    idx = (starts[:, None] + np.arange(length)[None, :]).reshape(-1)
    unfolded = jnp.zeros(total_len, dtype=y.dtype)
    return unfolded.at[jnp.asarray(idx)].add(y.reshape(-1))
