"""Recurrent cells and scanned sequence RNNs.

Explicit weight layout with torch gate conventions — GRU gates ordered
(reset, update, new), LSTM gates (input, forget, cell, output) — so that:
  * pretrained PyTorch reference checkpoints convert by pure transpose
    (ref: models/fatchord_version.py:117-118, 273-279),
  * the Pallas decode kernel and the lax.scan sampler consume the same raw
    weight arrays as the training graph.

Sequence iteration is ``flax.linen.scan`` (single XLA while-loop, compiled
once) — the TPU replacement for cuDNN's fused GRU.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def _dot(x, w, compute_dtype):
    """Matmul with optional low-precision inputs and f32 accumulation."""
    if compute_dtype is None:
        return x @ w
    cd = jnp.dtype(compute_dtype)
    return jnp.dot(x.astype(cd), w.astype(cd),
                   preferred_element_type=jnp.float32)


def gru_cell_step(x, h, w_ih, w_hh, b_ih, b_hh, compute_dtype=None):
    """One GRU step in torch convention.  x:(B,I) h:(B,H) → h':(B,H).

    ``compute_dtype`` (e.g. 'bfloat16') runs the two matmuls in reduced
    precision with f32 accumulation; gate math and state stay f32."""
    H = h.shape[-1]
    gi = _dot(x, w_ih, compute_dtype) + b_ih
    gh = _dot(h, w_hh, compute_dtype) + b_hh
    i_r, i_z, i_n = gi[..., :H], gi[..., H: 2 * H], gi[..., 2 * H:]
    h_r, h_z, h_n = gh[..., :H], gh[..., H: 2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def lstm_cell_step(x, h, c, w_ih, w_hh, b_ih, b_hh, compute_dtype=None):
    """One LSTM step in torch convention.  Returns (h', c')."""
    H = h.shape[-1]
    gates = (_dot(x, w_ih, compute_dtype) + _dot(h, w_hh, compute_dtype)
             + b_ih + b_hh)
    i = jax.nn.sigmoid(gates[..., :H])
    f = jax.nn.sigmoid(gates[..., H: 2 * H])
    g = jnp.tanh(gates[..., 2 * H: 3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H:])
    c = f * c + i * g
    return o * jnp.tanh(c), c


class GRUCell(nn.Module):
    """GRU cell with torch weight layout: w_ih (I,3H), w_hh (H,3H)."""

    hidden: int
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray):
        in_dim = x.shape[-1]
        bound = 1.0 / self.hidden ** 0.5
        init = _uniform_init(bound)
        w_ih = self.param("w_ih", init, (in_dim, 3 * self.hidden))
        w_hh = self.param("w_hh", init, (self.hidden, 3 * self.hidden))
        b_ih = self.param("b_ih", init, (3 * self.hidden,))
        b_hh = self.param("b_hh", init, (3 * self.hidden,))
        h = gru_cell_step(x, h, w_ih, w_hh, b_ih, b_hh, self.compute_dtype)
        return h, h


class LSTMCell(nn.Module):
    """LSTM cell with torch weight layout: w_ih (I,4H), w_hh (H,4H)."""

    hidden: int

    @nn.compact
    def __call__(self, carry: Tuple[jnp.ndarray, jnp.ndarray], x: jnp.ndarray):
        h, c = carry
        in_dim = x.shape[-1]
        bound = 1.0 / self.hidden ** 0.5
        init = _uniform_init(bound)
        w_ih = self.param("w_ih", init, (in_dim, 4 * self.hidden))
        w_hh = self.param("w_hh", init, (self.hidden, 4 * self.hidden))
        b_ih = self.param("b_ih", init, (4 * self.hidden,))
        b_hh = self.param("b_hh", init, (4 * self.hidden,))
        h, c = lstm_cell_step(x, h, c, w_ih, w_hh, b_ih, b_hh)
        return (h, c), h


class _GRUWeights(nn.Module):
    """Parameter holder keeping the ``<gru>/cell/{w_ih,w_hh,b_ih,b_hh}``
    checkpoint tree while the sequence math lives in :class:`GRU`."""

    hidden: int
    in_dim: int

    @nn.compact
    def __call__(self):
        bound = 1.0 / self.hidden ** 0.5
        init = _uniform_init(bound)
        return (
            self.param("w_ih", init, (self.in_dim, 3 * self.hidden)),
            self.param("w_hh", init, (self.hidden, 3 * self.hidden)),
            self.param("b_ih", init, (3 * self.hidden,)),
            self.param("b_hh", init, (3 * self.hidden,)),
        )


class GRU(nn.Module):
    """Unidirectional GRU over a (B, T, C) sequence.

    cuDNN-style split: the input-side gate projection ``xs @ w_ih`` for the
    WHOLE sequence is one large MXU-friendly matmul hoisted out of the
    recurrence; the scan body only does the (H,3H) hidden matmul + gate
    math.  Returns (outputs (B,T,H), final hidden (B,H)).
    """

    hidden: int
    compute_dtype: Optional[str] = None
    unroll: int = 8  # scan unroll: amortizes while-loop overhead on TPU.
                     # Prefer a divisor of T — a non-dividing unroll makes
                     # XLA slice the (T,B,3H) gate buffer into main+remainder
                     # loops, a multi-hundred-MB copy at training shapes.
    remat: bool = False  # jax.checkpoint the scan body: backward recomputes
                         # gates from the 512-wide carry instead of stashing
                         # (T,B,3H) activation buffers to HBM

    @nn.compact
    def __call__(self, xs, h0: Optional[jnp.ndarray] = None,
                 time_major: bool = False):
        """``xs``: one (B,T,C) array — or (T,B,C) with ``time_major`` — or a
        tuple of them, treated as a last-axis concat distributed over
        row-slices of w_ih (no concat materialized; see TorchDense)."""
        parts = xs if isinstance(xs, (tuple, list)) else (xs,)
        batch_axis = 1 if time_major else 0
        B = parts[0].shape[batch_axis]
        H = self.hidden
        in_dim = sum(t.shape[-1] for t in parts)
        if h0 is None:
            h0 = jnp.zeros((B, H), dtype=parts[0].dtype)
        w_ih, w_hh, b_ih, b_hh = _GRUWeights(H, in_dim, name="cell")()

        # (B,T,I) @ (I,3H): the full sequence input projection in one dot
        # (per split part — cat(xs) @ W == Σ xs_i @ W_i)
        off = 0
        gi_seq = None
        for t in parts:
            w = w_ih[off: off + t.shape[-1]]
            d = _dot(t, w, self.compute_dtype)
            gi_seq = d if gi_seq is None else gi_seq + d
            off += t.shape[-1]
        gi_seq = gi_seq + b_ih
        cd = self.compute_dtype

        def step(h, gi):
            gh = _dot(h, w_hh, cd) + b_hh
            r = jax.nn.sigmoid(gi[..., :H] + gh[..., :H])
            z = jax.nn.sigmoid(gi[..., H:2 * H] + gh[..., H:2 * H])
            n = jnp.tanh(gi[..., 2 * H:] + r * gh[..., 2 * H:])
            h = (1.0 - z) * n + z * h
            return h, h

        if self.remat:
            step = jax.checkpoint(step)
        if not time_major:
            gi_seq = jnp.swapaxes(gi_seq, 0, 1)
        T = gi_seq.shape[0]
        unroll = self.unroll if T % self.unroll == 0 else \
            max(u for u in range(1, self.unroll + 1) if T % u == 0)
        h, ys = jax.lax.scan(step, h0, gi_seq, unroll=unroll)
        if not time_major:
            ys = jnp.swapaxes(ys, 0, 1)
        return ys, h


class BiGRU(nn.Module):
    """Bidirectional GRU: concatenated forward/backward outputs (B,T,2H)."""

    hidden: int

    @nn.compact
    def __call__(self, xs: jnp.ndarray):
        fwd, _ = GRU(self.hidden, name="fwd")(xs)
        bwd, _ = GRU(self.hidden, name="bwd")(jnp.flip(xs, axis=1))
        return jnp.concatenate([fwd, jnp.flip(bwd, axis=1)], axis=-1)
