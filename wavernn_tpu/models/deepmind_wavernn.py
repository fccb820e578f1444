"""WaveRNN — original DeepMind dual-softmax variant (ref:
models/deepmind_version.py).

The 2018 paper's formulation: one big recurrent matrix R computing the
(u, r, e) gates for the full hidden state, with the state split into coarse
and fine halves; 16-bit audio is emitted as two 8-bit categoricals, the fine
half conditioned on the just-sampled coarse byte.  Used by the pedagogical
examples (examples/nb1_sine_wave.py etc.); the production vocoder is
models/wavernn.py.

TPU-first shape: functional step exposed for ``lax.scan`` in both the
teacher-forced forward and the generation loop; masked matmul split via R
instead of per-gate weight slices.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from wavernn_tpu.ops.rnn import _uniform_init


@dataclass(frozen=True)
class DeepMindWaveRNNConfig:
    hidden_size: int = 896
    quantisation: int = 256

    @property
    def split_size(self) -> int:
        return self.hidden_size // 2


class DeepMindWaveRNN(nn.Module):
    """Coarse/fine dual-softmax WaveRNN (ref: deepmind_version.py:8-86)."""

    cfg: DeepMindWaveRNNConfig

    def setup(self):
        c = self.cfg
        hs = c.hidden_size
        bound = 1.0 / hs ** 0.5
        init = _uniform_init(bound)
        # big recurrent matrix: h (hs) -> 3*hs gates (u, r, e)
        self.R = self.param("R", init, (hs, 3 * hs))
        # input projections: coarse stream sees [c_{t-1}, f_{t-1}];
        # fine stream sees [c_{t-1}, f_{t-1}, c_t]
        self.O1 = self.param("O1", init, (c.split_size, c.split_size))
        self.b_O1 = self.param("b_O1", init, (c.split_size,))
        self.O2 = self.param("O2", init, (c.split_size, c.quantisation))
        self.b_O2 = self.param("b_O2", init, (c.quantisation,))
        self.O3 = self.param("O3", init, (c.split_size, c.split_size))
        self.b_O3 = self.param("b_O3", init, (c.split_size,))
        self.O4 = self.param("O4", init, (c.split_size, c.quantisation))
        self.b_O4 = self.param("b_O4", init, (c.quantisation,))
        self.I_coarse = self.param("I_coarse", init, (2, 3 * c.split_size))
        self.b_I_coarse = self.param("b_I_coarse", init, (3 * c.split_size,))
        self.I_fine = self.param("I_fine", init, (3, 3 * c.split_size))
        self.b_I_fine = self.param("b_I_fine", init, (3 * c.split_size,))
        self.bias_u = self.param("bias_u", init, (c.hidden_size,))
        self.bias_r = self.param("bias_r", init, (c.hidden_size,))
        self.bias_e = self.param("bias_e", init, (c.hidden_size,))

    def cell(self, prev_y: jnp.ndarray, coarse_t: jnp.ndarray, h: jnp.ndarray):
        """One recurrent step.

        prev_y: (B, 2) scaled [c_{t-1}, f_{t-1}];
        coarse_t: (B, 1) scaled current coarse (teacher-forced or sampled);
        h: (B, hidden).  Returns (h', coarse_logits, fine_logits).

        Matches the reference's gate algebra (ref: deepmind_version.py:40-86):
        the coarse half of the gates uses only [c_{t-1}, f_{t-1}]; the fine
        half additionally sees c_t.
        """
        c = self.cfg
        hs, split = c.hidden_size, c.split_size

        R_out = h @ self.R  # (B, 3*hs): [u | r | e]
        R_u, R_r, R_e = R_out[:, :hs], R_out[:, hs:2 * hs], R_out[:, 2 * hs:]

        coarse_in = prev_y @ self.I_coarse + self.b_I_coarse  # (B, 3*split)
        fine_in = (
            jnp.concatenate([prev_y, coarse_t], axis=1) @ self.I_fine
            + self.b_I_fine
        )
        # interleave coarse/fine halves per gate
        def gate_halves(R_g, bias):
            return R_g[:, :split], R_g[:, split:], bias[:split], bias[split:]

        Ru_c, Ru_f, bu_c, bu_f = gate_halves(R_u, self.bias_u)
        Rr_c, Rr_f, br_c, br_f = gate_halves(R_r, self.bias_r)
        Re_c, Re_f, be_c, be_f = gate_halves(R_e, self.bias_e)

        s = split
        u_c = jax.nn.sigmoid(Ru_c + coarse_in[:, :s] + bu_c)
        u_f = jax.nn.sigmoid(Ru_f + fine_in[:, :s] + bu_f)
        r_c = jax.nn.sigmoid(Rr_c + coarse_in[:, s:2 * s] + br_c)
        r_f = jax.nn.sigmoid(Rr_f + fine_in[:, s:2 * s] + br_f)

        h_c, h_f = h[:, :s], h[:, s:]
        e_c = jnp.tanh(r_c * Re_c + coarse_in[:, 2 * s:] + be_c)
        e_f = jnp.tanh(r_f * Re_f + fine_in[:, 2 * s:] + be_f)
        h_c = u_c * h_c + (1.0 - u_c) * e_c
        h_f = u_f * h_f + (1.0 - u_f) * e_f

        out_c = jax.nn.relu(h_c @ self.O1 + self.b_O1) @ self.O2 + self.b_O2
        out_f = jax.nn.relu(h_f @ self.O3 + self.b_O3) @ self.O4 + self.b_O4
        return jnp.concatenate([h_c, h_f], axis=1), out_c, out_f

    def __call__(self, prev_y: jnp.ndarray, coarse_t: jnp.ndarray):
        """Teacher-forced forward over sequences.

        prev_y: (B, T, 2) scaled previous [coarse, fine];
        coarse_t: (B, T, 1) scaled current coarse.
        Returns (coarse_logits (B,T,Q), fine_logits (B,T,Q))."""
        B = prev_y.shape[0]
        h0 = jnp.zeros((B, self.cfg.hidden_size), prev_y.dtype)

        def step(h, inp):
            py, ct = inp
            h, oc, of = self.cell(py, ct, h)
            return h, (oc, of)

        xs = (jnp.swapaxes(prev_y, 0, 1), jnp.swapaxes(coarse_t, 0, 1))
        # params are setup-bound (no lazy creation), so plain lax.scan is safe
        _, (oc, of) = jax.lax.scan(step, h0, xs)
        return jnp.swapaxes(oc, 0, 1), jnp.swapaxes(of, 0, 1)


def generate(model: DeepMindWaveRNN, variables, seq_len: int, key,
             batch: int = 1) -> np.ndarray:
    """Free-running 16-bit generation (ref: deepmind_version.py:88-143).
    Returns float waveform in [-1, 1]."""
    c = model.cfg

    def apply_cell(prev_y, coarse_t, h):
        return model.apply(variables, prev_y, coarse_t, h,
                           method=DeepMindWaveRNN.cell)

    @jax.jit
    def run(key):
        h0 = jnp.zeros((batch, c.hidden_size))
        y0 = jnp.zeros((batch, 2))

        def step(carry, _):
            y_prev, h, key = carry
            key, kc, kf = jax.random.split(key, 3)
            # coarse: condition on previous sample only
            _, out_c, _ = apply_cell(y_prev, jnp.zeros((batch, 1)), h)
            c_cls = jax.random.categorical(kc, out_c, axis=-1)
            c_scaled = c_cls.astype(jnp.float32)[:, None] / 127.5 - 1.0
            # fine: condition on the freshly sampled coarse
            h_new, _, out_f = apply_cell(y_prev, c_scaled, h)
            f_cls = jax.random.categorical(kf, out_f, axis=-1)
            f_scaled = f_cls.astype(jnp.float32)[:, None] / 127.5 - 1.0
            y = jnp.concatenate([c_scaled, f_scaled], axis=1)
            sample = (c_cls * 256 + f_cls).astype(jnp.int32) - 2 ** 15
            return (y, h_new, key), sample

        (_, _, _), samples = jax.lax.scan(step, (y0, h0, key), None,
                                          length=seq_len)
        return samples  # (T, B)

    samples = np.asarray(run(key)).T.astype(np.float64)  # (B, T)
    return (samples[0] / 2 ** 15).astype(np.float32)
