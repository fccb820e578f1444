"""Free-running Tacotron generation (ref Tacotron.generate,
models/tacotron.py:370-430).

The whole text→mel graph — encode, fixed-length decode scan with a done-mask
replacing the reference's Python ``break``, postnet — compiles to one XLA
program per (text-length, r, steps) signature.  The host trims the output at
the first all-silent frame group.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wavernn_tpu.models.tacotron import Tacotron, TacotronConfig, init_decoder_carry


class TTSGenerator:
    """Jitted text → (mel, linear, attention) generator."""

    def __init__(self, cfg: TacotronConfig, variables, steps: int = 2000,
                 text_bucket: int = 32):
        self.cfg = cfg
        self.variables = variables
        self.model = Tacotron(cfg)
        self.steps = steps
        self.text_bucket = text_bucket

        @partial(jax.jit, static_argnames=("r", "steps"))
        def run(variables, x, r: int, steps: int):
            cfg_ = self.cfg
            model = self.model
            B, L = x.shape
            n_iters = steps // r

            enc, enc_proj = model.apply(
                variables, x, False, method=Tacotron.encode
            )
            carry0 = init_decoder_carry(cfg_, B, L)
            prev0 = jnp.zeros((B, cfg_.n_mels))
            done0 = jnp.zeros((B,), dtype=bool)

            def step(state, t):
                carry, prev, done = state
                carry, (mels, scores) = model.apply(
                    variables, carry, enc, enc_proj, prev, r,
                    method=Tacotron.decode_step,
                )
                prev = mels[:, :, -1]
                group_done = jnp.all(mels < cfg_.stop_threshold, axis=(1, 2))
                done = done | (group_done & (t * r > 10))
                return (carry, prev, done), (mels, scores, done)

            _, (mels_seq, scores_seq, done_seq) = jax.lax.scan(
                step, (carry0, prev0, done0), jnp.arange(n_iters)
            )
            # (T/r, B, n_mels, r) → (B, steps, n_mels)
            mel_outputs = jnp.transpose(mels_seq, (1, 0, 3, 2)).reshape(
                B, n_iters * r, cfg_.n_mels
            )
            linear = self.model.apply(
                variables, mel_outputs, False, method=Tacotron.postnet_forward
            )
            attn = jnp.swapaxes(scores_seq, 0, 1)  # (B, T/r, L)
            done_bt = jnp.swapaxes(done_seq, 0, 1)  # (B, T/r)
            n_valid = jnp.where(
                jnp.any(done_bt, axis=1),
                jnp.argmax(done_bt, axis=1) + 1,
                n_iters,
            )
            return mel_outputs, linear, attn, n_valid

        self._run = run

    def _bucket_steps(self, steps, r: int) -> int:
        steps = self.steps if steps is None else steps
        return ((steps + r - 1) // r) * r

    def __call__(self, x, r: int,
                 steps: int = None) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """x: 1-D int sequence of symbol ids.
        Returns (mel (n_mels, T), linear (fft_bins, T), attn (T/r, L)).

        Text is zero-padded up to a length bucket so varying sentence lengths
        reuse a small set of compiled programs (consistent with training,
        which attends over padded batches)."""
        seq_len = len(x)
        L = ((seq_len + self.text_bucket - 1) // self.text_bucket) * self.text_bucket
        xp = np.zeros((1, L), dtype=np.int32)
        xp[0, :seq_len] = np.asarray(x, dtype=np.int32)
        mel, linear, attn, n_valid = self._run(
            self.variables, jnp.asarray(xp), r, self._bucket_steps(steps, r)
        )
        n = int(n_valid[0]) * r
        mel = np.asarray(mel)[0, :n].T           # (n_mels, T)
        linear = np.asarray(linear)[0, :n].T     # (fft_bins, T)
        attn = np.asarray(attn)[0, : int(n_valid[0]), :seq_len]  # (T/r, L)
        return mel, linear, attn

    def batch(self, seqs, r: int):
        """Generate MULTIPLE utterances in one decode batch (beyond the
        reference's one-at-a-time generate).  Text is zero-padded to the
        bucketed max length — consistent with training, which attends over
        padded batches the same way (ref: utils/dataset.py:166-190).

        Returns a list of (mel, linear, attn) triples, each trimmed at its
        own stop frame."""
        L = max(len(s) for s in seqs)
        L = ((L + self.text_bucket - 1) // self.text_bucket) * self.text_bucket
        x = np.zeros((len(seqs), L), dtype=np.int32)
        for i, s in enumerate(seqs):
            x[i, : len(s)] = s
        mel, linear, attn, n_valid = self._run(
            self.variables, jnp.asarray(x), r, self._bucket_steps(None, r)
        )
        mel, linear, attn = np.asarray(mel), np.asarray(linear), np.asarray(attn)
        out = []
        for i, s in enumerate(seqs):
            n = int(n_valid[i]) * r
            out.append((
                mel[i, :n].T,
                linear[i, :n].T,
                attn[i, : int(n_valid[i]), : len(s)],
            ))
        return out
