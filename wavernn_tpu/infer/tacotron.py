"""Free-running Tacotron generation (ref Tacotron.generate,
models/tacotron.py:370-430).

The whole text→mel graph — encode, chunked early-exit decode with a
done-mask replacing the reference's Python ``break``, postnet — compiles to
one XLA program per (text-length, r, steps) signature.  The host trims the
output at the first all-silent frame group.

Two decode backends:
  * ``xla`` — the scanned DecoderCell (models/tacotron.py); batch-friendly.
  * ``pallas`` — the fused decoder-step kernel (ops/pallas_tts.py) with all
    decoder weights VMEM-resident; the B=1 latency path on TPU.
``auto`` picks pallas on TPU for single-utterance LSA decoding.
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
                 text_bucket: int = 32, backend: str = "auto",
                 int8_lstm: bool = False, mesh=None, stop_patience: int = 1):
        self.cfg = cfg
        # stop_patience: number of CONSECUTIVE all-silent frame groups
        # required before the decode is declared finished.  1 = the
        # reference's semantics (break at the first silent group,
        # ref: models/tacotron.py:411); larger values keep the decode alive
        # across brief in-utterance energy dips (note/phrase boundaries)
        # and only stop on sustained trailing silence.
        if stop_patience < 1:
            raise ValueError("stop_patience must be >= 1")
        self.stop_patience = int(stop_patience)
        # mesh: a parallel.mesh.MeshPlan — batch() shards the utterance
        # axis over the mesh's 'data' axis (multi-chip batched TTS serving;
        # the analog of the reference's DataParallel engagement,
        # ref: train_tacotron.py:131-132).  None = single device.
        self.mesh = mesh
        # pin checkpoint-loaded (host numpy) weights on device once —
        # numpy inputs to a jitted program re-upload per dispatch (see
        # ops/decode.Generator)
        self.variables = jax.device_put(variables)
        self.model = Tacotron(cfg)
        self.steps = steps
        self.text_bucket = text_bucket
        if backend == "auto":
            backend = (
                "pallas"
                if (jax.devices()[0].platform == "tpu"
                    and cfg.attn_mode == "lsa")
                else "xla"
            )
        if backend not in ("xla", "pallas"):
            raise ValueError(f"unknown TTS decode backend {backend!r}; "
                             "expected 'auto', 'xla', or 'pallas'")
        if backend == "pallas" and cfg.attn_mode != "lsa":
            raise ValueError(
                "the pallas decode backend implements location-sensitive "
                f"attention only (attn_mode='lsa'); got attn_mode="
                f"{cfg.attn_mode!r} — use backend='xla' for additive attention"
            )
        self.backend = backend
        self._run_pallas = (
            _make_pallas_run(cfg, self.model, int8_lstm, self.stop_patience)
            if backend == "pallas" else None
        )

        @partial(jax.jit, static_argnames=("r", "steps"))
        def run(variables, x, r: int, steps: int):
            cfg_ = self.cfg
            model = self.model
            B, L = x.shape
            # early-exit chunking: decode EXIT_CHUNK iters per while-loop
            # trip, stop as soon as every utterance hit the stop threshold —
            # the compute-skipping equivalent of the reference's Python
            # ``break`` (ref: models/tacotron.py:411); the fixed-length scan
            # only masked it.  Shapes stay static: outputs land in
            # preallocated buffers via dynamic_update_slice.
            n_req = steps // r                     # the caller's hard cap
            EXIT_CHUNK = min(50, n_req)
            n_iters = -(-n_req // EXIT_CHUNK) * EXIT_CHUNK
            n_chunks = n_iters // EXIT_CHUNK

            enc, enc_proj = model.apply(
                variables, x, False, method=Tacotron.encode
            )
            carry0 = init_decoder_carry(cfg_, B, L)
            prev0 = jnp.zeros((B, cfg_.n_mels))
            done0 = jnp.zeros((B,), dtype=bool)
            quiet0 = jnp.zeros((B,), dtype=jnp.int32)
            patience = self.stop_patience

            def step(state, t):
                carry, prev, done, quiet = state
                carry, (mels, scores) = model.apply(
                    variables, carry, enc, enc_proj, prev, r,
                    method=Tacotron.decode_step,
                )
                prev = mels[:, :, -1]
                group_quiet = jnp.all(mels < cfg_.stop_threshold, axis=(1, 2))
                quiet = jnp.where(group_quiet, quiet + 1, 0)
                done = done | ((quiet >= patience) & (t * r > 10))
                return (carry, prev, done, quiet), (mels, scores, done)

            mels_buf = jnp.zeros((n_iters, B, cfg_.n_mels, r))
            scores_buf = jnp.zeros((n_iters, B, L))
            done_buf = jnp.zeros((n_iters, B), dtype=bool)

            def trip_cond(st):
                c, state, _ = st
                return (c < n_chunks) & ~jnp.all(state[2])

            def trip_body(st):
                c, state, (mb, sb, db) = st
                ts = c * EXIT_CHUNK + jnp.arange(EXIT_CHUNK)
                state, (m_seq, s_seq, d_seq) = jax.lax.scan(step, state, ts)
                at = c * EXIT_CHUNK
                mb = jax.lax.dynamic_update_slice(mb, m_seq, (at, 0, 0, 0))
                sb = jax.lax.dynamic_update_slice(sb, s_seq, (at, 0, 0))
                db = jax.lax.dynamic_update_slice(db, d_seq, (at, 0))
                return c + 1, state, (mb, sb, db)

            _, _, (mels_seq, scores_seq, done_seq) = jax.lax.while_loop(
                trip_cond, trip_body,
                (jnp.int32(0), (carry0, prev0, done0, quiet0),
                 (mels_buf, scores_buf, done_buf)),
            )
            # enforce the caller's step cap (buffers are chunk-padded)
            mels_seq = mels_seq[:n_req]
            scores_seq = scores_seq[:n_req]
            done_seq = done_seq[:n_req]
            n_iters = n_req
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
        return self.collect(self.submit(x, r, steps))

    def submit(self, x, r: int, steps: int = None):
        """Asynchronously dispatch one utterance's text→mel decode; returns
        a handle for :meth:`collect`.  Submissions queue on the device in
        order (the whole decode is one jitted program), so a caller can
        submit many utterances and overlap device compute with host↔device
        transfer latency — the same pipelined serving path as the vocoder's
        Generator.submit (ops/decode.py)."""
        seq_len = len(x)
        L = ((seq_len + self.text_bucket - 1) // self.text_bucket) * self.text_bucket
        xp = np.zeros((1, L), dtype=np.int32)
        xp[0, :seq_len] = np.asarray(x, dtype=np.int32)
        run = self._run_pallas if self._run_pallas is not None else self._run
        out = run(self.variables, jnp.asarray(xp), r,
                  self._bucket_steps(steps, r))
        return out, r, seq_len

    def collect(self, handle) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Resolve a :meth:`submit` handle to (mel, linear, attn)."""
        (mel, linear, attn, n_valid), r, seq_len = handle
        mel, linear, attn, n_valid = jax.device_get(
            (mel, linear, attn, n_valid))
        n = int(n_valid[0]) * r
        return (mel[0, :n].T, linear[0, :n].T,
                attn[0, : int(n_valid[0]), :seq_len])

    def batch(self, seqs, r: int):
        """Generate MULTIPLE utterances in one decode batch (beyond the
        reference's one-at-a-time generate).  Text is zero-padded to the
        bucketed max length — consistent with training, which attends over
        padded batches the same way (ref: utils/dataset.py:166-190).

        Always uses the XLA scan path (throughput-bound; the pallas kernel
        targets the B=1 latency case).  With a mesh, the utterance axis is
        padded to a multiple of the 'data' axis and sharded over it — the
        SAME jitted program, with XLA partitioning the batch across chips.

        Returns a list of (mel, linear, attn) triples, each trimmed at its
        own stop frame."""
        L = max(len(s) for s in seqs)
        L = ((L + self.text_bucket - 1) // self.text_bucket) * self.text_bucket
        B = len(seqs)
        B_pad = B
        if self.mesh is not None:
            n_data = self.mesh.n_data
            B_pad = ((B + n_data - 1) // n_data) * n_data
        x = np.zeros((B_pad, L), dtype=np.int32)
        for i, s in enumerate(seqs):
            x[i, : len(s)] = s
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            xd = jax.device_put(
                x, NamedSharding(self.mesh.mesh, P("data", None)))
        else:
            xd = jnp.asarray(x)
        mel, linear, attn, n_valid = jax.device_get(self._run(
            self.variables, xd, r, self._bucket_steps(None, r)
        ))
        out = []
        for i, s in enumerate(seqs):
            n = int(n_valid[i]) * r
            out.append((
                mel[i, :n].T,
                linear[i, :n].T,
                attn[i, : int(n_valid[i]), : len(s)],
            ))
        return out


def _make_pallas_run(cfg: TacotronConfig, model: Tacotron,
                     int8_lstm: bool = False, stop_patience: int = 1):
    """Jitted single-utterance decode over the fused Pallas decoder kernel
    (ops/pallas_tts.py).  Same early-exit while_loop structure as the XLA
    path; each trip launches one CHUNK-step kernel."""
    from wavernn_tpu.ops.pallas_tts import (
        LANE,
        attn_pad_len,
        extract_tts_decode_weights,
        init_tts_decode_state,
        pack_tts_weights,
        tts_decode_chunk,
    )

    CHUNK = 48

    @partial(jax.jit, static_argnames=("r", "steps"))
    def run(variables, x, r: int, steps: int):
        B, L = x.shape
        assert B == 1, "pallas decode backend is single-utterance"
        n_req = steps // r
        n_iters = -(-n_req // CHUNK) * CHUNK
        n_chunks = n_iters // CHUNK

        enc, encp = model.apply(variables, x, False, method=Tacotron.encode)
        L_pad = attn_pad_len(L)
        enc_pad = jnp.pad(enc[0], ((0, L_pad - L), (0, 0)))
        encp_T = jnp.pad(encp[0].T, ((0, 0), (0, L_pad - L)))
        w = extract_tts_decode_weights(variables["params"])
        packed = pack_tts_weights(w, r, cfg.n_mels, int8_lstm=int8_lstm)
        state0 = init_tts_decode_state(cfg.decoder_dims, cfg.lstm_dims, L_pad)

        mels_buf = jnp.zeros((n_iters, r * LANE))
        scores_buf = jnp.zeros((n_iters, L_pad))
        done_buf = jnp.zeros((n_iters,), bool)

        def trip_cond(st):
            c, _, done, _, _ = st
            return (c < n_chunks) & ~done

        def trip_body(st):
            c, state, done, quiet, (mb, sb, db) = st
            mels_c, scores_c, stop_c, state = tts_decode_chunk(
                packed, enc_pad, encp_T, state, CHUNK, r, cfg.n_mels, L,
                int8_lstm=int8_lstm,
            )
            ts = c * CHUNK + jnp.arange(CHUNK)
            raw = (stop_c < cfg.stop_threshold) & (ts * r > 10)
            # consecutive-quiet run length, threaded across chunk boundaries
            # (stop only after stop_patience consecutive silent groups)
            def consec(q, r_t):
                q = jnp.where(r_t, q + 1, 0)
                return q, q
            quiet, q_seq = jax.lax.scan(consec, quiet, raw)
            hit = q_seq >= stop_patience
            done_seq = done | (jnp.cumsum(hit.astype(jnp.int32)) > 0)
            at = c * CHUNK
            mb = jax.lax.dynamic_update_slice(mb, mels_c, (at, 0))
            sb = jax.lax.dynamic_update_slice(sb, scores_c, (at, 0))
            db = jax.lax.dynamic_update_slice(db, done_seq, (at,))
            return c + 1, state, done_seq[-1], quiet, (mb, sb, db)

        _, _, _, _, (mels_seq, scores_seq, done_seq) = jax.lax.while_loop(
            trip_cond, trip_body,
            (jnp.int32(0), state0, jnp.bool_(False), jnp.int32(0),
             (mels_buf, scores_buf, done_buf)),
        )
        mels_seq = mels_seq[:n_req]
        scores_seq = scores_seq[:n_req]
        done_seq = done_seq[:n_req]
        # kernel rows: frame j of each step in lanes [j*LANE, j*LANE+n_mels)
        mel_outputs = (
            mels_seq.reshape(n_req, r, LANE)[:, :, : cfg.n_mels]
            .reshape(1, n_req * r, cfg.n_mels)
        )
        linear = model.apply(
            variables, mel_outputs, False, method=Tacotron.postnet_forward
        )
        attn = scores_seq[None, :, :L]          # (1, T/r, L)
        done_bt = done_seq[None]
        n_valid = jnp.where(
            jnp.any(done_bt, axis=1), jnp.argmax(done_bt, axis=1) + 1, n_req
        )
        return mel_outputs, linear, attn, n_valid

    return run
