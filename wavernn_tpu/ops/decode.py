"""Autoregressive WaveRNN decode runtime (scan implementation).

TPU-native replacement for the reference's per-sample Python loop over cuDNN
GRUCells (ref: models/fatchord_version.py:169-264): the whole sample loop is
one ``lax.scan`` compiled under jit — no per-step dispatch, on-device
sampling with threaded PRNG keys (SURVEY.md C22/C24).

Shape bucketing pads mel frames / fold counts up to coarse buckets so
arbitrary utterance lengths reuse a small set of compiled programs.

The fused Pallas kernel (ops/pallas_decode.py) implements the same step
function with weights pinned in VMEM; this module is the portable reference
implementation and the fallback on CPU.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
from wavernn_tpu.ops import fold as fold_ops
from wavernn_tpu.ops import mol as mol_ops
from wavernn_tpu.ops.rnn import gru_cell_step


@dataclass
class DecodeWeights:
    """Raw weight arrays of the sample-loop network, extracted from the flax
    param pytree (the analog of the reference's GRU→GRUCell transplant,
    ref: models/fatchord_version.py:273-279)."""

    I_w: jnp.ndarray
    I_b: jnp.ndarray
    gru1_w_ih: jnp.ndarray
    gru1_w_hh: jnp.ndarray
    gru1_b_ih: jnp.ndarray
    gru1_b_hh: jnp.ndarray
    gru2_w_ih: jnp.ndarray
    gru2_w_hh: jnp.ndarray
    gru2_b_ih: jnp.ndarray
    gru2_b_hh: jnp.ndarray
    fc1_w: jnp.ndarray
    fc1_b: jnp.ndarray
    fc2_w: jnp.ndarray
    fc2_b: jnp.ndarray
    fc3_w: jnp.ndarray
    fc3_b: jnp.ndarray


def extract_decode_weights(params) -> DecodeWeights:
    def gru(name):
        cell = params[name]["cell"]
        return cell["w_ih"], cell["w_hh"], cell["b_ih"], cell["b_hh"]

    g1 = gru("rnn1")
    g2 = gru("rnn2")
    return DecodeWeights(
        I_w=params["I"]["kernel"], I_b=params["I"]["bias"],
        gru1_w_ih=g1[0], gru1_w_hh=g1[1], gru1_b_ih=g1[2], gru1_b_hh=g1[3],
        gru2_w_ih=g2[0], gru2_w_hh=g2[1], gru2_b_ih=g2[2], gru2_b_hh=g2[3],
        fc1_w=params["fc1"]["kernel"], fc1_b=params["fc1"]["bias"],
        fc2_w=params["fc2"]["kernel"], fc2_b=params["fc2"]["bias"],
        fc3_w=params["fc3"]["kernel"], fc3_b=params["fc3"]["bias"],
    )


jax.tree_util.register_pytree_node(
    DecodeWeights,
    lambda w: (tuple(getattr(w, f) for f in w.__dataclass_fields__), None),
    lambda _, leaves: DecodeWeights(*leaves),
)


def decode_step(w: DecodeWeights, x, h1, h2, m_t, a1_t, a2_t, a3_t, a4_t):
    """One sample step: (B,1) sample + conditioning → logits, new state.

    Mirrors the reference inner loop (ref: fatchord_version.py:201-223) with
    the hoistable conditioning concatenations kept per-step for clarity; the
    Pallas kernel hoists them.
    """
    inp = jnp.concatenate([x, m_t, a1_t], axis=-1)
    xi = inp @ w.I_w + w.I_b
    h1 = gru_cell_step(xi, h1, w.gru1_w_ih, w.gru1_w_hh, w.gru1_b_ih, w.gru1_b_hh)
    x = xi + h1
    inp2 = jnp.concatenate([x, a2_t], axis=-1)
    h2 = gru_cell_step(inp2, h2, w.gru2_w_ih, w.gru2_w_hh, w.gru2_b_ih, w.gru2_b_hh)
    x = x + h2
    x = jax.nn.relu(jnp.concatenate([x, a3_t], axis=-1) @ w.fc1_w + w.fc1_b)
    x = jax.nn.relu(jnp.concatenate([x, a4_t], axis=-1) @ w.fc2_w + w.fc2_b)
    logits = x @ w.fc3_w + w.fc3_b
    return logits, h1, h2


@partial(jax.jit, static_argnames=("mode", "n_classes", "deterministic"))
def decode_scan(
    weights: DecodeWeights,
    mels_up: jnp.ndarray,   # (B, T, feat)
    aux: jnp.ndarray,       # (B, T, 4*aux_dims)
    key: jax.Array,
    mode: str,
    n_classes: int,
    deterministic: bool = False,
) -> jnp.ndarray:
    """Run the full autoregressive sample loop; returns (B, T) float samples."""
    B, T, _ = mels_up.shape
    rnn_dims = weights.gru1_w_hh.shape[0]
    d = aux.shape[-1] // 4

    # time-major for scan
    mels_t = jnp.swapaxes(mels_up, 0, 1)
    aux_t = jnp.swapaxes(aux, 0, 1)

    def step(carry, inputs):
        x, h1, h2, key = carry
        m_t, a_t = inputs
        key, sub = jax.random.split(key)
        logits, h1, h2 = decode_step(
            weights, x, h1, h2, m_t,
            a_t[..., 0 * d:1 * d], a_t[..., 1 * d:2 * d],
            a_t[..., 2 * d:3 * d], a_t[..., 3 * d:4 * d],
        )
        if mode == "MOL":
            if deterministic:
                nm = logits.shape[-1] // 3
                sel = jnp.argmax(logits[..., :nm], axis=-1)
                onehot = jax.nn.one_hot(sel, nm, dtype=logits.dtype)
                sample = jnp.sum(logits[..., nm:2 * nm] * onehot, axis=-1)
                sample = jnp.clip(sample, -1.0, 1.0)
            else:
                sample = mol_ops.sample_from_discretized_mix_logistic(sub, logits)
        elif mode == "RAW":
            if deterministic:
                cls = jnp.argmax(logits, axis=-1)
            else:
                cls = jax.random.categorical(sub, logits, axis=-1)
            sample = 2.0 * cls.astype(jnp.float32) / (n_classes - 1.0) - 1.0
        else:
            raise ValueError(f"Unknown mode {mode}")
        return (sample[:, None], h1, h2, key), sample

    x0 = jnp.zeros((B, 1), dtype=jnp.float32)
    h0 = jnp.zeros((B, rnn_dims), dtype=jnp.float32)
    (_, _, _, _), samples = jax.lax.scan(
        step, (x0, h0, h0, key), (mels_t, aux_t)
    )
    return jnp.swapaxes(samples, 0, 1)  # (B, T)


FF_CAL_STEPS = 4096     # calibration decode length (one compiled shape)
FF_CAL_MARGIN = 1.3     # headroom over the observed activation |max|
# adaptive int8_ff crossover: per-grid-program fold widths at or above this
# measured faster with int8 feed-forward streams (-1..-3% us/step at 64/80,
# -5..-9% at 96..128), below it a wash (48) or slower (16) — round-5
# interleaved A/B, tools/step_opt_probe.py --ab
FF_AUTO_MIN_KERNEL_B = 64


@partial(jax.jit, static_argnames=("mode", "n_classes"))
def ff_ranges(weights: DecodeWeights, rows: jnp.ndarray, key: jax.Array,
              mode: str, n_classes: int) -> jnp.ndarray:
    """Calibrate the Pallas kernel's int8_ff activation bounds.

    Runs a stochastic B=1 decode over ``rows`` — (N, SEG) packed
    conditioning in the kernel's lane layout (pallas_decode.pack_stream:
    seg0 = [mel|a1|0], seg1 = [a2|a3|a4|0]) — and returns the running
    |max| of the three activations the kernel quantizes at a fixed scale:
    [gru2 input (xi+h1), fc1 input (xi+h1+h2), fc2 input relu(fc1)].
    The kernel CLIPS at the calibrated bound, so rare outliers past the
    margin saturate instead of wrapping.
    """
    from wavernn_tpu.ops.pallas_decode import LANE

    H = weights.gru1_w_hh.shape[0]
    d = weights.fc1_w.shape[0] - H
    feat = weights.I_w.shape[0] - 1 - d
    n = rows.shape[0]
    steps = min(n, FF_CAL_STEPS)
    rows = rows[:steps].astype(jnp.float32)

    def step(carry, inputs):
        x, h1, h2, mx = carry
        c, sub = inputs
        m_t = c[None, :feat]
        a1 = c[None, feat:feat + d]
        s1 = c[LANE:]
        a2, a3, a4 = (s1[None, :d], s1[None, d:2 * d], s1[None, 2 * d:3 * d])
        inp = jnp.concatenate([x, m_t, a1], axis=-1)
        xi = inp @ weights.I_w + weights.I_b
        h1 = gru_cell_step(xi, h1, weights.gru1_w_ih, weights.gru1_w_hh,
                           weights.gru1_b_ih, weights.gru1_b_hh)
        xr = xi + h1
        h2 = gru_cell_step(jnp.concatenate([xr, a2], axis=-1), h2,
                           weights.gru2_w_ih, weights.gru2_w_hh,
                           weights.gru2_b_ih, weights.gru2_b_hh)
        xr2 = xr + h2
        f1 = jax.nn.relu(
            jnp.concatenate([xr2, a3], axis=-1) @ weights.fc1_w
            + weights.fc1_b)
        f2 = jax.nn.relu(
            jnp.concatenate([f1, a4], axis=-1) @ weights.fc2_w
            + weights.fc2_b)
        logits = f2 @ weights.fc3_w + weights.fc3_b
        if mode == "MOL":
            sample = mol_ops.sample_from_discretized_mix_logistic(sub, logits)
        else:
            cls = jax.random.categorical(sub, logits, axis=-1)
            sample = 2.0 * cls.astype(jnp.float32) / (n_classes - 1.0) - 1.0
        mx = jnp.maximum(mx, jnp.stack([
            jnp.max(jnp.abs(xr)), jnp.max(jnp.abs(xr2)), jnp.max(f1)]))
        return (sample[:, None], h1, h2, mx), None

    x0 = jnp.zeros((1, 1), jnp.float32)
    h0 = jnp.zeros((1, H), jnp.float32)
    keys = jax.random.split(key, steps)
    (_, _, _, mx), _ = jax.lax.scan(
        step, (x0, h0, h0, jnp.zeros((3,), jnp.float32)), (rows, keys))
    return jnp.maximum(mx * FF_CAL_MARGIN, 1e-3)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fold_spans(needed: int, group: int, first_group: int = None):
    """Fold-group spans for streaming decode: ``first_group`` (when set and
    smaller than ``group``) carves a small leading group so the first audio
    chunk arrives after decoding only a few folds — time-to-first-chunk
    scales with the first group's width, steady-state rate with ``group``.
    Shared by :meth:`Generator.stream` and :meth:`Generator.stream_oneshot`
    so the parity oracle covers the ramped schedule too."""
    spans, g0 = [], 0
    if first_group and first_group < min(group, needed):
        spans.append((0, first_group))
        g0 = first_group
    while g0 < needed:
        g1 = min(g0 + group, needed)
        spans.append((g0, g1))
        g0 = g1
    return spans


class Prestaged(NamedTuple):
    """A :meth:`Generator.prestage` result: one utterance's padded mel
    pinned on device plus the fold geometry it was staged for.  A typed
    handle (not a bare tuple) so :meth:`Generator.submit` can't misparse a
    caller's raw arrays as a staged handle, and so submitting with a
    DIFFERENT target/overlap than the staging geometry raises instead of
    silently decoding with stale fold counts (ADVICE r4)."""

    mels_dev: object
    num_folds: int
    wave_len: int
    batched: bool
    target: int
    overlap: int


class PrestagedBatch(NamedTuple):
    """A :meth:`Generator.prestage_batch` result (see :class:`Prestaged`)."""

    batch_dev: object
    wave_lens_dev: object
    metas: list
    t_buckets: tuple
    fold_counts: tuple
    target: int
    overlap: int


@dataclass
class StreamSession:
    """Per-utterance streaming decode state (Generator.open_stream_session).

    Holds the prepared conditioning front-end for one utterance so fold rows
    can be decoded in any grouping — by the utterance's own stream()
    (consecutive groups) or multiplexed with OTHER sessions' rows into one
    kernel launch (infer/stream_server.py).
    """

    needed_folds: int   # real folds to decode (padding-only folds skipped)
    stride: int         # fold k's conditioning starts at row k*stride
    fold_T: int         # decode steps per fold = target + 2*overlap
    wave_len: int       # true output sample count
    # pallas front-end: ONE packed (pad_to, SEG) bf16 conditioning stream;
    # fold rows are gathered from it by start offset
    packed: object = None
    T_pad: int = 0      # kernel conditioning window (fold_T chunk-aligned)
    # scan front-end: folded sample-rate conditioning, host-resident so a
    # server can slice rows without device round-trips
    mels_f: object = None
    aux_f: object = None


class _IncrementalUnfold:
    """Incremental crossfade finalization for one streaming session.

    Fold k-1 is the only earlier fold whose tail overlaps positions at or
    beyond fold k's seam, so one raw fold of left context is all the state
    required: each ``feed`` finalizes its rows plus that context in O(rows)
    with fixed-shape programs, and emits exactly the samples that have
    become final (every overlapping fold decoded).  Shared by
    Generator.stream and the multi-session StreamServer.

    ``feed`` splits into :meth:`feed_async` (dispatch the finalize program
    and advance the session cursor) and :meth:`collect` (drain it) so
    pipelined callers can queue the NEXT decode launch before blocking on
    this group's finalize — the device never idles on host round-trips.

    When the owning Generator serves ``output_dtype='int16'``, chunks come
    back as device-quantized 16-bit PCM: the crossfade unfold, the GLOBAL
    tail-fade envelope slice, and the quantization all run in the finalize
    program, so the host ships half the bytes and does no math.
    """

    def __init__(self, gen: "Generator", needed_folds: int, stride: int,
                 wave_len: int, overlap: int, mu_law: bool):
        self.gen = gen
        self.needed_folds = needed_folds
        self.stride = stride
        self.wave_len = wave_len
        self.overlap = overlap
        self.mu_law = mu_law
        self.g_done = 0        # folds fed so far
        self.emitted = 0       # samples emitted so far
        self._prev_fold = None  # raw samples of the last fold fed
        self.packed = gen.packed_output  # int16 PCM / mulaw8 wire bytes
        # Tail fade in GLOBAL waveform coordinates: the one-shot path fades
        # the last min(20*hop, wave_len) samples of the whole waveform, so
        # any chunk overlapping that window applies its slice of the same
        # envelope — chunk boundaries (group size, server scheduling) cannot
        # change the audio (stream ≡ stream_oneshot exactly).  The envelope
        # is built once per session, not per feed.
        self._fade = min(20 * gen.cfg.hop_length, wave_len)
        self._env = None

    @property
    def done(self) -> bool:
        return self.emitted >= self.wave_len

    def feed(self, samples: np.ndarray) -> np.ndarray:
        """Finalize raw fold rows for folds [g_done, g_done+len(samples));
        return the newly-final audio chunk (possibly empty)."""
        return self.collect(self.feed_async(samples))

    def feed_async(self, samples: np.ndarray):
        """Dispatch the finalize program for these fold rows (plus an async
        device→host copy of its result) and advance the session cursor;
        returns a token for :meth:`collect`."""
        gen, g0 = self.gen, self.g_done
        g1 = g0 + samples.shape[0]
        if self._prev_fold is None:
            window, base = samples, 0
        else:
            window = np.concatenate([self._prev_fold[None], samples], axis=0)
            base = (g0 - 1) * self.stride
        n_win = window.shape[0]
        n_win_pad = _round_up(n_win, gen.fold_bucket)
        window_p = np.pad(window, ((0, n_win_pad - n_win), (0, 0)))
        if self.packed:
            dev = gen._finalize_pcm16(
                jnp.asarray(window_p), jnp.asarray(n_win, jnp.int32),
                jnp.asarray(base, jnp.int32),
                jnp.asarray(self.wave_len, jnp.int32),
                mu_law=self.mu_law, overlap=self.overlap,
                n_classes=gen.cfg.n_classes,
            )
        else:
            dev = gen._finalize(
                jnp.asarray(window_p), jnp.asarray(n_win, jnp.int32),
                mu_law=self.mu_law, batched=True, overlap=self.overlap,
                n_classes=gen.cfg.n_classes,
            )
        dev.copy_to_host_async()
        self._prev_fold = samples[-1]
        final_upto = self.wave_len if g1 >= self.needed_folds else min(
            self.wave_len, g1 * self.stride
        )
        token = (dev, base, self.emitted, final_upto)
        self.emitted = final_upto
        self.g_done = g1
        return token

    def feed_async_dev(self, rows_dev, n: int, offset: int = 0):
        """Like :meth:`feed_async`, but over DEVICE-RESIDENT decode rows
        (``n`` rows at row ``offset`` of ``rows_dev``): the crossfade
        window is assembled on device from the device-held previous-fold
        carry, so raw rows never transfer to the host — only the finished
        chunk does.  The math is bit-identical to the host path (same
        finalize program on the same f32 values; a host round trip
        preserves bits).  ``offset`` is traced, so a multi-session server
        feeding slices of one co-batched launch reuses one program."""
        gen, g0 = self.gen, self.g_done
        g1 = g0 + n
        has_prev = self._prev_fold is not None
        base = (g0 - 1) * self.stride if has_prev else 0
        n_win = n + (1 if has_prev else 0)
        dev, last = gen._finalize_stream_dev(
            rows_dev, jnp.asarray(offset, jnp.int32),
            self._prev_fold if has_prev else rows_dev[0],
            jnp.asarray(base, jnp.int32),
            jnp.asarray(self.wave_len, jnp.int32),
            n=n, n_win_pad=_round_up(n_win, gen.fold_bucket),
            has_prev=has_prev, mu_law=self.mu_law, overlap=self.overlap,
            n_classes=gen.cfg.n_classes, pcm=self.packed,
        )
        dev.copy_to_host_async()
        self._prev_fold = last  # device-resident carry
        final_upto = self.wave_len if g1 >= self.needed_folds else min(
            self.wave_len, g1 * self.stride
        )
        token = (dev, base, self.emitted, final_upto)
        self.emitted = final_upto
        self.g_done = g1
        return token

    def collect(self, token) -> np.ndarray:
        """Drain a :meth:`feed_async` token to the newly-final audio chunk
        (possibly empty): packed tokens (int16/mulaw8) are already faded/
        quantized on device; float tokens get the host-side envelope
        slice."""
        dev, base, emitted, final_upto = token
        if self.packed:
            return np.asarray(dev)[emitted - base: final_upto - base]
        unfolded = np.asarray(dev, dtype=np.float64)
        chunk = unfolded[emitted - base: final_upto - base]
        fade = self._fade
        fade_start = self.wave_len - fade
        if fade and final_upto > fade_start:
            chunk = chunk.copy()
            a = max(emitted, fade_start)
            if self._env is None:
                self._env = np.linspace(1, 0, fade)
            chunk[a - emitted:] *= self._env[a - fade_start:
                                             final_upto - fade_start]
        return chunk


class Generator:
    """End-to-end mel → waveform generation (ref WaveRNN.generate,
    models/fatchord_version.py:169-264).

    Owns the jitted upsample/decode programs; shape-buckets inputs to bound
    recompilation.  ``backend='scan'`` uses the portable lax.scan decoder;
    ``backend='pallas'`` uses the fused VMEM-resident TPU kernel.
    """

    def __init__(self, cfg: WaveRNNConfig, variables, backend: str = "scan",
                 fold_bucket: int = 4, frame_bucket: int = 32,
                 int8_gates: bool = False, mesh=None,
                 deterministic: bool = False,
                 output_dtype: str = "float64",
                 int8_hh: bool = None,
                 int8_ff: bool = None,
                 input_dtype: str = "float32"):
        self.cfg = cfg
        # checkpoint loaders hand back HOST numpy pytrees; pin them on
        # device ONCE — numpy weights passed to a jitted program re-upload
        # the full model (~17 MB) on EVERY dispatch (measured 8x serving
        # throughput collapse over the relay)
        self.variables = jax.device_put(variables)
        self.model = WaveRNN(cfg)
        self.backend = backend
        # pallas only: stream the big GRU/FC matrices as int8.  Default
        # OFF since round 3: clean pipelined timing (tools/step_opt_probe.py)
        # shows int8 SLOWER than bf16 at every production fold width (4.16
        # vs 3.61 us/step at 48 folds, 2.94 vs 2.61 at 16) — the per-row
        # dynamic activation-quantization chain costs more than the byte
        # savings; round 2's adoption was based on relay-noisy single-
        # dispatch A/Bs.  Kept as an opt-in for future hardware/width
        # regimes; see pallas_decode.pack_weights.
        self.int8_gates = int8_gates
        # pallas only: stream the two big recurrent matrices as int8 with a
        # FIXED state-quantization scale (h bounded in [-1,1] by GRU
        # construction, so none of full int8's dynamic-quant chain).
        # Default ON since round 4: interleaved A/B ~ -4% us/step at 48
        # folds; trained-weights MCD delta within the scan seed spread
        # (docs/ROADMAP.md round-4 kernel section).
        self.int8_hh = ((not int8_gates) if int8_hh is None
                        else (int8_hh and not int8_gates))
        # pallas only: stream the three serial feed-forward matrices
        # (gru2 w_ih, fc1, fc2 — ~2.6 MB/step of bf16) as int8 with FIXED
        # activation scales calibrated once per Generator on the first
        # utterance's conditioning (ff_ranges; the kernel clips outliers at
        # the 1.3x margin).  Default None = ADAPTIVE: on only for kernel
        # fold widths >= FF_AUTO_MIN_KERNEL_B, where the byte savings beat
        # the serial quant chain (round-5 interleaved A/B: +1..2% us/step
        # at width 16, wash at 48, -1..-3% at 64/80, -5..-9% at 96..128;
        # trained-weights MCD indistinguishable from bf16 —
        # docs/ROADMAP.md round 5).  True/False force it globally.
        self.int8_ff = ("auto" if int8_ff is None else bool(int8_ff))
        if int8_gates:
            self.int8_ff = False
        self._ff_scales = None  # lazily calibrated (3,) f32 device array
        # mesh: a parallel.mesh.MeshPlan — batched decode shards the fold
        # axis over the mesh's 'data' axis (sequence-parallel generation:
        # folds of one utterance decode on different chips, SURVEY.md §5;
        # the reference only folds intra-device).  None = single device.
        self.mesh = mesh
        # deterministic=True replaces sampling with argmax (RAW) / mixture-
        # mode (MOL) draws — reproducible decode for tests and debugging.
        self.deterministic = deterministic
        # output_dtype='int16' delivers 16-bit PCM (the WAV payload format)
        # with the tail fade applied ON DEVICE: collect() then ships half
        # the bytes of float32 and does no host-side math — the production
        # serving path on a bandwidth-limited host link.
        # output_dtype='mulaw8' delivers 8-bit mu-law companded bytes
        # (G.711-style; mu=256, same label convention as
        # dsp.audio.encode_mu_law, so dsp.audio.decode_mu_law(y, 256)
        # recovers float audio) — HALF int16's egress bytes again.  For a
        # mu-law-native RAW model this re-expresses the model's own output
        # domain one bit narrower; copy-synthesis MCD impact is measured in
        # the bench (docs/ROADMAP.md round 5).
        if output_dtype not in ("float64", "float32", "int16", "mulaw8"):
            raise ValueError(f"unsupported output_dtype {output_dtype!r}")
        self.output_dtype = output_dtype
        # packed egress = fade + quantization happen on device; the host
        # ships the wire bytes verbatim
        self.packed_output = output_dtype in ("int16", "mulaw8")
        self.output_np_dtype = (np.int16 if output_dtype == "int16"
                                else np.uint8 if output_dtype == "mulaw8"
                                else np.dtype(output_dtype))
        # input_dtype='float16'/'bfloat16': LEAN INGRESS — staged mels cross
        # the host link at half the f32 bytes and are cast back to f32 on
        # device before the upsample convs (numerics of everything after
        # ingress unchanged).  Mels are [0,1]-normalized, so f16's 10
        # mantissa bits hold ~3 decimal digits of the feature — measured
        # copy-synthesis MCD impact within the scan seed spread
        # (docs/ROADMAP.md round 5).  The production serving config on a
        # bandwidth-limited link (bench.py) pairs this with int16 egress.
        # input_dtype='uint8': MIN-BYTES INGRESS — the [0,1] mel is
        # quantized to 8-bit steps on the host (round(m*255)) and
        # dequantized to f32 on device; quarter the f32 upload bytes.  One
        # step = 1/255 of the normalized range = ~0.4 dB of the 100 dB mel
        # scale per bin — a bandwidth knob like output_dtype='mulaw8',
        # measured in tools/wire_format_probe.py before trusting.
        if input_dtype not in ("float32", "float16", "bfloat16", "uint8"):
            raise ValueError(f"unsupported input_dtype {input_dtype!r}")
        self.input_dtype = input_dtype
        self._input_np_dtype = (jnp.bfloat16 if input_dtype == "bfloat16"
                                else np.dtype(input_dtype))
        self.fold_bucket = fold_bucket
        self.frame_bucket = frame_bucket
        self._upsample = jax.jit(
            lambda v, m: self.model.apply(v, m, False, method=WaveRNN.upsample_only)
        )
        self.weights = extract_decode_weights(self.variables["params"])

        @partial(jax.jit, static_argnames=("mu_law", "batched", "overlap",
                                           "n_classes"))
        def finalize(samples, num_folds, *, mu_law: bool, batched: bool,
                     overlap: int, n_classes: int):
            """On-device post-processing: mu-law expand + masked crossfade
            unfold.  Garbage bucket-padding folds are zeroed via the
            num_folds mask so the output shape stays bucket-static."""
            y = samples.astype(jnp.float32)
            if mu_law:
                mu = n_classes - 1
                y = jnp.sign(y) / mu * ((1 + mu) ** jnp.abs(y) - 1)
            if batched:
                mask = (jnp.arange(y.shape[0]) < num_folds)[:, None]
                y = y * mask
                return fold_ops.xfade_and_unfold(y, overlap)
            return y[0]

        self._finalize = finalize

        fade = 20 * cfg.hop_length

        def pack_wire(y):
            """Faded float samples → wire dtype: 16-bit PCM or 8-bit mu-law
            labels (mu=256, dsp.audio.encode_mu_law convention)."""
            if self.output_dtype == "mulaw8":
                # sign(y)*log1p(255|y|)/log(256) in [-1,1], then the same
                # floor(+0.5) label quantizer as dsp.audio.encode_mu_law
                fx = jnp.sign(y) * jnp.log1p(
                    255.0 * jnp.clip(jnp.abs(y), 0.0, 1.0)) / np.log(256.0)
                return jnp.clip(
                    jnp.floor((fx + 1.0) / 2.0 * 255.0 + 0.5), 0.0, 255.0
                ).astype(jnp.uint8)
            # clip AFTER scaling, exactly as dsp/wavio.save_wav quantizes
            # (so -32768 stays reachable for inputs below -1.0)
            return jnp.round(
                jnp.clip(y * 32767.0, -32768.0, 32767.0)
            ).astype(jnp.int16)

        def maybe_pcm16(y, wave_len):
            """Device-side tail fade + wire quantization (the exact
            host-side fade of collect(), moved in-graph) when the Generator
            serves packed bytes (int16 PCM / mulaw8); identity otherwise."""
            if not self.packed_output:
                return y
            # collect() clamps the fade window to the clip length
            # (fade_len = min(20*hop, len)); mirror that so sub-fade-length
            # clips fade 1 -> 0 across the whole clip instead of starting
            # attenuated
            L = jnp.minimum(fade, wave_len).astype(jnp.float32)
            idx = jnp.arange(y.shape[0])
            j = (idx - (wave_len - L)).astype(jnp.float32)
            factor = jnp.clip(1.0 - j / jnp.maximum(L - 1.0, 1.0), 0.0, 1.0)
            return pack_wire(y * factor)

        @partial(jax.jit, static_argnames=("mu_law", "overlap", "n_classes"))
        def finalize_pcm16(samples, num_folds, base, wave_len, *,
                           mu_law: bool, overlap: int, n_classes: int):
            """Streaming finalize for the packed serving paths (int16 PCM /
            mulaw8): crossfade-unfold one fold window, apply the slice of
            the GLOBAL tail-fade envelope that lands in it (``base`` = the
            window's first sample in waveform coordinates), and quantize to
            the wire dtype — all on device, mirroring maybe_pcm16's
            one-shot math so chunked and one-shot serving produce the same
            bytes."""
            y = finalize(samples, num_folds, mu_law=mu_law, batched=True,
                         overlap=overlap, n_classes=n_classes)
            L = jnp.minimum(fade, wave_len).astype(jnp.float32)
            gidx = base + jnp.arange(y.shape[0])
            j = (gidx - (wave_len - L)).astype(jnp.float32)
            factor = jnp.clip(1.0 - j / jnp.maximum(L - 1.0, 1.0), 0.0, 1.0)
            return pack_wire(y * factor)

        self._finalize_pcm16 = finalize_pcm16

        @partial(jax.jit, static_argnames=("n", "n_win_pad", "has_prev",
                                           "mu_law", "overlap", "n_classes",
                                           "pcm"))
        def finalize_stream_dev(rows, offset, prev, base, wave_len, *,
                                n: int, n_win_pad: int, has_prev: bool,
                                mu_law: bool, overlap: int, n_classes: int,
                                pcm: bool):
            """Streaming finalize over DEVICE-RESIDENT decode rows: build
            the crossfade window on device (prev-fold carry + ``n`` rows at
            traced row ``offset`` — a multi-session launch packs several
            sessions' rows in one array), unfold, and return (window
            output, last raw fold).  The raw rows never cross the host
            link — only the finished audio does (the host path
            round-tripped ~2 MB of rows per group over the relay, capping
            streaming at ~half the decode rate)."""
            w = jax.lax.dynamic_slice(
                rows, (offset, 0), (n, rows.shape[1]))
            if has_prev:
                w = jnp.concatenate([prev[None], w], axis=0)
            n_win = n + (1 if has_prev else 0)
            w = jnp.pad(w, ((0, n_win_pad - n_win), (0, 0)))
            last = w[n_win - 1]
            if pcm:
                out = finalize_pcm16(
                    w, jnp.asarray(n_win, jnp.int32), base, wave_len,
                    mu_law=mu_law, overlap=overlap, n_classes=n_classes)
            else:
                out = finalize(
                    w, jnp.asarray(n_win, jnp.int32), mu_law=mu_law,
                    batched=True, overlap=overlap, n_classes=n_classes)
            return out, last

        self._finalize_stream_dev = finalize_stream_dev

        @partial(jax.jit, static_argnames=("mu_law", "batched", "target",
                                           "overlap", "num_folds_padded"))
        def full_pipeline(variables, weights, mels_padded, num_folds,
                          wave_len, key, ffs, *,
                          mu_law: bool, batched: bool, target: int,
                          overlap: int, num_folds_padded: int):
            """The whole mel→waveform graph as ONE program: upsample convs,
            fold gather, AR decode, mu-law expand, crossfade unfold.  A single
            dispatch per utterance — no intermediate host round-trips."""
            # lean-ingress mels (f16/bf16/u8 wire) compute in f32
            mels_padded = self._ingress_f32(mels_padded)
            if batched and self.backend == "pallas":
                # fused conditioning: one packed bf16 stream + one fold
                # gather, aux broadcast lazily from mel rate (no stretched
                # f32 aux / per-fold copies / pack transpose in HBM)
                from wavernn_tpu.ops import pallas_decode

                mels_up, aux_mel = self.model.apply(
                    variables, mels_padded, False,
                    method=WaveRNN.upsample_parts,
                )
                fold_T = target + 2 * overlap
                T_pad = _round_up(fold_T, pallas_decode.CHUNK)
                # fold counts above one kernel tile must land on a tile
                # boundary (grid grouping); extra folds read zero padding
                # and are masked out by finalize.  With a mesh, the PER-CHIP
                # fold count must be sublane/tile aligned instead.
                nfp = self._kernel_fold_pad(num_folds_padded)
                packed = pallas_decode.pack_stream(
                    mels_up, aux_mel, cfg.total_scale)
                stride = target + overlap
                need = (nfp - 1) * stride + T_pad
                if need > packed.shape[0]:
                    packed = jnp.pad(
                        packed, ((0, need - packed.shape[0]), (0, 0)))
                samples = self._decode_cond_fm(
                    weights, packed, jnp.arange(nfp) * stride, key,
                    fold_T, T_pad, ffs=ffs)
                return maybe_pcm16(finalize(
                    samples, num_folds, mu_law=mu_law, batched=batched,
                    overlap=overlap, n_classes=cfg.n_classes,
                ), wave_len)
            mels_up, aux = self.model.apply(
                variables, mels_padded, False, method=WaveRNN.upsample_only
            )
            if batched:
                mels_f = fold_ops.fold_with_overlap(mels_up, target, overlap)
                aux_f = fold_ops.fold_with_overlap(aux, target, overlap)
                pad_folds = num_folds_padded - mels_f.shape[0]
                if pad_folds:
                    mels_f = jnp.pad(mels_f, ((0, pad_folds), (0, 0), (0, 0)))
                    aux_f = jnp.pad(aux_f, ((0, pad_folds), (0, 0), (0, 0)))
            else:
                mels_f, aux_f = mels_up, aux
            samples = self._decode(weights, mels_f, aux_f, key, ffs=ffs)
            return maybe_pcm16(finalize(
                samples, num_folds, mu_law=mu_law, batched=batched,
                overlap=overlap, n_classes=cfg.n_classes,
            ), wave_len)

        self._full_pipeline = full_pipeline

        @partial(jax.jit, static_argnames=("t_buckets", "target", "overlap",
                                           "fold_counts", "mu_law"))
        def batch_pipeline(variables, weights, batch_mels, wave_lens, key,
                           ffs, *,
                           t_buckets: tuple, target: int, overlap: int,
                           fold_counts: tuple, mu_law: bool):
            """The whole multi-utterance serve as ONE program: batched
            upsample, per-utterance packed conditioning streams concatenated
            with offsets, one fold gather, one decode over every utterance's
            folds, and per-utterance crossfade finalization.  The jit cache
            keys on the tuple of bucketed frame counts, so same-shaped
            batches reuse the program.  ``wave_lens`` (traced, (N,) int32)
            carries each utterance's true sample count for the device-side
            tail fade of the int16 serving output."""
            from wavernn_tpu.ops import pallas_decode

            # lean-ingress mels (f16/bf16/u8 wire) compute in f32
            batch_mels = self._ingress_f32(batch_mels)

            fold_T = target + 2 * overlap
            stride = target + overlap

            def finalize_each(samples):
                # one concatenated output array → a single host transfer;
                # per-utterance boundaries are static (fold_counts)
                waves, o = [], 0
                for i, nf in enumerate(fold_counts):
                    waves.append(maybe_pcm16(finalize(
                        samples[o: o + nf], jnp.asarray(nf, jnp.int32),
                        mu_law=mu_law, batched=True, overlap=overlap,
                        n_classes=cfg.n_classes,
                    ), wave_lens[i]))
                    o += nf
                return jnp.concatenate(waves)

            if self.backend == "pallas":
                T_pad = _round_up(fold_T, pallas_decode.CHUNK)
                mels_up_b, aux_mel_b = self.model.apply(
                    variables, batch_mels, False,
                    method=WaveRNN.upsample_parts,
                )
                streams, starts, off = [], [], 0
                for i, (t_bucket, nf) in enumerate(zip(t_buckets,
                                                       fold_counts)):
                    frames = t_bucket - 2 * cfg.pad
                    real_len = frames * cfg.hop_length
                    s = pallas_decode.pack_stream(
                        mels_up_b[i: i + 1, :real_len],
                        aux_mel_b[i: i + 1, :frames], cfg.total_scale,
                    )
                    need = (nf - 1) * stride + T_pad
                    if need > s.shape[0]:
                        s = jnp.pad(s, ((0, need - s.shape[0]), (0, 0)))
                    else:
                        s = s[:need]
                    starts += [off + b * stride for b in range(nf)]
                    off += need
                    streams.append(s)
                total = len(starts)
                total_pad = self._kernel_fold_pad(
                    _round_up(total, self.fold_bucket))
                starts += [0] * (total_pad - total)
                return finalize_each(self._decode_cond_fm(
                    weights, jnp.concatenate(streams, axis=0),
                    jnp.asarray(starts, jnp.int32), key, fold_T, T_pad,
                    ffs=ffs))
            # scan backend: classic folded arrays
            mels_up_b, aux_b = self.model.apply(
                variables, batch_mels, False, method=WaveRNN.upsample_only
            )
            packed_m, packed_a = [], []
            for i, t_bucket in enumerate(t_buckets):
                real_len = (t_bucket - 2 * cfg.pad) * cfg.hop_length
                packed_m.append(fold_ops.fold_with_overlap(
                    mels_up_b[i: i + 1, :real_len], target, overlap))
                packed_a.append(fold_ops.fold_with_overlap(
                    aux_b[i: i + 1, :real_len], target, overlap))
            mels_f = jnp.concatenate(packed_m, axis=0)
            aux_f = jnp.concatenate(packed_a, axis=0)
            pad_folds = self._pad_folds(mels_f.shape[0]) - mels_f.shape[0]
            if pad_folds:
                mels_f = jnp.pad(mels_f, ((0, pad_folds), (0, 0), (0, 0)))
                aux_f = jnp.pad(aux_f, ((0, pad_folds), (0, 0), (0, 0)))
            return finalize_each(self._decode(weights, mels_f, aux_f, key,
                                              ffs=ffs))

        self._batch_pipeline = batch_pipeline

    # -- public API ----------------------------------------------------------

    def __call__(
        self,
        mels: np.ndarray,
        batched: bool,
        target: int,
        overlap: int,
        mu_law: bool,
        seed: int = 0,
    ) -> np.ndarray:
        """mels: (n_mels, T_mel) or (1, n_mels, T_mel) normalized mel.
        Returns float64 waveform of length (T_mel-1)*hop."""
        return self.collect(self.submit(mels, batched, target, overlap,
                                        mu_law, seed))

    def _ingress_pack(self, mels: np.ndarray) -> np.ndarray:
        """Host-side mel → wire ingress dtype.  uint8 quantizes the
        [0,1]-normalized mel to 8-bit steps; the float dtypes are a plain
        cast.  Inverse of :meth:`_ingress_f32`."""
        if self.input_dtype == "uint8":
            return np.clip(np.round(mels * 255.0), 0.0, 255.0).astype(
                np.uint8)
        return mels.astype(self._input_np_dtype, copy=False)

    def _ingress_f32(self, mels):
        """Device-side staged wire mels → f32 compute mels (everything
        after ingress runs at full precision regardless of wire dtype)."""
        mels = mels.astype(jnp.float32)
        if self.input_dtype == "uint8":
            mels = mels * jnp.float32(1.0 / 255.0)
        return mels

    def prestage(self, mels: np.ndarray, batched: bool, target: int,
                 overlap: int):
        """Pad + upload one utterance's mel to the device ahead of
        submission (production serving stages inputs while earlier
        utterances decode; the reference's own rate meter likewise starts
        with mels already device-resident)."""
        c = self.cfg
        mels = np.asarray(mels, dtype=np.float32)
        if mels.ndim == 2:
            mels = mels[None]
        assert mels.shape[0] == 1, "generate expects a single utterance"
        mels = np.transpose(mels, (0, 2, 1))  # (1, T_mel, feat)

        wave_len = (mels.shape[1] - 1) * c.hop_length

        # context pad (ref pads pad frames both sides), then bucket-pad frames
        t_real = mels.shape[1] + 2 * c.pad
        t_bucket = _round_up(t_real, self.frame_bucket)
        pre = c.pad
        post = t_bucket - mels.shape[1] - c.pad
        mels = np.pad(mels, ((0, 0), (pre, post), (0, 0)))

        if batched:
            real_len = (t_bucket - 2 * c.pad) * c.hop_length
            num_folds, _ = fold_ops.fold_shape(real_len, target, overlap)
        else:
            num_folds = 1
        return Prestaged(
            jax.device_put(self._ingress_pack(mels)),
            num_folds, wave_len, batched, target, overlap)

    def submit(
        self,
        mels,
        batched: bool,
        target: int,
        overlap: int,
        mu_law: bool,
        seed: int = 0,
    ):
        """Asynchronously dispatch one utterance's full mel→waveform
        pipeline; returns a handle for :meth:`collect`.  Because the whole
        graph is one jitted program, submissions queue on the device and
        overlap host↔device transfer latency — the pipelined serving path
        (submit many, then collect in order).  ``mels`` is a raw mel array
        or a :meth:`prestage` result."""
        c = self.cfg
        mu_law = mu_law if c.mode == "RAW" else False

        if not isinstance(mels, Prestaged):
            mels = self.prestage(mels, batched, target, overlap)
        elif (mels.batched, mels.target, mels.overlap) != (batched, target,
                                                          overlap):
            raise ValueError(
                f"prestaged handle was built for batched={mels.batched}, "
                f"target={mels.target}, overlap={mels.overlap}; submit got "
                f"batched={batched}, target={target}, overlap={overlap} — "
                "the fold geometry would be stale; re-prestage")
        mels_dev, num_folds, wave_len = mels[:3]
        ffs = self._ensure_ff_scales(
            mels_dev, self._kernel_fold_pad(self._pad_folds(num_folds)))

        out_dev = self._full_pipeline(
            self.variables, self.weights, mels_dev,
            jnp.asarray(num_folds, jnp.int32),
            jnp.asarray(wave_len, jnp.int32), jax.random.PRNGKey(seed), ffs,
            mu_law=mu_law, batched=batched, target=target, overlap=overlap,
            num_folds_padded=self._pad_folds(num_folds),
        )
        return out_dev, wave_len

    def prefetch(self, handle) -> None:
        """Start the device→host copy of a :meth:`submit` result without
        blocking.  In pipelined serving, prefetching every outstanding
        handle right after submission overlaps result transfers with the
        device compute of later utterances (transfers stream back as each
        in-order program finishes); :meth:`collect` then finds the bytes
        already on host."""
        handle[0].copy_to_host_async()

    def collect(self, handle) -> np.ndarray:
        """Resolve a :meth:`submit` handle to the waveform: float64 (default,
        reference-parity) / float32, or device-faded wire bytes (16-bit PCM
        / 8-bit mu-law) when the Generator was built with a packed
        ``output_dtype``."""
        out_dev, wave_len = handle
        if self.packed_output:
            # fade + quantization already applied on device
            return np.asarray(out_dev)[:wave_len]
        # np.array (not asarray): a same-dtype fetch can alias read-only
        # device memory, and the fade below writes in place
        output = np.array(out_dev, dtype=np.dtype(self.output_dtype))[:wave_len]
        # linear tail fade to avoid an abrupt cut (ref: fatchord_version.py:255-258)
        fade_len = min(20 * self.cfg.hop_length, len(output))
        if fade_len:
            output[-fade_len:] *= np.linspace(1, 0, fade_len)
        return output

    def generate_batch(self, mels_list, target: int, overlap: int,
                       mu_law: bool, seed: int = 0):
        """Serve MULTIPLE utterances in one call.  Beyond the reference's
        one-utterance generate — this is the production batching path.

        A raw list of mels is served as a PER-UTTERANCE PIPELINE of
        dispatches: utterance k's staging upload and result transfer
        overlap the in-order device decode of its neighbours, so a cold
        (one-shot) call exposes only the first upload and the last
        transfer on the host link instead of the whole batch's bytes — on
        the measured relay this nearly doubles one-shot throughput over
        the single fused program (VERDICT r4 #8; bench.py
        ``cobatch_oneshot`` vs ``pipelined_strict``).

        A :meth:`prestage_batch` handle (or a mesh-equipped Generator,
        whose fold-sharded decode wants the one big program) is served as
        ONE fused co-batched program — the steady-state saturated-server
        path, pipelined ACROSS calls via :meth:`submit_batch` /
        :meth:`prefetch_batch` / :meth:`collect_batch`.

        Returns a list of waveforms: float64 (default) / float32, or
        device-faded wire bytes (16-bit PCM / 8-bit mu-law) when the
        Generator was built with a packed ``output_dtype``.
        """
        if isinstance(mels_list, PrestagedBatch) or self.mesh is not None:
            return self.collect_batch(self.submit_batch(
                mels_list, target=target, overlap=overlap, mu_law=mu_law,
                seed=seed))
        handles = []
        for i, mels in enumerate(mels_list):
            staged = self.prestage(mels, batched=True, target=target,
                                   overlap=overlap)
            # distinct deterministic per-utterance seed streams
            h = self.submit(staged, batched=True, target=target,
                            overlap=overlap, mu_law=mu_law,
                            seed=(seed * 1_000_003 + i) % (2 ** 31))
            self.prefetch(h)
            handles.append(h)
        return [self.collect(h) for h in handles]

    def prestage_batch(self, mels_list, target: int, overlap: int):
        """Pad + upload a whole utterance batch ahead of submission (the
        co-batched analog of :meth:`prestage`): steady-state serving stages
        batch p+1's mels while batch p decodes, keeping the input upload
        off the dispatch path."""
        c = self.cfg

        # pad every utterance to ONE bucketed frame length so the whole
        # batch upsamples in a single dispatch (same single-dispatch
        # philosophy as _full_pipeline); each utterance's true region is
        # sliced back out afterwards — the upsample convs are local, so the
        # shared zero-tail cannot perturb samples inside the true region
        padded, metas = [], []  # metas: (t_bucket, wave_len)
        for mels in mels_list:
            mels = np.asarray(mels, dtype=np.float32)
            if mels.ndim == 2:
                mels = mels[None]
            mels = np.transpose(mels, (0, 2, 1))
            wave_len = (mels.shape[1] - 1) * c.hop_length
            t_bucket = _round_up(mels.shape[1] + 2 * c.pad, self.frame_bucket)
            padded.append((mels, c.pad, t_bucket - mels.shape[1] - c.pad))
            metas.append([t_bucket, wave_len])

        t_glob = max(t for (t, _) in metas)
        batch = np.concatenate(
            [np.pad(m, ((0, 0), (pre, post + t_glob - (m.shape[1] + pre + post)),
                        (0, 0)))
             for m, pre, post in padded], axis=0,
        )

        t_buckets, fold_counts = [], []
        for meta in metas:
            t_bucket, wave_len = meta
            real_len = (t_bucket - 2 * c.pad) * c.hop_length
            num_folds, _ = fold_ops.fold_shape(real_len, target, overlap)
            t_buckets.append(t_bucket)
            fold_counts.append(num_folds)
            meta[0] = num_folds  # metas becomes (num_folds, wave_len)

        return PrestagedBatch(
            jax.device_put(self._ingress_pack(batch)),
            jax.device_put(jnp.asarray([wl for _, wl in metas], jnp.int32)),
            metas, tuple(t_buckets), tuple(fold_counts), target, overlap)

    def submit_batch(self, mels_list, target: int, overlap: int,
                     mu_law: bool, seed: int = 0):
        """Asynchronously dispatch one co-batched multi-utterance serve
        (see :meth:`generate_batch`); returns a handle for
        :meth:`collect_batch`.  ``mels_list`` is a list of raw mel arrays
        or a :meth:`prestage_batch` result."""
        c = self.cfg
        mu_law = mu_law if c.mode == "RAW" else False
        if not isinstance(mels_list, PrestagedBatch):
            mels_list = self.prestage_batch(mels_list, target, overlap)
        elif (mels_list.target, mels_list.overlap) != (target, overlap):
            raise ValueError(
                f"prestaged batch was built for target={mels_list.target}, "
                f"overlap={mels_list.overlap}; submit_batch got "
                f"target={target}, overlap={overlap} — the fold geometry "
                "would be stale; re-prestage")
        batch_dev, wl_dev, metas, t_buckets, fold_counts = mels_list[:5]
        ffs = self._ensure_ff_scales(
            batch_dev[:1],
            self._kernel_fold_pad(_round_up(sum(fold_counts),
                                            self.fold_bucket)))

        out_dev = self._batch_pipeline(
            self.variables, self.weights, batch_dev, wl_dev,
            jax.random.PRNGKey(seed), ffs,
            t_buckets=t_buckets, target=target, overlap=overlap,
            fold_counts=fold_counts, mu_law=mu_law,
        )
        return out_dev, metas, (target, overlap)

    def prefetch_batch(self, handle) -> None:
        """Start the device→host copy of a :meth:`submit_batch` result
        without blocking (see :meth:`prefetch`)."""
        handle[0].copy_to_host_async()

    def collect_batch(self, handle):
        """Resolve a :meth:`submit_batch` handle to the list of waveforms."""
        out_dev, metas, (target, overlap) = handle
        c = self.cfg
        stride = target + overlap
        flat = np.asarray(out_dev, dtype=self.output_np_dtype)  # ONE transfer

        outputs, o = [], 0
        for num_folds, wave_len in metas:
            seg_len = num_folds * stride + overlap
            out = flat[o: o + wave_len].copy()
            o += seg_len
            if not self.packed_output:  # packed: faded on device
                fade_len = min(20 * c.hop_length, len(out))
                if fade_len:
                    out[-fade_len:] *= np.linspace(1, 0, fade_len)
            outputs.append(out)
        return outputs

    def open_stream_session(self, mels, target: int, overlap: int,
                            pad_to: int = None,
                            host_rows: bool = False) -> StreamSession:
        """Prepare one utterance's streaming front-end: pad/bucket the mel
        spectrogram and build the fold-row conditioning source — on pallas
        the fused packed bf16 stream (mel-rate aux, no stretched f32 aux /
        fold copies: time-to-first-chunk excludes the whole-utterance
        fold/pack HBM churn the pre-fusion path paid up front), on scan the
        folded sample-rate conditioning.

        ``pad_to`` (pallas only) forces the packed stream to a fixed row
        count so a multi-session server can write sessions into equal-size
        slots of one shared buffer; raises if the utterance needs more rows.
        ``host_rows`` (scan only) materializes the folded conditioning on
        the host so a server can stack rows across sessions; the solo
        stream path leaves it device-resident.
        """
        c = self.cfg
        mels = np.asarray(mels, dtype=np.float32)
        if mels.ndim == 2:
            mels = mels[None]
        mels = np.transpose(mels, (0, 2, 1))
        wave_len = (mels.shape[1] - 1) * c.hop_length

        t_real = mels.shape[1] + 2 * c.pad
        t_bucket = _round_up(t_real, self.frame_bucket)
        mels = np.pad(
            mels, ((0, 0), (c.pad, t_bucket - mels.shape[1] - c.pad), (0, 0))
        )
        real_len = (t_bucket - 2 * c.pad) * c.hop_length
        num_folds, _ = fold_ops.fold_shape(real_len, target, overlap)
        fold_T = target + 2 * overlap
        stride = target + overlap  # fold k starts at k*stride
        # folds whose span starts at/after wave_len are pure padding — skip
        # decoding them so the last real group carries the tail fade
        needed_folds = min(num_folds, -(-wave_len // stride))

        if self.backend == "pallas":
            from wavernn_tpu.ops import pallas_decode

            T_pad = _round_up(fold_T, pallas_decode.CHUNK)
            need = max(real_len, (needed_folds - 1) * stride + T_pad)
            if pad_to is None:
                pad_to = need
            elif pad_to < need:
                raise ValueError(
                    f"utterance needs {need} conditioning rows but the slot "
                    f"holds {pad_to} — raise the server's slot_seconds or "
                    f"shorten the utterance"
                )
            packed = self._get_pack_stream()(
                self.variables,
                jnp.asarray(self._ingress_pack(mels)),
                pad_to=pad_to)
            if self.int8_ff is True:
                # eager one-time calibration for the FORCED int8_ff mode;
                # 'auto' streams calibrate lazily at the first group launch
                # wide enough for the policy (launch_group)
                self._calibrate_ff(packed)
            return StreamSession(
                needed_folds=needed_folds, stride=stride, fold_T=fold_T,
                wave_len=wave_len, packed=packed, T_pad=T_pad,
            )

        mels_up, aux = self._upsample(self.variables, jnp.asarray(mels))
        mels_f = fold_ops.fold_with_overlap(mels_up, target, overlap)
        aux_f = fold_ops.fold_with_overlap(aux, target, overlap)
        if host_rows:
            mels_f, aux_f = np.asarray(mels_f), np.asarray(aux_f)
        return StreamSession(
            needed_folds=needed_folds, stride=stride, fold_T=fold_T,
            wave_len=wave_len, mels_f=mels_f, aux_f=aux_f,
        )

    def _stream_setup(self, mels, target: int, overlap: int, seed: int):
        """Shared streaming front-end: open a session and build the
        per-group fold decoder over it; return
        ``(launch_group, drain_group, needed_folds, stride, wave_len)``.

        ``launch_group(g0, g1)`` dispatches one group's decode (plus an
        async device→host copy of its rows) and returns a handle;
        ``drain_group(handle)`` blocks for the rows.  The split lets
        :meth:`stream` keep decode launches queued on the device while the
        host finalizes earlier groups.  Both :meth:`stream` and
        :meth:`stream_oneshot` run their folds through THESE closures, so
        the two differ only in finalization — which is exactly the
        invariant ``tools/stream_latency.py`` asserts.
        """
        sess = self.open_stream_session(mels, target, overlap)
        stride = sess.stride

        if self.backend == "pallas":
            group_fn = self._get_stream_group()

            def launch_group(g0, g1):
                n = g1 - g0
                n_pad = self._kernel_fold_pad(n)
                starts = np.zeros(n_pad, np.int32)
                starts[:n] = np.arange(g0, g1, dtype=np.int32) * stride
                # lazy calibration: only a group wide enough for the
                # int8_ff policy pays the one-time scan
                ffs = (self._calibrate_ff(sess.packed)
                       if self._ff_policy(n_pad) else None)
                dev = group_fn(
                    self.weights, sess.packed, jnp.asarray(starts),
                    jax.random.PRNGKey(seed + g0), ffs,
                    fold_T=sess.fold_T, T_pad=sess.T_pad,
                )
                return dev, n
        else:
            def launch_group(g0, g1):
                n = g1 - g0
                n_pad = self._pad_folds(n)
                mf = jnp.pad(sess.mels_f[g0:g1],
                             ((0, n_pad - n), (0, 0), (0, 0)))
                af = jnp.pad(sess.aux_f[g0:g1],
                             ((0, n_pad - n), (0, 0), (0, 0)))
                dev = self._decode(
                    self.weights, mf, af, jax.random.PRNGKey(seed + g0))
                return dev, n

        def drain_group(handle):
            dev, n = handle
            return np.asarray(dev)[:n]

        return launch_group, drain_group, sess.needed_folds, stride, \
            sess.wave_len

    def stream(self, mels, target: int, overlap: int, mu_law: bool,
               group: int = 16, seed: int = 0, lookahead: int = 2,
               first_group: int = None):
        """Streaming synthesis: yield finalized audio chunks as fold groups
        finish decoding (BASELINE config 5: streaming TTS serving).  Chunks
        are float64, or device-faded wire bytes (16-bit PCM / 8-bit mu-law)
        when the Generator was built with a packed ``output_dtype``.

        Latency model: the first chunk arrives after ONE group of folds
        decodes (~group*target samples of audio) instead of after the whole
        utterance; each subsequent group extends the stream.  A RAMPED
        first group (``first_group``, e.g. 4) shrinks only the leading
        launch: time-to-first-chunk scales with the small group's decode
        while the steady-state rate keeps ``group``'s width (the decode is
        serial in time, so the first chunk's latency is first_group-
        independent of the utterance length).

        Pipelined, device-resident dispatch: up to ``lookahead`` group
        decodes stay queued on the device ahead of the group being
        finalized, one finalize stays in flight behind them, and the raw
        fold rows NEVER cross the host link — each finalize reads its
        group's rows and the previous-fold carry in place on device
        (_finalize_stream_dev), so the only per-group transfer is the
        finished audio chunk.  In steady state the stream runs at the
        device decode rate instead of the round-3 relay-bound regime
        (docs/ROADMAP.md).  The emitted audio is dispatch-order
        independent: with deterministic decode it is sample-for-sample the
        unpipelined stream (group PRNG keys are keyed by fold index, not
        launch time).

        Incremental crossfade finalization: only the single raw fold
        preceding the current group is carried as context — fold k-1 is the
        only earlier fold whose tail overlaps positions at or beyond fold
        k's seam — so each group finalizes in O(group) with a fixed-shape
        program, and the compile count is independent of utterance length.
        A position is final once every fold overlapping it has decoded, so
        after group g the stream emits up to the next group's seam start.
        """
        mu_law = mu_law if self.cfg.mode == "RAW" else False
        launch, drain, needed_folds, stride, wave_len = self._stream_setup(
            mels, target, overlap, seed)
        fin = _IncrementalUnfold(self, needed_folds, stride, wave_len,
                                 overlap, mu_law)
        spans = fold_spans(needed_folds, group, first_group)
        lookahead = max(1, lookahead)
        decodes = deque()    # in-flight decode launches
        finals = deque()     # in-flight finalize tokens
        si = 0
        while si < len(spans) or decodes or finals:
            while si < len(spans) and len(decodes) < lookahead:
                decodes.append(launch(*spans[si]))
                si += 1
            if decodes:
                finals.append(fin.feed_async_dev(*decodes.popleft()))
            # hold one finalize in flight while decode work remains
            hold = 1 if (si < len(spans) or decodes) else 0
            while len(finals) > hold:
                chunk = fin.collect(finals.popleft())
                if len(chunk):
                    yield chunk

    def stream_oneshot(self, mels, target: int, overlap: int, mu_law: bool,
                       group: int = 16, seed: int = 0,
                       first_group: int = None) -> np.ndarray:
        """Decode the SAME per-group programs :meth:`stream` uses (same fold
        gather, same kernel, same per-group PRNG keys), but finalize every
        fold in ONE crossfade-unfold.  This is the parity oracle that
        isolates stream()'s incremental finalization as exactly zero-error
        (``tools/stream_latency.py``); comparing stream() against the
        one-shot pipeline instead would compare different XLA programs whose
        f32 upsample rounding differs by ULPs.  Returns the float64 waveform.
        """
        c = self.cfg
        mu_law = mu_law if c.mode == "RAW" else False
        launch, drain, needed_folds, _, wave_len = self._stream_setup(
            mels, target, overlap, seed)
        rows = np.concatenate(
            [drain(launch(g0, g1))
             for g0, g1 in fold_spans(needed_folds, group, first_group)],
            axis=0)
        n_pad = self._pad_folds(rows.shape[0])
        window = np.pad(rows, ((0, n_pad - rows.shape[0]), (0, 0)))
        wav = np.asarray(self._finalize(
            jnp.asarray(window), jnp.asarray(rows.shape[0], jnp.int32),
            mu_law=mu_law, batched=True, overlap=overlap,
            n_classes=c.n_classes,
        ), dtype=np.float64)[:wave_len]
        fade_len = min(20 * c.hop_length, len(wav))
        if fade_len:
            wav[-fade_len:] *= np.linspace(1, 0, fade_len)
        return wav

    def update_variables(self, variables) -> None:
        """Swap in new model variables (e.g. a fresher checkpoint) without
        discarding compiled programs — variables/weights are program *inputs*
        (device-pinned once, as in __init__)."""
        self.variables = jax.device_put(variables)
        self.weights = extract_decode_weights(self.variables["params"])

    # -- internals -------------------------------------------------------------

    def _get_pack_stream(self):
        """Jitted (upsample convs + packed bf16 conditioning stream) for the
        streaming path; cached so repeated stream() calls reuse programs."""
        if getattr(self, "_pack_stream_fn", None) is None:
            from wavernn_tpu.ops import pallas_decode

            @partial(jax.jit, static_argnames=("pad_to",))
            def pack_stream_fn(variables, mels_padded, *, pad_to: int):
                # lean-ingress mels (f16/bf16/u8 wire) compute in f32
                mels_padded = self._ingress_f32(mels_padded)
                mels_up, aux_mel = self.model.apply(
                    variables, mels_padded, False,
                    method=WaveRNN.upsample_parts,
                )
                s = pallas_decode.pack_stream(
                    mels_up, aux_mel, self.cfg.total_scale)
                if pad_to > s.shape[0]:
                    s = jnp.pad(s, ((0, pad_to - s.shape[0]), (0, 0)))
                return s

            self._pack_stream_fn = pack_stream_fn
        return self._pack_stream_fn

    def _get_stream_group(self):
        """Jitted per-group decode over the packed stream: one fold gather
        plus the kernel launch (optionally mesh-sharded)."""
        if getattr(self, "_stream_group_fn", None) is None:
            from wavernn_tpu.ops import pallas_decode

            @partial(jax.jit, static_argnames=("fold_T", "T_pad"))
            def stream_group(weights, packed, starts, key, ffs=None, *,
                             fold_T: int, T_pad: int):
                return self._decode_cond_fm(weights, packed, starts, key,
                                            fold_T, T_pad, ffs=ffs)

            self._stream_group_fn = stream_group
        return self._stream_group_fn

    def _pad_folds(self, n: int) -> int:
        """Static fold-count padding: bucket for program reuse, and (with a
        mesh) a multiple of the data-axis size so the fold axis shards
        evenly (pallas shards also need sublane-aligned per-chip widths)."""
        n = _round_up(n, self.fold_bucket)
        if self.mesh is not None:
            per_chip = 16 if self.backend == "pallas" else 1
            n = _round_up(n, per_chip * self.mesh.n_data)
        return n

    def _kernel_fold_pad(self, n: int) -> int:
        """Fold padding for the pallas kernel's conditioning width: the
        PER-CHIP fold count follows fold_tiling (sublane-aligned, balanced
        grid groups past one tile), so the prebuilt conditioning width
        always matches the kernel's own B_pad computation."""
        from wavernn_tpu.ops import pallas_decode

        shards = self.mesh.n_data if self.mesh is not None else 1
        local, _, _ = pallas_decode.fold_tiling(-(-n // shards))
        return local * shards

    def _ff_policy(self, n_folds: int) -> bool:
        """Should int8_ff apply to a pallas dispatch over ``n_folds`` fold
        rows?  ``int8_ff=True/False`` force it; the default 'auto' enables
        it only when the per-grid-program kernel width (fold_tiling) is at
        or above the measured crossover FF_AUTO_MIN_KERNEL_B.  Fold widths
        are static shapes, so this is a trace-time decision."""
        if self.backend != "pallas" or self.mesh is not None:
            return False
        if self.int8_ff is True:
            return True
        if self.int8_ff != "auto":
            return False
        from wavernn_tpu.ops.pallas_decode import fold_tiling

        return fold_tiling(max(int(n_folds), 1))[2] >= FF_AUTO_MIN_KERNEL_B

    def _ensure_ff_scales(self, mels_dev, n_folds: int):
        """EAGER int8_ff calibration (per-MODEL scales; the first
        utterance's conditioning is representative — rare outliers saturate
        at the kernel's clip).  Runs ONCE per Generator with CONCRETE
        conditioning — before round 5, calibration was reached only from
        inside the jitted pipeline traces, so the 4096-step B=1 scan was
        baked into the compiled program and re-executed on EVERY generate
        call (ADVICE r4).  Returns the cached (3,) f32 device array, or
        None when int8_ff doesn't apply to a dispatch of ``n_folds`` fold
        rows (policy off / narrow width / mesh / non-pallas).

        ``mels_dev``: a (1, T, feat) padded device mel (a :meth:`prestage`
        upload or the first row of a prestaged batch)."""
        if not self._ff_policy(n_folds):
            return None
        if self._ff_scales is None:
            packed = self._get_pack_stream()(
                self.variables, mels_dev, pad_to=0)
            self._calibrate_ff(packed)
        return self._ff_scales

    def _calibrate_ff(self, packed):
        """Core of :meth:`_ensure_ff_scales` over an already-packed
        CONCRETE conditioning stream (the streaming session front-end
        computes one anyway).  Callers gate on :meth:`_ff_policy`."""
        if not self.int8_ff or self.backend != "pallas" or self.mesh is not None:
            return None
        if self._ff_scales is None:
            self._ff_scales = jax.device_put(ff_ranges(
                self.weights, packed[:FF_CAL_STEPS],
                jax.random.PRNGKey(17), self.cfg.mode, self.cfg.n_classes))
        return self._ff_scales

    def _decode(self, weights, mels_f, aux_f, key, ffs=None):
        if self.backend == "pallas":
            from wavernn_tpu.ops import pallas_decode

            # int8_ff per the width policy (off under a mesh — the sharded
            # fold path is a scale-out layout, not a single-chip one)
            use_ff = ffs is not None and self._ff_policy(mels_f.shape[0])
            fn = lambda w, m, a, k: pallas_decode.decode(
                w, m, a, k,
                mode=self.cfg.mode, n_classes=self.cfg.n_classes,
                int8_gates=self.int8_gates, int8_hh=self.int8_hh,
                int8_ff=use_ff, ff_scales=ffs if use_ff else None,
                deterministic=self.deterministic,
            )
        else:
            fn = lambda w, m, a, k: decode_scan(
                w, m, a, k,
                mode=self.cfg.mode, n_classes=self.cfg.n_classes,
                deterministic=self.deterministic,
            )
        # shard only when the fold axis tiles the mesh (unbatched B=1
        # decodes stay single-device)
        if (self.mesh is not None
                and mels_f.shape[0] % self.mesh.n_data == 0
                and mels_f.shape[0] >= self.mesh.n_data):
            from wavernn_tpu.parallel.mesh import shard_folds_decode

            return shard_folds_decode(self.mesh, fn, weights, mels_f, aux_f,
                                      key)
        return fn(weights, mels_f, aux_f, key)

    def _decode_cond_fm(self, weights, packed, starts, key, out_T: int,
                        T_pad: int, ffs=None):
        """Pallas decode straight off the FLAT packed conditioning stream:
        fold windows become fold-major contiguous slices
        (pallas_decode.fold_major_cond) and the kernel transposes each
        chunk on-core — no time-major row gather in HBM (measured
        ~5 ms/utterance at production shapes, bit-exact).  With a mesh the
        gathered layout is kept (its fold axis shards over 'data')."""
        from wavernn_tpu.ops import pallas_decode

        if self.mesh is not None:
            cond = pallas_decode.gather_cond(packed, starts, T_pad)
            return self._decode_cond(weights, cond, key, out_T)
        fm = pallas_decode.fold_major_cond(packed, starts, T_pad)
        use_ff = ffs is not None and self._ff_policy(fm.shape[0])
        return pallas_decode.decode(
            weights, None, None, key, mode=self.cfg.mode,
            n_classes=self.cfg.n_classes, cond_fm=fm, out_T=out_T,
            int8_gates=self.int8_gates, int8_hh=self.int8_hh,
            int8_ff=use_ff, ff_scales=ffs if use_ff else None,
            deterministic=self.deterministic,
        )

    def _decode_cond(self, weights, cond, key, out_T: int, ffs=None):
        """Pallas decode over a prebuilt conditioning stream, optionally
        sharded over the mesh's 'data' axis (fold axis = cond axis 1)."""
        from wavernn_tpu.ops import pallas_decode

        use_ff = ffs is not None and self._ff_policy(cond.shape[1])
        fn = lambda w, c, k: pallas_decode.decode(
            w, None, None, k, mode=self.cfg.mode,
            n_classes=self.cfg.n_classes, cond=c, out_T=out_T,
            int8_gates=self.int8_gates, int8_hh=self.int8_hh,
            int8_ff=use_ff, ff_scales=ffs if use_ff else None,
            deterministic=self.deterministic,
        )
        if self.mesh is not None:
            from wavernn_tpu.parallel.mesh import shard_cond_decode

            return shard_cond_decode(self.mesh, fn, weights, cond, key)
        return fn(weights, cond, key)
