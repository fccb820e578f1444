"""Fused Pallas TPU kernel for the Tacotron decoder step (free-running TTS).

The Tacotron decode loop is the TTS analog of the WaveRNN sample loop
(SURVEY.md C22): one strictly serial cell per r-frame group — prenet,
attention GRU, location-sensitive attention, two residual LSTMs, mel
projection (ref Decoder.forward, models/tacotron.py:229-279).  Under XLA the
eval-mode cell compiles to ~30 tiny latency-bound ops (~10.4 us/step at
B=1 measured on v5e — each (1,512)x(512,2048) projection lowers to a VPU
multiply+reduce, and every op pays dispatch/fusion latency).

This kernel fuses the entire step with all decoder weights pinned in VMEM
as bf16 (~10 MB), the same design as ops/pallas_decode.py:

  * the location conv (31-tap, 2->32 channels; ref LSA, tacotron.py:171-205)
    is computed as ONE matmul: the per-step attention rows are rolled into a
    (64, L_pad) window matrix X_T (62 lane-rolls + row stores), and the
    conv filter and the location projection L are FOLDED at pack time into a
    single (256, 64) matrix M, so  processed_loc^T = M @ X_T,
  * all per-position tensors live transposed — (256, L_pad) with text
    positions on lanes — so the score contraction  u = v . tanh(...)  and
    the context reduction  c = scores @ enc  are single MXU dots with no
    in-kernel transposes (Mosaic supports neither lane->sublane reshapes
    nor 2-D transposes on these shapes),
  * the attention-hidden column needed by the query projection comes from a
    (1,D)->(D,1) vector transpose (the one layout crossing the step cannot
    avoid; Mosaic lowers it directly),
  * N decoder steps run per kernel launch; the caller's while_loop keeps
    the early-exit semantics (stop when every utterance is silent,
    ref: models/tacotron.py:411).

Scope: eval-mode LSA decode, batch 1 (the latency-bound interactive case).
Batched generation stays on the XLA scan path (infer/tacotron.py), which is
throughput-efficient at B>=8.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
KTAPS = 31  # LSA conv kernel width (ref: models/tacotron.py:176)
PAD = (KTAPS - 1) // 2


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass
class TTSDecodeWeights:
    """Raw decoder weights extracted from the flax param tree (the TTS analog
    of ops/decode.extract_decode_weights)."""

    prenet_fc1_w: jnp.ndarray   # (n_mels, D)
    prenet_fc1_b: jnp.ndarray
    prenet_fc2_w: jnp.ndarray   # (D, D//2)
    prenet_fc2_b: jnp.ndarray
    attn_w_ih: jnp.ndarray      # (D + D//2, 3D)
    attn_w_hh: jnp.ndarray      # (D, 3D)
    attn_b_ih: jnp.ndarray
    attn_b_hh: jnp.ndarray
    conv_w: jnp.ndarray         # (31, 2, F)
    L_w: jnp.ndarray            # (F, D)
    L_b: jnp.ndarray
    W_w: jnp.ndarray            # (D, D)
    W_b: jnp.ndarray
    v_w: jnp.ndarray            # (D, 1)
    rnn_in_w: jnp.ndarray       # (2D, lstm)
    rnn_in_b: jnp.ndarray
    lstm1_w_ih: jnp.ndarray     # (lstm, 4*lstm)
    lstm1_w_hh: jnp.ndarray
    lstm1_b_ih: jnp.ndarray
    lstm1_b_hh: jnp.ndarray
    lstm2_w_ih: jnp.ndarray
    lstm2_w_hh: jnp.ndarray
    lstm2_b_ih: jnp.ndarray
    lstm2_b_hh: jnp.ndarray
    mel_w: jnp.ndarray          # (lstm, n_mels * MAX_R)


def extract_tts_decode_weights(params) -> TTSDecodeWeights:
    """params: the model's ``variables['params']`` tree."""
    d = params["decoder"]
    a = d["attn_net"]
    return TTSDecodeWeights(
        prenet_fc1_w=d["prenet"]["fc1"]["kernel"],
        prenet_fc1_b=d["prenet"]["fc1"]["bias"],
        prenet_fc2_w=d["prenet"]["fc2"]["kernel"],
        prenet_fc2_b=d["prenet"]["fc2"]["bias"],
        attn_w_ih=d["attn_rnn"]["w_ih"], attn_w_hh=d["attn_rnn"]["w_hh"],
        attn_b_ih=d["attn_rnn"]["b_ih"], attn_b_hh=d["attn_rnn"]["b_hh"],
        conv_w=a["conv"]["kernel"],
        L_w=a["L"]["kernel"], L_b=a["L"]["bias"],
        W_w=a["W"]["kernel"], W_b=a["W"]["bias"],
        v_w=a["v"]["kernel"],
        rnn_in_w=d["rnn_input"]["kernel"], rnn_in_b=d["rnn_input"]["bias"],
        lstm1_w_ih=d["res_rnn1"]["w_ih"], lstm1_w_hh=d["res_rnn1"]["w_hh"],
        lstm1_b_ih=d["res_rnn1"]["b_ih"], lstm1_b_hh=d["res_rnn1"]["b_hh"],
        lstm2_w_ih=d["res_rnn2"]["w_ih"], lstm2_w_hh=d["res_rnn2"]["w_hh"],
        lstm2_b_ih=d["res_rnn2"]["b_ih"], lstm2_b_hh=d["res_rnn2"]["b_hh"],
        mel_w=d["mel_proj"]["kernel"],
    )


jax.tree_util.register_pytree_node(
    TTSDecodeWeights,
    lambda w: (tuple(getattr(w, f) for f in w.__dataclass_fields__), None),
    lambda _, leaves: TTSDecodeWeights(*leaves),
)


# The X_T window matrix has 64 rows: rows [0, 31) hold the cumulative-
# attention row rolled by each conv tap, rows [32, 63) the previous-
# attention row; rows 31 and 63 stay zero (sublane padding).
XT_ROWS = 64


def pack_tts_weights(w: TTSDecodeWeights, r: int, n_mels: int,
                     dtype=jnp.bfloat16, int8_lstm: bool = False):
    """Split/pad the decoder weights into the kernel's aligned layout.

    Matmul weights go to ``dtype`` (bf16 default: VMEM residency, ~10 MB
    total), biases and small vectors stay f32 — the same precision scheme
    as the WaveRNN decode kernel (ops/pallas_decode.py), validated there to
    be distribution-level exact.

    ``int8_lstm`` stores the four residual-LSTM matrices (8.4 of the 10 MB
    per step) as int8 with per-column symmetric scales, activations
    dynamically quantized per row in-kernel (same scheme as the WaveRNN
    kernel's int8_gates).  Measured on v5e: a FIDELITY knob, not a speed
    knob — trained-weights mel delta vs the f32 scan drops 0.0073 -> 0.0042
    (per-column scales + f32 accumulation out-resolve bf16), at ~10% step
    cost (3.12 -> 3.43 us; at B=1 the serial quantization chain outweighs
    the byte savings, unlike the 64-row WaveRNN kernel).  Default off."""
    f32 = lambda a: jnp.asarray(a, jnp.float32)
    bf = lambda a: jnp.asarray(a, dtype)

    def q8(mat):
        mat = f32(mat)
        m = jnp.max(jnp.abs(mat), axis=0, keepdims=True)
        s = jnp.where(m > 0, m, 1.0) / 127.0
        return jnp.round(mat / s).astype(jnp.int8), s
    D = w.attn_w_hh.shape[0]          # decoder_dims
    Dh = w.prenet_fc2_w.shape[1]      # D // 2 (prenet output)
    H = w.lstm1_w_hh.shape[0]         # lstm_dims
    F = w.conv_w.shape[2]             # location filters
    MAX_R = w.mel_w.shape[1] // n_mels

    def pad_rows(mat, total_rows):
        return jnp.pad(jnp.asarray(mat), ((0, total_rows - mat.shape[0]),
                                          (0, 0)))

    def gru_bias(b_ih, b_hh):
        b = jnp.concatenate([
            f32(b_ih[: 2 * D] + b_hh[: 2 * D]), f32(b_ih[2 * D:]),
        ])[None]
        return b, f32(b_hh[2 * D:])[None]

    b_attn, b_attn_hn = gru_bias(w.attn_b_ih, w.attn_b_hh)

    # fold the location conv and the L projection into one (D, XT_ROWS)
    # matrix: ploc^T = M_loc @ X_T with X_T rows = rolled attention rows
    conv = f32(w.conv_w)                            # (31, 2, F)
    Lw = f32(w.L_w)                                 # (F, D)
    m_cum = jnp.einsum("tf,fd->dt", conv[:, 0], Lw)   # (D, 31)
    m_prev = jnp.einsum("tf,fd->dt", conv[:, 1], Lw)  # (D, 31)
    zcol = jnp.zeros((D, 1), jnp.float32)
    M_loc = jnp.concatenate([m_cum, zcol, m_prev, zcol], axis=1)  # (D, 64)

    # mel projection: keep only the first r of the MAX_R frame slots and
    # lay each frame in its own 128-lane block (aligned prev-frame slice)
    mel = f32(w.mel_w).reshape(H, n_mels, MAX_R)[:, :, :r]
    mel = jnp.transpose(mel, (0, 2, 1))             # (H, r, n_mels)
    mel = jnp.pad(mel, ((0, 0), (0, 0), (0, LANE - n_mels)))
    mel = mel.reshape(H, r * LANE)

    if int8_lstm:
        l1_ih, l1_ih_s = q8(w.lstm1_w_ih)
        l1_hh, l1_hh_s = q8(w.lstm1_w_hh)
        l2_ih, l2_ih_s = q8(w.lstm2_w_ih)
        l2_hh, l2_hh_s = q8(w.lstm2_w_hh)
        lstm_entries = dict(
            l1_ih=l1_ih, l1_ih_s=l1_ih_s, l1_hh=l1_hh, l1_hh_s=l1_hh_s,
            l2_ih=l2_ih, l2_ih_s=l2_ih_s, l2_hh=l2_hh, l2_hh_s=l2_hh_s,
        )
    else:
        lstm_entries = dict(
            l1_ih=bf(w.lstm1_w_ih), l1_hh=bf(w.lstm1_w_hh),
            l2_ih=bf(w.lstm2_w_ih), l2_hh=bf(w.lstm2_w_hh),
        )

    n_mels_pad = _round_up(n_mels, LANE)
    return dict(
        **lstm_entries,
        p1_w=bf(pad_rows(w.prenet_fc1_w, n_mels_pad)),   # (128, D)
        p1_b=f32(w.prenet_fc1_b)[None],
        p2_w=bf(w.prenet_fc2_w),                         # (D, Dh)
        p2_b=f32(w.prenet_fc2_b)[None],
        wih_c=bf(w.attn_w_ih[:D]),                       # (D, 3D)
        wih_p=bf(pad_rows(w.attn_w_ih[D:], _round_up(Dh, LANE))),
        whh=bf(w.attn_w_hh),                             # (D, 3D)
        b_attn=b_attn, b_attn_hn=b_attn_hn,
        M_loc=bf(M_loc),                                 # (D, 64)
        b_q_col=f32(w.L_b + w.W_b)[:, None],             # (D, 1)
        W_qT=bf(w.W_w.T),                                # (D, D)
        v_row=bf(w.v_w.T),                               # (1, D)
        ri_c=bf(w.rnn_in_w[:D]),                         # (D, H)
        ri_h=bf(w.rnn_in_w[D:]),                         # (D, H)
        ri_b=f32(w.rnn_in_b)[None],
        l1_b=f32(w.lstm1_b_ih + w.lstm1_b_hh)[None],
        l2_b=f32(w.lstm2_b_ih + w.lstm2_b_hh)[None],
        mel_w=bf(mel),                                   # (H, r*LANE)
    )


def _tts_weight_order(int8_lstm: bool):
    order = [
        "p1_w", "p1_b", "p2_w", "p2_b",
        "wih_c", "wih_p", "whh", "b_attn", "b_attn_hn",
        "M_loc", "b_q_col", "W_qT", "v_row",
        "ri_c", "ri_h", "ri_b",
        "l1_ih", "l1_hh", "l1_b", "l2_ih", "l2_hh", "l2_b",
        "mel_w",
    ]
    if int8_lstm:
        order += ["l1_ih_s", "l1_hh_s", "l2_ih_s", "l2_hh_s"]
    return order


def _tts_decode_kernel(
    # args: the packed weights in _tts_weight_order (int8_lstm appends the
    # four LSTM scale rows), then encoder context, carried state, outputs
    # and scratch — see tts_decode_chunk for the exact shapes
    *rest,
    n_steps: int,
    r: int,
    n_mels: int,
    mask_L: int,    # attended text length (scores masked beyond it)
    int8_lstm: bool = False,
):
    names = _tts_weight_order(int8_lstm)
    ws = dict(zip(names, rest))
    (enc,            # (L_pad, D) f32, zero rows beyond L
     encp_T,         # (D, L_pad) f32 — encoder projection, transposed
     prev_mel_in,    # (1, LANE) f32 (n_mels real lanes)
     h_attn_in,      # (1, D)
     h1_in, c1_in, h2_in, c2_in,   # (1, H)
     ctx_in,         # (1, D)
     cum_in, prv_in,  # (1, L_pad)
     mels_out,       # (N, r*LANE) f32
     scores_out,     # (N, L_pad) f32
     stop_out,       # (N, LANE) f32 — max real mel value this step (bcast)
     prev_mel_o, h_attn_o, h1_o, c1_o, h2_o, c2_o, ctx_o, cum_o, prv_o,
     xt_ref,         # (XT_ROWS, L_pad) f32 — rolled attention window matrix
     ) = rest[len(names):]
    p1_w, p1_b, p2_w, p2_b = ws["p1_w"], ws["p1_b"], ws["p2_w"], ws["p2_b"]
    wih_c, wih_p, whh = ws["wih_c"], ws["wih_p"], ws["whh"]
    b_attn, b_attn_hn = ws["b_attn"], ws["b_attn_hn"]
    M_loc, b_q_col, W_qT, v_row = (ws["M_loc"], ws["b_q_col"], ws["W_qT"],
                                   ws["v_row"])
    ri_c, ri_h, ri_b = ws["ri_c"], ws["ri_h"], ws["ri_b"]
    l1_ih, l1_hh, l1_b = ws["l1_ih"], ws["l1_hh"], ws["l1_b"]
    l2_ih, l2_hh, l2_b = ws["l2_ih"], ws["l2_hh"], ws["l2_b"]
    mel_w = ws["mel_w"]
    D = h_attn_in.shape[1]
    H = h1_in.shape[1]
    L_pad = cum_in.shape[1]

    wdt = whh.dtype  # weight/compute dtype (bf16 prod, f32 exact tests)
    bf = lambda x: x.astype(wdt)

    def dot(a, b):
        return jnp.dot(bf(a), b, preferred_element_type=jnp.float32)

    def ldot(a, wq, scale_name):
        """LSTM matmul: ``wdt``, or int8 weights + per-row dynamic
        activation quantization (same scheme as pallas_decode.gdot)."""
        if not int8_lstm:
            return jnp.dot(bf(a), wq[...], preferred_element_type=jnp.float32)
        sa = jnp.maximum(jnp.max(jnp.abs(a), axis=1, keepdims=True),
                         1e-8) * (1.0 / 127.0)
        qa = jnp.round(a / sa).astype(jnp.int8)
        acc = jax.lax.dot_general(
            qa, wq[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (sa * ws[scale_name][...])

    xt_ref[...] = jnp.zeros_like(xt_ref)

    lane_mask = jax.lax.broadcasted_iota(jnp.int32, (1, L_pad), 1) < mask_L
    mel_lane = jax.lax.broadcasted_iota(jnp.int32, (1, r * LANE), 1)
    mel_valid = (mel_lane % LANE) < n_mels
    enc_bf = bf(enc[...])
    encp = encp_T[...]

    def step_body(i, carry):
        prev_mel, h_attn, h1, c1, h2, c2, context, cum, prv = carry

        # ---- prenet (eval mode: no dropout; ref tacotron.py:135-149)
        p1 = jax.nn.relu(dot(prev_mel, p1_w[...]) + p1_b[...])
        p2 = jax.nn.relu(dot(p1, p2_w[...]) + p2_b[...])
        if p2.shape[1] < wih_p.shape[0]:   # small-config prenet: lane-pad
            p2 = jnp.pad(p2, ((0, 0), (0, wih_p.shape[0] - p2.shape[1])))

        # ---- attention GRU (torch gate convention, b_attn packs
        #      b_ih+b_hh for r/z and b_ih for n)
        gi = dot(context, wih_c[...]) + dot(p2, wih_p[...]) + b_attn[...]
        gh = dot(h_attn, whh[...])
        rg = jax.nn.sigmoid(gi[:, :D] + gh[:, :D])
        zg = jax.nn.sigmoid(gi[:, D:2 * D] + gh[:, D:2 * D])
        ng = jnp.tanh(gi[:, 2 * D:] + rg * (gh[:, 2 * D:] + b_attn_hn[...]))
        h_attn = (1.0 - zg) * ng + zg * h_attn

        # ---- location-sensitive attention (ref tacotron.py:171-205)
        # window matrix: row t = cum rolled by (t - PAD), row 32+t = prev;
        # rolls wrap through the zero lane padding (L <= L_pad - PAD)
        for t in range(KTAPS):
            sh = (PAD - t) % L_pad
            xt_ref[pl.ds(t, 1), :] = pltpu.roll(cum, shift=sh, axis=1)
            xt_ref[pl.ds(XT_ROWS // 2 + t, 1), :] = pltpu.roll(
                prv, shift=sh, axis=1)

        # conv + L projection folded into ONE dot (pack_tts_weights)
        ploc_T = jnp.dot(M_loc[...], bf(xt_ref[...]),
                         preferred_element_type=jnp.float32)  # (D, L_pad)
        # query column: (1,D) -> (D,1) vector transpose (supported by
        # Mosaic; an rhs-transposed dot_general trips a mixed-precision
        # lowering bug here)
        pq_col = jnp.dot(W_qT[...], bf(h_attn).T,
                         preferred_element_type=jnp.float32)  # (D, 1)
        targ = jnp.tanh(ploc_T + encp + pq_col + b_q_col[...])
        u_row = dot(v_row[...], bf(targ))             # (1, L_pad)
        sig = jnp.where(lane_mask, jax.nn.sigmoid(u_row), 0.0)
        scores = sig / jnp.sum(sig, axis=1, keepdims=True)
        cum = cum + scores
        prv = scores
        context = dot(scores, enc_bf)                 # (1, D)

        # ---- residual LSTMs (ref tacotron.py:260-272)
        x = dot(context, ri_c[...]) + dot(h_attn, ri_h[...]) + ri_b[...]

        def lstm(x, h, c, w_ih, w_hh, b, ih_s, hh_s):
            g = ldot(x, w_ih, ih_s) + ldot(h, w_hh, hh_s) + b[...]
            i_g = jax.nn.sigmoid(g[:, :H])
            f_g = jax.nn.sigmoid(g[:, H:2 * H])
            g_g = jnp.tanh(g[:, 2 * H:3 * H])
            o_g = jax.nn.sigmoid(g[:, 3 * H:])
            c = f_g * c + i_g * g_g
            return o_g * jnp.tanh(c), c

        h1, c1 = lstm(x, h1, c1, l1_ih, l1_hh, l1_b, "l1_ih_s", "l1_hh_s")
        x = x + h1
        h2, c2 = lstm(x, h2, c2, l2_ih, l2_hh, l2_b, "l2_ih_s", "l2_hh_s")
        x = x + h2

        # ---- mel projection: frame j in lanes [j*LANE, j*LANE + n_mels)
        mels = dot(x, mel_w[...])                     # (1, r*LANE)
        prev_mel = mels[:, (r - 1) * LANE:]

        # ---- outputs
        mels_out[pl.ds(i, 1), :] = mels
        scores_out[pl.ds(i, 1), :] = scores
        gmax = jnp.max(jnp.where(mel_valid, mels, -jnp.inf),
                       axis=1, keepdims=True)
        stop_out[pl.ds(i, 1), :] = jnp.broadcast_to(gmax, (1, LANE))

        return (prev_mel, h_attn, h1, c1, h2, c2, context, cum, prv)

    carry0 = (prev_mel_in[...], h_attn_in[...], h1_in[...], c1_in[...],
              h2_in[...], c2_in[...], ctx_in[...], cum_in[...], prv_in[...])
    carry = jax.lax.fori_loop(0, n_steps, step_body, carry0)

    (prev_mel_o[...], h_attn_o[...], h1_o[...], c1_o[...], h2_o[...],
     c2_o[...], ctx_o[...], cum_o[...], prv_o[...]) = carry


@dataclass
class TTSDecodeState:
    """Carried decoder state between chunked kernel launches (the
    functionalized form of init_decoder_carry, models/tacotron.py)."""

    prev_mel: jnp.ndarray   # (1, LANE)
    h_attn: jnp.ndarray     # (1, D)
    h1: jnp.ndarray         # (1, H)
    c1: jnp.ndarray
    h2: jnp.ndarray
    c2: jnp.ndarray
    context: jnp.ndarray    # (1, D)
    cum: jnp.ndarray        # (1, L_pad)
    prv: jnp.ndarray        # (1, L_pad)


jax.tree_util.register_pytree_node(
    TTSDecodeState,
    lambda s: (tuple(getattr(s, f) for f in s.__dataclass_fields__), None),
    lambda _, leaves: TTSDecodeState(*leaves),
)


def init_tts_decode_state(D: int, H: int, L_pad: int) -> TTSDecodeState:
    z = lambda n: jnp.zeros((1, n), jnp.float32)
    return TTSDecodeState(
        prev_mel=z(LANE), h_attn=z(D), h1=z(H), c1=z(H), h2=z(H), c2=z(H),
        context=z(D), cum=z(L_pad), prv=z(L_pad),
    )


def attn_pad_len(L: int) -> int:
    """Lane padding for the attention axis: rolls must wrap through zeros,
    so the padded width leaves at least PAD zero lanes past L."""
    return _round_up(L + PAD, LANE)


_STATE_FIELDS = list(TTSDecodeState.__dataclass_fields__)


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "r", "n_mels", "mask_L", "interpret",
                     "int8_lstm"),
)
def tts_decode_chunk(
    packed: dict,
    enc: jnp.ndarray,        # (L_pad, D) f32, zero rows beyond mask_L
    encp_T: jnp.ndarray,     # (D, L_pad) f32
    state: TTSDecodeState,
    n_steps: int,
    r: int,
    n_mels: int,
    mask_L: int,
    interpret: bool = False,
    int8_lstm: bool = False,
):
    """Run ``n_steps`` fused decoder steps.  Returns
    (mels (n_steps, r*LANE), scores (n_steps, L_pad),
     stop_max (n_steps,), new_state)."""
    D = state.h_attn.shape[1]
    H = state.h1.shape[1]
    L_pad = state.cum.shape[1]
    assert enc.shape == (L_pad, D) and encp_T.shape == (D, L_pad)
    assert n_steps % 8 == 0, "n_steps must be a multiple of the sublane tile"

    kernel = functools.partial(
        _tts_decode_kernel,
        n_steps=n_steps, r=r, n_mels=n_mels, mask_L=mask_L,
        int8_lstm=int8_lstm,
    )

    order = _tts_weight_order(int8_lstm)
    n_in = len(order) + 2 + len(_STATE_FIELDS)
    out_shapes = (
        jax.ShapeDtypeStruct((n_steps, r * LANE), jnp.float32),
        jax.ShapeDtypeStruct((n_steps, L_pad), jnp.float32),
        jax.ShapeDtypeStruct((n_steps, LANE), jnp.float32),
        jax.ShapeDtypeStruct((1, LANE), jnp.float32),   # prev_mel
        jax.ShapeDtypeStruct((1, D), jnp.float32),      # h_attn
        jax.ShapeDtypeStruct((1, H), jnp.float32),      # h1
        jax.ShapeDtypeStruct((1, H), jnp.float32),      # c1
        jax.ShapeDtypeStruct((1, H), jnp.float32),      # h2
        jax.ShapeDtypeStruct((1, H), jnp.float32),      # c2
        jax.ShapeDtypeStruct((1, D), jnp.float32),      # context
        jax.ShapeDtypeStruct((1, L_pad), jnp.float32),  # cum
        jax.ShapeDtypeStruct((1, L_pad), jnp.float32),  # prv
    )

    outs = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shapes
        ),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((XT_ROWS, L_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        *[packed[k] for k in order],
        enc, encp_T,
        *[getattr(state, f) for f in _STATE_FIELDS],
    )

    mels, scores, stop = outs[0], outs[1], outs[2]
    new_state = TTSDecodeState(*outs[3:])
    return mels, scores, stop[:, 0], new_state
