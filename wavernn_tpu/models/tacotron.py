"""Tacotron seq2seq TTS model — TPU-native re-design.

Architecture parity with ref models/tacotron.py:282-469: CBHG encoder over
character embeddings; autoregressive decoder with location-sensitive
("smooth" sigmoid-normalized) attention, two zoneout-LSTM residual layers and
r-frames-per-step reduction; CBHG postnet + linear projection.

TPU-first differences:
  * channel-last (B, T, C) layout,
  * the decoder loop is a single ``nn.scan`` over a DecoderCell whose carry
    holds *all* recurrent state — GRU/LSTM hiddens, context vector, and the
    LSA cumulative/previous attention (the reference keeps those as mutable
    Python attributes, ref: models/tacotron.py:178-204),
  * teacher-forced prenet frames are gathered in one op before the scan,
  * inference (infer/tacotron.py) runs a fixed-length scan over the exposed
    ``decode_step`` with a done-mask instead of a Python ``break``
    (ref: models/tacotron.py:411), trimmed on host,
  * r (frames per decoder step) is a static call argument: each curriculum
    session compiles its own optimal program instead of branching on a buffer.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from wavernn_tpu.ops.rnn import BiGRU, _uniform_init, gru_cell_step, lstm_cell_step

MAX_R = 20  # ref: models/tacotron.py:211


@dataclass(frozen=True)
class TacotronConfig:
    embed_dims: int = 256
    num_chars: int = 148
    encoder_dims: int = 128
    decoder_dims: int = 256
    n_mels: int = 80
    fft_bins: int = 80      # training pipeline predicts mels in both heads
    postnet_dims: int = 128
    encoder_K: int = 16
    lstm_dims: int = 512
    postnet_K: int = 8
    num_highways: int = 4
    dropout: float = 0.5
    stop_threshold: float = -3.4
    attn_mode: str = "lsa"  # 'lsa' (location-sensitive, default) | 'additive'
    # jax.checkpoint the decoder scan cell: the backward recomputes the
    # (fat) per-step decoder activations from the carry instead of stashing
    # them to HBM — same win as the WaveRNN scan remat
    decoder_remat: bool = True
    # decoder scan unroll: the cell is ~30 small latency-bound ops, so
    # unrolling lets the TPU scheduler pipeline consecutive steps
    # (10 measured ~1 ms/step better than 5 both before and after the
    # mask hoist, tools/tts_train_probe.py)
    decoder_unroll: int = 10

    @classmethod
    def from_hp(cls, hp, num_chars: int) -> "TacotronConfig":
        return cls(
            embed_dims=hp.tts_embed_dims,
            num_chars=num_chars,
            encoder_dims=hp.tts_encoder_dims,
            decoder_dims=hp.tts_decoder_dims,
            attn_mode=hp.get("tts_attn_mode", "lsa"),
            n_mels=hp.num_mels,
            fft_bins=hp.num_mels,
            postnet_dims=hp.tts_postnet_dims,
            encoder_K=hp.tts_encoder_K,
            lstm_dims=hp.tts_lstm_dims,
            postnet_K=hp.tts_postnet_K,
            num_highways=hp.tts_num_highways,
            dropout=hp.tts_dropout,
            stop_threshold=hp.tts_stop_threshold,
        )


_xavier = nn.initializers.xavier_uniform()


class Dense(nn.Module):
    """Linear with xavier-uniform kernel + zero bias (ref init_model,
    models/tacotron.py:432-434)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", _xavier, (x.shape[-1], self.features))
        y = x @ k
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class HighwayNetwork(nn.Module):
    """g·relu(W1 x) + (1-g)·x with g = σ(W2 x) (ref: tacotron.py:10-22)."""

    size: int

    @nn.compact
    def __call__(self, x):
        x1 = Dense(self.size, name="W1")(x)
        x2 = Dense(self.size, name="W2")(x)
        g = jax.nn.sigmoid(x2)
        return g * nn.relu(x1) + (1.0 - g) * x


class BatchNormConv(nn.Module):
    """Conv1d (no bias) → optional relu → batch norm (ref: tacotron.py:42-52).
    Even kernels pad k//2 both sides and crop right, matching torch."""

    out_channels: int
    kernel: int
    relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        T = x.shape[1]
        pad = self.kernel // 2
        y = nn.Conv(
            self.out_channels, kernel_size=(self.kernel,),
            padding=((pad, pad),), use_bias=False,
            kernel_init=_xavier, name="conv",
        )(x)[:, :T]
        if self.relu:
            y = nn.relu(y)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bnorm")(y)


class PreNet(nn.Module):
    """Two relu+dropout FC layers (ref: tacotron.py:135-149)."""

    fc1_dims: int = 256
    fc2_dims: int = 128
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool, masks=None):
        """``masks``: optional pregenerated keep-masks (m1, m2) replacing
        the in-call dropout PRNG — used by the decoder scan, where per-step
        ``make_rng`` calls are latency-expensive.  Same semantics as
        nn.Dropout: keep with probability 1-dropout, scale by 1/(1-p)."""
        keep = 1.0 - self.dropout
        x = nn.relu(Dense(self.fc1_dims, name="fc1")(x))
        if masks is not None:
            if train:
                x = jnp.where(masks[0], x / keep, 0.0)
        else:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.relu(Dense(self.fc2_dims, name="fc2")(x))
        if masks is not None:
            if train:
                x = jnp.where(masks[1], x / keep, 0.0)
        else:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class CBHG(nn.Module):
    """Conv bank + highway + BiGRU sequence encoder (ref: tacotron.py:55-128)."""

    K: int
    channels: int
    proj_channels: Tuple[int, int]
    num_highways: int

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        seq_len = x.shape[1]

        # Convolution bank: kernels 1..K over the time axis
        conv_bank = jnp.concatenate(
            [
                BatchNormConv(self.channels, k, name=f"bank{k}")(x, train)
                for k in range(1, self.K + 1)
            ],
            axis=-1,
        )

        # max pool k=2 stride=1 with left pad (torch crops the right overhang)
        pooled = jnp.maximum(
            conv_bank,
            jnp.pad(conv_bank, ((0, 0), (1, 0), (0, 0)),
                    constant_values=-jnp.inf)[:, :seq_len],
        )

        y = BatchNormConv(self.proj_channels[0], 3, name="conv_project1")(pooled, train)
        y = BatchNormConv(self.proj_channels[1], 3, relu=False,
                          name="conv_project2")(y, train)
        y = y + residual

        if self.proj_channels[-1] != self.channels:
            y = Dense(self.channels, use_bias=False, name="pre_highway")(y)
        for i in range(self.num_highways):
            y = HighwayNetwork(self.channels, name=f"highway{i}")(y)

        return BiGRU(self.channels, name="rnn")(y)


class Encoder(nn.Module):
    """Char embedding → prenet → CBHG (ref: tacotron.py:25-39)."""

    cfg: TacotronConfig

    @nn.compact
    def __call__(self, x, train: bool):
        c = self.cfg
        e = nn.Embed(c.num_chars, c.embed_dims, embedding_init=_xavier,
                     name="embedding")(x)
        # prenet output feeds the CBHG residual: fc2 == encoder_dims
        # (reference hardcodes 256→128 with encoder_dims=128, tacotron.py:136)
        e = PreNet(fc1_dims=2 * c.encoder_dims, fc2_dims=c.encoder_dims,
                   dropout=c.dropout, name="pre_net")(e, train)
        return CBHG(c.encoder_K, c.encoder_dims,
                    (c.encoder_dims, c.encoder_dims),
                    c.num_highways, name="cbhg")(e, train)


class AdditiveAttention(nn.Module):
    """Plain Bahdanau-style additive attention with softmax scores
    (ref Attention, tacotron.py:152-168 — the reference's non-location-
    sensitive alternative, selectable via TacotronConfig.attn_mode)."""

    attn_dim: int

    @nn.compact
    def __call__(self, encoder_seq_proj, query, cumulative, attention_prev):
        processed_query = Dense(self.attn_dim, use_bias=False, name="W")(query)[:, None]
        u = Dense(1, use_bias=False, name="v")(
            jnp.tanh(encoder_seq_proj + processed_query)
        )[..., 0]
        return jax.nn.softmax(u, axis=1)


class LSA(nn.Module):
    """Location-sensitive attention with sigmoid-normalized ('smooth') scores
    (ref: tacotron.py:171-205).  Stateless: cumulative/previous attention
    arrive in and leave with the scan carry."""

    attn_dim: int
    kernel_size: int = 31
    filters: int = 32

    @nn.compact
    def __call__(self, encoder_seq_proj, query, cumulative, attention_prev):
        loc = jnp.stack([cumulative, attention_prev], axis=-1)  # (B, T, 2)
        pad = (self.kernel_size - 1) // 2
        loc = nn.Conv(self.filters, kernel_size=(self.kernel_size,),
                      padding=((pad, pad),), use_bias=False,
                      kernel_init=_xavier, name="conv")(loc)
        processed_loc = Dense(self.attn_dim, name="L")(loc)               # (B,T,A)
        processed_query = Dense(self.attn_dim, name="W")(query)[:, None]  # (B,1,A)

        u = Dense(1, use_bias=False, name="v")(
            jnp.tanh(processed_query + encoder_seq_proj + processed_loc)
        )[..., 0]                                                         # (B,T)

        sig = jax.nn.sigmoid(u)
        return sig / jnp.sum(sig, axis=1, keepdims=True)  # smooth attention


class _KernelParam(nn.Module):
    """Bias-free kernel holder with Dense's param path (``<name>/kernel``)
    for call sites that consume the kernel directly (e.g. r-sliced)."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", _xavier, self.shape)


class _RawGRUCell(nn.Module):
    """GRU cell with torch-layout raw params (scan-broadcast friendly)."""

    hidden: int

    @nn.compact
    def __call__(self, x, h):
        bound = 1.0 / self.hidden ** 0.5
        w_ih = self.param("w_ih", _xavier, (x.shape[-1], 3 * self.hidden))
        w_hh = self.param("w_hh", _xavier, (self.hidden, 3 * self.hidden))
        b_ih = self.param("b_ih", _uniform_init(bound), (3 * self.hidden,))
        b_hh = self.param("b_hh", _uniform_init(bound), (3 * self.hidden,))
        return gru_cell_step(x, h, w_ih, w_hh, b_ih, b_hh)


class _RawLSTMCell(nn.Module):
    """LSTM cell with torch-layout raw params."""

    hidden: int

    @nn.compact
    def __call__(self, x, h, c):
        bound = 1.0 / self.hidden ** 0.5
        w_ih = self.param("w_ih", _xavier, (x.shape[-1], 4 * self.hidden))
        w_hh = self.param("w_hh", _xavier, (self.hidden, 4 * self.hidden))
        b_ih = self.param("b_ih", _uniform_init(bound), (4 * self.hidden,))
        b_hh = self.param("b_hh", _uniform_init(bound), (4 * self.hidden,))
        return lstm_cell_step(x, h, c, w_ih, w_hh, b_ih, b_hh)


class DecoderCell(nn.Module):
    """One decoder step: prenet → attention GRU → LSA → 2× zoneout-LSTM →
    mel projection (ref Decoder.forward, tacotron.py:229-279).

    ``r`` and ``train`` are static call arguments (nn.broadcast under scan).
    """

    cfg: TacotronConfig
    zoneout_p: float = 0.1

    @staticmethod
    def _zoneout(prev, current, keep_mask):
        return jnp.where(keep_mask, prev, current)

    @nn.compact
    def __call__(self, carry, encoder_seq, encoder_seq_proj, prenet_in,
                 masks, r: int, train: bool):
        c = self.cfg
        (attn_h, r1_h, r1_c, r2_h, r2_c, context, cumulative, attn_prev) = carry
        # masks: per-step (prenet keep-mask x2, zoneout keep-prev mask x2),
        # pregenerated OUTSIDE the scan — 4 jax.random calls per step across
        # ~300 steps cost ~4 ms/fwd (and again in the remat backward) when
        # generated in-loop; batched generation makes them ~free
        pm1, pm2, z1, z2 = masks

        # attn_rnn input is decoder_dims + decoder_dims//2 (ref: tacotron.py:218)
        prenet_out = PreNet(fc1_dims=c.decoder_dims, fc2_dims=c.decoder_dims // 2,
                            dropout=c.dropout, name="prenet")(
                                prenet_in, train, masks=(pm1, pm2))

        # attention GRU
        attn_in = jnp.concatenate([context, prenet_out], axis=-1)
        attn_h = _RawGRUCell(c.decoder_dims, name="attn_rnn")(attn_in, attn_h)

        attn_cls = LSA if c.attn_mode == "lsa" else AdditiveAttention
        scores = attn_cls(c.decoder_dims, name="attn_net")(
            encoder_seq_proj, attn_h, cumulative, attn_prev
        )
        attn_prev = scores
        cumulative = cumulative + scores

        context = jnp.einsum("bt,btc->bc", scores, encoder_seq)

        x = Dense(c.lstm_dims, name="rnn_input")(
            jnp.concatenate([context, attn_h], axis=-1)
        )

        r1_h_next, r1_c = _RawLSTMCell(c.lstm_dims, name="res_rnn1")(x, r1_h, r1_c)
        r1_h = self._zoneout(r1_h, r1_h_next, z1) if train else r1_h_next
        x = x + r1_h

        r2_h_next, r2_c = _RawLSTMCell(c.lstm_dims, name="res_rnn2")(x, r2_h, r2_c)
        r2_h = self._zoneout(r2_h, r2_h_next, z2) if train else r2_h_next
        x = x + r2_h

        # mel_proj keeps the reference's (lstm, n_mels*MAX_R) kernel layout
        # and checkpoint path (ref: tacotron.py:219,278 — project all 20
        # r-slots, slice r), but the slice is applied to the KERNEL, not the
        # output: the per-step matmul is 80*r wide instead of 1600, and the
        # weight slice is loop-invariant so XLA hoists it out of the scan.
        w_mel = _KernelParam((x.shape[-1], c.n_mels * MAX_R),
                             name="mel_proj")()
        w_r = w_mel.reshape(x.shape[-1], c.n_mels, MAX_R)[:, :, :r]
        mels = jnp.einsum("bl,lmr->bmr", x, w_r)  # (B, n_mels, r)

        carry = (attn_h, r1_h, r1_c, r2_h, r2_c, context, cumulative, attn_prev)
        return carry, (mels, scores)


class Tacotron(nn.Module):
    """Full Tacotron graph (ref: tacotron.py:282-430).

    Exposed methods beyond ``__call__``: ``encode``, ``decode_step`` and
    ``postnet_forward`` — the building blocks the jitted free-running
    generator composes (infer/tacotron.py).
    """

    cfg: TacotronConfig

    def setup(self):
        c = self.cfg
        self.encoder = Encoder(c)
        self.encoder_proj = Dense(c.decoder_dims, use_bias=False)
        # static_argnums index the lifted core_fn (module at 0, then the
        # __call__ args): r and train land at positions 6, 7 — python
        # statics the remat must not trace
        cell = (nn.remat(DecoderCell, static_argnums=(6, 7))
                if c.decoder_remat else DecoderCell)
        self.decoder = nn.scan(
            cell,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=(nn.broadcast, nn.broadcast, 0, 0, nn.broadcast,
                     nn.broadcast),
            out_axes=0,
            unroll=c.decoder_unroll,
        )(c)
        self.postnet = CBHG(c.postnet_K, c.postnet_dims, (256, c.n_mels),
                            c.num_highways)
        self.post_proj = Dense(c.fft_bins, use_bias=False)

    # -- building blocks --------------------------------------------------------

    def init_decoder_carry(self, B: int, T_enc: int, dtype=jnp.float32):
        return init_decoder_carry(self.cfg, B, T_enc, dtype)

    def encode(self, x, train: bool = False):
        encoder_seq = self.encoder(x, train)
        return encoder_seq, self.encoder_proj(encoder_seq)

    def decode_step(self, carry, encoder_seq, encoder_seq_proj, prenet_in, r: int):
        """Single free-running decoder step (eval mode).  prenet_in: (B, n_mels)."""
        dummy = _dummy_masks(1)
        carry, (mels, scores) = self.decoder(
            carry, encoder_seq, encoder_seq_proj, prenet_in[None], dummy,
            r, False
        )
        return carry, (mels[0], scores[0])

    def postnet_forward(self, mel_outputs, train: bool = False):
        return self.post_proj(self.postnet(mel_outputs, train))

    # -- teacher-forced forward ---------------------------------------------------

    def __call__(self, x, m, r: int, train: bool = True,
                 generate_gta: bool = False):
        """x: (B, L) char ids; m: (B, T, n_mels) target mels (T % r == 0).
        Returns (mel_outputs (B,T,n_mels), linear (B,T,fft_bins),
                 attn_scores (B, T/r, L))."""
        if generate_gta:
            train = False
        c = self.cfg
        B, steps = m.shape[0], m.shape[1]
        assert steps % r == 0, "mel length must be an r-multiple"

        encoder_seq, encoder_seq_proj = self.encode(x, train)

        # teacher-forcing prenet inputs: GO frame then last frame of each group
        go = jnp.zeros((1, B, c.n_mels), m.dtype)
        idx = jnp.arange(1, steps // r) * r - 1
        prenet_seq = jnp.concatenate([go, jnp.swapaxes(m[:, idx], 0, 1)], axis=0)

        T_dec = steps // r
        if train:
            # all the scan's stochastic masks in 4 batched draws (see
            # DecoderCell docstring: in-loop make_rng was ~4 ms/forward)
            k1, k2, k3, k4 = jax.random.split(self.make_rng("dropout"), 4)
            keep = 1.0 - c.dropout
            masks = (
                jax.random.bernoulli(k1, keep, (T_dec, B, c.decoder_dims)),
                jax.random.bernoulli(k2, keep, (T_dec, B, c.decoder_dims // 2)),
                jax.random.bernoulli(k3, DecoderCell.zoneout_p,
                                     (T_dec, B, c.lstm_dims)),
                jax.random.bernoulli(k4, DecoderCell.zoneout_p,
                                     (T_dec, B, c.lstm_dims)),
            )
        else:
            masks = _dummy_masks(T_dec)

        carry0 = self.init_decoder_carry(B, x.shape[1], m.dtype)
        _, (mels, scores) = self.decoder(
            carry0, encoder_seq, encoder_seq_proj, prenet_seq, masks, r, train
        )
        # mels: (T/r, B, n_mels, r) → (B, T, n_mels)
        mel_outputs = jnp.transpose(mels, (1, 0, 3, 2)).reshape(B, steps, c.n_mels)
        attn_scores = jnp.swapaxes(scores, 0, 1)  # (B, T/r, L)

        linear = self.postnet_forward(mel_outputs, train)
        return mel_outputs, linear, attn_scores


def _dummy_masks(T_dec: int):
    """Placeholder eval-mode mask pytree for the decoder scan (same
    structure as the train masks; sliced per step then dead-code-eliminated
    since ``train`` is static)."""
    z = jnp.zeros((T_dec, 1, 1), jnp.bool_)
    return (z, z, z, z)


def init_decoder_carry(cfg: TacotronConfig, B: int, T_enc: int,
                       dtype=jnp.float32):
    """Zero-initialized decoder scan carry (the functionalized equivalent of
    the reference's per-call hidden-state zeroing, ref: tacotron.py:322-337)."""
    z = lambda *s: jnp.zeros(s, dtype)
    return (
        z(B, cfg.decoder_dims),                    # attn hidden
        z(B, cfg.lstm_dims), z(B, cfg.lstm_dims),  # lstm1 h, c
        z(B, cfg.lstm_dims), z(B, cfg.lstm_dims),  # lstm2 h, c
        z(B, cfg.decoder_dims),                    # context (= 2*encoder_dims)
        z(B, T_enc), z(B, T_enc),                  # cumulative, prev attention
    )


def tacotron_num_params(params) -> float:
    leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda a: a.size, params)
    )
    return sum(leaves) / 1_000_000
