"""Pallas Tacotron decoder kernel vs the flax decode_step scan path.

Interpret mode with f32-packed weights must reproduce the XLA decoder
step-for-step (same math, different schedule); the bf16 production packing
is validated end-to-end on real TPU by test_tpu_backend_parity (skipped
off-TPU).
"""

import json
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).parent.parent

from wavernn_tpu.models.tacotron import (
    Tacotron,
    TacotronConfig,
    init_decoder_carry,
)
from wavernn_tpu.ops.pallas_tts import (
    LANE,
    attn_pad_len,
    extract_tts_decode_weights,
    init_tts_decode_state,
    pack_tts_weights,
    tts_decode_chunk,
)


@pytest.fixture(scope="module")
def setup():
    cfg = TacotronConfig()
    model = Tacotron(cfg)
    rng = np.random.default_rng(7)
    L = 40
    x = jnp.asarray(rng.integers(1, cfg.num_chars, (1, L)).astype(np.int32))
    m0 = jnp.asarray(rng.uniform(-4, 4, (1, 8, cfg.n_mels)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, m0, 2, True,
    )
    enc, encp = model.apply(variables, x, False, method=Tacotron.encode)
    return cfg, model, variables, x, enc, encp


def _flax_rollout(cfg, model, variables, x, enc, encp, r, n_steps):
    carry = init_decoder_carry(cfg, 1, x.shape[1])
    prev = jnp.zeros((1, cfg.n_mels))
    mels_seq, scores_seq = [], []
    for _ in range(n_steps):
        carry, (mels, scores) = model.apply(
            variables, carry, enc, encp, prev, r,
            method=Tacotron.decode_step,
        )
        prev = mels[:, :, -1]
        mels_seq.append(np.asarray(mels[0]))      # (n_mels, r)
        scores_seq.append(np.asarray(scores[0]))  # (L,)
    return np.stack(mels_seq), np.stack(scores_seq)


def _kernel_rollout(cfg, variables, x, enc, encp, r, n_steps, dtype,
                    chunks=1):
    L = x.shape[1]
    L_pad = attn_pad_len(L)
    w = extract_tts_decode_weights(variables["params"])
    packed = pack_tts_weights(w, r, cfg.n_mels, dtype=dtype)
    enc_pad = jnp.pad(enc[0], ((0, L_pad - L), (0, 0)))
    encp_T = jnp.pad(encp[0].T, ((0, 0), (0, L_pad - L)))
    state = init_tts_decode_state(
        cfg.decoder_dims, cfg.lstm_dims, L_pad)
    mels_all, scores_all, stop_all = [], [], []
    per = n_steps // chunks
    for _ in range(chunks):
        mels_k, scores_k, stop_k, state = tts_decode_chunk(
            packed, enc_pad, encp_T, state, per, r, cfg.n_mels, L,
            interpret=True,
        )
        mels_all.append(np.asarray(mels_k))
        scores_all.append(np.asarray(scores_k))
        stop_all.append(np.asarray(stop_k))
    return (np.concatenate(mels_all), np.concatenate(scores_all),
            np.concatenate(stop_all))


@pytest.mark.parametrize("r", [2, 1])
def test_kernel_matches_decode_step(setup, r):
    cfg, model, variables, x, enc, encp = setup
    n_steps = 8
    mels_f, scores_f = _flax_rollout(
        cfg, model, variables, x, enc, encp, r, n_steps)
    mels_k, scores_k, stop_k = _kernel_rollout(
        cfg, variables, x, enc, encp, r, n_steps, jnp.float32)

    # kernel rows: frame j of step i in lanes [j*LANE, j*LANE + n_mels)
    mels_k = mels_k.reshape(n_steps, r, LANE)[:, :, : cfg.n_mels]
    mels_f = np.swapaxes(mels_f, 1, 2)            # (N, r, n_mels)
    np.testing.assert_allclose(mels_k, mels_f, atol=2e-4)
    np.testing.assert_allclose(
        scores_k[:, : x.shape[1]], scores_f, atol=2e-5)
    np.testing.assert_allclose(scores_k[:, x.shape[1]:], 0.0)
    np.testing.assert_allclose(
        stop_k, mels_f.reshape(n_steps, -1).max(axis=1), atol=2e-4)


def test_kernel_state_carries_across_chunks(setup):
    """Two 8-step launches == one 16-step launch (state round-trip)."""
    cfg, model, variables, x, enc, encp = setup
    m1, s1, _ = _kernel_rollout(
        cfg, variables, x, enc, encp, 2, 16, jnp.float32, chunks=1)
    m2, s2, _ = _kernel_rollout(
        cfg, variables, x, enc, encp, 2, 16, jnp.float32, chunks=2)
    np.testing.assert_allclose(m1, m2, atol=1e-6)
    np.testing.assert_allclose(s1, s2, atol=1e-6)


def test_kernel_bf16_close(setup):
    """bf16 production packing stays close to the f32 rollout."""
    cfg, model, variables, x, enc, encp = setup
    n_steps = 8
    mels_f, scores_f = _flax_rollout(
        cfg, model, variables, x, enc, encp, 2, n_steps)
    mels_k, scores_k, _ = _kernel_rollout(
        cfg, variables, x, enc, encp, 2, n_steps, jnp.bfloat16)
    mels_k = mels_k.reshape(n_steps, 2, LANE)[:, :, : cfg.n_mels]
    mels_f = np.swapaxes(mels_f, 1, 2)
    assert np.isfinite(mels_k).all()
    # untrained net, random weights: outputs are O(0.1); bf16 rounding of
    # the recurrent chain stays within a few 1e-2
    assert np.abs(mels_k - mels_f).mean() < 0.05
    assert np.abs(scores_k[:, : x.shape[1]] - scores_f).max() < 0.1


@pytest.mark.tpu
def test_tpu_backend_parity(tpu_env):
    """Full TTSGenerator: pallas backend tracks the xla backend on TPU
    (bf16 VMEM weights vs f32 scan — distributional closeness on an
    untrained net over a 400-step free run).  TPU tier: ``pytest -m tpu``."""
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "tts_kernel_parity.py")],
        env=tpu_env, capture_output=True, text=True, timeout=1800, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    stats = json.loads(proc.stdout.strip().splitlines()[-1])
    assert stats["frames"] > 0
    # free-running recurrence on an untrained net: bf16 rounding wanders a
    # few 1e-2 in mel space but must stay distributionally tight
    assert stats["mel_mean_abs_diff"] < 0.05
    assert stats["attn_max_abs_diff"] < 0.2


def test_kernel_long_text_and_high_r():
    """L spanning two lane tiles (L_pad=256) and r=7 (first curriculum
    session): rolls wrap through the zero padding, mel frames land in
    their own 128-lane blocks."""
    cfg = TacotronConfig()
    model = Tacotron(cfg)
    rng = np.random.default_rng(9)
    L = 120  # > 113 -> attn_pad_len = 256
    assert attn_pad_len(L) == 256
    x = jnp.asarray(rng.integers(1, cfg.num_chars, (1, L)).astype(np.int32))
    m0 = jnp.asarray(rng.uniform(-4, 4, (1, 7, cfg.n_mels)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, m0, 7, True,
    )
    enc, encp = model.apply(variables, x, False, method=Tacotron.encode)
    n_steps = 8
    mels_f, scores_f = _flax_rollout(
        cfg, model, variables, x, enc, encp, 7, n_steps)
    mels_k, scores_k, _ = _kernel_rollout(
        cfg, variables, x, enc, encp, 7, n_steps, jnp.float32)
    mels_k = mels_k.reshape(n_steps, 7, LANE)[:, :, : cfg.n_mels]
    mels_f = np.swapaxes(mels_f, 1, 2)
    np.testing.assert_allclose(mels_k, mels_f, atol=2e-4)
    np.testing.assert_allclose(scores_k[:, :L], scores_f, atol=2e-5)


def test_kernel_int8_lstm_close(setup):
    """int8 LSTM weights (per-column scales + dynamic per-row activation
    quant) stay close to the f32 rollout."""
    cfg, model, variables, x, enc, encp = setup
    n_steps = 8
    mels_f, scores_f = _flax_rollout(
        cfg, model, variables, x, enc, encp, 2, n_steps)
    L = x.shape[1]
    L_pad = attn_pad_len(L)
    w = extract_tts_decode_weights(variables["params"])
    packed = pack_tts_weights(w, 2, cfg.n_mels, dtype=jnp.float32,
                              int8_lstm=True)
    enc_pad = jnp.pad(enc[0], ((0, L_pad - L), (0, 0)))
    encp_T = jnp.pad(encp[0].T, ((0, 0), (0, L_pad - L)))
    state = init_tts_decode_state(cfg.decoder_dims, cfg.lstm_dims, L_pad)
    mels_k, scores_k, _, _ = tts_decode_chunk(
        packed, enc_pad, encp_T, state, n_steps, 2, cfg.n_mels, L,
        interpret=True, int8_lstm=True,
    )
    mels_k = np.asarray(mels_k).reshape(n_steps, 2, LANE)[:, :, : cfg.n_mels]
    mels_f = np.swapaxes(mels_f, 1, 2)
    assert np.isfinite(mels_k).all()
    assert np.abs(mels_k - mels_f).mean() < 0.05
    assert np.abs(np.asarray(scores_k)[:, :L] - scores_f).max() < 0.1
