"""WaveRNN model tests: shape contracts, upsample length algebra, parameter
count parity, scan generation end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig, num_params


def tiny_cfg(mode="RAW"):
    return WaveRNNConfig(
        rnn_dims=32, fc_dims=32, bits=9, pad=2, upsample_factors=(5, 5, 11),
        feat_dims=80, compute_dims=16, res_out_dims=16, res_blocks=2,
        hop_length=275, sample_rate=22050, mode=mode,
    )


def init_model(cfg, B=2, T_mel=9):
    model = WaveRNN(cfg)
    seq_len = (T_mel - 2 * cfg.pad) * cfg.hop_length
    x = jnp.zeros((B, seq_len))
    m = jnp.zeros((B, T_mel, cfg.feat_dims))
    variables = model.init(jax.random.PRNGKey(0), x, m, True)
    return model, variables, x, m


@pytest.mark.parametrize("mode,n_classes", [("RAW", 512), ("MOL", 30)])
def test_forward_shapes(mode, n_classes):
    cfg = tiny_cfg(mode)
    model, variables, x, m = init_model(cfg)
    y, _ = model.apply(variables, x, m, True, mutable=["batch_stats"])
    assert y.shape == (x.shape[0], x.shape[1], n_classes)


def test_upsample_length_algebra():
    cfg = tiny_cfg()
    model, variables, _, m = init_model(cfg, T_mel=12)
    mels_up, aux = model.apply(
        variables, m[:, :12], False, method=WaveRNN.upsample_only
    )
    expect_t = (12 - 2 * cfg.pad) * cfg.hop_length
    assert mels_up.shape == (2, expect_t, cfg.feat_dims)
    assert aux.shape == (2, expect_t, cfg.res_out_dims)


def test_default_param_count_matches_reference():
    """Reference prints ~4.23M trainable params for the default MOL config
    (ref: models/fatchord_version.py:425-430, BASELINE.md)."""
    cfg = WaveRNNConfig()  # default 512-dim MOL
    model = WaveRNN(cfg)
    x = jnp.zeros((1, 275))
    m = jnp.zeros((1, 5, 80))
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, m, True)
    )
    n = num_params(variables["params"])
    assert 4.1 < n < 4.4, n


def test_batchnorm_stats_update():
    cfg = tiny_cfg()
    model, variables, x, m = init_model(cfg)
    _, mutated = model.apply(
        variables, x, jnp.ones_like(m) * 0.5, True, mutable=["batch_stats"]
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
    )


@pytest.mark.parametrize("mode", ["RAW", "MOL"])
@pytest.mark.parametrize("batched", [False, True])
def test_generate_end_to_end(mode, batched):
    from wavernn_tpu.ops.decode import Generator

    cfg = tiny_cfg(mode)
    model, variables, _, _ = init_model(cfg)

    T_mel = 40
    mel = np.random.default_rng(0).uniform(0, 1, (cfg.feat_dims, T_mel)).astype(np.float32)
    gen = Generator(cfg, variables, backend="scan", frame_bucket=16)
    wav = gen(mel, batched=batched, target=2750, overlap=550, mu_law=True)
    assert wav.shape == ((T_mel - 1) * cfg.hop_length,)
    assert np.isfinite(wav).all()
    # equal-power crossfade can transiently sum to sqrt(2) at fold seams
    assert np.abs(wav).max() <= (2 ** 0.5 if batched else 1.0) + 1e-6
    # tail fade applied
    assert abs(wav[-1]) < 1e-6


def test_generate_batch_multiple_utterances():
    """Multi-utterance serving path: folds of several utterances packed into
    one decode batch, unfolded per utterance."""
    from wavernn_tpu.ops.decode import Generator

    cfg = tiny_cfg("RAW")
    model, variables, _, _ = init_model(cfg)
    rng = np.random.default_rng(0)
    mels = [
        rng.uniform(0, 1, (cfg.feat_dims, t)).astype(np.float32)
        for t in (25, 40)
    ]
    gen = Generator(cfg, variables, backend="scan", frame_bucket=16)
    wavs = gen.generate_batch(mels, target=2750, overlap=550, mu_law=True)
    assert len(wavs) == 2
    for wav, mel in zip(wavs, mels):
        assert wav.shape == ((mel.shape[1] - 1) * cfg.hop_length,)
        assert np.isfinite(wav).all()


def test_streaming_generation_chunks():
    """stream() must emit progressively and, concatenated, cover exactly the
    same sample count (with the tail fade) as a full generate."""
    from wavernn_tpu.ops.decode import Generator

    cfg = tiny_cfg("RAW")
    model, variables, _, _ = init_model(cfg)
    rng = np.random.default_rng(0)
    mel = rng.uniform(0, 1, (cfg.feat_dims, 60)).astype(np.float32)
    gen = Generator(cfg, variables, backend="scan", frame_bucket=16,
                    fold_bucket=4)
    chunks = list(gen.stream(mel, target=2750, overlap=550, mu_law=True,
                             group=2))
    assert len(chunks) >= 2  # actually streamed
    wav = np.concatenate(chunks)
    assert wav.shape == ((60 - 1) * cfg.hop_length,)
    assert np.isfinite(wav).all()
    assert abs(wav[-1]) < 1e-6  # tail fade applied to the last chunk


def test_streaming_ramped_first_group_parity():
    """A ramped (small) first group changes only WHEN audio becomes final,
    never WHAT audio: stream(first_group=k) must equal its own one-shot
    oracle exactly, its first chunk must be smaller than the unramped
    first chunk, and fold_spans must tile the folds exactly once."""
    from wavernn_tpu.ops.decode import Generator, fold_spans

    assert fold_spans(10, 4) == [(0, 4), (4, 8), (8, 10)]
    assert fold_spans(10, 4, first_group=1) == [(0, 1), (1, 5), (5, 9),
                                                (9, 10)]
    assert fold_spans(3, 4, first_group=4) == [(0, 3)]  # no ramp if >= group
    assert fold_spans(1, 4, first_group=2) == [(0, 1)]

    cfg = tiny_cfg("RAW")
    model, variables, _, _ = init_model(cfg)
    rng = np.random.default_rng(4)
    mel = rng.uniform(0, 1, (cfg.feat_dims, 90)).astype(np.float32)
    gen = Generator(cfg, variables, backend="scan", frame_bucket=16,
                    fold_bucket=4)
    kw = dict(target=2750, overlap=550, mu_law=True, group=3)

    ramped = list(gen.stream(mel, first_group=1, **kw))
    plain = list(gen.stream(mel, **kw))
    assert len(ramped[0]) < len(plain[0])  # first chunk arrives earlier
    oracle = gen.stream_oneshot(mel, first_group=1, **kw)
    np.testing.assert_allclose(np.concatenate(ramped), oracle, atol=1e-6)


def test_int16_output_matches_float_path():
    """output_dtype='int16' (device-side tail fade + PCM quantization) must
    equal quantizing the float64 path's waveform, to 1 LSB."""
    from wavernn_tpu.ops.decode import Generator

    cfg = tiny_cfg("RAW")
    model, variables, _, _ = init_model(cfg)
    mel = np.random.default_rng(5).uniform(
        0, 1, (cfg.feat_dims, 40)).astype(np.float32)

    kw = dict(batched=True, target=2750, overlap=550, mu_law=True, seed=3)
    f64 = Generator(cfg, variables, backend="scan")(mel, **kw)
    pcm = Generator(cfg, variables, backend="scan",
                    output_dtype="int16")(mel, **kw)
    assert pcm.dtype == np.int16
    assert pcm.shape == f64.shape
    expect = np.round(np.clip(f64, -1, 1) * 32767.0)
    np.testing.assert_allclose(pcm.astype(np.float64), expect, atol=1.0)
    # the vast majority must match exactly (only fp-order ties may differ)
    assert (pcm.astype(np.float64) == expect).mean() > 0.99


def test_mulaw8_output_matches_host_codec():
    """output_dtype='mulaw8' (device-side tail fade + 8-bit mu-law
    companding — half int16's egress bytes again) must equal encoding the
    float64 path's waveform with dsp.audio.encode_mu_law(mu=256), to 1
    label; streamed chunks must equal the one-shot bytes exactly; and
    http_server.pcm16 must expand the wire bytes to within one 8-bit
    mu-law quantization cell of the float path's PCM."""
    from wavernn_tpu.dsp import audio
    from wavernn_tpu.infer.http_server import pcm16
    from wavernn_tpu.ops.decode import Generator

    cfg = tiny_cfg("RAW")
    model, variables, _, _ = init_model(cfg)
    mel = np.random.default_rng(5).uniform(
        0, 1, (cfg.feat_dims, 40)).astype(np.float32)

    kw = dict(target=2750, overlap=550, mu_law=True, seed=3)
    f64 = Generator(cfg, variables, backend="scan")(
        mel, batched=True, **kw)
    gm = Generator(cfg, variables, backend="scan", fold_bucket=4,
                   output_dtype="mulaw8")
    wm = gm(mel, batched=True, **kw)
    assert wm.dtype == np.uint8
    assert wm.shape == f64.shape
    expect = audio.encode_mu_law(np.clip(f64, -1, 1), 256)
    d = np.abs(wm.astype(np.float64) - expect)
    assert d.max() <= 1.0
    assert (d == 0).mean() > 0.99  # only fp-order boundary ties may differ

    # chunked streaming serves the same audio as its one-shot oracle
    # (stream ≡ stream_oneshot: same fold-group PRNG stream; the oracle is
    # float64 by contract, so encode it with the host codec and allow the
    # same 1-label fp-order ties as above)
    skw = dict(kw, group=2)
    chunks = list(gm.stream(mel, **skw))
    assert all(c.dtype == np.uint8 for c in chunks)
    oracle = audio.encode_mu_law(
        np.clip(gm.stream_oneshot(mel, **skw), -1, 1), 256)
    ds = np.abs(np.concatenate(chunks).astype(np.float64) - oracle)
    assert ds.max() <= 1.0
    assert (ds == 0).mean() > 0.99

    # host expansion (HTTP WAV framing): within one mu-law cell of the
    # float path's PCM.  Cell width at |x| ~= 1 is ~1/log(256)*2/255 ~ 1.4e-3
    # of full scale -> ~2.6% of int16 range near the loud end
    exp16 = pcm16(wm).astype(np.float64)
    ref16 = pcm16(np.asarray(f64)).astype(np.float64)
    assert np.abs(exp16 - ref16).max() <= 0.03 * 32768


def test_generate_batch_int16_matches_float_path():
    """Co-batched serving with output_dtype='int16' (device-side per-
    utterance tail fade + PCM quantization inside the single batch program)
    must equal quantizing the float64 batch path's waveforms, to 1 LSB."""
    from wavernn_tpu.ops.decode import Generator

    cfg = tiny_cfg("RAW")
    model, variables, _, _ = init_model(cfg)
    rng = np.random.default_rng(11)
    mels = [rng.uniform(0, 1, (cfg.feat_dims, t)).astype(np.float32)
            for t in (25, 40)]

    kw = dict(target=2750, overlap=550, mu_law=True, seed=3)
    f64 = Generator(cfg, variables, backend="scan",
                    frame_bucket=16).generate_batch(mels, **kw)
    pcm = Generator(cfg, variables, backend="scan", frame_bucket=16,
                    output_dtype="int16").generate_batch(mels, **kw)
    for w16, w64 in zip(pcm, f64):
        assert w16.dtype == np.int16
        assert w16.shape == w64.shape
        expect = np.round(np.clip(w64, -1, 1) * 32767.0)
        np.testing.assert_allclose(w16.astype(np.float64), expect, atol=1.0)
        assert (w16.astype(np.float64) == expect).mean() > 0.99


def test_generate_lean_ingress_f16_close_to_f32():
    """input_dtype='float16' (half-byte mel upload, f32 compute on device)
    must track the f32-ingress decode closely: same shapes, and the
    deterministic waveforms nearly identical (the only perturbation is the
    [0,1] mel's f16 rounding at ~1e-4)."""
    from wavernn_tpu.ops.decode import Generator

    cfg = tiny_cfg("RAW")
    model, variables, _, _ = init_model(cfg)
    rng = np.random.default_rng(2)
    mel = rng.uniform(0, 1, (cfg.feat_dims, 40)).astype(np.float32)
    kw = dict(batched=True, target=2750, overlap=550, mu_law=True)
    ref = Generator(cfg, variables, backend="scan", frame_bucket=16,
                    deterministic=True)(mel, **kw)
    lean = Generator(cfg, variables, backend="scan", frame_bucket=16,
                     deterministic=True, input_dtype="float16")(mel, **kw)
    assert lean.shape == ref.shape
    # deterministic RAW decode: almost every sample picks the same class
    assert (lean == ref).mean() > 0.98

    import pytest

    with pytest.raises(ValueError, match="input_dtype"):
        Generator(cfg, variables, backend="scan", input_dtype="int8")


def test_generate_uint8_ingress_bit_exact_vs_requantized_f32():
    """input_dtype='uint8' (quarter-byte mel upload) must decode EXACTLY
    like feeding the 8-bit-requantized mel through the f32 path: the wire
    format is round(m*255) on the host and *(1/255f) on device, so
    replicating that arithmetic at f32 ingress is a bit-exact oracle (the
    deterministic decode leaves no sampling noise to hide behind)."""
    from wavernn_tpu.ops.decode import Generator

    cfg = tiny_cfg("RAW")
    model, variables, _, _ = init_model(cfg)
    rng = np.random.default_rng(3)
    mel = rng.uniform(0, 1, (cfg.feat_dims, 40)).astype(np.float32)
    kw = dict(batched=True, target=2750, overlap=550, mu_law=True)
    # exactly the device dequant: labels * float32(1/255)
    q = (np.clip(np.round(mel * 255.0), 0.0, 255.0)
         * np.float32(1.0 / 255.0)).astype(np.float32)
    ref = Generator(cfg, variables, backend="scan", frame_bucket=16,
                    deterministic=True)(q, **kw)
    lean = Generator(cfg, variables, backend="scan", frame_bucket=16,
                     deterministic=True, input_dtype="uint8")(mel, **kw)
    np.testing.assert_array_equal(lean, ref)


def test_generate_deterministic_given_seed():
    from wavernn_tpu.ops.decode import Generator

    cfg = tiny_cfg("RAW")
    model, variables, _, _ = init_model(cfg)
    mel = np.random.default_rng(1).uniform(0, 1, (cfg.feat_dims, 20)).astype(np.float32)
    gen = Generator(cfg, variables, backend="scan")
    w1 = gen(mel, batched=False, target=2750, overlap=550, mu_law=False, seed=7)
    w2 = gen(mel, batched=False, target=2750, overlap=550, mu_law=False, seed=7)
    np.testing.assert_array_equal(w1, w2)


def test_streaming_incremental_crossfade_matches_full_unfold():
    """The incremental per-group finalization must produce EXACTLY the same
    audio as one full crossfade-unfold over all decoded folds, and the
    compile count must be independent of utterance length (O(1) programs)."""
    import jax
    import jax.numpy as jnp
    from wavernn_tpu.ops import fold as fold_ops
    from wavernn_tpu.ops.decode import Generator, _round_up

    cfg = tiny_cfg("RAW")
    model, variables, _, _ = init_model(cfg)
    rng = np.random.default_rng(2)
    T_mel = 120  # long enough for several groups
    mel = rng.uniform(0, 1, (cfg.feat_dims, T_mel)).astype(np.float32)
    target, overlap, group = 2750, 550, 2
    gen = Generator(cfg, variables, backend="scan", frame_bucket=16,
                    fold_bucket=4)

    chunks = list(gen.stream(mel, target=target, overlap=overlap,
                             mu_law=True, group=group))
    streamed = np.concatenate(chunks)

    # reproduce the decode exactly (same per-group keys), then finalize the
    # WHOLE fold stack in one unfold
    mels_in = np.transpose(mel[None], (0, 2, 1))
    wave_len = (T_mel - 1) * cfg.hop_length
    t_bucket = _round_up(T_mel + 2 * cfg.pad, 16)
    mels_in = np.pad(
        mels_in, ((0, 0), (cfg.pad, t_bucket - T_mel - cfg.pad), (0, 0))
    )
    mels_up, aux = gen._upsample(gen.variables, jnp.asarray(mels_in))
    real_len = (t_bucket - 2 * cfg.pad) * cfg.hop_length
    num_folds, _ = fold_ops.fold_shape(real_len, target, overlap)
    mels_f = fold_ops.fold_with_overlap(mels_up, target, overlap)
    aux_f = fold_ops.fold_with_overlap(aux, target, overlap)
    decoded = []
    for g0 in range(0, num_folds, group):
        g1 = min(g0 + group, num_folds)
        n = g1 - g0
        n_pad = _round_up(n, 4)
        mf = jnp.pad(mels_f[g0:g1], ((0, n_pad - n), (0, 0), (0, 0)))
        af = jnp.pad(aux_f[g0:g1], ((0, n_pad - n), (0, 0), (0, 0)))
        decoded.append(np.asarray(gen._decode(
            gen.weights, mf, af, jax.random.PRNGKey(g0)))[:n])
    folds = np.concatenate(decoded, axis=0)
    full = np.asarray(gen._finalize(
        jnp.asarray(folds), jnp.asarray(num_folds, jnp.int32),
        mu_law=True, batched=True, overlap=overlap, n_classes=cfg.n_classes,
    ), dtype=np.float64)[:wave_len]
    fade_len = min(20 * cfg.hop_length, len(full))
    full[-fade_len:] *= np.linspace(1, 0, fade_len)

    assert num_folds > 2 * group  # several incremental groups exercised
    np.testing.assert_allclose(streamed, full, atol=1e-6)

    # the public parity oracle (same per-group programs, one-shot unfold)
    # must agree with this independently-constructed reference exactly
    oneshot = gen.stream_oneshot(mel, target=target, overlap=overlap,
                                 mu_law=True, group=group)
    np.testing.assert_allclose(oneshot, full, atol=1e-6)

    # O(1) compiled programs: first group (no context), steady-state
    # (group+1 folds), and possibly a short last group — never O(n_groups)
    assert gen._finalize._cache_size() <= 3


def test_streaming_tail_fade_spans_chunk_boundaries():
    """When the final feed's chunk is SHORTER than the 20-hop tail fade
    (needed_folds % group == 1 with a short last fold), the fade must still
    cover the last min(20*hop, wave_len) samples of the waveform — i.e. it
    is applied in global coordinates across chunk boundaries, exactly as
    stream_oneshot fades.  Regression: the fade used to be clamped to the
    final chunk, so stream() and the oracle diverged on these shapes."""
    from wavernn_tpu.ops.decode import Generator

    cfg = tiny_cfg("RAW")
    model, variables, _, _ = init_model(cfg)
    rng = np.random.default_rng(5)
    # T_mel=99: wave_len=26950, stride=3300 -> needed_folds=9; group=2
    # leaves a 1-fold final feed whose chunk (550) < fade (5500)
    T_mel, target, overlap, group = 99, 2750, 550, 2
    mel = rng.uniform(0, 1, (cfg.feat_dims, T_mel)).astype(np.float32)
    gen = Generator(cfg, variables, backend="scan", frame_bucket=16,
                    fold_bucket=4)

    wave_len = (T_mel - 1) * cfg.hop_length
    stride = target + overlap
    needed = -(-wave_len // stride)
    assert needed % group == 1 and wave_len - (needed - 1) * stride \
        < 20 * cfg.hop_length  # the shape actually exercises the edge

    streamed = np.concatenate(list(gen.stream(
        mel, target=target, overlap=overlap, mu_law=True, group=group)))
    oneshot = gen.stream_oneshot(mel, target=target, overlap=overlap,
                                 mu_law=True, group=group)
    assert streamed.shape == oneshot.shape == (wave_len,)
    np.testing.assert_array_equal(streamed, oneshot)


# --- sequence-chunked BPTT ---------------------------------------------------


def test_chunk_unchunk_roundtrip():
    from wavernn_tpu.models.wavernn import chunk_sequence, unchunk_sequence

    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.normal(size=(3, 24, 5)).astype(np.float32))
    for k, w in [(2, 0), (2, 3), (4, 6), (3, 8)]:
        y = chunk_sequence(t, k, w)
        assert y.shape == (3 * k, w + 24 // k, 5)
        np.testing.assert_array_equal(unchunk_sequence(y, 3, k, w), t)
        # warmup content: chunk j's first w frames == chunk j-1's last w
        y4 = np.asarray(y).reshape(3, k, w + 24 // k, 5)
        np.testing.assert_array_equal(y4[:, 0, :w], 0.0)
        for j in range(1, k):
            np.testing.assert_array_equal(
                y4[:, j, :w],
                np.asarray(t).reshape(3, k, 24 // k, 5)[:, j - 1, (24 // k) - w:])


def test_chunked_forward_exact_when_memoryless():
    """With w_hh zeroed the GRUs are memoryless, so chunked and unchunked
    forwards must agree exactly — an end-to-end wiring check."""
    cfg = tiny_cfg("RAW")
    model, variables, x, m = init_model(cfg, B=2, T_mel=9)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, x.shape).astype(np.float32))
    m = jnp.asarray(rng.uniform(0, 1, m.shape).astype(np.float32))

    params = jax.tree_util.tree_map(lambda a: a, variables["params"])
    H = cfg.rnn_dims
    for r in ("rnn1", "rnn2"):
        cell = params[r]["cell"]
        cell["w_hh"] = jnp.zeros_like(cell["w_hh"])
        # kill the update gate (z ≈ 0) so h_t = n_t has no h_{t-1} term
        cell["b_hh"] = cell["b_hh"].at[H: 2 * H].set(-60.0)
        cell["b_ih"] = cell["b_ih"].at[H: 2 * H].set(-60.0)
    variables = {"params": params, "batch_stats": variables["batch_stats"]}

    ref, _ = model.apply(variables, x, m, True, mutable=["batch_stats"])

    import dataclasses
    ccfg = dataclasses.replace(cfg, seq_chunks=5, chunk_warmup=32)
    cmodel = WaveRNN(ccfg)
    out, _ = cmodel.apply(variables, x, m, True, mutable=["batch_stats"])
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_chunked_eval_forward_unchanged():
    """Chunking is a training-time option: eval forward ignores it."""
    import dataclasses
    cfg = tiny_cfg("RAW")
    model, variables, x, m = init_model(cfg, B=2, T_mel=9)
    ref = model.apply(variables, x, m, False)
    ccfg = dataclasses.replace(cfg, seq_chunks=5, chunk_warmup=32)
    out = WaveRNN(ccfg).apply(variables, x, m, False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_chunked_training_converges():
    """Truncated-BPTT training still fits a tone (loss descends)."""
    import dataclasses
    import optax
    from wavernn_tpu.training.state import make_optimizer, new_train_state
    from wavernn_tpu.training.wavernn import make_train_step
    from wavernn_tpu.dsp.audio import encode_mu_law, label_2_float

    cfg = WaveRNNConfig(
        rnn_dims=32, fc_dims=32, bits=8, pad=2, upsample_factors=(4, 5),
        feat_dims=16, compute_dims=16, res_out_dims=16, res_blocks=1,
        hop_length=20, sample_rate=1000, mode="RAW",
        seq_chunks=4, chunk_warmup=10,
    )
    model = WaveRNN(cfg)
    rng = np.random.default_rng(0)
    B, n_frames = 4, 8
    T = n_frames * cfg.hop_length
    mel_win = n_frames + 2 * cfg.pad
    wave = np.sin(2 * np.pi * 110 * np.arange(T + 1) / cfg.sample_rate)
    labels = encode_mu_law(wave, mu=cfg.n_classes)
    x = np.broadcast_to(
        label_2_float(labels[:-1], cfg.bits), (B, T)).astype(np.float32)
    y = np.broadcast_to(labels[1:], (B, T)).astype(np.int32)
    mels = rng.uniform(0, 1, (B, mel_win, cfg.feat_dims)).astype(np.float32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(mels), True)
    optimizer = make_optimizer(3e-3, 4.0)
    state = new_train_state(variables["params"], variables["batch_stats"],
                            optimizer)
    step = make_train_step(model, optimizer, cfg.mode, donate=False)
    first = None
    for _ in range(150):
        state, loss, _ = step(state, jnp.asarray(x), jnp.asarray(y),
                              jnp.asarray(mels))
        first = float(loss) if first is None else first
    assert float(loss) < 0.5 * first, (first, float(loss))


def test_generator_pins_host_weights_on_device():
    """Checkpoint loaders hand back HOST numpy pytrees; the generators must
    device_put them once at construction — numpy weights passed to a jitted
    program re-upload the whole model every dispatch (measured 8x serving
    collapse over a relay when this regressed)."""
    import jax

    from wavernn_tpu.ops.decode import Generator

    cfg = tiny_cfg("RAW")
    _, variables, _, _ = init_model(cfg)
    host_vars = jax.tree.map(np.asarray, jax.device_get(variables))
    gen = Generator(cfg, host_vars, backend="scan")
    for leaf in jax.tree_util.tree_leaves(gen.variables):
        assert isinstance(leaf, jax.Array), type(leaf)
    for leaf in jax.tree_util.tree_leaves(gen.weights):
        assert isinstance(leaf, jax.Array), type(leaf)
    gen.update_variables(host_vars)
    for leaf in jax.tree_util.tree_leaves(gen.variables):
        assert isinstance(leaf, jax.Array), type(leaf)
