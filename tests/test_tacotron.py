"""Tacotron tests: forward shapes, decoder scan vs stepwise equivalence,
free-running generation with stop masking, training-step loss descent,
GTA export, curriculum resume logic."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavernn_tpu.models.tacotron import (
    Tacotron,
    TacotronConfig,
    init_decoder_carry,
    tacotron_num_params,
)


def tiny_cfg():
    return TacotronConfig(
        embed_dims=16, num_chars=148, encoder_dims=16, decoder_dims=32,
        n_mels=20, fft_bins=20, postnet_dims=16, encoder_K=4, lstm_dims=32,
        postnet_K=3, num_highways=2, dropout=0.5, stop_threshold=-3.4,
    )


def init_model(cfg, B=2, L=11, T=15, r=5):
    model = Tacotron(cfg)
    x = jnp.zeros((B, L), jnp.int32)
    m = jnp.zeros((B, T, cfg.n_mels))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, m, r, True,
    )
    return model, variables


def test_forward_shapes():
    cfg = tiny_cfg()
    B, L, T, r = 2, 11, 15, 5
    model, variables = init_model(cfg, B, L, T, r)
    x = jnp.asarray(np.random.default_rng(0).integers(1, 140, (B, L)), jnp.int32)
    m = jnp.asarray(np.random.default_rng(1).uniform(-4, 4, (B, T, cfg.n_mels)), jnp.float32)
    (m1, m2, attn), _ = model.apply(
        variables, x, m, r, True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert m1.shape == (B, T, cfg.n_mels)
    assert m2.shape == (B, T, cfg.fft_bins)
    assert attn.shape == (B, T // r, L)
    # smooth attention rows sum to 1
    np.testing.assert_allclose(np.asarray(attn).sum(-1), 1.0, atol=1e-5)


def test_full_size_param_count():
    """Reference Tacotron prints ~11.1M params with default hparams
    (embed 256, enc 128, dec 256, lstm 512, postnet 128, 148 symbols)."""
    cfg = TacotronConfig()
    model = Tacotron(cfg)
    x = jnp.zeros((1, 8), jnp.int32)
    m = jnp.zeros((1, 10, cfg.n_mels))
    variables = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, m, 5, True,
        )
    )
    n = tacotron_num_params(variables["params"])
    assert 10.0 < n < 12.5, n


def test_eval_forward_deterministic():
    cfg = tiny_cfg()
    model, variables = init_model(cfg)
    x = jnp.ones((2, 11), jnp.int32)
    m = jnp.zeros((2, 15, cfg.n_mels))
    a = model.apply(variables, x, m, 5, False)
    b = model.apply(variables, x, m, 5, False)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_generation_runs_and_trims():
    from wavernn_tpu.infer.tacotron import TTSGenerator

    cfg = tiny_cfg()
    model, variables = init_model(cfg)
    gen = TTSGenerator(cfg, variables, steps=40)
    seq = list(np.random.default_rng(0).integers(1, 140, 11))
    mel, linear, attn = gen(seq, r=5)
    assert mel.shape[0] == cfg.n_mels
    assert linear.shape[0] == cfg.fft_bins
    assert mel.shape[1] == linear.shape[1]
    assert mel.shape[1] % 5 == 0 and mel.shape[1] <= 40
    assert attn.shape[1] == 11


def test_generation_stop_patience_delays_exit():
    """stop_patience=K must stop the decode exactly K-1 groups after the
    patience=1 stop point when every group is "quiet" (forced here by a
    stop_threshold above any possible output; the min-length guard
    t*r > 10 sets the first eligible stop step)."""
    from wavernn_tpu.infer.tacotron import TTSGenerator

    cfg = tiny_cfg()
    model, variables = init_model(cfg)
    import dataclasses

    # every frame counts as silent -> quiet counter == t+1 at step t
    cfg_quiet = dataclasses.replace(cfg, stop_threshold=1e9)
    seq = list(np.random.default_rng(0).integers(1, 140, 11))
    lens = {}
    for patience in (1, 3):
        gen = TTSGenerator(cfg_quiet, variables, steps=60,
                           stop_patience=patience)
        mel, _, _ = gen(seq, r=5)
        lens[patience] = mel.shape[1]
    # patience=1: first stop at t=3 (15 > 10) -> 4 groups; patience=3 also
    # satisfied at t=3 (quiet=4 >= 3) -> identical; use a patience larger
    # than the min-length step to see the delay
    gen = TTSGenerator(cfg_quiet, variables, steps=60, stop_patience=8)
    mel, _, _ = gen(seq, r=5)
    assert lens[1] == 4 * 5
    assert lens[3] == 4 * 5
    assert mel.shape[1] == 8 * 5  # quiet >= 8 first at t=7

    with pytest.raises(ValueError):
        TTSGenerator(cfg_quiet, variables, steps=60, stop_patience=0)


def test_generation_batch_multiple_texts():
    from wavernn_tpu.infer.tacotron import TTSGenerator

    cfg = tiny_cfg()
    model, variables = init_model(cfg)
    gen = TTSGenerator(cfg, variables, steps=40, text_bucket=8)
    rng = np.random.default_rng(1)
    seqs = [list(rng.integers(1, 140, n)) for n in (7, 12)]
    outs = gen.batch(seqs, r=5)
    assert len(outs) == 2
    for (mel, linear, attn), s in zip(outs, seqs):
        assert mel.shape[0] == cfg.n_mels
        assert mel.shape[1] % 5 == 0 and 0 < mel.shape[1] <= 40
        assert attn.shape[1] == len(s)


def test_decode_step_matches_scan():
    """The scanned teacher-forced decoder and repeated decode_step calls must
    produce identical outputs given the same inputs (eval mode)."""
    cfg = tiny_cfg()
    model, variables = init_model(cfg)
    B, L, T, r = 1, 7, 10, 5
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(1, 140, (B, L)), jnp.int32)
    m = jnp.asarray(rng.uniform(-4, 4, (B, T, cfg.n_mels)), jnp.float32)

    m1, _, _ = model.apply(variables, x, m, r, False)

    enc, encp = model.apply(variables, x, False, method=Tacotron.encode)
    carry = init_decoder_carry(cfg, B, L)
    outs = []
    prenet_in = jnp.zeros((B, cfg.n_mels))
    for t in range(T // r):
        if t > 0:
            prenet_in = m[:, t * r - 1]
        carry, (mels, scores) = model.apply(
            variables, carry, enc, encp, prenet_in, r,
            method=Tacotron.decode_step,
        )
        outs.append(np.asarray(mels))  # (B, n_mels, r)
    stepped = np.concatenate([o.transpose(0, 2, 1) for o in outs], axis=1)
    np.testing.assert_allclose(np.asarray(m1), stepped, atol=1e-5)


def test_tts_train_step_decreases_loss():
    from wavernn_tpu.training.state import make_optimizer, new_train_state
    from wavernn_tpu.training.tacotron import make_tts_train_step

    cfg = tiny_cfg()
    model, variables = init_model(cfg)
    opt = make_optimizer(2e-3, 1.0)
    state = new_train_state(variables["params"], variables["batch_stats"], opt)
    step = make_tts_train_step(model, opt, r=5, donate=False)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, 140, (4, 11)), jnp.int32)
    m = jnp.asarray(rng.uniform(-4, 4, (4, 15, cfg.n_mels)), jnp.float32)
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(25):
        key, sub = jax.random.split(key)
        state, loss, gnorm, attn, m2 = step(state, x, m, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert state.get_step() == 25


def test_gta_export(tmp_path):
    from wavernn_tpu.training.state import make_optimizer, new_train_state
    from wavernn_tpu.training.tacotron import create_gta_features

    cfg = tiny_cfg()
    model, variables = init_model(cfg)
    opt = make_optimizer(1e-3, 1.0)
    state = new_train_state(variables["params"], variables["batch_stats"], opt)

    rng = np.random.default_rng(0)
    batches = [
        (
            jnp.asarray(rng.integers(1, 140, (2, 9)), jnp.int32),
            jnp.asarray(rng.uniform(-4, 4, (2, 15, cfg.n_mels)), jnp.float32),
            [f"utt{i}", f"utt{i + 1}"],
            [12, 15],
        )
        for i in range(0, 4, 2)
    ]
    create_gta_features(cfg, state, batches, tmp_path, r=5)
    for i in range(4):
        gta = np.load(tmp_path / f"utt{i}.npy")
        assert gta.shape[0] == cfg.n_mels


def test_r_for_step_schedule_position():
    from wavernn_tpu.training.tacotron import r_for_step

    sched = [(7, 1e-3, 10_000, 32), (5, 1e-4, 100_000, 32), (2, 1e-4, 180_000, 16)]
    assert r_for_step(0, sched) == 7
    assert r_for_step(9_999, sched) == 7
    assert r_for_step(10_000, sched) == 5
    assert r_for_step(150_000, sched) == 2
    assert r_for_step(999_999, sched) == 2  # past the schedule: final r


def test_curriculum_session_selection(hp_tiny, tmp_path):
    """Resume must land in the session the restored step dictates
    (ref: train_tacotron.py:68-90)."""
    from wavernn_tpu.training.tacotron import run_schedule
    from wavernn_tpu.training.state import make_optimizer, new_train_state
    from wavernn_tpu.paths import Paths

    hp_tiny.tts_schedule = [
        (7, 1e-3, 5, 2),
        (5, 1e-4, 10, 2),
        (2, 1e-4, 15, 2),
    ]
    cfg = tiny_cfg()
    model, variables = init_model(cfg)
    opt = make_optimizer(1e-3, 1.0)
    state = new_train_state(variables["params"], variables["batch_stats"], opt)
    state = state.replace(step=jnp.asarray(7, jnp.int32))  # inside session 2

    seen = []

    def fake_loop(paths, cfg_, st, optimizer, train_set, r, lr, steps, attn):
        seen.append((r, lr, steps))
        return st.replace(step=st.step + steps)

    def fake_datasets(batch_size, r):
        return [], "utt0"

    paths = Paths(tmp_path / "d", "v", "t", base=tmp_path)
    run_schedule(paths, cfg, state, opt, fake_datasets, train_loop=fake_loop)
    assert seen == [(5, 1e-4, 3), (2, 1e-4, 5)]


def test_generation_submit_collect_pipelined():
    """submit/collect (pipelined serving) == sequential __call__."""
    from wavernn_tpu.infer.tacotron import TTSGenerator

    cfg = tiny_cfg()
    model, variables = init_model(cfg)
    gen = TTSGenerator(cfg, variables, steps=40, text_bucket=8)
    rng = np.random.default_rng(2)
    seqs = [list(rng.integers(1, 140, n)) for n in (9, 13)]

    direct = [gen(s, r=5) for s in seqs]
    handles = [gen.submit(s, r=5) for s in seqs]
    piped = [gen.collect(h) for h in handles]
    for (m1, l1, a1), (m2, l2, a2) in zip(direct, piped):
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_array_equal(a1, a2)
