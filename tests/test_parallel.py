"""Parallelism tests on the 8-device virtual CPU mesh: mesh construction,
batch/parameter sharding, data-parallel train-step equivalence (gradient
psum replaces the reference's DataParallel gather — SURVEY.md C16/C23)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavernn_tpu.parallel.mesh import make_mesh, shard_batch_fn, shard_params


def test_mesh_shapes():
    plan = make_mesh()
    assert plan.n_data == 8 and plan.n_model == 1
    plan2 = make_mesh({"data": 4, "model": 2})
    assert plan2.n_data == 4 and plan2.n_model == 2
    with pytest.raises(ValueError):
        make_mesh({"data": 3, "model": 2})


def test_shard_batch_divisibility():
    plan = make_mesh({"data": 4, "model": 2})
    place = shard_batch_fn(plan)
    (x,) = place(np.zeros((8, 3)))
    assert x.shape == (8, 3)
    with pytest.raises(ValueError):
        place(np.zeros((6, 3)))


def test_shard_params_tp_layout():
    plan = make_mesh({"data": 4, "model": 2})
    params = {
        "rnn": {"cell": {"w_ih": jnp.zeros((64, 192)), "b_ih": jnp.zeros(192)}},
        "norm": {"scale": jnp.zeros(7)},  # not divisible → replicated
    }
    with plan.mesh:
        sharded = shard_params(plan, params, tensor_parallel=True)
    w = sharded["rnn"]["cell"]["w_ih"]
    # output dim sharded over 'model'
    assert "model" in str(w.sharding.spec)
    assert str(sharded["norm"]["scale"].sharding.spec) == "PartitionSpec()"


def test_real_model_tp_layout():
    """The intended TP layout on the REAL full-size param trees (VERDICT r2
    Weak #4): big recurrent/FC matrices model-sharded on their output dim,
    their biases alongside; BatchNorm scale/bias pairs and conv kernels
    replicated — no accidental bias-only sharding."""
    from wavernn_tpu.models.tacotron import Tacotron, TacotronConfig
    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.parallel.mesh import make_param_specs

    def flat(specs, prefix=""):
        out = {}
        for k, v in specs.items():
            p = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out.update(flat(v, p))
            else:
                out[p] = v
        return out

    # -- WaveRNN (full size: 512-dim GRUs, ~4.23M params) --
    cfg = WaveRNNConfig()
    model = WaveRNN(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, cfg.hop_length)),
                   jnp.zeros((1, 1 + 2 * cfg.pad, cfg.feat_dims)), True)
    specs = flat(make_param_specs(v["params"], 2))

    sharded = {p for p, s in specs.items() if "model" in str(s)}
    # every big matrix + its bias lands sharded
    for rnn in ("rnn1", "rnn2"):
        for leaf in ("w_ih", "w_hh", "b_ih", "b_hh"):
            assert f"{rnn}/cell/{leaf}" in sharded, (rnn, leaf)
    for fc in ("I", "fc1", "fc2", "fc3"):
        assert any(f"{fc}/kernel" in p for p in sharded), fc
        assert any(f"{fc}/bias" in p for p in sharded), fc
    # BatchNorm scale/bias pairs move together (replicated)
    for p, s in specs.items():
        if "/bn" in p or "BatchNorm" in p:
            assert str(s) == "PartitionSpec()", (p, s)
    # conv kernels (3-D) replicated, and so are their biases
    for p, s in specs.items():
        if "conv" in p:
            assert str(s) == "PartitionSpec()", (p, s)

    # -- Tacotron (full size) --
    from wavernn_tpu.text.symbols import symbols

    tcfg = TacotronConfig(num_chars=len(symbols))
    tmodel = Tacotron(tcfg)
    tv = tmodel.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16), jnp.int32), jnp.zeros((1, 4, tcfg.n_mels)), 2, True,
    )
    tspecs = flat(make_param_specs(tv["params"], 2))
    tsharded = {p for p, s in tspecs.items() if "model" in str(s)}
    # decoder LSTMs and attention GRU weight matrices sharded
    assert any("w_ih" in p for p in tsharded)
    assert any("w_hh" in p for p in tsharded)
    for p, s in tspecs.items():
        if "bnorm" in p or "embedding" in p:
            assert str(s) == "PartitionSpec()", (p, s)
        # a 1-D leaf may only shard when its module's matrix sharded too
        if p.endswith("/scale"):
            assert str(s) == "PartitionSpec()", (p, s)


def test_dp_train_step_matches_single_device():
    """A data-parallel sharded train step must produce the same loss and
    updated params as the unsharded one (XLA inserts the grad all-reduce)."""
    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.training.state import make_optimizer, new_train_state
    from wavernn_tpu.training.wavernn import make_train_step

    cfg = WaveRNNConfig(
        rnn_dims=32, fc_dims=32, bits=8, pad=2, upsample_factors=(2, 2),
        feat_dims=8, compute_dims=8, res_out_dims=8, res_blocks=1,
        hop_length=4, sample_rate=1000, mode="RAW",
    )
    model = WaveRNN(cfg)
    B = 8
    mel_win, seq_len = 4 + 2 * cfg.pad, 4 * cfg.hop_length
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (B, seq_len)).astype(np.float32)
    y = rng.integers(0, cfg.n_classes, (B, seq_len)).astype(np.int32)
    mels = rng.uniform(0, 1, (B, mel_win, cfg.feat_dims)).astype(np.float32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mels), True)
    opt = make_optimizer(1e-3, 4.0)

    def run(shard: bool):
        state = new_train_state(variables["params"], variables["batch_stats"], opt)
        step = make_train_step(model, opt, cfg.mode, donate=False)
        if shard:
            plan = make_mesh()  # 8-way DP
            place = shard_batch_fn(plan)
            with plan.mesh:
                xb, yb, mb = place(x, y, mels)
                state, loss, gn = step(state, xb, yb, mb)
        else:
            state, loss, gn = step(state, x, y, mels)
        return float(loss), jax.device_get(state.params)

    loss_1, params_1 = run(False)
    loss_8, params_8 = run(True)
    assert loss_1 == pytest.approx(loss_8, rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params_1),
                    jax.tree_util.tree_leaves(params_8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tp_train_step_matches_single_device():
    """A tensor-parallel sharded train step (params split over 'model',
    batch over 'data') must reproduce the single-device loss and updated
    params — this executes the _param_spec TP layout, not just its specs."""
    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.training.state import make_optimizer, new_train_state
    from wavernn_tpu.training.wavernn import make_train_step

    cfg = WaveRNNConfig(
        rnn_dims=32, fc_dims=32, bits=8, pad=2, upsample_factors=(2, 2),
        feat_dims=8, compute_dims=8, res_out_dims=8, res_blocks=1,
        hop_length=4, sample_rate=1000, mode="RAW",
    )
    model = WaveRNN(cfg)
    B = 8
    mel_win, seq_len = 4 + 2 * cfg.pad, 4 * cfg.hop_length
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (B, seq_len)).astype(np.float32)
    y = rng.integers(0, cfg.n_classes, (B, seq_len)).astype(np.int32)
    mels = rng.uniform(0, 1, (B, mel_win, cfg.feat_dims)).astype(np.float32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mels), True)
    opt = make_optimizer(1e-3, 4.0)

    def run(tp: bool):
        step = make_train_step(model, opt, cfg.mode, donate=False)
        if tp:
            plan = make_mesh({"data": 4, "model": 2})
            with plan.mesh:
                params = shard_params(plan, variables["params"],
                                      tensor_parallel=True)
                bstats = shard_params(plan, variables["batch_stats"],
                                      tensor_parallel=False)
                state = new_train_state(params, bstats, opt)
                xb, yb, mb = shard_batch_fn(plan)(x, y, mels)
                state, loss, gn = step(state, xb, yb, mb)
        else:
            state = new_train_state(variables["params"],
                                    variables["batch_stats"], opt)
            state, loss, gn = step(state, x, y, mels)
        return float(loss), jax.device_get(state.params)

    loss_1, params_1 = run(False)
    loss_tp, params_tp = run(True)
    assert loss_1 == pytest.approx(loss_tp, rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params_1),
                    jax.tree_util.tree_leaves(params_tp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fold_sharded_generation():
    """Sequence-parallel generation: the fold axis sharded over the mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.ops.decode import decode_scan, extract_decode_weights

    cfg = WaveRNNConfig(
        rnn_dims=32, fc_dims=32, bits=8, pad=2, upsample_factors=(2, 2),
        feat_dims=8, compute_dims=8, res_out_dims=8, res_blocks=1,
        hop_length=4, sample_rate=1000, mode="RAW",
    )
    model = WaveRNN(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16)), jnp.zeros((1, 8, 8)), True
    )
    w = extract_decode_weights(variables["params"])

    plan = make_mesh()
    folds, T = 16, 32
    rng = np.random.default_rng(0)
    with plan.mesh:
        sharding = NamedSharding(plan.mesh, P("data", None, None))
        mels_up = jax.device_put(
            rng.uniform(0, 1, (folds, T, cfg.feat_dims)).astype(np.float32), sharding
        )
        aux = jax.device_put(
            rng.uniform(0, 1, (folds, T, cfg.res_out_dims)).astype(np.float32), sharding
        )
        samples = decode_scan(
            w, mels_up, aux, jax.random.PRNGKey(0),
            mode=cfg.mode, n_classes=cfg.n_classes,
        )
        out = np.asarray(samples)
    assert out.shape == (folds, T)
    assert np.isfinite(out).all()


def test_generator_with_mesh_matches_without():
    """The USER-FACING multi-chip generation path: Generator(mesh=...) must
    produce the same waveform as the single-device Generator (deterministic
    decode; the fold axis shards over the mesh's 'data' axis)."""
    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.ops.decode import Generator

    cfg = WaveRNNConfig(
        rnn_dims=32, fc_dims=32, bits=8, pad=2, upsample_factors=(2, 2),
        feat_dims=8, compute_dims=8, res_out_dims=8, res_blocks=1,
        hop_length=4, sample_rate=1000, mode="RAW",
    )
    model = WaveRNN(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16)), jnp.zeros((1, 8, 8)), True
    )
    rng = np.random.default_rng(3)
    mel = rng.uniform(0, 1, (cfg.feat_dims, 40)).astype(np.float32)

    ref_gen = Generator(cfg, variables, backend="scan", deterministic=True)
    ref = ref_gen(mel, batched=True, target=16, overlap=8, mu_law=True)

    plan = make_mesh()  # 8-way DP over folds
    mesh_gen = Generator(cfg, variables, backend="scan", mesh=plan,
                         deterministic=True)
    out = mesh_gen(mel, batched=True, target=16, overlap=8, mu_law=True)

    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_tts_batch_with_mesh_matches_without():
    """The USER-FACING multi-chip batched TTS path: TTSGenerator(mesh=...)
    .batch must produce the same mels as the single-device batch (the
    utterance axis shards over 'data'; B=3 on data=8 exercises the internal
    pad-to-a-data-multiple).  This is the call dryrun_multichip proves."""
    from wavernn_tpu.infer.tacotron import TTSGenerator
    from wavernn_tpu.models.tacotron import Tacotron, TacotronConfig

    cfg = TacotronConfig(
        embed_dims=16, num_chars=148, encoder_dims=16, decoder_dims=32,
        n_mels=20, fft_bins=20, postnet_dims=16, encoder_K=4, lstm_dims=32,
        postnet_K=3, num_highways=2,
    )
    model = Tacotron(cfg)
    x0 = jnp.zeros((2, 8), jnp.int32)
    m0 = jnp.zeros((2, 10, cfg.n_mels))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0, m0, 5, True)

    rng = np.random.default_rng(5)
    seqs = [list(rng.integers(1, 140, n)) for n in (5, 8, 6)]
    ref = TTSGenerator(cfg, variables, steps=20, text_bucket=8,
                       backend="xla").batch(seqs, r=5)
    out = TTSGenerator(cfg, variables, steps=20, text_bucket=8,
                       backend="xla", mesh=make_mesh()).batch(seqs, r=5)
    assert len(out) == len(ref) == 3
    for (mo, lo, ao), (mr, lr, ar) in zip(out, ref):
        assert mo.shape == mr.shape and ao.shape == ar.shape
        np.testing.assert_allclose(mo, mr, atol=1e-4)
        np.testing.assert_allclose(ao, ar, atol=1e-4)


def test_fold_sharded_decode_matches_single_device():
    """Sequence-parallel generation via shard_map: the fold axis sharded
    over 8 virtual chips must reproduce the single-device decode exactly
    (deterministic mode; stochastic shards get independent PRNG streams)."""
    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.ops.decode import decode_scan, extract_decode_weights
    from wavernn_tpu.parallel.mesh import shard_folds_decode

    cfg = WaveRNNConfig(
        rnn_dims=32, fc_dims=32, bits=8, pad=2, upsample_factors=(2, 2),
        feat_dims=8, compute_dims=8, res_out_dims=8, res_blocks=1,
        hop_length=4, sample_rate=1000, mode="RAW",
    )
    model = WaveRNN(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)),
                   jnp.zeros((1, 8, 8)), True)
    w = extract_decode_weights(v["params"])
    rng = np.random.default_rng(0)
    mf = jnp.asarray(rng.uniform(0, 1, (16, 32, 8)), jnp.float32)
    af = jnp.asarray(rng.uniform(0, 1, (16, 32, 8)), jnp.float32)

    fn = lambda w_, m, a, k: decode_scan(
        w_, m, a, k, mode="RAW", n_classes=cfg.n_classes, deterministic=True)
    plan = make_mesh()
    with plan.mesh:
        out = shard_folds_decode(plan, fn, w, mf, af, jax.random.PRNGKey(0))
    ref = decode_scan(w, mf, af, jax.random.PRNGKey(0), mode="RAW",
                      n_classes=cfg.n_classes, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # stochastic: shards must NOT share a sample stream (key folded per shard)
    fn_s = lambda w_, m, a, k: decode_scan(
        w_, m, a, k, mode="RAW", n_classes=cfg.n_classes)
    with plan.mesh:
        s = np.asarray(shard_folds_decode(plan, fn_s, w, mf, af,
                                          jax.random.PRNGKey(0)))
    assert not np.array_equal(s[0], s[2])  # different shards, different draws


def _tiny_tacotron():
    """Tiny Tacotron with every sharded dim divisible by n_model=2."""
    from wavernn_tpu.models.tacotron import Tacotron, TacotronConfig

    cfg = TacotronConfig(
        embed_dims=16, num_chars=40, encoder_dims=16, decoder_dims=32,
        n_mels=16, fft_bins=16, postnet_dims=16, encoder_K=3, lstm_dims=32,
        postnet_K=3, num_highways=2,
    )
    return Tacotron(cfg), cfg


@pytest.mark.parametrize("layout", ["dp", "tp"])
def test_tacotron_sharded_train_step_matches_single_device(layout):
    """A mesh-sharded Tacotron train step must reproduce the single-device
    loss and updated params (VERDICT r3 Weak #3): BatchNorm batch_stats and
    the hoisted dropout/zoneout mask draws are exactly the parts that could
    silently diverge under a mesh — XLA must treat the sharded batch as ONE
    global batch (stats via collectives), and the mask PRNG draws are
    batch-shaped so sharding cannot change them."""
    import optax

    from wavernn_tpu.training.state import new_train_state
    from wavernn_tpu.training.tacotron import make_tts_train_step

    model, cfg = _tiny_tacotron()
    B, L, T, r = 8, 12, 20, 2
    rng = np.random.default_rng(0)
    x = rng.integers(1, cfg.num_chars, (B, L)).astype(np.int32)
    m = rng.uniform(-4, 4, (B, T, cfg.n_mels)).astype(np.float32)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x), jnp.asarray(m), r, True,
    )
    opt = optax.adam(1e-3)
    key = jax.random.PRNGKey(7)

    def run(shard: bool):
        step = make_tts_train_step(model, opt, r=r, donate=False)
        if shard:
            plan = (make_mesh() if layout == "dp"
                    else make_mesh({"data": 4, "model": 2}))
            with plan.mesh:
                params = shard_params(plan, variables["params"],
                                      tensor_parallel=layout == "tp")
                bstats = shard_params(plan, variables["batch_stats"],
                                      tensor_parallel=False)
                state = new_train_state(params, bstats, opt)
                xb, mb = shard_batch_fn(plan)(x, m)
                state, loss, gn, attn, m2 = step(state, xb, mb, key)
        else:
            state = new_train_state(variables["params"],
                                    variables["batch_stats"], opt)
            state, loss, gn, attn, m2 = step(state, x, m, key)
        return (float(loss), jax.device_get(state.params),
                jax.device_get(state.batch_stats))

    loss_1, params_1, bs_1 = run(False)
    loss_s, params_s, bs_s = run(True)
    assert loss_1 == pytest.approx(loss_s, rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params_1),
                    jax.tree_util.tree_leaves(params_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # the BatchNorm running stats must be the GLOBAL-batch stats
    for a, b in zip(jax.tree_util.tree_leaves(bs_1),
                    jax.tree_util.tree_leaves(bs_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_two_process_distributed_smoke():
    """The multi-host init path (parallel/distributed.py) as EXECUTED code:
    two local processes emulate two hosts (CPU backend, 2 virtual devices
    each), initialize through maybe_initialize_distributed's env contract,
    and must agree on a cross-process psum and one DP train-step loss
    (tools/multihost_smoke.py)."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).parent.parent
    proc = subprocess.run(
        [sys.executable, str(repo / "tools" / "multihost_smoke.py"),
         "--coordinator", "localhost:9471"],
        capture_output=True, text=True, timeout=600, cwd=str(repo),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["ok"] and len(result["workers"]) == 2
    assert all(w["psum"] == w["global_devices"] for w in result["workers"])
