"""Checkpoint-conversion parity against the REAL reference models.

Instantiates the genuine PyTorch `WaveRNN` (reference
models/fatchord_version.py:92) and `Tacotron` (reference
models/tacotron.py:282) from the read-only mount, converts their actual
state_dicts with tools/convert_torch_checkpoint.py, and asserts the JAX
models' teacher-forced forward outputs match the torch eval forward.
This is the proof that a user's trained reference checkpoint transfers.
"""

import sys
import types
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

REFERENCE = Path("/root/reference")
TOOLS = Path(__file__).parent.parent / "tools"

pytestmark = pytest.mark.skipif(
    not (REFERENCE / "models" / "fatchord_version.py").exists(),
    reason="reference mount not available",
)


@pytest.fixture(scope="module")
def ref_models():
    """Import the reference torch models, stubbing librosa (absent here;
    only touched at call time by utils/dsp functions we never invoke)."""
    torch = pytest.importorskip("torch")
    stubbed = []
    for missing in ("librosa",):
        if missing not in sys.modules:
            sys.modules[missing] = types.ModuleType(missing)
            stubbed.append(missing)
    # the reference predates numpy 2 (np.cumproduct was removed)
    had_cumproduct = hasattr(np, "cumproduct")
    if not had_cumproduct:
        np.cumproduct = np.cumprod
    sys.path.insert(0, str(REFERENCE))
    try:
        from models.fatchord_version import WaveRNN as TorchWaveRNN
        from models.tacotron import Tacotron as TorchTacotron
    finally:
        sys.path.remove(str(REFERENCE))
    yield torch, TorchWaveRNN, TorchTacotron
    if not had_cumproduct:
        del np.cumproduct
    for name in stubbed:
        # don't leave an empty stub for other tests (e.g. transformers
        # probes librosa availability via sys.modules)
        sys.modules.pop(name, None)


def _state_dict_numpy(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def test_real_wavernn_checkpoint_converts_and_matches(ref_models):
    torch, TorchWaveRNN, _ = ref_models
    sys.path.insert(0, str(TOOLS))
    from convert_torch_checkpoint import convert_wavernn

    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig

    kw = dict(rnn_dims=64, fc_dims=64, bits=9, pad=2, upsample_factors=(4, 5),
              feat_dims=20, compute_dims=16, res_out_dims=16, res_blocks=3,
              hop_length=20, sample_rate=8000, mode="RAW")
    torch.manual_seed(0)
    tmodel = TorchWaveRNN(**kw).eval()
    sd = _state_dict_numpy(tmodel)

    params, stats, step = convert_wavernn(sd, kw["res_blocks"],
                                          kw["upsample_factors"])
    assert step == 0

    B, frames = 2, 6
    mel_win = frames + 2 * kw["pad"]
    seq_len = frames * kw["hop_length"]
    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, (B, seq_len)).astype(np.float32)
    mels = rng.uniform(0, 1, (B, mel_win, kw["feat_dims"])).astype(np.float32)

    with torch.no_grad():
        want = tmodel(torch.from_numpy(x),
                      torch.from_numpy(mels).transpose(1, 2)).numpy()

    cfg = WaveRNNConfig(**kw)
    got = WaveRNN(cfg).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x), jnp.asarray(mels), False,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_real_tacotron_checkpoint_converts_and_matches(ref_models):
    torch, _, TorchTacotron = ref_models
    sys.path.insert(0, str(TOOLS))
    from convert_torch_checkpoint import convert_tacotron

    from wavernn_tpu.models.tacotron import Tacotron, TacotronConfig

    cfg = TacotronConfig()  # default LJSpeech-scale dims, fft_bins=80
    torch.manual_seed(0)
    tmodel = TorchTacotron(
        embed_dims=cfg.embed_dims, num_chars=cfg.num_chars,
        encoder_dims=cfg.encoder_dims, decoder_dims=cfg.decoder_dims,
        n_mels=cfg.n_mels, fft_bins=cfg.fft_bins,
        postnet_dims=cfg.postnet_dims, encoder_K=cfg.encoder_K,
        lstm_dims=cfg.lstm_dims, postnet_K=cfg.postnet_K,
        num_highways=cfg.num_highways, dropout=cfg.dropout,
        stop_threshold=cfg.stop_threshold,
    )
    r = 2
    tmodel.r = r
    sd = _state_dict_numpy(tmodel)
    params, stats, step, r_got = convert_tacotron(
        sd, cfg.encoder_K, cfg.postnet_K, cfg.num_highways
    )
    assert step == 0 and r_got == r

    B, L, T = 2, 11, 8
    rng = np.random.default_rng(3)
    x = rng.integers(1, cfg.num_chars, (B, L)).astype(np.int32)
    m = rng.uniform(-4, 4, (B, T, cfg.n_mels)).astype(np.float32)

    with torch.no_grad():
        # generate_gta=True puts the reference in eval mode (deterministic:
        # no prenet dropout, no zoneout) — ref models/tacotron.py:315-317
        want_mel, want_lin, want_attn = tmodel(
            torch.from_numpy(x.astype(np.int64)),
            torch.from_numpy(m).transpose(1, 2), generate_gta=True,
        )

    got_mel, got_lin, got_attn = Tacotron(cfg).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x), jnp.asarray(m), r, False,
    )
    np.testing.assert_allclose(
        np.asarray(got_mel), want_mel.numpy().transpose(0, 2, 1), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_lin), want_lin.numpy().transpose(0, 2, 1), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_attn), want_attn.numpy(), atol=5e-4
    )


def _assert_state_dicts_equal(sd_want, sd_got):
    """Key-set equality + bitwise value equality (num_batches_tracked is
    key-only: the reference never reads it and the exporter emits 0)."""
    assert set(sd_got) == set(sd_want), (
        sorted(set(sd_want) ^ set(sd_got)))
    for k, want in sd_want.items():
        if k.endswith("num_batches_tracked"):
            continue
        got = sd_got[k]
        assert got.shape == np.asarray(want).shape, k
        np.testing.assert_array_equal(got, want, err_msg=k)


def test_wavernn_export_roundtrips_and_strict_loads(ref_models):
    """torch → convert → export → the ORIGINAL state dict, bit for bit,
    and a strict load_state_dict into a fresh reference module."""
    torch, TorchWaveRNN, _ = ref_models
    sys.path.insert(0, str(TOOLS))
    from convert_torch_checkpoint import convert_wavernn
    from export_torch_checkpoint import export_wavernn

    kw = dict(rnn_dims=64, fc_dims=64, bits=9, pad=2, upsample_factors=(4, 5),
              feat_dims=20, compute_dims=16, res_out_dims=16, res_blocks=3,
              hop_length=20, sample_rate=8000, mode="RAW")
    torch.manual_seed(1)
    tmodel = TorchWaveRNN(**kw).eval()
    sd = _state_dict_numpy(tmodel)

    params, stats, step = convert_wavernn(sd, kw["res_blocks"],
                                          kw["upsample_factors"])
    sd2 = export_wavernn(params, stats, step, kw["upsample_factors"])
    _assert_state_dicts_equal(sd, sd2)

    torch.manual_seed(2)  # different init so a silent no-op load would fail
    fresh = TorchWaveRNN(**kw)
    fresh.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                           for k, v in sd2.items()}, strict=True)
    for k, v in _state_dict_numpy(fresh).items():
        if not k.endswith("num_batches_tracked"):
            np.testing.assert_array_equal(v, sd[k], err_msg=k)


def test_tacotron_export_roundtrips_and_strict_loads(ref_models):
    torch, _, TorchTacotron = ref_models
    sys.path.insert(0, str(TOOLS))
    from convert_torch_checkpoint import convert_tacotron
    from export_torch_checkpoint import export_tacotron

    from wavernn_tpu.models.tacotron import TacotronConfig

    cfg = TacotronConfig()
    kw = dict(embed_dims=cfg.embed_dims, num_chars=cfg.num_chars,
              encoder_dims=cfg.encoder_dims, decoder_dims=cfg.decoder_dims,
              n_mels=cfg.n_mels, fft_bins=cfg.fft_bins,
              postnet_dims=cfg.postnet_dims, encoder_K=cfg.encoder_K,
              lstm_dims=cfg.lstm_dims, postnet_K=cfg.postnet_K,
              num_highways=cfg.num_highways, dropout=cfg.dropout,
              stop_threshold=cfg.stop_threshold)
    torch.manual_seed(1)
    tmodel = TorchTacotron(**kw)
    tmodel.r = 5
    sd = _state_dict_numpy(tmodel)

    params, stats, step, r = convert_tacotron(
        sd, cfg.encoder_K, cfg.postnet_K, cfg.num_highways)
    assert r == 5
    sd2 = export_tacotron(params, stats, step, r, cfg.stop_threshold)
    _assert_state_dicts_equal(sd, sd2)

    torch.manual_seed(2)
    fresh = TorchTacotron(**kw)
    fresh.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                           for k, v in sd2.items()}, strict=True)
    assert int(fresh.r) == 5
    for k, v in _state_dict_numpy(fresh).items():
        if not k.endswith("num_batches_tracked"):
            np.testing.assert_array_equal(v, sd[k], err_msg=k)


def test_jax_trained_wavernn_exports_into_reference(ref_models):
    """The other direction of the migration story: a JAX-initialized (i.e.
    flax-native, never-seen-torch) WaveRNN tree exports into the reference
    module via strict load, and the torch forward matches our forward —
    proof that a model TRAINED in this framework transfers back."""
    torch, TorchWaveRNN, _ = ref_models
    sys.path.insert(0, str(TOOLS))
    from export_torch_checkpoint import export_wavernn

    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig

    kw = dict(rnn_dims=64, fc_dims=64, bits=9, pad=2, upsample_factors=(4, 5),
              feat_dims=20, compute_dims=16, res_out_dims=16, res_blocks=3,
              hop_length=20, sample_rate=8000, mode="RAW")
    cfg = WaveRNNConfig(**kw)
    model = WaveRNN(cfg)

    B, frames = 2, 6
    mel_win = frames + 2 * kw["pad"]
    seq_len = frames * kw["hop_length"]
    rng = np.random.default_rng(11)
    x = rng.uniform(-1, 1, (B, seq_len)).astype(np.float32)
    mels = rng.uniform(0, 1, (B, mel_win, kw["feat_dims"])).astype(np.float32)

    variables = model.init(jax.random.PRNGKey(42), jnp.asarray(x),
                           jnp.asarray(mels), True)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    sd = export_wavernn(params, stats, 1234, kw["upsample_factors"])
    tmodel = TorchWaveRNN(**kw)
    tmodel.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in sd.items()}, strict=True)
    tmodel.eval()
    assert tmodel.get_step() == 1234

    with torch.no_grad():
        want = tmodel(torch.from_numpy(x),
                      torch.from_numpy(mels).transpose(1, 2)).numpy()
    got = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x), jnp.asarray(mels), False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)
