"""Training runtime tests: jitted step decreases loss (sine-overfit smoke, the
NB1-style graded integration check), checkpoint save/restore round-trip,
pairing-integrity guard, lr injection."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
from wavernn_tpu.training.state import (
    TrainState,
    make_optimizer,
    new_train_state,
    set_learning_rate,
)
from wavernn_tpu.training.wavernn import make_train_step


def tiny_cfg(mode="RAW"):
    return WaveRNNConfig(
        rnn_dims=32, fc_dims=32, bits=8, pad=2, upsample_factors=(4, 4),
        feat_dims=20, compute_dims=16, res_out_dims=16, res_blocks=1,
        hop_length=16, sample_rate=1000, mode=mode,
    )


def make_batch(cfg, B=4, rng=None):
    rng = rng or np.random.default_rng(0)
    mel_win = 8 + 2 * cfg.pad
    seq_len = 8 * cfg.hop_length
    mels = rng.uniform(0, 1, (B, mel_win, cfg.feat_dims)).astype(np.float32)
    if cfg.mode == "RAW":
        labels = rng.integers(0, 2 ** cfg.bits, (B, seq_len + 1))
        x = 2 * labels[:, :-1] / (2 ** cfg.bits - 1) - 1
        y = labels[:, 1:].astype(np.int32)
        return x.astype(np.float32), y, mels
    y = rng.uniform(-1, 1, (B, seq_len + 1)).astype(np.float32)
    return y[:, :-1], y[:, 1:], mels


def init_state(cfg, lr=1e-3, clip=4.0):
    model = WaveRNN(cfg)
    x, y, mels = make_batch(cfg, B=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mels), True)
    opt = make_optimizer(lr, clip)
    state = new_train_state(variables["params"], variables["batch_stats"], opt)
    return model, opt, state


@pytest.mark.parametrize("mode", ["RAW", "MOL"])
def test_train_step_decreases_loss(mode):
    cfg = tiny_cfg(mode)
    model, opt, state = init_state(cfg, lr=3e-3)
    step = make_train_step(model, opt, cfg.mode, donate=False)

    x, y, mels = make_batch(cfg)
    losses = []
    for _ in range(30):
        state, loss, gnorm = step(state, x, y, mels)
        losses.append(float(loss))
        assert np.isfinite(float(gnorm))
    assert losses[-1] < losses[0] * 0.98
    assert state.get_step() == 30


def test_step_counter_travels_with_checkpoint(tmp_path):
    from wavernn_tpu.paths import Paths
    from wavernn_tpu.utils.checkpoints import restore_checkpoint, save_checkpoint

    cfg = tiny_cfg()
    model, opt, state = init_state(cfg)
    step_fn = make_train_step(model, opt, cfg.mode, donate=False)
    x, y, mels = make_batch(cfg)
    for _ in range(3):
        state, *_ = step_fn(state, x, y, mels)

    paths = Paths(tmp_path / "data", "v", "t", base=tmp_path)
    save_checkpoint("voc", paths, state)

    _, opt2, fresh = init_state(cfg)
    restored = restore_checkpoint("voc", paths, fresh)
    assert restored.get_step() == 3
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments restored too
    for a, b in zip(
        jax.tree_util.tree_leaves(state.opt_state),
        jax.tree_util.tree_leaves(restored.opt_state),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_checkpoint_pairing_integrity(tmp_path):
    from wavernn_tpu.paths import Paths
    from wavernn_tpu.utils.checkpoints import save_checkpoint

    cfg = tiny_cfg()
    _, _, state = init_state(cfg)
    paths = Paths(tmp_path / "data", "v", "t", base=tmp_path)
    save_checkpoint("voc", paths, state)
    paths.voc_latest_optim.unlink()  # corrupt the pair
    with pytest.raises(FileNotFoundError):
        save_checkpoint("voc", paths, state)


def test_restore_missing_raises_or_creates(tmp_path):
    from wavernn_tpu.paths import Paths
    from wavernn_tpu.utils.checkpoints import restore_checkpoint

    cfg = tiny_cfg()
    _, _, state = init_state(cfg)
    paths = Paths(tmp_path / "data", "v", "t", base=tmp_path)
    with pytest.raises(FileNotFoundError):
        restore_checkpoint("voc", paths, state)
    restore_checkpoint("voc", paths, state, create_if_missing=True)
    assert paths.voc_latest_weights.exists()
    assert paths.voc_latest_optim.exists()


def test_named_checkpoints(tmp_path):
    from wavernn_tpu.paths import Paths
    from wavernn_tpu.utils.checkpoints import restore_checkpoint, save_checkpoint

    cfg = tiny_cfg()
    _, _, state = init_state(cfg)
    paths = Paths(tmp_path / "data", "v", "t", base=tmp_path)
    save_checkpoint("voc", paths, state, name="wave_step1K")
    assert (paths.voc_checkpoints / "wave_step1K_weights.msgpack").exists()
    restored = restore_checkpoint("voc", paths, state, name="wave_step1K")
    assert restored.get_step() == state.get_step()


def test_set_learning_rate():
    cfg = tiny_cfg()
    _, opt, state = init_state(cfg, lr=1e-3)
    set_learning_rate(state.opt_state, 5e-4)
    # find the injected value
    def find_lr(node):
        if hasattr(node, "hyperparams"):
            return float(node.hyperparams["learning_rate"])
        if isinstance(node, (tuple, list)):
            for c in node:
                v = find_lr(c)
                if v is not None:
                    return v
        return None

    assert find_lr(state.opt_state) == pytest.approx(5e-4)


def test_nan_step_cannot_clobber_latest_checkpoint(tmp_path, hp_tiny):
    """A step that produces non-finite loss/grad must not overwrite the
    latest checkpoint pair (VERDICT r2 Weak #5; ref NaN-guard intent:
    train_wavernn.py:129-130)."""
    from wavernn_tpu.paths import Paths
    from wavernn_tpu.training.wavernn import voc_train_loop

    hp = hp_tiny
    hp.voc_checkpoint_every = 1000

    cfg = tiny_cfg()
    _, opt, state = init_state(cfg)
    paths = Paths(tmp_path / "data", "v", "t", base=tmp_path)

    good = make_batch(cfg, B=2)
    state = voc_train_loop(paths, cfg, state, opt, [good], test_set=None,
                           total_steps=1, gen_at_checkpoint=False)
    assert paths.voc_latest_weights.exists()
    good_weights = paths.voc_latest_weights.read_bytes()
    good_optim = paths.voc_latest_optim.read_bytes()

    x, y, mels = make_batch(cfg, B=2)
    poisoned = (np.full_like(x, np.nan), y, mels)
    state = voc_train_loop(paths, cfg, state, opt, [poisoned], test_set=None,
                           total_steps=2, gen_at_checkpoint=False)

    assert paths.voc_latest_weights.read_bytes() == good_weights
    assert paths.voc_latest_optim.read_bytes() == good_optim


def test_tts_nan_step_cannot_clobber_latest_checkpoint(tmp_path, hp_tiny):
    """Same guard on the Tacotron loop (ref: train_tacotron.py:145-146)."""
    import jax.numpy as jnp

    from wavernn_tpu.models.tacotron import Tacotron, TacotronConfig
    from wavernn_tpu.paths import Paths
    from wavernn_tpu.text.symbols import symbols
    from wavernn_tpu.training.tacotron import tts_train_loop

    hp = hp_tiny
    hp.tts_checkpoint_every = 1000

    r = 2
    cfg = TacotronConfig.from_hp(hp, num_chars=len(symbols))
    model = Tacotron(cfg)
    rng = np.random.default_rng(0)
    chars = rng.integers(1, len(symbols), (2, 12)).astype(np.int32)
    mel = rng.uniform(-4, 4, (2, 4 * r, cfg.n_mels)).astype(np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(chars), jnp.asarray(mel), r, True,
    )
    opt = make_optimizer(1e-3, 1.0)
    state = new_train_state(variables["params"], variables["batch_stats"], opt)
    paths = Paths(tmp_path / "data", "v", "t", base=tmp_path)

    good = (chars, mel, ["a", "b"], [mel.shape[1]] * 2)
    state = tts_train_loop(paths, cfg, state, opt, [good], r=r, lr=1e-3,
                           train_steps=1, attn_example="zzz")
    good_weights = paths.tts_latest_weights.read_bytes()
    good_optim = paths.tts_latest_optim.read_bytes()

    poisoned = (chars, np.full_like(mel, np.nan), ["a", "b"], [mel.shape[1]] * 2)
    state = tts_train_loop(paths, cfg, state, opt, [poisoned], r=r, lr=1e-3,
                           train_steps=1, attn_example="zzz")

    assert paths.tts_latest_weights.read_bytes() == good_weights
    assert paths.tts_latest_optim.read_bytes() == good_optim


def test_pruning_wired_into_train_loop(tmp_path, hp_tiny):
    """voc_prune_* hparams engage sparse training inside voc_train_loop:
    after the ramp, the big matrices hit the target sparsity, pruned
    weights are exactly zero in the CHECKPOINT, and a resumed run keeps
    them pruned (VERDICT r2 Missing #3; ref prototype:
    notebooks/Pruning - Scratchpad.ipynb)."""
    from wavernn_tpu.paths import Paths
    from wavernn_tpu.training.wavernn import voc_train_loop
    from wavernn_tpu.utils.checkpoints import restore_checkpoint

    hp = hp_tiny
    hp.voc_checkpoint_every = 1000
    hp.voc_prune = True
    hp.voc_prune_target_sparsity = 0.75
    hp.voc_prune_start = 2
    hp.voc_prune_ramp = 4
    hp.voc_prune_every = 2

    cfg = tiny_cfg()
    _, opt, state = init_state(cfg)
    paths = Paths(tmp_path / "data", "v", "t", base=tmp_path)

    batches = [make_batch(cfg, B=2, rng=np.random.default_rng(i))
               for i in range(10)]
    state = voc_train_loop(paths, cfg, state, opt, batches, test_set=None,
                           total_steps=10, gen_at_checkpoint=False)

    def sparsity(p, name):
        w = np.asarray(p[name]["cell"]["w_hh"])
        return float((w == 0).mean())

    # ramp completed at step 6 → target sparsity on the gated matrices
    s1 = sparsity(state.params, "rnn1")
    assert abs(s1 - 0.75) < 0.02, s1

    # pruned weights are zero ON DISK (the resume contract)
    _, opt2, fresh = init_state(cfg)
    restored = restore_checkpoint("voc", paths, fresh)
    assert abs(sparsity(restored.params, "rnn1") - 0.75) < 0.02
    zero_set = np.asarray(restored.params["rnn1"]["cell"]["w_hh"]) == 0

    # resume: one more step must keep the same weights pruned
    resumed = voc_train_loop(paths, cfg, restored, opt2, batches[:1],
                             test_set=None, total_steps=11,
                             gen_at_checkpoint=False)
    w_after = np.asarray(resumed.params["rnn1"]["cell"]["w_hh"])
    assert np.all(w_after[zero_set] == 0)
    assert abs(float((w_after == 0).mean()) - 0.75) < 0.02


def test_sine_overfit_smoke():
    """NB1-equivalent: the model should overfit a short sine segment quickly
    (SURVEY.md §4.4)."""
    from wavernn_tpu.dsp import audio as dsp_audio

    cfg = tiny_cfg("RAW")
    model, opt, state = init_state(cfg, lr=5e-3)
    step = make_train_step(model, opt, cfg.mode, donate=False)

    # one fixed batch cut from a sine wave, mu-law labels
    n = 8 * cfg.hop_length + 1
    t = np.arange(n * 4) / 1000.0
    wave = 0.6 * np.sin(2 * np.pi * 50 * t)
    labels = dsp_audio.encode_mu_law(wave, 2 ** cfg.bits).astype(np.int32)
    B = 4
    xs, ys, mels = [], [], []
    rng = np.random.default_rng(0)
    mel_fake = rng.uniform(0, 1, (B, 8 + 2 * cfg.pad, cfg.feat_dims)).astype(np.float32)
    for b in range(B):
        off = b * 100
        lab = labels[off: off + n]
        xs.append(2 * lab[:-1] / (2 ** cfg.bits - 1) - 1)
        ys.append(lab[1:])
    x = np.stack(xs).astype(np.float32)
    y = np.stack(ys).astype(np.int32)

    first = None
    for i in range(60):
        state, loss, _ = step(state, x, y, mel_fake)
        if first is None:
            first = float(loss)
    # cross-entropy should drop well below the initial value
    assert float(loss) < first * 0.7, (first, float(loss))
