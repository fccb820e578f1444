"""End-to-end integration: synthetic corpus → preprocess → vocoder training
loop (with checkpointing) → copy-synthesis; Tacotron train step on real
loader batches.  The fastest full-pipeline check (SURVEY.md §4.4 ladder)."""

import pickle

import numpy as np
import pytest

from wavernn_tpu.dsp import wavio


@pytest.fixture()
def tiny_corpus(tmp_path, hp_tiny):
    hp = hp_tiny
    hp.voc_test_samples = 2
    hp.voc_checkpoint_every = 1000  # no audition gen in tests
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(5):
        n = 22050 + int(rng.integers(0, 8000))
        t = np.arange(n) / 22050
        y = (0.4 * np.sin(2 * np.pi * 330 * (i + 1) * t)).astype(np.float32)
        wavio.save_wav(y, wav_dir / f"utt{i}.wav", sr=22050)
        lines.append(f"utt{i}|hello world {i}|hello world {i}")
    (wav_dir / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")

    from wavernn_tpu.data.preprocess import preprocess_dataset
    from wavernn_tpu.paths import Paths
    from wavernn_tpu.text.recipes import ljspeech
    from wavernn_tpu.utils.files import get_files

    paths = Paths(tmp_path / "data", "voc_e2e", "tts_e2e", base=tmp_path)
    with open(paths.data / "text_dict.pkl", "wb") as f:
        pickle.dump(ljspeech(wav_dir), f)
    preprocess_dataset(get_files(wav_dir, ".wav"), paths, n_workers=1)
    return paths


def test_vocoder_pipeline_end_to_end(tiny_corpus, hp_tiny):
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.data.dataset import get_vocoder_datasets
    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.ops.decode import Generator
    from wavernn_tpu.training.state import make_optimizer, new_train_state
    from wavernn_tpu.training.wavernn import voc_train_loop
    from wavernn_tpu.utils.checkpoints import restore_checkpoint

    hp = hp_tiny
    paths = tiny_corpus
    cfg = WaveRNNConfig.from_hp(hp)
    model = WaveRNN(cfg)

    mel_win = hp.voc_seq_len // hp.hop_length + 2 * hp.voc_pad
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, hp.voc_seq_len)),
        jnp.zeros((1, mel_win, hp.num_mels)),
        True,
    )
    opt = make_optimizer(1e-3, hp.voc_clip_grad_norm)
    state = new_train_state(variables["params"], variables["batch_stats"], opt)
    state = restore_checkpoint("voc", paths, state, create_if_missing=True)

    train_set, test_set = get_vocoder_datasets(paths.data, batch_size=2, train_gta=False)
    state = voc_train_loop(
        paths, cfg, state, opt, train_set, test_set,
        total_steps=3, gen_at_checkpoint=False,
    )
    assert state.get_step() >= 3
    assert paths.voc_latest_weights.exists()
    assert paths.voc_log.exists()

    # resume restores the step
    fresh = new_train_state(variables["params"], variables["batch_stats"], opt)
    resumed = restore_checkpoint("voc", paths, fresh)
    assert resumed.get_step() == state.get_step()

    # copy-synthesis from the trained state
    mel, _ = next(iter(test_set))
    gen = Generator(cfg, {"params": state.params, "batch_stats": state.batch_stats})
    wav = gen(mel[:, :30], batched=True, target=2750, overlap=550, mu_law=hp.mu_law)
    assert len(wav) == 29 * hp.hop_length
    assert np.isfinite(wav).all()


def test_tts_train_step_on_real_batches(tiny_corpus, hp_tiny):
    import jax

    from wavernn_tpu.data.dataset import get_tts_datasets
    from wavernn_tpu.models.tacotron import Tacotron, TacotronConfig
    from wavernn_tpu.text.symbols import symbols
    from wavernn_tpu.training.state import make_optimizer, new_train_state
    from wavernn_tpu.training.tacotron import make_tts_train_step

    hp = hp_tiny
    paths = tiny_corpus
    cfg = TacotronConfig.from_hp(hp, num_chars=len(symbols))
    model = Tacotron(cfg)

    r = 7
    train_set, attn_example = get_tts_datasets(paths.data, batch_size=2, r=r)
    chars, mel, ids, mel_lens = next(iter(train_set))

    import jax.numpy as jnp

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(chars), jnp.asarray(mel), r, True,
    )
    opt = make_optimizer(1e-3, hp.tts_clip_grad_norm)
    state = new_train_state(variables["params"], variables["batch_stats"], opt)
    step = make_tts_train_step(model, opt, r, donate=False)
    state, loss, gnorm, attn, m2 = step(state, chars, mel, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert attn.shape[0] == 2 and attn.shape[1] == mel.shape[1] // r


def test_gta_export_artifact_contract_and_voc_consumption(tiny_corpus,
                                                          hp_tiny):
    """GTA fine-tuning path (ref: train_tacotron.py:178-198 →
    utils/dataset.py:35-64): create_gta_features must write one normalized
    (n_mels, mel_len) array per utterance — frames aligned to the TRUE mel
    length, values on the vocoder's [0,1] scale — and a vocoder train step
    must consume the gta/ directory through get_vocoder_datasets(
    train_gta=True)."""
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.data.dataset import (get_tts_datasets,
                                          get_vocoder_datasets)
    from wavernn_tpu.models.tacotron import Tacotron, TacotronConfig
    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.text.symbols import symbols
    from wavernn_tpu.training.state import make_optimizer, new_train_state
    from wavernn_tpu.training.tacotron import create_gta_features
    from wavernn_tpu.training.wavernn import make_train_step

    hp = hp_tiny
    paths = tiny_corpus
    r = 2

    # trained-for-0-steps Tacotron: the artifact CONTRACT is what's tested
    tts_cfg = TacotronConfig.from_hp(hp, num_chars=len(symbols))
    tts_model = Tacotron(tts_cfg)
    tts_vars = tts_model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 8), jnp.int32), jnp.zeros((1, 6, tts_cfg.n_mels)),
        r, True,
    )
    tts_state = new_train_state(tts_vars["params"], tts_vars["batch_stats"],
                                make_optimizer(1e-3, 4.0))

    train_set, _ = get_tts_datasets(paths.data, batch_size=2, r=r,
                                    drop_last=False)
    create_gta_features(tts_cfg, tts_state, train_set, paths.gta, r)

    import pickle as pkl
    with open(paths.data / "dataset.pkl", "rb") as f:
        dataset = pkl.load(f)
    assert len(dataset) == 5
    for item_id, mel_len in dataset:
        gta = np.load(paths.gta / f"{item_id}.npy")
        true_mel = np.load(paths.mel / f"{item_id}.npy")
        # one file per utterance, frames trimmed to the TRUE mel length
        # (batch padding must not leak into the artifact)
        assert gta.shape == (hp.num_mels, mel_len)
        assert true_mel.shape[-1] == mel_len
        # normalized to the vocoder's scale: (gta+4)/8 of the [-4,4] head
        assert gta.min() >= 0.0 - 1e-6 and gta.max() <= 1.0 + 1e-6
        assert np.isfinite(gta).all()

    # the --gta vocoder dataset pairs gta mels with the TRUE quantized
    # audio; one train step must run on it
    voc_cfg = WaveRNNConfig.from_hp(hp)
    voc_model = WaveRNN(voc_cfg)
    train_gta, _ = get_vocoder_datasets(paths.data, batch_size=2,
                                        train_gta=True)
    x, y, m = next(iter(train_gta))
    assert m.shape[-1] == hp.num_mels
    voc_vars = voc_model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                              jnp.asarray(m), True)
    opt = make_optimizer(1e-3, 4.0)
    state = new_train_state(voc_vars["params"], voc_vars["batch_stats"], opt)
    step = make_train_step(voc_model, opt, voc_cfg.mode, donate=False)
    state, loss, _ = step(state, x, y, m)
    assert np.isfinite(float(loss))
    assert state.get_step() == 1
