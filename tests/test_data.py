"""Data pipeline tests: preprocessing artifacts, loaders, collation shapes,
deterministic splits, binned sampler."""

import pickle

import numpy as np
import pytest

from wavernn_tpu.dsp import wavio


@pytest.fixture()
def toy_corpus(tmp_path, hp_tiny):
    """Build a small synthetic wav corpus + metadata.csv, run preprocessing."""
    hp = hp_tiny
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(6):
        n = 22050 + int(rng.integers(0, 11025))
        t = np.arange(n) / 22050
        f = 220 * (i + 1)
        y = (0.4 * np.sin(2 * np.pi * f * t)).astype(np.float32)
        wavio.save_wav(y, wav_dir / f"utt{i}.wav", sr=22050)
        lines.append(f"utt{i}|some text {i}|some text {i}")
    (wav_dir / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")

    from wavernn_tpu.data.preprocess import preprocess_dataset
    from wavernn_tpu.paths import Paths
    from wavernn_tpu.text.recipes import ljspeech
    from wavernn_tpu.utils.files import get_files

    paths = Paths(tmp_path / "data", "voc_test", "tts_test", base=tmp_path)
    wavs = get_files(wav_dir, ".wav")
    text_dict = ljspeech(wav_dir)
    with open(paths.data / "text_dict.pkl", "wb") as f:
        pickle.dump(text_dict, f)
    dataset = preprocess_dataset(wavs, paths, n_workers=1)
    return paths, dataset


def test_preprocess_artifacts(toy_corpus, hp_tiny):
    paths, dataset = toy_corpus
    assert len(dataset) == 6
    for item_id, mel_len in dataset:
        mel = np.load(paths.mel / f"{item_id}.npy")
        quant = np.load(paths.quant / f"{item_id}.npy")
        assert mel.shape[0] == hp_tiny.num_mels
        assert mel.shape[1] == mel_len
        assert 0 <= mel.min() and mel.max() <= 1
        bits = 16 if hp_tiny.voc_mode == "MOL" else hp_tiny.bits
        assert quant.min() >= 0 and quant.max() < 2 ** bits
        # quant/mel alignment: hop * n_frames ≈ n_samples
        assert abs(len(quant) // hp_tiny.hop_length + 1 - mel_len) <= 1


def test_vocoder_loader_shapes(toy_corpus, hp_tiny):
    from wavernn_tpu.data.dataset import get_vocoder_datasets

    hp = hp_tiny
    hp.voc_test_samples = 2
    paths, _ = toy_corpus
    train_set, test_set = get_vocoder_datasets(paths.data, batch_size=2, train_gta=False)

    x, y, mels = next(iter(train_set))
    assert x.shape == (2, hp.voc_seq_len)
    assert y.shape == (2, hp.voc_seq_len)
    mel_win = hp.voc_seq_len // hp.hop_length + 2 * hp.voc_pad
    assert mels.shape == (2, mel_win, hp.num_mels)
    assert x.dtype == np.float32
    if hp.voc_mode == "MOL":
        assert y.dtype == np.float32
        assert -1 <= y.min() and y.max() <= 1

    m, q = next(iter(test_set))
    assert m.shape[0] == hp.num_mels


def test_vocoder_split_deterministic(toy_corpus, hp_tiny):
    from wavernn_tpu.data.dataset import _split_ids

    hp_tiny.voc_test_samples = 2
    paths, _ = toy_corpus
    a_train, a_test = _split_ids(paths.data)
    b_train, b_test = _split_ids(paths.data)
    assert a_train == b_train and a_test == b_test
    assert len(a_test) == 2
    assert set(a_train).isdisjoint(a_test)


def test_tts_loader_shapes(toy_corpus, hp_tiny):
    from wavernn_tpu.data.dataset import get_tts_datasets

    paths, _ = toy_corpus
    r = 5
    train_set, attn_example = get_tts_datasets(paths.data, batch_size=2, r=r)
    chars, mel, ids, mel_lens = next(iter(train_set))
    assert chars.ndim == 2 and chars.dtype == np.int32
    assert mel.shape[0] == 2 and mel.shape[2] == hp_tiny.num_mels
    assert mel.shape[1] % r == 0
    assert -4.0 - 1e-5 <= mel.min() and mel.max() <= 4.0 + 1e-5
    assert isinstance(attn_example, str)


def test_binned_length_sampler_covers_all():
    from wavernn_tpu.data.dataset import BinnedLengthSampler

    lengths = list(np.random.default_rng(0).integers(10, 100, 50))
    s = BinnedLengthSampler(lengths, batch_size=4, bin_size=12)
    idx = list(iter(s))
    assert sorted(idx) == list(range(50))


def test_dataloader_prefetch_order_completeness():
    from wavernn_tpu.data.loader import DataLoader, Dataset

    class Rng(Dataset):
        def __getitem__(self, i):
            return i

        def __len__(self):
            return 23

    dl = DataLoader(Rng(), batch_size=5, num_workers=3)
    batches = list(iter(dl))
    flat = [i for b in batches for i in b]
    assert sorted(flat) == list(range(23))
    assert len(dl) == 5
