"""NB3 equivalent: fit a long (30-minute-scale) sample through the REAL
training stack (ref: notebooks/NB3 - Fit a 30min Sample.ipynb).

Unlike nb2 (hand-rolled batch sampler), this rung drives the production
pipeline end to end: corpus on disk → preprocess pool → VocoderDataset +
DataLoader window crops → voc_train_loop (checkpointing, audition cadence,
log) → copy-synthesis from the held-out split.  The default is scaled to
run in minutes on CPU (--minutes 30 --full_size reproduces the reference
rung's scale on TPU).

Usage: python examples/nb3_fit_long_sample.py [--minutes 1] [--steps 300]
Asserts the loss drops and the audition wav is written.
"""

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def synth_corpus(wav_dir: Path, sr: int, total_seconds: float, n_files: int):
    """A harmonically rich, f0-modulated corpus split into utterances."""
    from wavernn_tpu.dsp import wavio

    wav_dir.mkdir(parents=True, exist_ok=True)
    per = total_seconds / n_files
    for i in range(n_files):
        t = np.arange(int(sr * per)) / sr
        f0 = 140.0 + 40.0 * np.sin(2 * np.pi * (0.2 + 0.05 * i) * t) + 15 * i
        phase = 2 * np.pi * np.cumsum(f0) / sr
        y = sum((0.5 ** k) * np.sin((k + 1) * phase) for k in range(3))
        y = (0.4 * y / np.abs(y).max()).astype(np.float32)
        wavio.save_wav(y, wav_dir / f"long_{i:03d}.wav", sr=sr)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--minutes", type=float, default=1.0)
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--seq_hops", type=int, default=5,
                        help="training window length in mel hops")
    parser.add_argument("--full_size", action="store_true",
                        help="use the full 512-dim model (TPU scale)")
    parser.add_argument("--workspace", default=None)
    args = parser.parse_args()

    ws = Path(args.workspace or tempfile.mkdtemp(prefix="nb3_"))
    print(f"workspace: {ws}")

    from wavernn_tpu.config import hp, default_hparams_path

    small = {} if args.full_size else dict(
        voc_rnn_dims=64, voc_fc_dims=64, voc_compute_dims=32,
        voc_res_out_dims=32, voc_res_blocks=2,
    )
    hp.configure(
        default_hparams_path(), data_path=str(ws / "data"), voc_mode="RAW",
        voc_batch_size=args.batch_size, voc_total_steps=args.steps,
        voc_seq_len=args.seq_hops * 275,
        voc_checkpoint_every=args.steps,  # audition fires on the last step
        voc_gen_at_checkpoint=1, voc_test_samples=2, **small,
    )

    from wavernn_tpu.data.dataset import get_vocoder_datasets
    from wavernn_tpu.data.preprocess import preprocess_dataset
    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig, num_params
    from wavernn_tpu.paths import Paths
    from wavernn_tpu.training.state import make_optimizer, new_train_state
    from wavernn_tpu.training.wavernn import make_train_step, voc_train_loop
    from wavernn_tpu.utils.files import get_files

    synth_corpus(ws / "wavs", hp.sample_rate, args.minutes * 60.0, n_files=12)
    paths = Paths(hp.data_path, hp.voc_model_id, hp.tts_model_id, base=ws)
    preprocess_dataset(get_files(ws / "wavs", ".wav"), paths)

    import jax
    import jax.numpy as jnp

    cfg = WaveRNNConfig.from_hp(hp)
    model = WaveRNN(cfg)
    mel_win = hp.voc_seq_len // hp.hop_length + 2 * hp.voc_pad
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, hp.voc_seq_len)),
        jnp.zeros((1, mel_win, hp.num_mels)), True,
    )
    print("Trainable Parameters: %.3fM" % num_params(variables["params"]))
    opt = make_optimizer(hp.voc_lr * 4, hp.voc_clip_grad_norm)
    state = new_train_state(variables["params"], variables["batch_stats"], opt)

    train_set, test_set = get_vocoder_datasets(paths.data, args.batch_size,
                                               train_gta=False)

    # baseline loss before training (one fresh batch)
    step_fn = make_train_step(model, opt, cfg.mode, donate=False)
    x0, y0, m0 = next(iter(train_set))
    _, loss0, _ = step_fn(state, x0, y0, m0)
    loss0 = float(loss0)

    state = voc_train_loop(paths, cfg, state, opt, train_set, test_set,
                           total_steps=args.steps)

    _, loss1, _ = step_fn(state, x0, y0, m0)
    loss1 = float(loss1)
    print(f"loss {loss0:.3f} -> {loss1:.3f}")
    assert loss1 < loss0 - 0.5, "training did not reduce the loss"
    wavs = list(paths.voc_output.glob("*.wav"))
    assert wavs, "audition generation wrote no wavs"
    assert paths.voc_latest_weights.exists()
    print(f"OK: {len(wavs)} audition wavs under {paths.voc_output}")


if __name__ == "__main__":
    main()
