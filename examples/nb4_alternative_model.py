"""NB4a+b equivalent: the "alternative model" walkthrough (ref:
notebooks/NB4a - Alternative Model (Preprocessing).ipynb and
NB4b - Alternative Model (Training).ipynb).

The reference's NB4 pair prototypes what became its production model: the
fatchord WaveRNN with the MOL head, trained on preprocessed (mel, 16-bit
label) pairs and generated with batched folding.  This walkthrough runs
that exact arc on a synthetic corpus through the production stack:

  part A — preprocess: wavs → mel.npy + 16-bit quant.npy + dataset.pkl
           (MOL mode stores float-derived 16-bit labels, not mu-law;
            ref preprocess.py:42-46)
  part B — train the MOL WaveRNN via voc_train_loop, then batched
           fold/crossfade copy-synthesis of a held-out utterance.

Defaults run in minutes on CPU; --full_size is the TPU-scale rung (the
reference quotes ~48h GPU convergence for the real thing — NB4b cell 1).

Usage: python examples/nb4_alternative_model.py [--steps 150]
"""

import argparse
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=150)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--seq_hops", type=int, default=3)
    parser.add_argument("--full_size", action="store_true")
    parser.add_argument("--workspace", default=None)
    args = parser.parse_args()

    ws = Path(args.workspace or tempfile.mkdtemp(prefix="nb4_"))
    print(f"workspace: {ws}")

    from wavernn_tpu.config import hp, default_hparams_path

    small = {} if args.full_size else dict(
        voc_rnn_dims=64, voc_fc_dims=64, voc_compute_dims=32,
        voc_res_out_dims=32, voc_res_blocks=2,
    )
    hp.configure(
        default_hparams_path(), data_path=str(ws / "data"),
        voc_mode="MOL",  # the alternative model's head
        voc_batch_size=args.batch_size, voc_total_steps=args.steps,
        voc_seq_len=args.seq_hops * 275,
        voc_checkpoint_every=args.steps, voc_gen_at_checkpoint=0,
        voc_test_samples=2, **small,
    )

    # ---- part A: preprocessing (NB4a) ---------------------------------------
    from wavernn_tpu.data.preprocess import preprocess_dataset
    from wavernn_tpu.dsp import wavio
    from wavernn_tpu.paths import Paths
    from wavernn_tpu.utils.files import get_files

    sr = hp.sample_rate
    wav_dir = ws / "wavs"
    wav_dir.mkdir(parents=True, exist_ok=True)
    for i in range(8):
        t = np.arange(int(sr * 2.0)) / sr
        f0 = 150.0 + 20.0 * i
        y = sum((0.5 ** k) * np.sin(2 * np.pi * (k + 1) * f0 * t)
                for k in range(3))
        wavio.save_wav((0.4 * y / np.abs(y).max()).astype(np.float32),
                       wav_dir / f"alt_{i:02d}.wav", sr=sr)

    paths = Paths(hp.data_path, hp.voc_model_id, hp.tts_model_id, base=ws)
    dataset = preprocess_dataset(get_files(wav_dir, ".wav"), paths)
    assert len(dataset) == 8
    # MOL preprocessing stores 16-bit labels (ref preprocess.py:44-46)
    quant = np.load(paths.quant / f"{dataset[0][0]}.npy")
    assert quant.max() >= 2 ** 9, "expected 16-bit label range in MOL mode"
    print(f"part A OK: {len(dataset)} utterances preprocessed (16-bit labels)")

    # ---- part B: training + batched generation (NB4b) -----------------------
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.data.dataset import get_vocoder_datasets
    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig, num_params
    from wavernn_tpu.ops.decode import Generator
    from wavernn_tpu.training.state import make_optimizer, new_train_state
    from wavernn_tpu.training.wavernn import make_train_step, voc_train_loop

    cfg = WaveRNNConfig.from_hp(hp)
    assert cfg.mode == "MOL" and cfg.n_classes == 30
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
    step_fn = make_train_step(model, opt, cfg.mode, donate=False)
    x0, y0, m0 = next(iter(train_set))
    loss0 = float(step_fn(state, x0, y0, m0)[1])

    state = voc_train_loop(paths, cfg, state, opt, train_set, test_set,
                           total_steps=args.steps, gen_at_checkpoint=False)
    loss1 = float(step_fn(state, x0, y0, m0)[1])
    print(f"MOL loss {loss0:.3f} -> {loss1:.3f}")
    assert loss1 < loss0 - 0.3, "training did not reduce the MOL loss"

    # batched fold/crossfade generation of a held-out mel (NB4b's finale)
    mel, _ = next(iter(test_set))
    gen = Generator(cfg, {"params": state.params,
                          "batch_stats": state.batch_stats})
    wav = gen(np.asarray(mel), batched=True, target=2750, overlap=550,
              mu_law=False)
    out = paths.voc_output / "nb4_alternative_model.wav"
    wavio.save_wav(np.asarray(wav, np.float32), out, sr=sr)
    assert np.isfinite(wav).all() and len(wav) > sr
    print(f"part B OK: wrote {out} ({len(wav) / sr:.1f}s)")


if __name__ == "__main__":
    main()
