"""NB2/NB3 equivalent: overfit the production WaveRNN on a single utterance
and copy-synthesize it (ref: notebooks/NB2 - Fit a 30min Sample.ipynb arc).

Usage: python examples/nb2_fit_single_sample.py --wav path/to.wav [--steps 2000]
Writes the re-synthesized waveform next to the input.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from wavernn_tpu.config import hp, default_hparams_path
from wavernn_tpu.dsp import audio
from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig, num_params
from wavernn_tpu.ops.decode import Generator
from wavernn_tpu.training.state import make_optimizer, new_train_state
from wavernn_tpu.training.wavernn import make_train_step
from wavernn_tpu.utils.display import stream


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--wav", required=True)
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--hp_file", default=str(default_hparams_path()))
    args = parser.parse_args()

    hp.configure(args.hp_file, voc_mode="RAW")
    cfg = WaveRNNConfig.from_hp(hp)

    y = audio.load_wav(args.wav)
    mel = audio.melspectrogram(y).astype(np.float32)          # (n_mels, T)
    labels = audio.encode_mu_law(y, 2 ** hp.bits).astype(np.int64)

    model = WaveRNN(cfg)
    mel_win = hp.voc_seq_len // hp.hop_length + 2 * hp.voc_pad
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, hp.voc_seq_len)),
        jnp.zeros((1, mel_win, hp.num_mels)),
        True,
    )
    print("Trainable Parameters: %.3fM" % num_params(variables["params"]))
    opt = make_optimizer(hp.voc_lr * 4, hp.voc_clip_grad_norm)
    state = new_train_state(variables["params"], variables["batch_stats"], opt)
    train_step = make_train_step(model, opt, cfg.mode, donate=False)

    rng = np.random.default_rng(0)
    max_off = mel.shape[1] - 2 - (mel_win + 2 * hp.voc_pad)

    def batch():
        offs = rng.integers(0, max_off, args.batch_size)
        ms = np.stack([mel[:, o: o + mel_win] for o in offs]).transpose(0, 2, 1)
        sig = [labels[(o + hp.voc_pad) * hp.hop_length:][: hp.voc_seq_len + 1]
               for o in offs]
        lab = np.stack(sig)
        x = audio.label_2_float(lab[:, :-1].astype(np.float32), hp.bits)
        return x.astype(np.float32), lab[:, 1:].astype(np.int32), ms

    for i in range(1, args.steps + 1):
        x, t, m = batch()
        state, loss, _ = train_step(state, x, t, m)
        if i % 20 == 0:
            stream(f"step {i}/{args.steps} loss={float(loss):.4f} ")
    print()

    gen = Generator(cfg, {"params": state.params,
                          "batch_stats": state.batch_stats})
    wav = gen(mel[:, :400], batched=True, target=hp.voc_target,
              overlap=hp.voc_overlap, mu_law=hp.mu_law)
    out = Path(args.wav).with_suffix(".resynth.wav")
    audio.save_wav(wav, out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
