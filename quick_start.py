"""Quick-start synthesis from pretrained checkpoints (ref: quick_start.py).

Unzips pretrained checkpoint archives (if present under pretrained/) into
quick_start/ and synthesizes sentences.txt or --input_text.  PyTorch-format
pretrained zips can first be converted with tools/convert_torch_checkpoint.py.
"""

import argparse
import os
import zipfile
from pathlib import Path

import jax
import numpy as np

from wavernn_tpu.config import hp
from wavernn_tpu.dsp import audio
from wavernn_tpu.infer.tacotron import TTSGenerator
from wavernn_tpu.infer.wavernn import make_generator
from wavernn_tpu.models.tacotron import TacotronConfig
from wavernn_tpu.models.wavernn import WaveRNNConfig
from wavernn_tpu.text import text_to_sequence
from wavernn_tpu.text.symbols import symbols
from wavernn_tpu.utils.checkpoints import load_weights
from wavernn_tpu.utils.display import simple_table


def maybe_unzip(zip_path: str, out_dir: str):
    if Path(zip_path).exists():
        os.makedirs(out_dir, exist_ok=True)
        with zipfile.ZipFile(zip_path, "r") as zf:
            zf.extractall(out_dir)


def main():
    parser = argparse.ArgumentParser(description="TTS Generator (quick start)")
    parser.add_argument("--input_text", "-i", type=str,
                        help="[string] type in something here and TTS will generate it!")
    parser.add_argument("--batched", "-b", dest="batched", action="store_true",
                        help="fast batched generation (lower quality)")
    parser.add_argument("--unbatched", "-u", dest="batched", action="store_false",
                        help="slower unbatched generation (better quality)")
    parser.add_argument("--force_cpu", "-c", action="store_true",
                        help="force CPU-only generation")
    parser.add_argument("--hp_file", metavar="FILE", default="hparams.py",
                        help="the file to use for the hyperparameters")
    parser.set_defaults(batched=True, input_text=None)
    args = parser.parse_args()

    hp.configure(args.hp_file)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    print("Using device:", jax.devices()[0])

    maybe_unzip("pretrained/ljspeech.wavernn.mol.800k.zip", "quick_start/voc_weights/")
    maybe_unzip("pretrained/ljspeech.tacotron.r2.180k.zip", "quick_start/tts_weights/")

    print("\nInitialising WaveRNN Model...\n")
    from gen_wavernn import build_state as build_voc_state

    voc_cfg = WaveRNNConfig.from_hp(hp)
    voc_state = build_voc_state(voc_cfg)
    voc_state = load_weights(voc_state, "quick_start/voc_weights/latest_weights.msgpack")

    print("\nInitialising Tacotron Model...\n")
    from gen_tacotron import build_tts_state

    from wavernn_tpu.training.tacotron import r_for_step

    tts_cfg = TacotronConfig.from_hp(hp, num_chars=len(symbols))
    tts_state = build_tts_state(tts_cfg, hp.tts_schedule[-1][0])
    tts_state = load_weights(tts_state, "quick_start/tts_weights/latest_weights.msgpack")
    r = r_for_step(tts_state.get_step(), hp.tts_schedule)

    if args.input_text:
        inputs = [text_to_sequence(args.input_text.strip(), hp.tts_cleaner_names)]
    else:
        with open("sentences.txt") as f:
            inputs = [text_to_sequence(l.strip(), hp.tts_cleaner_names) for l in f]

    voc_k = voc_state.get_step() // 1000
    tts_k = tts_state.get_step() // 1000
    simple_table([
        ("WaveRNN", str(voc_k) + "k"),
        (f"Tacotron(r={r})", str(tts_k) + "k"),
        ("Generation Mode", "Batched" if args.batched else "Unbatched"),
        ("Target Samples", 11_000 if args.batched else "N/A"),
        ("Overlap Samples", 550 if args.batched else "N/A"),
    ])

    tts_variables = {"params": tts_state.params, "batch_stats": tts_state.batch_stats}
    tts_gen = TTSGenerator(tts_cfg, tts_variables)
    os.makedirs("quick_start", exist_ok=True)

    for i, x in enumerate(inputs, 1):
        print(f"\n| Generating {i}/{len(inputs)}")
        _, m, attention = tts_gen(x, r=r)

        if args.input_text:
            save_path = f"quick_start/__input_{args.input_text[:10]}_{tts_k}k.wav"
        else:
            save_path = f"quick_start/{i}_batched{str(args.batched)}_{tts_k}k.wav"

        m = np.clip((m + 4) / 8, 0, 1)
        gen = make_generator(voc_cfg, voc_state)
        wav = gen(m, batched=args.batched, target=11_000, overlap=550, mu_law=hp.mu_law)
        audio.save_wav(wav, save_path)

    print("\n\nDone.\n")


if __name__ == "__main__":
    main()
