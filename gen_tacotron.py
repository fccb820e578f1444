"""End-to-end TTS generation CLI (ref: gen_tacotron.py): text → Tacotron mel
→ WaveRNN or Griffin-Lim waveform."""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from wavernn_tpu.config import hp
from wavernn_tpu.dsp import audio
from wavernn_tpu.dsp.jax_audio import reconstruct_waveform
from wavernn_tpu.infer.tacotron import TTSGenerator
from wavernn_tpu.infer.wavernn import make_generator
from wavernn_tpu.models.tacotron import Tacotron, TacotronConfig
from wavernn_tpu.models.wavernn import WaveRNNConfig
from wavernn_tpu.paths import Paths
from wavernn_tpu.text import text_to_sequence
from wavernn_tpu.text.symbols import symbols
from wavernn_tpu.training.state import make_optimizer, new_train_state
from wavernn_tpu.utils.checkpoints import load_weights
from wavernn_tpu.utils.display import save_attention, simple_table


def build_tts_state(cfg: TacotronConfig, r0: int):
    model = Tacotron(cfg)
    x0 = jnp.zeros((1, 16), jnp.int32)
    m0 = jnp.zeros((1, 5 * r0, cfg.n_mels))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0, m0, r0, True,
    )
    opt = make_optimizer(1e-4, None)
    return new_train_state(variables["params"], variables["batch_stats"], opt)


def main():
    parser = argparse.ArgumentParser(description="TTS Generator")
    parser.add_argument("--input_text", "-i", type=str,
                        help="[string] type in something here and TTS will generate it!")
    parser.add_argument("--tts_weights", type=str,
                        help="[string/path] alternative Tacotron weights")
    parser.add_argument("--save_attention", "-a", dest="save_attn", action="store_true",
                        help="save attention plots")
    parser.add_argument("--force_cpu", "-c", action="store_true", help="force CPU-only generation")
    parser.add_argument("--tts_backend", choices=["auto", "xla", "pallas"],
                        default="auto",
                        help="decoder backend: fused Pallas kernel (TPU, "
                             "B=1 latency path) or the XLA scan")
    int8_group = parser.add_mutually_exclusive_group()
    int8_group.add_argument("--int8", action="store_true",
                        help="enable int8 weight streaming in the pallas "
                             "decode kernel (off by default: measured "
                             "slower than bf16 at production fold widths)")
    int8_group.add_argument("--no_int8", action="store_true",
                        help="disable int8 weight streaming in the pallas "
                             "vocoder kernel (pure bf16 weights)")
    parser.add_argument("--mesh", "-m", action="store_true",
                        help="shard the vocoder's fold axis over the device "
                             "mesh (multi-chip sequence-parallel decode; "
                             "uses hp.mesh_shape when set)")
    parser.add_argument("--hp_file", metavar="FILE", default="hparams.py",
                        help="the file to use for the hyperparameters")
    parser.set_defaults(input_text=None)

    subparsers = parser.add_subparsers(required=True, dest="vocoder")
    wr_parser = subparsers.add_parser("wavernn", aliases=["wr"])
    wr_parser.add_argument("--batched", "-b", dest="batched", action="store_true")
    wr_parser.add_argument("--unbatched", "-u", dest="batched", action="store_false")
    wr_parser.add_argument("--overlap", "-o", type=int, help="[int] crossover samples")
    wr_parser.add_argument("--target", "-t", type=int, help="[int] samples per batch index")
    wr_parser.add_argument("--voc_weights", type=str,
                           help="[string/path] alternative WaveRNN weights")
    wr_parser.set_defaults(batched=None)

    gl_parser = subparsers.add_parser("griffinlim", aliases=["gl"])
    gl_parser.add_argument("--iters", type=int, default=32,
                           help="[int] griffinlim iterations")

    args = parser.parse_args()
    args.vocoder = "griffinlim" if args.vocoder in ("griffinlim", "gl") else "wavernn"

    overrides = ({"gen_int8": False} if args.no_int8
                 else {"gen_int8": True} if args.int8 else {})
    hp.configure(args.hp_file, **overrides)
    if args.vocoder == "wavernn":
        if args.target is None:
            args.target = hp.voc_target
        if args.overlap is None:
            args.overlap = hp.voc_overlap
        if args.batched is None:
            args.batched = hp.voc_gen_batched

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    print("Using device:", jax.devices()[0])

    paths = Paths(hp.data_path, hp.voc_model_id, hp.tts_model_id)

    mesh = None
    if args.mesh and args.vocoder == "wavernn":
        from wavernn_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(hp.mesh_shape)
        print(f"Decode mesh: data={mesh.n_data} model={mesh.n_model} "
              f"({len(jax.devices())} devices)")

    voc_state = voc_cfg = None
    if args.vocoder == "wavernn":
        print("\nInitialising WaveRNN Model...\n")
        from gen_wavernn import build_state

        voc_cfg = WaveRNNConfig.from_hp(hp)
        voc_state = build_state(voc_cfg)
        voc_load_path = args.voc_weights if args.voc_weights else paths.voc_latest_weights
        voc_state = load_weights(voc_state, voc_load_path)

    print("\nInitialising Tacotron Model...\n")
    from wavernn_tpu.training.tacotron import r_for_step

    tts_cfg = TacotronConfig.from_hp(hp, num_chars=len(symbols))
    tts_state = build_tts_state(tts_cfg, hp.tts_schedule[-1][0])
    tts_load_path = args.tts_weights if args.tts_weights else paths.tts_latest_weights
    tts_state = load_weights(tts_state, tts_load_path)
    # r follows the checkpoint's schedule position (the reference reads the
    # restored model.r buffer, ref: gen_tacotron.py:267)
    final_r = r_for_step(tts_state.get_step(), hp.tts_schedule)

    if args.input_text:
        inputs = [text_to_sequence(args.input_text.strip(), hp.tts_cleaner_names)]
    else:
        with open("sentences.txt") as f:
            inputs = [text_to_sequence(l.strip(), hp.tts_cleaner_names) for l in f]

    tts_k = tts_state.get_step() // 1000
    if args.vocoder == "wavernn":
        voc_k = voc_state.get_step() // 1000
        simple_table([
            ("Tacotron", str(tts_k) + "k"),
            ("r", final_r),
            ("Vocoder Type", "WaveRNN"),
            ("WaveRNN", str(voc_k) + "k"),
            ("Generation Mode", "Batched" if args.batched else "Unbatched"),
            ("Target Samples", args.target if args.batched else "N/A"),
            ("Overlap Samples", args.overlap if args.batched else "N/A"),
        ])
    else:
        simple_table([
            ("Tacotron", str(tts_k) + "k"),
            ("r", final_r),
            ("Vocoder Type", "Griffin-Lim"),
            ("GL Iters", args.iters),
        ])

    tts_variables = {"params": tts_state.params, "batch_stats": tts_state.batch_stats}
    tts_gen = TTSGenerator(tts_cfg, tts_variables, backend=args.tts_backend)

    for i, x in enumerate(inputs, 1):
        print(f"\n| Generating {i}/{len(inputs)}")
        _, m, attention = tts_gen(x, r=final_r)
        # rescale mel [-4,4] → [0,1]
        m = np.clip((m + 4) / 8, 0, 1)

        if args.vocoder == "griffinlim":
            v_type = args.vocoder
        elif args.batched:
            v_type = "wavernn_batched"
        else:
            v_type = "wavernn_unbatched"

        if args.input_text:
            save_path = paths.tts_output / f"__input_{args.input_text[:10]}_{v_type}_{tts_k}k.wav"
        else:
            save_path = paths.tts_output / f"{i}_{v_type}_{tts_k}k.wav"

        if args.save_attn:
            save_attention(attention, save_path, save_raw=True)

        if args.vocoder == "wavernn":
            gen = make_generator(voc_cfg, voc_state, mesh=mesh)
            wav = gen(m, batched=args.batched, target=args.target,
                      overlap=args.overlap, mu_law=hp.mu_law)
            audio.save_wav(wav, save_path)
        else:
            wav = reconstruct_waveform(m, n_iter=args.iters)
            audio.save_wav(wav, save_path)

    print("\n\nDone.\n")


if __name__ == "__main__":
    main()
