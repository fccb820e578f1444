"""WaveRNN generation CLI (ref: gen_wavernn.py): copy-synthesis from the
held-out test set, from a .wav, or from a .npy mel."""

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp

from wavernn_tpu.config import hp
from wavernn_tpu.data.dataset import get_vocoder_datasets
from wavernn_tpu.infer.wavernn import gen_from_file, gen_testset
from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
from wavernn_tpu.paths import Paths
from wavernn_tpu.training.state import make_optimizer, new_train_state
from wavernn_tpu.utils.checkpoints import load_weights
from wavernn_tpu.utils.display import simple_table


def build_state(cfg: WaveRNNConfig):
    model = WaveRNN(cfg)
    x0 = jnp.zeros((1, cfg.hop_length))
    m0 = jnp.zeros((1, 1 + 2 * cfg.pad, cfg.feat_dims))
    variables = model.init(jax.random.PRNGKey(0), x0, m0, True)
    opt = make_optimizer(1e-4, None)
    return new_train_state(variables["params"], variables["batch_stats"], opt)


def main():
    parser = argparse.ArgumentParser(description="Generate WaveRNN Samples")
    parser.add_argument("--batched", "-b", dest="batched", action="store_true",
                        help="fast batched generation")
    parser.add_argument("--unbatched", "-u", dest="batched", action="store_false",
                        help="slow unbatched generation")
    parser.add_argument("--samples", "-s", type=int, help="[int] number of utterances to generate")
    parser.add_argument("--target", "-t", type=int, help="[int] samples in each batch index")
    parser.add_argument("--overlap", "-o", type=int, help="[int] crossover samples")
    parser.add_argument("--file", "-f", type=str, help="[string/path] wav or npy mel outside the dataset")
    parser.add_argument("--voc_weights", "-w", type=str, help="[string/path] alternative WaveRNN weights")
    parser.add_argument("--gta", "-g", dest="gta", action="store_true",
                        help="generate from GTA testset")
    parser.add_argument("--eval", dest="eval_mcd", action="store_true",
                        help="report copy-synthesis MCD over the test set")
    parser.add_argument("--force_cpu", "-c", action="store_true", help="force CPU-only generation")
    parser.add_argument("--mesh", "-m", action="store_true",
                        help="shard batched decode's fold axis over all "
                             "devices (multi-chip sequence-parallel "
                             "generation; uses hp.mesh_shape when set)")
    int8_group = parser.add_mutually_exclusive_group()
    int8_group.add_argument("--int8", action="store_true",
                        help="enable int8 weight streaming in the pallas "
                             "decode kernel (off by default: measured "
                             "slower than bf16 at production fold widths)")
    int8_group.add_argument("--no_int8", action="store_true",
                        help="disable int8 weight streaming in the pallas decode "
                             "kernel (pure bf16 weights)")
    parser.add_argument("--hp_file", metavar="FILE", default="hparams.py",
                        help="the file to use for the hyperparameters")
    parser.set_defaults(batched=None)
    args = parser.parse_args()

    overrides = ({"gen_int8": False} if args.no_int8
                 else {"gen_int8": True} if args.int8 else {})
    hp.configure(args.hp_file, **overrides)
    if args.target is None:
        args.target = hp.voc_target
    if args.overlap is None:
        args.overlap = hp.voc_overlap
    if args.batched is None:
        args.batched = hp.voc_gen_batched
    if args.samples is None:
        args.samples = hp.voc_gen_at_checkpoint

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    print("Using device:", jax.devices()[0])

    mesh = None
    if args.mesh:
        from wavernn_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(hp.mesh_shape)
        print(f"Decode mesh: data={mesh.n_data} model={mesh.n_model} "
              f"({len(jax.devices())} devices)")

    print("\nInitialising Model...\n")
    cfg = WaveRNNConfig.from_hp(hp)
    state = build_state(cfg)

    paths = Paths(hp.data_path, hp.voc_model_id, hp.tts_model_id)
    voc_weights = args.voc_weights if args.voc_weights else paths.voc_latest_weights
    state = load_weights(state, voc_weights)

    simple_table([
        ("Generation Mode", "Batched" if args.batched else "Unbatched"),
        ("Target Samples", args.target if args.batched else "N/A"),
        ("Overlap Samples", args.overlap if args.batched else "N/A"),
    ])

    if args.file:
        file = Path(args.file).expanduser()
        gen_from_file(cfg, state, file, paths.voc_output, args.batched,
                      args.target, args.overlap, mesh=mesh)
    elif args.eval_mcd:
        from wavernn_tpu.infer.eval import eval_testset_mcd

        _, test_set = get_vocoder_datasets(paths.data, 1, args.gta)
        eval_testset_mcd(cfg, state, test_set, args.samples, args.batched,
                         args.target, args.overlap)
    else:
        _, test_set = get_vocoder_datasets(paths.data, 1, args.gta)
        gen_testset(cfg, state, test_set, args.samples, args.batched,
                    args.target, args.overlap, paths.voc_output, mesh=mesh)

    print("\n\nExiting...\n")


if __name__ == "__main__":
    main()
