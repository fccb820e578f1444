"""WaveRNN vocoder training CLI (ref: train_wavernn.py).

Data parallelism: with >1 device, batches are placed with a NamedSharding
over the data mesh axis; XLA inserts the gradient all-reduce (the TPU
replacement for DataParallel).
"""

import argparse

import jax
import numpy as np

from wavernn_tpu.config import hp
from wavernn_tpu.data.dataset import get_vocoder_datasets
from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig, num_params
from wavernn_tpu.parallel import make_mesh, shard_batch_fn
from wavernn_tpu.paths import Paths
from wavernn_tpu.training.state import make_optimizer, new_train_state
from wavernn_tpu.training.wavernn import voc_train_loop
from wavernn_tpu.utils.checkpoints import restore_checkpoint
from wavernn_tpu.utils.display import simple_table


def main():
    parser = argparse.ArgumentParser(description="Train WaveRNN Vocoder")
    parser.add_argument("--lr", "-l", type=float, help="[float] override hparams.py learning rate")
    parser.add_argument("--batch_size", "-b", type=int, help="[int] override hparams.py batch size")
    parser.add_argument("--force_train", "-f", action="store_true",
                        help="force the model to train past total steps")
    parser.add_argument("--gta", "-g", action="store_true", help="train on GTA features")
    parser.add_argument("--force_cpu", "-c", action="store_true",
                        help="force CPU-only training")
    parser.add_argument("--profile", metavar="DIR", default=None,
                        help="capture a jax.profiler trace of the first steps to DIR")
    parser.add_argument("--hp_file", metavar="FILE", default="hparams.py",
                        help="the file to use for the hyperparameters")
    args = parser.parse_args()

    hp.configure(args.hp_file)
    if args.lr is None:
        args.lr = hp.voc_lr
    if args.batch_size is None:
        args.batch_size = hp.voc_batch_size

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from wavernn_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
    paths = Paths(hp.data_path, hp.voc_model_id, hp.tts_model_id)
    devices = jax.devices()
    print("Using devices:", devices)

    if args.batch_size % len(devices) != 0:
        raise ValueError("`batch_size` must be evenly divisible by the device count!")

    print("\nInitialising Model...\n")
    cfg = WaveRNNConfig.from_hp(hp)
    model = WaveRNN(cfg)

    import jax.numpy as jnp

    x0 = jnp.zeros((1, hp.voc_seq_len))
    m0 = jnp.zeros((1, hp.voc_seq_len // hp.hop_length + 2 * hp.voc_pad, hp.num_mels))
    variables = model.init(jax.random.PRNGKey(0), x0, m0, True)
    print("Trainable Parameters: %.3fM" % num_params(variables["params"]))

    optimizer = make_optimizer(args.lr, hp.voc_clip_grad_norm)
    state = new_train_state(variables["params"], variables["batch_stats"], optimizer)
    state = restore_checkpoint("voc", paths, state, create_if_missing=True)

    train_set, test_set = get_vocoder_datasets(paths.data, args.batch_size, args.gta)

    total_steps = 10_000_000 if args.force_train else hp.voc_total_steps

    simple_table([
        ("Remaining", str((total_steps - state.get_step()) // 1000) + "k Steps"),
        ("Batch Size", args.batch_size),
        ("LR", args.lr),
        ("Sequence Len", hp.voc_seq_len),
        ("GTA Train", args.gta),
    ])

    shard_batch = None
    if len(devices) > 1:
        plan = make_mesh(hp.mesh_shape)
        shard_batch = shard_batch_fn(plan)

    from wavernn_tpu.utils.profiling import trace

    with trace(args.profile):
        voc_train_loop(paths, cfg, state, optimizer, train_set, test_set,
                       total_steps, lr=args.lr, shard_batch=shard_batch)

    print("Training Complete.")
    print("To continue training increase voc_total_steps in hparams.py or use --force_train")


if __name__ == "__main__":
    main()
