"""Tacotron TTS training CLI with curriculum schedule + GTA export
(ref: train_tacotron.py)."""

import argparse

import jax
import jax.numpy as jnp

from wavernn_tpu.config import hp
from wavernn_tpu.data.dataset import get_tts_datasets
from wavernn_tpu.models.tacotron import Tacotron, TacotronConfig, tacotron_num_params
from wavernn_tpu.paths import Paths
from wavernn_tpu.text.symbols import symbols
from wavernn_tpu.training.state import make_optimizer, new_train_state
from wavernn_tpu.training.tacotron import create_gta_features, run_schedule
from wavernn_tpu.utils.checkpoints import restore_checkpoint


def main():
    parser = argparse.ArgumentParser(description="Train Tacotron TTS")
    parser.add_argument("--force_train", "-f", action="store_true",
                        help="force the model to train past total steps")
    parser.add_argument("--force_gta", "-g", action="store_true",
                        help="force the model to create GTA features")
    parser.add_argument("--force_cpu", "-c", action="store_true",
                        help="force CPU-only training")
    parser.add_argument("--profile", metavar="DIR", default=None,
                        help="capture a jax.profiler trace to DIR")
    parser.add_argument("--hp_file", metavar="FILE", default="hparams.py",
                        help="the file to use for the hyperparameters")
    args = parser.parse_args()

    hp.configure(args.hp_file)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    from wavernn_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
    paths = Paths(hp.data_path, hp.voc_model_id, hp.tts_model_id)
    devices = jax.devices()
    print("Using devices:", devices)
    for _, _, _, batch_size in hp.tts_schedule:
        if batch_size % len(devices) != 0:
            raise ValueError("`batch_size` must be evenly divisible by the device count!")

    print("\nInitialising Tacotron Model...\n")
    cfg = TacotronConfig.from_hp(hp, num_chars=len(symbols))
    model = Tacotron(cfg)

    r0 = hp.tts_schedule[0][0]
    x0 = jnp.zeros((1, 16), jnp.int32)
    m0 = jnp.zeros((1, 5 * r0, cfg.n_mels))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0, m0, r0, True,
    )
    print("Trainable Parameters: %.3fM" % tacotron_num_params(variables["params"]))

    optimizer = make_optimizer(hp.tts_schedule[0][1], hp.tts_clip_grad_norm)
    state = new_train_state(variables["params"], variables["batch_stats"], optimizer)
    state = restore_checkpoint("tts", paths, state, create_if_missing=True)

    shard_batch = None
    if len(devices) > 1:
        from wavernn_tpu.parallel import make_mesh, shard_batch_fn

        plan = make_mesh(hp.mesh_shape)
        place = shard_batch_fn(plan)

        def shard_batch(x, m):
            return place(x, m)

    if not args.force_gta:
        def get_datasets(batch_size, r):
            return get_tts_datasets(paths.data, batch_size, r)

        from wavernn_tpu.utils.profiling import trace

        with trace(args.profile):
            state = run_schedule(paths, cfg, state, optimizer, get_datasets,
                                 force_train=args.force_train,
                                 shard_batch=shard_batch)
        print("Training Complete.")
        print("To continue training increase the schedule in hparams.py or use --force_train\n")

    print("Creating Ground Truth Aligned Dataset...\n")
    from wavernn_tpu.training.tacotron import r_for_step

    # use the r of the checkpoint's schedule position (the reference reads
    # model.r from the restored buffer, ref: train_tacotron.py:108)
    gta_r = r_for_step(state.get_step(), hp.tts_schedule)
    train_set, _ = get_tts_datasets(paths.data, 8, gta_r, drop_last=False)
    create_gta_features(cfg, state, train_set, paths.gta, gta_r)
    print("\n\nYou can now train WaveRNN on GTA features - use python train_wavernn.py --gta\n")


if __name__ == "__main__":
    main()
