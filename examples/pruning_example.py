"""Sparse-WaveRNN training with the cubic magnitude-pruning schedule
(ref: notebooks/Pruning - Scratchpad.ipynb prototype, productionized in
wavernn_tpu/pruning.py).

Usage: python examples/pruning_example.py [--steps 300]
Trains a tiny model on noise while ramping sparsity and prints the measured
mask sparsity trajectory.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
from wavernn_tpu.pruning import PruneConfig, Pruner, measured_sparsity
from wavernn_tpu.training.state import make_optimizer, new_train_state
from wavernn_tpu.training.wavernn import make_train_step
from wavernn_tpu.utils.display import stream


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    args = parser.parse_args()

    cfg = WaveRNNConfig(
        rnn_dims=64, fc_dims=64, bits=8, pad=2, upsample_factors=(4, 4),
        feat_dims=16, compute_dims=16, res_out_dims=16, res_blocks=1,
        hop_length=16, sample_rate=1000, mode="RAW",
    )
    model = WaveRNN(cfg)
    B, mel_win = 8, 4 + 2 * cfg.pad
    seq_len = 4 * cfg.hop_length
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (B, seq_len)).astype(np.float32)
    y = rng.integers(0, cfg.n_classes, (B, seq_len)).astype(np.int32)
    mels = rng.uniform(0, 1, (B, mel_win, cfg.feat_dims)).astype(np.float32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mels), True)
    opt = make_optimizer(1e-3, 4.0)
    state = new_train_state(variables["params"], variables["batch_stats"], opt)
    train_step = make_train_step(model, opt, cfg.mode, donate=False)

    pcfg = PruneConfig(target_sparsity=0.9, start_step=50,
                       ramp_steps=200, prune_every=25)
    pruner = Pruner(pcfg)
    masks = pruner.init_masks(state.params)

    for i in range(1, args.steps + 1):
        state, loss, _ = train_step(state, x, y, mels)
        step = state.get_step()
        masks = pruner.maybe_update(masks, state.params, step)
        state = state.replace(params=Pruner.apply(masks, state.params))
        if step % 25 == 0:
            s = measured_sparsity(masks)
            stream(f"step {step} loss={float(loss):.3f} sparsity={s:.3f}  ")
    print("\ndone")


if __name__ == "__main__":
    main()
