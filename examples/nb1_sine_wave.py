"""NB1 equivalent: overfit the DeepMind dual-softmax WaveRNN on a sine wave
(ref: notebooks/NB1 - Fit a Sine Wave.ipynb).

The smallest end-to-end smoke test of the autoregressive machinery: if this
can't memorize a sine, nothing downstream will work.

Usage: python examples/nb1_sine_wave.py [--steps 500] [--out sine.wav]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wavernn_tpu.dsp import wavio
from wavernn_tpu.dsp.audio import split_signal
from wavernn_tpu.models.deepmind_wavernn import (
    DeepMindWaveRNN,
    DeepMindWaveRNNConfig,
    generate,
)
from wavernn_tpu.utils.display import stream


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=500)
    parser.add_argument("--sample_rate", type=int, default=24000)
    parser.add_argument("--out", default="model_outputs/nb1_sine.wav")
    args = parser.parse_args()

    sr = args.sample_rate
    t = np.arange(sr) / sr
    wave = np.sin(2 * np.pi * 220 * t)
    quant = (wave * (2 ** 15 - 0.5)).astype(np.int64)
    coarse, fine = split_signal(quant)

    # scaled inputs and integer targets, teacher-forced
    c_scaled = coarse / 127.5 - 1.0
    f_scaled = fine / 127.5 - 1.0
    prev_y = np.stack([c_scaled[:-1], f_scaled[:-1]], axis=-1)[None].astype(np.float32)
    coarse_t = c_scaled[1:, None][None].astype(np.float32)
    target_c = coarse[1:][None].astype(np.int32)
    target_f = fine[1:][None].astype(np.int32)

    cfg = DeepMindWaveRNNConfig(hidden_size=896)
    model = DeepMindWaveRNN(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(prev_y),
                           jnp.asarray(coarse_t))
    opt = optax.adam(1e-3)
    opt_state = opt.init(variables["params"])

    @jax.jit
    def step(params, opt_state, prev_y, coarse_t, tc, tf):
        def loss_fn(p):
            oc, of = model.apply({"params": p}, prev_y, coarse_t)
            lc = optax.softmax_cross_entropy_with_integer_labels(oc, tc).mean()
            lf = optax.softmax_cross_entropy_with_integer_labels(of, tf).mean()
            return lc + lf

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    for i in range(1, args.steps + 1):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(prev_y), jnp.asarray(coarse_t),
            jnp.asarray(target_c), jnp.asarray(target_f),
        )
        if i % 10 == 0:
            stream(f"step {i}/{args.steps} loss={float(loss):.4f} ")
    print()

    wav = generate(model, {"params": params}, seq_len=sr,
                   key=jax.random.PRNGKey(1))
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    wavio.save_wav(wav, args.out, sr=sr)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
