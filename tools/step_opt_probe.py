"""Decode-kernel step-time experiments at production shapes.

Pipelined timing (K back-to-back dispatches, last fetched) of the candidate
per-step optimizations surfaced by the reworked kernel-breakdown numbers
(gate transcendentals 1.16 us, sampling 0.64 us, int8-vs-bf16 reversal):

  * int8 vs bf16 weight streaming, at the bench fold width (48) and 64
  * sigmoid-via-tanh gate lowering (same function, different op sequence)
  * maxmask MOL mixture selection (skip the argmax/iota chain)
  * combinations of the winners

Run on TPU:  python tools/step_opt_probe.py [B] [T]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    B = int(pos[0]) if len(pos) > 0 else 48
    T = int(pos[1]) if len(pos) > 1 else 12160

    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.ops import pallas_decode
    from wavernn_tpu.ops.decode import extract_decode_weights

    cfg = WaveRNNConfig()
    model = WaveRNN(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 275)),
                   jnp.zeros((1, 5, 80)), True)
    w = extract_decode_weights(v["params"])

    B_pad = pallas_decode._round_up(max(B, 16), 16)
    cond = jax.block_until_ready(jax.jit(
        lambda k: jax.random.uniform(
            k, (pallas_decode._round_up(T, 256), B_pad, pallas_decode.SEG),
            jnp.bfloat16, -1, 1)
    )(jax.random.PRNGKey(0)))
    K = 6

    def run(name, **kw):
        fn = lambda s: pallas_decode.decode(
            w, None, None, jax.random.PRNGKey(s), mode="MOL", n_classes=30,
            cond=cond, out_T=T, **kw)
        np.asarray(fn(0))

        def one_pass(p):
            t0 = time.time()
            outs = [fn(p * K + k + 1) for k in range(K)]
            np.asarray(outs[-1])
            return time.time() - t0

        best = min(one_pass(p) for p in range(3))
        print(f"{name:44s} {best / (K * T) * 1e6:5.2f} us/step")

    ffs = jnp.full((3,), 10.0, jnp.float32)  # timing-only dummy bounds

    run("production default (int8_hh)", int8_hh=True)
    run("int8_hh + int8_ff (fixed-scale ff quant)", int8_hh=True,
        int8_ff=True, ff_scales=ffs)
    run("int8_ff only", int8_ff=True, ff_scales=ffs)
    run("bf16 (round-3 default)")
    if "--full" in sys.argv:
        run("sched=ghfirst (hoist hidden dots)", sched="ghfirst")
        run("ghfirst + bf16 transcendentals", sched="ghfirst",
            gate_dtype="bf16")
        run("poly gates (Pade tanh, no transcendental)", gate_act="poly")
        run("poly + bf16 gate math", gate_act="poly", gate_dtype="bf16")
        run("blockcond (UNROLL-batched input dots)", block_cond=True)
        run("blockcond + poly", block_cond=True, gate_act="poly")
        run("int8_hh + ghfirst", int8_hh=True, sched="ghfirst")
        run("int8 everything (round-3 loser, re-check)", int8_gates=True)


if __name__ == "__main__":
    main()
