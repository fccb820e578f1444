"""Decode-kernel step-time experiments at production shapes.

Pipelined timing (K back-to-back dispatches, last fetched) of the candidate
per-step optimizations surfaced by the reworked kernel-breakdown numbers
(gate transcendentals 1.16 us, sampling 0.64 us, int8-vs-bf16 reversal):

  * int8 vs bf16 weight streaming, at the bench fold width (48) and 64
  * sigmoid-via-tanh gate lowering (same function, different op sequence)
  * maxmask MOL mixture selection (skip the argmax/iota chain)
  * combinations of the winners

Run on TPU:  python tools/step_opt_probe.py [B] [T]

``--ab`` instead runs the int8_ff adoption measurement: STRICTLY
INTERLEAVED A/B passes (A = production int8_hh, B = int8_hh + int8_ff) at
fold widths 16/48/128, so relay drift hits both arms equally — the
decision protocol that re-adjudicated int8_gates in round 3 and adopted
int8_hh in round 4 (quality half: tools/kernel_quality.py / bench MCD
gate with int8_ff on).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def ab_int8_ff(T: int = 12160, widths=(16, 48, 128)):
    """Interleaved A/B: int8_hh (production) vs int8_hh+int8_ff, per fold
    width.  Passes alternate A,B,A,B,... so slow relay drift cancels;
    report the per-arm MEDIAN us/step over 7 passes of K=6 dispatches."""
    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.ops import pallas_decode
    from wavernn_tpu.ops.decode import extract_decode_weights

    cfg = WaveRNNConfig()
    model = WaveRNN(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 275)),
                   jnp.zeros((1, 5, 80)), True)
    w = extract_decode_weights(v["params"])
    ffs = jnp.full((3,), 10.0, jnp.float32)
    K, PASSES = 6, 7

    for B in widths:
        B_pad, _, _ = pallas_decode.fold_tiling(B)
        cond = jax.block_until_ready(jax.jit(
            lambda k: jax.random.uniform(
                k, (pallas_decode._round_up(T, 256), B_pad,
                    pallas_decode.SEG), jnp.bfloat16, -1, 1)
        )(jax.random.PRNGKey(0)))

        def fn(s, use_ff):
            kw = dict(int8_hh=True)
            if use_ff:
                kw.update(int8_ff=True, ff_scales=ffs)
            return pallas_decode.decode(
                w, None, None, jax.random.PRNGKey(s), mode="MOL",
                n_classes=30, cond=cond, out_T=T, **kw)

        np.asarray(fn(0, False)); np.asarray(fn(0, True))  # compile both

        times = {False: [], True: []}
        for p in range(PASSES):
            for use_ff in (False, True):       # strict interleave
                t0 = time.time()
                outs = [fn(p * 2 * K + k + 1, use_ff) for k in range(K)]
                np.asarray(outs[-1])
                times[use_ff].append((time.time() - t0) / (K * T) * 1e6)
        a = float(np.median(times[False]))
        b = float(np.median(times[True]))
        am = float(np.min(times[False]))
        bm = float(np.min(times[True]))
        # median cancels slow drift between arms; min sheds the relay's
        # multi-second stall episodes — report both (a stall inside one
        # arm's pass has flipped the median's sign between runs)
        print(f"B={B:4d}  int8_hh {a:5.2f}/{am:5.2f} us/step   "
              f"+int8_ff {b:5.2f}/{bm:5.2f} us/step   "
              f"delta med {100*(b-a)/a:+5.1f}%  min {100*(bm-am)/am:+5.1f}%")


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    if "--ab" in sys.argv:
        widths = tuple(int(x) for x in pos[0].split(",")) if pos \
            else (16, 48, 128)
        ab_int8_ff(12160 if len(pos) < 2 else int(pos[1]), widths)
        return
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
        # (the rejected scheduling/gate-math variants — ghfirst, poly
        # gates, bf16 transcendentals, block_cond, out_xpose=block, legacy
        # argmax mol_select — were pruned from the kernel in round 5;
        # docs/ROADMAP.md keeps their measurements)
        run("int8 everything (round-3 loser, re-check)", int8_gates=True)


if __name__ == "__main__":
    main()
