"""A/B probe: per-step vs per-block output transpose in the decode kernel.

The kernel-breakdown ablation attributes ~1.8 us/step to the time-major
output write; its inner cost is U=8 per-step (B,1)->(1,B) transposes per
unrolled block.  This probe measures the block variant (one (B,U)->(U,B)
transpose) against the step variant under production conditions
(bf16 weights, prebuilt packed conditioning, bench-shaped fold count), and
asserts the two produce bit-identical samples.

Run on TPU:  python tools/outwrite_probe.py [B] [T]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 12160

    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.ops import pallas_decode
    from wavernn_tpu.ops.decode import extract_decode_weights

    cfg = WaveRNNConfig()
    model = WaveRNN(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 275)),
                   jnp.zeros((1, 5, 80)), True)
    w = extract_decode_weights(v["params"])

    B_pad = pallas_decode._round_up(max(B, 16), 16)
    # generate the conditioning on device (a host f64 array at wide B would
    # be several GB on this 1-vCPU host)
    cond = jax.block_until_ready(jax.jit(
        lambda k: jax.random.uniform(
            k, (pallas_decode._round_up(T, 256), B_pad, pallas_decode.SEG),
            jnp.bfloat16, -1, 1)
    )(jax.random.PRNGKey(0)))

    def run(name, **kw):
        fn = lambda s: pallas_decode.decode(
            w, None, None, jax.random.PRNGKey(s), mode="MOL", n_classes=30,
            cond=cond, out_T=T, **kw)
        np.asarray(fn(0))  # compile + warm
        best = min(
            (lambda t0: (np.asarray(fn(s + 1)), time.time() - t0)[1])(
                time.time())
            for s in range(5)
        )
        print(f"{name:28s} {best:.3f}s = {best / T * 1e6:5.2f} us/step")
        return fn

    run("out_xpose=step (production)")
    run("step, unroll=16", unroll=16)
    # (out_xpose=block was measured equal-or-worse and pruned from the
    # kernel in round 5; docs/ROADMAP.md keeps the numbers)

    # determinism: repeated deterministic decodes are bit-identical
    a = np.asarray(pallas_decode.decode(
        w, None, None, jax.random.PRNGKey(7), mode="MOL", n_classes=30,
        cond=cond, out_T=T, deterministic=True))
    b = np.asarray(pallas_decode.decode(
        w, None, None, jax.random.PRNGKey(7), mode="MOL", n_classes=30,
        cond=cond, out_T=T, deterministic=True))
    exact = np.array_equal(a, b)
    print(f"deterministic outputs bit-identical: {exact}")
    assert exact


if __name__ == "__main__":
    main()
