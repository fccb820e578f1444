"""Tacotron decoder step-time probe with pipelined timing (TPU).

Round-2 recorded 3.12 us/step (pallas) vs 10.4 (XLA cell) at B=1 and
"int8_lstm +10% step cost" — numbers whose A/B deltas are unresolvable
through single relay-inclusive calls (a 400-step decode is ~1.2 ms of
device time against ~60 ms of relay/fetch).  This probe submits K long
free-running decodes back-to-back (TTSGenerator.submit/collect, untrained
model so the stop threshold never fires → fixed work per call) and times
the pipeline, resolving per-step deltas at the ~0.1 us level.

Run on TPU:  python tools/tts_step_probe.py [frames] [K]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.infer.tacotron import TTSGenerator
    from wavernn_tpu.models.tacotron import Tacotron, TacotronConfig

    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    r = 2

    cfg = TacotronConfig()
    model = Tacotron(cfg)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.integers(1, cfg.num_chars, (1, 32)), jnp.int32)
    m0 = jnp.asarray(rng.uniform(-4, 4, (1, 8, cfg.n_mels)), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0, m0, r, True)
    seq = list(rng.integers(1, cfg.num_chars, 60))

    def run(name, **kw):
        gen = TTSGenerator(cfg, variables, steps=frames, **kw)
        mel, _, _ = gen(seq, r=r)  # compile + warm
        n_steps = mel.shape[1] // r

        def one_pass():
            # collect ONLY the last handle: device execution is in-order,
            # so the K-1 earlier decodes are done when it returns, and the
            # ~2.3 MB/call result transfers stay out of the clock (they
            # swamp the 3-10 us/step decode deltas over the relay)
            t0 = time.time()
            handles = [gen.submit(seq, r=r) for _ in range(K)]
            gen.collect(handles[-1])
            dt = time.time() - t0
            for h in handles[:-1]:
                gen.collect(h)
            return dt / (K * n_steps)

        best = min(one_pass() for _ in range(3))
        print(f"{name:36s} {best * 1e6:6.2f} us/step  "
              f"({n_steps} steps/call)")

    run("xla scan cell", backend="xla")
    run("pallas decoder kernel", backend="pallas")
    run("pallas + int8_lstm", backend="pallas", int8_lstm=True)


if __name__ == "__main__":
    main()
