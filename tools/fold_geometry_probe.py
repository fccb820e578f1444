"""Fold-geometry scaling probe: throughput of the full generation pipeline
as a function of folds-per-launch for a FIXED utterance length.

The fold target trades sequential decode steps against kernel batch rows:
steps/launch = target + 2*overlap, rows = ceil(T / target).  The kernel's
per-step cost model (~fixed floor + per-row term, docs/ROADMAP.md) decides
which way to lean; this probe measures the real end-to-end curve so the
`voc_target` guidance in the docs stays tied to current-kernel numbers
(the round-2 0.13 us/fold figure predates int8 weight streaming).

Prints one JSON line.  Run on TPU:  python tools/fold_geometry_probe.py
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.ops.decode import Generator

    import jax
    import jax.numpy as jnp

    cfg = WaveRNNConfig()
    model = WaveRNN(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.hop_length)),
        jnp.zeros((1, 1 + 2 * cfg.pad, cfg.feat_dims)),
        True,
    )
    gen = Generator(cfg, variables, backend="pallas", fold_bucket=16)

    T_mel = 1920  # ~24 s
    rng = np.random.default_rng(0)
    mel = rng.uniform(0, 1, (cfg.feat_dims, T_mel)).astype(np.float32)
    overlap = 550
    reps = 5

    results = []
    n_utt = 5  # pipelined dispatches per timed pass (bench.py's recipe:
    # the axon relay RTT hides behind queued device work)
    for target in (16500, 11000, 8250, 5500):
        staged = gen.prestage(mel, batched=True, target=target,
                              overlap=overlap)
        # warmup/compile
        w = np.asarray(gen.collect(gen.submit(
            staged, batched=True, target=target, overlap=overlap,
            mu_law=False, seed=1)))
        times = []
        for r in range(reps):
            t0 = time.time()
            handles = [gen.submit(staged, batched=True, target=target,
                                  overlap=overlap, mu_law=False,
                                  seed=r * n_utt + s + 2)
                       for s in range(n_utt)]
            for h in handles:
                gen.prefetch(h)
            total = sum(len(gen.collect(h)) for h in handles)
            times.append(time.time() - t0)
        dt = float(np.median(times))
        n_folds = int(np.ceil((len(w) - overlap) / target))
        results.append({
            "target": target,
            "folds": n_folds,
            "steps_per_launch": target + 2 * overlap,
            "median_ms_per_utt": round(dt / n_utt * 1e3, 1),
            "khz": round(total / dt / 1e3, 1),
            "xrt": round(total / cfg.sample_rate / dt, 1),
        })
    print(json.dumps({"T_mel": T_mel, "overlap": overlap, "reps": reps,
                      "results": results}))


if __name__ == "__main__":
    main()
