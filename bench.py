"""Headline benchmark: batched WaveRNN synthesis rate per chip.

Prints ONE JSON line:
  {"metric": "wavernn_gen_khz_per_chip", "value": <kHz>, "unit": "kHz",
   "vs_baseline": <value / 1102.5>}

Baseline: the driver-specified north-star of >50x realtime at 22.05 kHz per
v5e chip (BASELINE.md) == 1102.5 kHz, i.e. vs_baseline > 1.0 beats it.
The metric definition matches the reference's own generation-rate display:
samples generated / wall-clock second (ref: models/fatchord_version.py:267-271).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.ops.decode import Generator

    platform = jax.devices()[0].platform
    backend = "pallas" if platform == "tpu" else "scan"

    cfg = WaveRNNConfig()  # full-size 512-dim MOL (the published config)
    model = WaveRNN(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.hop_length)),
        jnp.zeros((1, 1 + 2 * cfg.pad, cfg.feat_dims)),
        True,
    )
    gen = Generator(cfg, variables, backend=backend, fold_bucket=16)

    # ~24 s utterance -> ~46 folds of 11k samples: a production-shaped batch
    T_mel = int(os.environ.get("BENCH_T_MEL", "1920"))
    target, overlap = 11_000, 550
    mel = np.random.default_rng(0).uniform(0, 1, (cfg.feat_dims, T_mel))
    mel = mel.astype(np.float32)

    # warmup / compile
    wav = gen(mel, batched=True, target=target, overlap=overlap, mu_law=False)

    runs = int(os.environ.get("BENCH_RUNS", "3"))
    times = []
    for s in range(runs):
        t0 = time.time()
        wav = gen(mel, batched=True, target=target, overlap=overlap,
                  mu_law=False, seed=s + 1)
        times.append(time.time() - t0)

    dt = min(times)
    khz = len(wav) / dt / 1000.0
    baseline_khz = 50.0 * cfg.sample_rate / 1000.0  # 50x realtime
    print(json.dumps({
        "metric": "wavernn_gen_khz_per_chip",
        "value": round(khz, 1),
        "unit": "kHz",
        "vs_baseline": round(khz / baseline_khz, 3),
    }))


if __name__ == "__main__":
    main()
