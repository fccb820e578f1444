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
    # int16 PCM serving output: the tail fade + 16-bit quantization run on
    # device and collect() ships WAV-payload bytes — half a float32's
    # transfer per sample (validated against the float path by
    # tests/test_wavernn.py::test_int16_output_matches_float_path)
    gen = Generator(cfg, variables, backend=backend, fold_bucket=16,
                    output_dtype="int16")

    # ~24 s utterances -> ~47 folds of 11k samples each: production-shaped
    T_mel = int(os.environ.get("BENCH_T_MEL", "1920"))
    target, overlap = 11_000, 550
    rng = np.random.default_rng(0)
    runs = int(os.environ.get("BENCH_RUNS", "5"))
    mels = [rng.uniform(0, 1, (cfg.feat_dims, T_mel)).astype(np.float32)
            for _ in range(runs)]

    # warmup / compile
    wav = gen(mels[0], batched=True, target=target, overlap=overlap,
              mu_law=False)
    gen.generate_batch(mels, target=target, overlap=overlap, mu_law=False)

    # Pipelined serving throughput, samples/wall-clock — the reference's
    # own metric definition (ref: models/fatchord_version.py:267-271, which
    # times only the device-side sample loop with mels already resident).
    # Inputs are prestaged; all utterances are submitted (single-program
    # fused dispatches queue on the chip in order) and the clock stops only
    # after EVERY utterance's audio has been fetched back to the host — the
    # strict definition: all N host transfers are inside the clock.
    # Headline = MEDIAN of ``passes`` timed passes (the axon relay between
    # host and chip stalls for tens of ms at random; the median sheds that
    # environment noise without cherry-picking); the best pass and the
    # last-fetch-only (loose) rate are reported alongside for comparison
    # with earlier rounds.
    # Secondary: CO-BATCHED serving — ONE program serves all N utterances
    # (generate_batch): folds pack into full 64-row kernel tile groups and
    # the whole batch returns as one int16 transfer.  MEASURED SLOWER than
    # pipelined per-utterance dispatches (docs/ROADMAP.md: the single
    # program serializes its conditioning front-end ahead of 4 serial
    # kernel groups, while pipelining hides each utterance's front-end and
    # transfers behind device decode) — reported for disclosure, not the
    # headline.
    staged = [gen.prestage(m, batched=True, target=target, overlap=overlap)
              for m in mels]
    # 9 passes (was 5): relay stall episodes are multi-second against a
    # ~0.3 s timed pass, so one stall wrecks a whole pass — more passes
    # stabilize the median without changing its definition
    passes = int(os.environ.get("BENCH_PASSES", "9"))
    cobatch, strict, loose = [], [], []
    for p in range(passes):
        t0 = time.time()
        waves = gen.generate_batch(mels, target=target, overlap=overlap,
                                   mu_law=False, seed=1_000_000 + p)
        dt = time.time() - t0
        assert all(len(w) and np.abs(w.astype(np.int32)).max() > 256
                   for w in waves)
        cobatch.append(sum(len(w) for w in waves) / dt / 1000.0)

    for p in range(passes):
        t0 = time.time()
        handles = [gen.submit(d, batched=True, target=target, overlap=overlap,
                              mu_law=False, seed=p * runs + s + 1)
                   for s, d in enumerate(staged)]
        for h in handles:       # overlap result transfers with device compute
            gen.prefetch(h)
        waves = [gen.collect(h) for h in handles]
        dt_all = time.time() - t0
        # output is int16 PCM (isfinite would be vacuous): assert each wave
        # carries real signal — nonzero samples well above the LSB floor
        assert all(len(w) and np.abs(w.astype(np.int32)).max() > 256
                   for w in waves)
        total = sum(len(w) for w in waves)
        strict.append(total / dt_all / 1000.0)

        # loose pass (prior rounds' definition): clock stops once the LAST
        # utterance's audio is fetched — device work is provably done, but
        # the other N-1 host transfers fall outside the clock
        t0 = time.time()
        handles = [gen.submit(d, batched=True, target=target, overlap=overlap,
                              mu_law=False, seed=(p + passes) * runs + s + 1)
                   for s, d in enumerate(staged)]
        last = gen.collect(handles[-1])
        dt_last = time.time() - t0
        rest = [gen.collect(h) for h in handles[:-1]]
        loose.append((sum(len(w) for w in rest) + len(last)) / dt_last / 1e3)
    khz = float(np.median(strict))
    baseline_khz = 50.0 * cfg.sample_rate / 1000.0  # 50x realtime
    print(json.dumps({
        "metric": "wavernn_gen_khz_per_chip",
        "value": round(khz, 1),
        "unit": "kHz",
        "vs_baseline": round(khz / baseline_khz, 3),
        "mode": "pipelined_strict",  # all N transfers inside the clock
        "strict_best": round(max(strict), 1),
        "cobatch_median": round(float(np.median(cobatch)), 1),
        "cobatch_best": round(max(cobatch), 1),
        "loose_median": round(float(np.median(loose)), 1),
        "loose_best": round(max(loose), 1),
        "passes": passes,
        "output": "pcm16",
    }))


if __name__ == "__main__":
    main()
