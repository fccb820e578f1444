"""Streaming serving latency + fused-front-end parity probe (TPU).

Measures, for a ~24 s utterance on the full-size WaveRNN through the fused
Pallas streaming path (Generator.stream):

  * time-to-first-chunk (TTFC): stream() call → first audio chunk on host,
    including the packed-conditioning build — the serving latency headline;
  * steady-state throughput (kHz and xRT) over the whole stream.

Also PROVES the fused stream path: with deterministic decode, the
concatenated stream must equal the one-shot full-pipeline generate sample
for sample (same per-fold conditioning via gather_cond, same kernel, and
the incremental crossfade is exact — ref batched path economics:
models/fatchord_version.py:169-264).

Prints one JSON line.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.ops.decode import Generator

    cfg = WaveRNNConfig()
    model = WaveRNN(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.hop_length)),
        jnp.zeros((1, 1 + 2 * cfg.pad, cfg.feat_dims)),
        True,
    )
    backend = "pallas" if jax.devices()[0].platform == "tpu" else "scan"
    target, overlap, group = 11_000, 550, 16
    T_mel = 1920  # ~24 s at hop 275 / 22.05 kHz
    rng = np.random.default_rng(0)
    mel = rng.uniform(0, 1, (cfg.feat_dims, T_mel)).astype(np.float32)

    # -- parity: deterministic stream == full crossfade-unfold -------------
    # Generator.stream_oneshot decodes the SAME per-group programs the
    # stream uses (pack_stream + gather_cond + kernel), then finalizes every
    # fold in ONE unfold: this isolates the incremental-crossfade/emission
    # logic as exactly zero-error.  (Comparing against the one-shot pipeline
    # instead would compare two different XLA programs whose f32 upsample
    # rounding differs by ULPs — the AR decode amplifies that, so it is not
    # a meaningful invariant.)
    det = Generator(cfg, variables, backend=backend, fold_bucket=16,
                    deterministic=True)
    wav_stream = np.concatenate(list(det.stream(
        mel, target=target, overlap=overlap, mu_law=False, group=group)))
    wav_full = det.stream_oneshot(
        mel, target=target, overlap=overlap, mu_law=False, group=group)
    assert wav_stream.shape == wav_full.shape, (wav_stream.shape,
                                                wav_full.shape)
    max_diff = float(np.max(np.abs(wav_stream - wav_full)))

    # -- latency: TTFC + steady state (stochastic production config) -------
    gen = Generator(cfg, variables, backend=backend, fold_bucket=16)
    # warmup: compile every program in the stream path
    for _ in gen.stream(mel, target=target, overlap=overlap, mu_law=False,
                        group=group):
        pass

    ttfc, total_dt, n_samples = [], [], 0
    for p in range(3):
        t0 = time.time()
        first = None
        chunks = []
        for ch in gen.stream(mel, target=target, overlap=overlap,
                             mu_law=False, group=group, seed=p):
            if first is None:
                first = time.time() - t0
            chunks.append(ch)
        total_dt.append(time.time() - t0)
        ttfc.append(first)
        n_samples = sum(len(c) for c in chunks)

    wave_secs = n_samples / cfg.sample_rate
    dt = float(np.median(total_dt))
    out = {
        "ttfc_ms": round(float(np.median(ttfc)) * 1e3, 1),
        "ttfc_best_ms": round(min(ttfc) * 1e3, 1),
        "first_chunk_audio_s": round(group * (target + overlap)
                                     / cfg.sample_rate, 2),
        "stream_khz": round(n_samples / dt / 1e3, 1),
        "stream_xrt": round(wave_secs / dt, 1),
        "audio_s": round(wave_secs, 2),
        "parity_max_abs_diff": max_diff,
        "backend": backend,
    }

    # int16 serving path: device-faded PCM chunks (half the chunk bytes,
    # no host math) — the production /stream configuration
    gen16 = Generator(cfg, variables, backend=backend, fold_bucket=16,
                      output_dtype="int16")
    for _ in gen16.stream(mel, target=target, overlap=overlap,
                          mu_law=False, group=group):
        pass
    for tag, grp, fg in (("int16", group, None), ("int16_g32", 32, None),
                         ("int16_g32_ramp4", 32, 4)):
        # ramp4 = the production bench config: a 4-fold first group cuts
        # time-to-first-chunk (the first chunk's decode is first_group-
        # proportional) at unchanged steady state (VERDICT r4 #6)
        for _ in gen16.stream(mel, target=target, overlap=overlap,
                              mu_law=False, group=grp, first_group=fg):
            pass
        ttfc16, dts = [], []
        for p in range(3):
            t0 = time.time()
            first = None
            n16 = 0
            for ch in gen16.stream(mel, target=target, overlap=overlap,
                                   mu_law=False, group=grp, seed=p,
                                   first_group=fg):
                if first is None:
                    first = time.time() - t0
                n16 += len(ch)
            dts.append(time.time() - t0)
            ttfc16.append(first)
        d = float(np.median(dts))
        out[f"{tag}_stream_khz"] = round(n16 / d / 1e3, 1)
        out[f"{tag}_stream_xrt"] = round(n16 / cfg.sample_rate / d, 1)
        out[f"{tag}_ttfc_ms"] = round(float(np.median(ttfc16)) * 1e3, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
