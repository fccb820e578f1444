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
    # The reference signal decodes the SAME per-group programs the stream
    # uses (pack_stream + gather_cond + kernel), then finalizes every fold
    # in ONE unfold: this isolates the incremental-crossfade/emission logic
    # as exactly zero-error.  (Comparing against the one-shot pipeline
    # instead would compare two different XLA programs whose f32 upsample
    # rounding differs by ULPs — the AR decode amplifies that, so it is not
    # a meaningful invariant.)
    import jax.numpy as jnp

    from wavernn_tpu.ops import fold as fold_ops
    from wavernn_tpu.ops.decode import _round_up

    det = Generator(cfg, variables, backend=backend, fold_bucket=16,
                    deterministic=True)
    wav_stream = np.concatenate(list(det.stream(
        mel, target=target, overlap=overlap, mu_law=False, group=group)))

    if backend == "pallas":
        from wavernn_tpu.ops import pallas_decode

        mels_in = np.transpose(mel[None], (0, 2, 1))
        wave_len = (mel.shape[1] - 1) * cfg.hop_length
        t_bucket = _round_up(mel.shape[1] + 2 * cfg.pad, det.frame_bucket)
        mels_in = np.pad(mels_in, ((0, 0), (cfg.pad, t_bucket - mel.shape[1]
                                            - cfg.pad), (0, 0)))
        real_len = (t_bucket - 2 * cfg.pad) * cfg.hop_length
        num_folds, _ = fold_ops.fold_shape(real_len, target, overlap)
        fold_T = target + 2 * overlap
        stride = target + overlap
        needed = min(num_folds, -(-wave_len // stride))
        T_pad = _round_up(fold_T, pallas_decode.CHUNK)
        pad_to = max(real_len, (needed - 1) * stride + T_pad)
        packed = det._get_pack_stream()(
            det.variables, jnp.asarray(mels_in), pad_to=pad_to)
        gfn = det._get_stream_group()
        rows = []
        for g0 in range(0, needed, group):
            g1 = min(g0 + group, needed)
            n_pad = det._kernel_fold_pad(g1 - g0)
            starts = np.zeros(n_pad, np.int32)
            starts[:g1 - g0] = np.arange(g0, g1, dtype=np.int32) * stride
            rows.append(np.asarray(gfn(
                det.weights, packed, jnp.asarray(starts),
                jax.random.PRNGKey(g0), fold_T=fold_T, T_pad=T_pad,
            ))[: g1 - g0])
        all_rows = np.concatenate(rows, axis=0)
        n_win_pad = det._pad_folds(all_rows.shape[0])
        window = np.pad(all_rows, ((0, n_win_pad - all_rows.shape[0]),
                                   (0, 0)))
        wav_full = np.asarray(det._finalize(
            jnp.asarray(window), jnp.asarray(all_rows.shape[0], jnp.int32),
            mu_law=False, batched=True, overlap=overlap,
            n_classes=cfg.n_classes,
        ), dtype=np.float64)[:wave_len]
        fade_len = min(20 * cfg.hop_length, len(wav_full))
        wav_full[-fade_len:] *= np.linspace(1, 0, fade_len)
    else:
        wav_full = det(mel, batched=True, target=target, overlap=overlap,
                       mu_law=False)
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
    print(json.dumps({
        "ttfc_ms": round(float(np.median(ttfc)) * 1e3, 1),
        "ttfc_best_ms": round(min(ttfc) * 1e3, 1),
        "first_chunk_audio_s": round(group * (target + overlap)
                                     / cfg.sample_rate, 2),
        "stream_khz": round(n_samples / dt / 1e3, 1),
        "stream_xrt": round(wave_secs / dt, 1),
        "audio_s": round(wave_secs, 2),
        "parity_max_abs_diff": max_diff,
        "backend": backend,
    }))


if __name__ == "__main__":
    main()
