"""Multi-session streaming server on real TPU (TPU tier via test_stream_tpu).

Exercises infer/stream_server.py with the pallas backend's shared
slot-buffer path on hardware:

  * parity — deterministic server output for each of 3 concurrent sessions
    must EXACTLY equal that session's own Generator.stream (same gathered
    conditioning rows out of the shared buffer, same kernel, same
    incremental crossfade);
  * serving — 4 concurrent ~24 s utterances, stochastic decode: aggregate
    synthesis rate, per-wall-clock realtime factor, and mean inter-chunk
    cadence per session.

Prints one JSON line.  Run on TPU:  python tools/stream_server_probe.py
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax

    from wavernn_tpu.infer.stream_server import StreamServer
    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.ops.decode import Generator

    import jax.numpy as jnp

    assert jax.devices()[0].platform == "tpu", "TPU required"
    cfg = WaveRNNConfig()
    model = WaveRNN(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.hop_length)),
        jnp.zeros((1, 1 + 2 * cfg.pad, cfg.feat_dims)),
        True,
    )
    target, overlap, group = 11_000, 550, 16
    rng = np.random.default_rng(0)
    out = {}

    # -- parity: deterministic server == solo streams ----------------------
    det = Generator(cfg, variables, backend="pallas", fold_bucket=16,
                    deterministic=True)
    mels = [rng.uniform(0, 1, (cfg.feat_dims, f)).astype(np.float32)
            for f in (480, 320, 600)]
    solo = [np.concatenate(list(det.stream(
        m, target=target, overlap=overlap, mu_law=False, group=group)))
        for m in mels]
    srv = StreamServer(det, target=target, overlap=overlap, mu_law=False,
                       group=group, width=64, capacity=4, slot_seconds=10.0)
    served = srv.run(mels)
    out["parity_max_abs_diff"] = float(max(
        np.max(np.abs(g - w)) for g, w in zip(served, solo)))
    out["parity_launches"] = srv.launches

    # -- serving: 4 concurrent 24 s stochastic streams ---------------------
    gen = Generator(cfg, variables, backend="pallas", fold_bucket=16)
    T_mel = 1920  # ~24 s
    mels4 = [rng.uniform(0, 1, (cfg.feat_dims, T_mel)).astype(np.float32)
             for _ in range(4)]
    srv = StreamServer(gen, target=target, overlap=overlap, mu_law=False,
                       group=group, width=64, capacity=4, slot_seconds=30.0)
    for m in mels4:  # compile warmup: admit + one step + drain
        srv.add(m)
    while srv.active:
        srv.step()

    srv = StreamServer(gen, target=target, overlap=overlap, mu_law=False,
                       group=group, width=64, capacity=4, slot_seconds=30.0,
                       seed=7)
    t0 = time.time()
    sids = [srv.add(m) for m in mels4]
    chunk_times = {sid: [] for sid in sids}
    n_samples = 0
    while srv.active:
        for sid, ch in srv.step().items():
            chunk_times[sid].append(time.time() - t0)
            n_samples += len(ch)
    dt = time.time() - t0
    gaps = [np.diff([0.0] + ts) for ts in chunk_times.values() if ts]
    out["concurrent_sessions"] = len(mels4)
    out["aggregate_khz"] = round(n_samples / dt / 1e3, 1)
    out["aggregate_xrt"] = round(n_samples / cfg.sample_rate / dt, 1)
    out["mean_chunk_gap_ms"] = round(
        float(np.mean(np.concatenate(gaps))) * 1e3, 1)
    out["audio_s_total"] = round(n_samples / cfg.sample_rate, 2)
    out["wall_s"] = round(dt, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
