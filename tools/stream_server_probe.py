"""Multi-session streaming server on real TPU (TPU tier via test_stream_tpu).

Exercises infer/stream_server.py with the pallas backend's shared
slot-buffer path on hardware:

  * parity — deterministic server output for each of 3 concurrent sessions
    must EXACTLY equal that session's own Generator.stream (same gathered
    conditioning rows out of the shared buffer, same kernel, same
    incremental crossfade);
  * serving — N concurrent ~24 s utterances (sweep over --sessions,
    default "4,16"), stochastic decode: aggregate synthesis rate,
    per-wall-clock realtime factor, and mean inter-chunk cadence per
    session.  aggregate_xrt / N = each stream's realtime margin.

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

    # -- serving sweep: N concurrent 24 s stochastic streams ---------------
    arg = "4,16"
    if "--sessions" in sys.argv:
        arg = sys.argv[sys.argv.index("--sessions") + 1]
    counts = [int(x) for x in arg.split(",")]
    gen = Generator(cfg, variables, backend="pallas", fold_bucket=16)
    T_mel = 1920  # ~24 s
    sweep = []
    for n_sess in counts:
        mels_n = [rng.uniform(0, 1, (cfg.feat_dims, T_mel)).astype(np.float32)
                  for _ in range(n_sess)]
        kw = dict(target=target, overlap=overlap, mu_law=False, group=group,
                  width=64, capacity=n_sess, slot_seconds=25.0)
        srv = StreamServer(gen, **kw)
        for m in mels_n:  # compile warmup: admit + drain
            srv.add(m)
        while srv.active:
            srv.step()

        srv = StreamServer(gen, seed=7, **kw)
        t0 = time.time()
        sids = [srv.add(m) for m in mels_n]
        chunk_times = {sid: [] for sid in sids}
        n_samples = 0
        while srv.active:
            for sid, ch in srv.step().items():
                chunk_times[sid].append(time.time() - t0)
                n_samples += len(ch)
        dt = time.time() - t0
        gaps = [np.diff([0.0] + ts) for ts in chunk_times.values() if ts]
        xrt = n_samples / cfg.sample_rate / dt
        sweep.append({
            "concurrent_sessions": n_sess,
            "aggregate_khz": round(n_samples / dt / 1e3, 1),
            "aggregate_xrt": round(xrt, 1),
            "per_stream_xrt": round(xrt / n_sess, 1),
            "mean_chunk_gap_ms": round(
                float(np.mean(np.concatenate(gaps))) * 1e3, 1),
            "audio_s_total": round(n_samples / cfg.sample_rate, 2),
            "wall_s": round(dt, 2),
        })
    out["sweep"] = sweep
    # headline fields = first sweep entry (the tpu-tier test's contract)
    out.update({k: v for k, v in sweep[0].items()})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
