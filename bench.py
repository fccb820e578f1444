"""Headline benchmark: every BASELINE.md tracked metric in ONE JSON line.

  {"metric": "wavernn_gen_khz_per_chip", "value": <kHz>, ...,
   "stream_khz": ..., "ttfc_ms": ...,
   "tts_gate": "pass"|"fail", "tts_frames_per_s_b1": ...,
   "mcd_pallas": ..., "mcd_gate": "pass"|"fail",
   "voc_train_ms_per_step": ..., "tts_train_ms_per_step": ...}

* WaveRNN kHz/chip — the reference's own generation-rate definition
  (samples / wall-clock s, ref: models/fatchord_version.py:267-271) against
  the >50x-realtime-per-chip north star (1102.5 kHz); decode runs on the
  COMMITTED TRAINED golden weights (bench_assets/, tools/train_golden.py)
  so the signal asserts are meaningful, with random-init fallback.
  Strict clocks include per-pass input staging INSIDE the timed window,
  and the serving modes' passes are interleaved round-robin so a relay
  congestion episode cannot skew one mode's median (round 5).
* Copy-synthesis MCD QUALITY GATE — the pallas kernel vocodes the golden
  eval mel with the trained weights; MCD must stay inside a corridor sized
  to the committed seed spread over the scan baseline, so a kernel
  numerics regression (gate math, sampling, int8 path) fails the bench
  loudly instead of hiding behind an unchanged speed number.
* Streaming — steady-state single-stream kHz + time-to-first-chunk (int16,
  group 32, ramped first group).
* TTS QUALITY GATE — the committed TRAINED tiny Tacotron decodes the
  golden eval text through the production backend; attention diagonality
  and mel-vs-ground-truth distance gate against the committed CPU pin.
* Tacotron mel frames/sec — B=1 (pallas kernel on TPU) and B=8 (XLA scan),
  pipelined submit/collect-all, median-of-reps like the vocoder clock.
* Training throughput — vocoder step at the published config (B=32,
  seq 1375) and Tacotron step (B=16, L=100, T=600, r=2), device-pipelined
  (states chain through K steps; one scalar fetch at the end).

Gate failure OR any crashed section prints the full JSON line, then exits
nonzero.
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent
ASSETS = REPO / "bench_assets"
BASELINE_KHZ = 50.0 * 22050 / 1000.0  # >50x realtime at 22.05 kHz


def load_golden(cfg):
    """Trained golden weights (tools/train_golden.py --which full), or None."""
    path = ASSETS / "wavernn_mol_golden.msgpack"
    if not path.exists():
        return None
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.models.wavernn import WaveRNN
    from wavernn_tpu.utils.checkpoints import load_pytree

    model = WaveRNN(cfg)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.hop_length)),
        jnp.zeros((1, 1 + 2 * cfg.pad, cfg.feat_dims)), True,
    )
    blob = load_pytree(
        {"params": template["params"],
         "batch_stats": template["batch_stats"], "step": np.asarray(0)},
        path,
    )
    # msgpack restores HOST numpy arrays: device_put ONCE, or every submit
    # re-uploads ~17 MB of weights over the relay (measured 8x headline
    # collapse when this was missed)
    return jax.device_put(
        {"params": blob["params"], "batch_stats": blob["batch_stats"]})


def bench_vocoder(out):
    import jax

    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.ops.decode import Generator

    platform = jax.devices()[0].platform
    backend = "pallas" if platform == "tpu" else "scan"

    cfg = WaveRNNConfig()  # full-size 512-dim MOL (the published config)
    variables = load_golden(cfg)
    out["weights"] = "golden_trained" if variables is not None else "random"
    if variables is None:
        import jax.numpy as jnp

        model = WaveRNN(cfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, cfg.hop_length)),
            jnp.zeros((1, 1 + 2 * cfg.pad, cfg.feat_dims)), True,
        )
    # int16 PCM serving output: the tail fade + 16-bit quantization run on
    # device and collect() ships WAV-payload bytes — half a float32's
    # transfer per sample (validated against the float path by
    # tests/test_wavernn.py::test_int16_output_matches_float_path)
    # production serving config on a bandwidth-limited host link: f16 mel
    # ingress (half the upload bytes; copy-synthesis MCD delta 0.08 dB,
    # ~1/8 of the scan seed spread) + int16 PCM egress.  The MCD gate below
    # runs the SAME ingress/egress-relevant config, so quality stays
    # coupled to what the clock measures.
    gen = Generator(cfg, variables, backend=backend, fold_bucket=16,
                    output_dtype="int16", input_dtype="float16")

    # ~24 s utterances -> ~47 folds of 11k samples each: production-shaped
    T_mel = int(os.environ.get("BENCH_T_MEL", "1920"))
    target, overlap = 11_000, 550
    rng = np.random.default_rng(0)
    runs = int(os.environ.get("BENCH_RUNS", "5"))
    mels = [rng.uniform(0, 1, (cfg.feat_dims, T_mel)).astype(np.float32)
            for _ in range(runs)]

    # warmup / compile: the per-utterance program (via generate_batch's
    # pipelined path) AND the fused co-batched program (via submit_batch)
    gen(mels[0], batched=True, target=target, overlap=overlap, mu_law=False)
    gen.generate_batch(mels, target=target, overlap=overlap, mu_law=False)
    gen.collect_batch(gen.submit_batch(mels, target=target, overlap=overlap,
                                       mu_law=False))

    # Serving throughput, samples/wall-clock — the reference's own metric
    # definition.  THREE strict serving modes (every byte of staging,
    # decode, and result transfer inside the clock), each MEDIAN of
    # ``passes`` timed passes:
    #   * ONE-SHOT: a single generate_batch call on a raw mel list — since
    #     round 5 it internally pipelines per utterance (VERDICT r4 #8);
    #     the plain "server got N requests" call.
    #   * PIPELINED: explicit prestage/submit/prefetch/collect per
    #     utterance, uploads and transfers overlapped with the in-order
    #     device queue.
    #   * CO-BATCHED STEADY: fused single-program batches, pass k+1
    #     dispatched before pass k is collected.
    # The modes' passes are INTERLEAVED round-robin (round 5, second
    # session): the axon relay stalls for tens of ms at random and
    # sometimes for whole minutes — with the modes timed in separate
    # blocks, one congestion episode landed entirely on one mode and
    # skewed the mode comparison (measured: pipelined median 4.5 MHz in
    # the same run where oneshot, timed minutes earlier, held 8.8 MHz).
    # Interleaving spreads environment noise evenly, so the per-mode
    # medians — and the headline "best strict mode" choice — compare
    # serving strategies, not relay weather.
    staged = [gen.prestage(m, batched=True, target=target, overlap=overlap)
              for m in mels]
    passes = int(os.environ.get("BENCH_PASSES", "9"))
    co_k = int(os.environ.get("BENCH_COBATCH_PASSES", "4"))
    co_reps = 3
    # spread the co_reps co-batched passes evenly across the session
    co_at = {round((p + 1) * passes / (co_reps + 1)) for p in range(co_reps)}
    staged_b = gen.prestage_batch(mels, target=target, overlap=overlap)
    # Soft wall-clock budget for the pass loop: the relay has multi-minute
    # stall episodes, and 9 full rounds under one can push the section past
    # external timeouts.  Medians over >=3 interleaved rounds are still
    # valid (co_at guarantees a co-batched pass within the first 3), so
    # stop adding rounds once the budget is spent.
    budget_s = float(os.environ.get("BENCH_VOC_BUDGET_S", "720"))
    t_section = time.time()
    oneshot, strict, loose, costeady = [], [], [], []
    for p in range(passes):
        if p >= 3 and time.time() - t_section > budget_s:
            break
        # -- one-shot pass --------------------------------------------------
        t0 = time.time()
        waves = gen.generate_batch(mels, target=target, overlap=overlap,
                                   mu_law=False, seed=1_000_000 + p)
        dt = time.time() - t0
        assert all(len(w) and np.abs(w.astype(np.int32)).max() > 256
                   for w in waves)
        oneshot.append(sum(len(w) for w in waves) / dt / 1000.0)

        # -- pipelined strict pass ------------------------------------------
        # staging happens INSIDE the clock: a steady-state server re-pads +
        # re-uploads every request's mel (the uploads overlap the in-order
        # device queue of the earlier submissions)
        t0 = time.time()
        handles = []
        for s, m in enumerate(mels):
            d = gen.prestage(m, batched=True, target=target, overlap=overlap)
            handles.append(gen.submit(d, batched=True, target=target,
                                      overlap=overlap, mu_law=False,
                                      seed=p * runs + s + 1))
        for h in handles:       # overlap result transfers with device compute
            gen.prefetch(h)
        waves = [gen.collect(h) for h in handles]
        dt_all = time.time() - t0
        # int16 output: assert real signal well above the LSB floor
        assert all(len(w) and np.abs(w.astype(np.int32)).max() > 256
                   for w in waves)
        strict.append(sum(len(w) for w in waves) / dt_all / 1000.0)

        # -- loose pass (prior rounds' definition, never headline) ----------
        # clock stops at the LAST utterance's fetch; the other N-1
        # transfers fall outside it
        t0 = time.time()
        handles = [gen.submit(d, batched=True, target=target,
                              overlap=overlap, mu_law=False,
                              seed=(p + passes) * runs + s + 1)
                   for s, d in enumerate(staged)]
        last = gen.collect(handles[-1])
        dt_last = time.time() - t0
        rest = [gen.collect(h) for h in handles[:-1]]
        loose.append((sum(len(w) for w in rest) + len(last)) / dt_last / 1e3)

        # -- co-batched steady-state pass (every few rounds) ----------------
        # batch k+1 is dispatched (and its transfer prefetched) BEFORE
        # batch k is collected, so each fused program's single result
        # transfer hides behind the next program's decode; the clock spans
        # co_k whole batches, with batch k+1's staging (host padding +
        # upload) INSIDE the clock overlapped with device compute
        # (ADVICE r4: the reused-handle version excluded upload bytes).
        # This is the saturated-server throughput the wide-fold kernel
        # geometry (B_TILE-wide grid groups) is built for.
        if (p + 1) in co_at:
            pi = len(costeady)
            t0 = time.time()
            h = gen.submit_batch(staged_b, target=target, overlap=overlap,
                                 mu_law=False, seed=2_000_000 + pi * co_k)
            gen.prefetch_batch(h)
            total = 0
            for k in range(1, co_k + 1):
                h2 = None
                staged_b = gen.prestage_batch(mels, target=target,
                                              overlap=overlap)
                if k < co_k:
                    h2 = gen.submit_batch(staged_b, target=target,
                                          overlap=overlap, mu_law=False,
                                          seed=2_000_000 + pi * co_k + k)
                    gen.prefetch_batch(h2)
                waves = gen.collect_batch(h)
                assert all(len(w) and np.abs(w.astype(np.int32)).max() > 256
                           for w in waves)
                total += sum(len(w) for w in waves)
                h = h2
            costeady.append(total / (time.time() - t0) / 1000.0)

    khz_pipe = float(np.median(strict))
    khz_costeady = float(np.median(costeady))
    khz_oneshot = float(np.median(oneshot))
    # headline = the best STRICT serving mode (all three clocks pay every
    # staging upload and result transfer; their passes were interleaved,
    # so the comparison is apples-to-apples under the same relay weather)
    khz, mode = max(
        (khz_pipe, "pipelined_strict"),
        (khz_costeady, "cobatch_steady_strict"),
        (khz_oneshot, "oneshot_strict"),
    )
    out.update({
        "value": round(khz, 1),
        "vs_baseline": round(khz / BASELINE_KHZ, 3),
        "mode": mode,
        "pipelined_median": round(khz_pipe, 1),
        "strict_best": round(max(strict), 1),
        "cobatch_steady_median": round(khz_costeady, 1),
        "cobatch_steady_best": round(max(costeady), 1),
        "oneshot_median": round(float(np.median(oneshot)), 1),
        "oneshot_best": round(max(oneshot), 1),
        "loose_median": round(float(np.median(loose)), 1),
        "loose_best": round(max(loose), 1),
        "passes": len(strict),
        "output": "pcm16",
        "ingress": "f16_mel",
    })
    return cfg, variables, backend


def bench_mcd_gate(out, cfg, variables, backend):
    """Quality gate: trained-weights copy-synthesis MCD through the pallas
    kernel (scan off-TPU) vs the committed scan baseline plus a corridor
    sized to the MEASURED seed spread (round 4's +30 dB corridor was ~23x
    the noise — a 10-25 dB kernel numerics bug would have sailed through;
    VERDICT r4 weak #1).  The spread is committed by tools/train_golden.py
    alongside the baseline; the gate sits at baseline + max(4*spread, 3 dB)
    (legacy metas without a spread key fall back to +6 dB)."""
    meta_path = ASSETS / "golden_meta.json"
    if out["weights"] != "golden_trained" or not meta_path.exists():
        out["mcd_gate"] = "skipped (no golden assets)"
        return
    from wavernn_tpu.config import hp, default_hparams_path
    from wavernn_tpu.infer.eval import copy_synthesis_mcd
    from wavernn_tpu.ops.decode import Generator

    if not hp.is_configured():
        hp.configure(str(default_hparams_path()))
    meta = json.loads(meta_path.read_text())
    mel = np.load(ASSETS / "golden_eval_mel.npy")
    # same f16 mel ingress as the timed serving config (quality-coupled)
    gen = Generator(cfg, variables, backend=backend, fold_bucket=16,
                    input_dtype="float16")
    scores = [float(copy_synthesis_mcd(
        gen, mel, batched=True, target=11_000, overlap=550, mu_law=False,
        seed=s)[0]) for s in range(3)]
    mcd = float(np.mean(scores))
    spread = meta.get("mcd_scan_spread")
    corridor = max(4.0 * spread, 3.0) if spread is not None else 6.0
    threshold = float(meta["mcd_scan_mean"]) + corridor
    out["mcd_pallas"] = round(mcd, 2)
    out["mcd_threshold"] = round(threshold, 2)
    out["mcd_scan_committed"] = meta["mcd_scan_mean"]
    out["mcd_backend"] = backend
    out["mcd_gate"] = "pass" if mcd < threshold else "fail"


def bench_stream(out, cfg, variables, backend):
    """Streaming serving: steady-state single-stream rate + time-to-first-
    chunk, int16 output, production group width with a ramped first group
    (driver-visible so a regression in the streaming path is loud —
    VERDICT r4 weak #4; same median-of-N policy as the headline)."""
    from wavernn_tpu.ops.decode import Generator

    gen = Generator(cfg, variables, backend=backend, fold_bucket=16,
                    output_dtype="int16", input_dtype="float16")
    T_mel = 1920
    rng = np.random.default_rng(7)
    mel = rng.uniform(0, 1, (cfg.feat_dims, T_mel)).astype(np.float32)
    kw = dict(target=11_000, overlap=550, mu_law=False, group=32,
              first_group=4)
    for chunk in gen.stream(mel, seed=0, **kw):
        pass  # compile + warm every group shape
    reps = int(os.environ.get("BENCH_STREAM_PASSES", "5"))
    ttfcs, rates = [], []
    for p in range(reps):
        t0 = time.time()
        first, total = None, 0
        for chunk in gen.stream(mel, seed=p + 1, **kw):
            if first is None:
                first = time.time() - t0
            total += len(chunk)
        dt = time.time() - t0
        assert total == (T_mel - 1) * cfg.hop_length
        ttfcs.append(first * 1e3)
        rates.append(total / dt / 1e3)
    out["stream_khz"] = round(float(np.median(rates)), 1)
    out["ttfc_ms"] = round(float(np.median(ttfcs)), 1)
    out["stream_config"] = "group32/first4/int16/f16in"


def bench_mulaw8(out, cfg, variables, backend):
    """mulaw8 egress (8-bit mu-law wire bytes — half int16's egress bytes,
    the dominant byte stream on the relay-bound strict clock): strict
    pipelined serving rate + trained-weights copy-synthesis MCD through the
    wire format (expand on host, exactly what http_server.pcm16 serves).
    Informational keys; the headline/gate stay on the production int16
    config."""
    from wavernn_tpu.dsp.audio import decode_mu_law
    from wavernn_tpu.infer.eval import copy_synthesis_mcd
    from wavernn_tpu.ops.decode import Generator

    gen = Generator(cfg, variables, backend=backend, fold_bucket=16,
                    output_dtype="mulaw8", input_dtype="float16")
    T_mel = int(os.environ.get("BENCH_T_MEL", "1920"))
    target, overlap = 11_000, 550
    rng = np.random.default_rng(3)
    runs = int(os.environ.get("BENCH_RUNS", "5"))
    mels = [rng.uniform(0, 1, (cfg.feat_dims, T_mel)).astype(np.float32)
            for _ in range(runs)]
    # warm the per-utterance program
    gen(mels[0], batched=True, target=target, overlap=overlap, mu_law=False)
    passes = max(3, int(os.environ.get("BENCH_PASSES", "9")) - 2)
    rates = []
    for p in range(passes):
        t0 = time.time()
        handles = []
        for s, m in enumerate(mels):
            d = gen.prestage(m, batched=True, target=target, overlap=overlap)
            handles.append(gen.submit(d, batched=True, target=target,
                                      overlap=overlap, mu_law=False,
                                      seed=p * runs + s + 1))
        for h in handles:
            gen.prefetch(h)
        waves = [gen.collect(h) for h in handles]
        dt = time.time() - t0
        assert all(w.dtype == np.uint8 and len(w) for w in waves)
        rates.append(sum(len(w) for w in waves) / dt / 1e3)
    out["mulaw8_khz"] = round(float(np.median(rates)), 1)

    # quality through the wire: decode labels -> float on host (the serving
    # expansion) and score the same copy-synthesis MCD as the gate corpus
    if out.get("weights") == "golden_trained" and "mcd_pallas" in out:
        mel = np.load(ASSETS / "golden_eval_mel.npy")
        mcd, _ = copy_synthesis_mcd(
            gen, mel, batched=True, target=target, overlap=overlap,
            mu_law=False, seed=0,
            to_float=lambda w: decode_mu_law(
                w.astype(np.float64), 256, from_labels=True))
        out["mcd_mulaw8"] = round(float(mcd), 2)


def bench_tts_gate(out):
    """TTS quality gate on the COMMITTED trained tiny Tacotron: decode the
    golden eval text with the production backend (pallas on TPU) and gate
    attention diagonality + mel distance to ground truth against the
    committed CPU/XLA pin (VERDICT r4 missing #1 / weak #2 — before round
    5 no driver artifact could see a pallas-TTS numerics regression).
    Also reports the pallas-vs-xla mel delta measured in-session."""
    import jax

    sys.path.insert(0, str(REPO / "tools"))
    from train_golden import load_taco_golden, taco_eval_decode

    golden = REPO / "tests" / "golden"
    meta = json.loads((golden / "tiny_tacotron_meta.json").read_text())
    pinned = meta["pinned_gates_cpu_xla"]
    from wavernn_tpu.models.tacotron import TacotronConfig

    variables = load_taco_golden(TacotronConfig(**meta["dims"]))
    on_tpu = jax.devices()[0].platform == "tpu"
    backend = "pallas" if on_tpu else "xla"
    mel_p, attn_p, gates = taco_eval_decode(backend, variables)
    out["tts_gate_backend"] = backend
    out["tts_attn_monotone"] = gates["attn_monotone"]
    out["tts_attn_coverage"] = gates["attn_coverage"]
    out["tts_mel_gt_l1"] = gates["mel_gt_l1"]
    out["tts_mel_gt_l1_pinned"] = pinned["mel_gt_l1"]
    out["tts_tempo"] = gates["tempo"]
    ok = (gates["attn_monotone"] >= 0.85
          and gates["attn_coverage"] >= 0.7
          and 0.6 < gates["tempo"] < 1.5
          # mel distance to ground truth must stay in the pinned decode's
          # regime; autoregressive trajectories diverge frame-by-frame
          # between backends, so the gate is quality-anchored (distance to
          # ground truth), not an exact cross-backend diff
          and gates["mel_gt_l1"] < pinned["mel_gt_l1"] * 1.5 + 0.1)
    if on_tpu:
        mel_x, _, gates_x = taco_eval_decode("xla", variables)
        n = min(mel_p.shape[1], mel_x.shape[1])
        out["tts_mel_xla_l1"] = round(
            float(np.abs(mel_p[:, :n] - mel_x[:, :n]).mean()), 4)
        out["tts_frames_delta_vs_xla"] = int(mel_p.shape[1] - mel_x.shape[1])
        ok = ok and gates_x["mel_gt_l1"] < pinned["mel_gt_l1"] * 1.5 + 0.1
    out["tts_gate"] = "pass" if ok else "fail"


def bench_tacotron(out):
    """Tacotron mel frames/sec, pipelined strict (submit K, collect all);
    MEDIAN-of-reps clock, same policy as the vocoder headline (round 4
    reported best-of-3 here, flattering TTS vs the vocoder methodology)."""
    import jax

    from wavernn_tpu.infer.tacotron import TTSGenerator
    from wavernn_tpu.models.tacotron import Tacotron, TacotronConfig

    on_tpu = jax.devices()[0].platform == "tpu"
    r, frames = 2, 1500
    cfg = TacotronConfig()
    model = Tacotron(cfg)
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    x0 = jnp.asarray(rng.integers(1, cfg.num_chars, (1, 32)), jnp.int32)
    m0 = jnp.asarray(rng.uniform(-4, 4, (1, 8, cfg.n_mels)), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0, m0, r, True)
    seq = list(rng.integers(1, cfg.num_chars, 60))

    def timed_b1(backend, K=5, reps=5):
        gen = TTSGenerator(cfg, variables, steps=frames, backend=backend)
        gen(seq, r=r)  # compile + warm (untrained: runs to the step cap)
        rates = []
        for _ in range(reps):
            t0 = time.time()
            handles = [gen.submit(seq, r=r) for _ in range(K)]
            outs = [gen.collect(h) for h in handles]
            dt = time.time() - t0
            total = sum(o[0].shape[1] for o in outs)
            rates.append(total / dt)
        return float(np.median(rates))

    out["tts_frames_per_s_b1"] = round(
        timed_b1("pallas" if on_tpu else "xla"), 1)
    out["tts_b1_backend"] = "pallas" if on_tpu else "xla"

    # B=8 co-batched decode on the XLA scan path (throughput config)
    gen8 = TTSGenerator(cfg, variables, steps=frames, backend="xla")
    seqs = [list(rng.integers(1, cfg.num_chars, 60)) for _ in range(8)]
    gen8.batch(seqs, r=r)  # compile + warm
    rates = []
    for _ in range(5):
        t0 = time.time()
        outs = gen8.batch(seqs, r=r)
        dt = time.time() - t0
        rates.append(sum(m.shape[1] for m, _, _ in outs) / dt)
    out["tts_frames_per_s_b8"] = round(float(np.median(rates)), 1)


def bench_train(out):
    """Published-config train-step times, device-pipelined (states chain
    through K steps; one scalar fetch closes the clock)."""
    import jax
    import jax.numpy as jnp
    import optax

    from wavernn_tpu.models.tacotron import Tacotron, TacotronConfig
    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.training.state import make_optimizer, new_train_state
    from wavernn_tpu.training.tacotron import make_tts_train_step
    from wavernn_tpu.training.wavernn import make_train_step

    rng = np.random.default_rng(0)

    # vocoder: B=32, seq_len=1375 (ref hparams.py:47-55)
    cfg = WaveRNNConfig()
    model = WaveRNN(cfg)
    B, seq = 32, 1375
    mel_win = seq // cfg.hop_length + 2 * cfg.pad
    x = jnp.asarray(rng.uniform(-1, 1, (B, seq)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, (B, seq)), jnp.float32)
    m = jnp.asarray(rng.uniform(0, 1, (B, mel_win, cfg.feat_dims)),
                    jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, m, True)
    opt = make_optimizer(1e-4, 4.0)
    state = new_train_state(variables["params"], variables["batch_stats"],
                            opt)
    # donate=True is the production loop's configuration; the state chains
    # forward through every timed step (donated buffers are never reused)
    step = make_train_step(model, opt, cfg.mode, donate=True)
    state, loss, _ = step(state, x, y, m)
    float(loss)  # compile + warm
    K, best = 8, np.inf
    for _ in range(3):
        t0 = time.time()
        for _ in range(K):
            state, loss, _ = step(state, x, y, m)
        float(loss)
        best = min(best, (time.time() - t0) / K)
    out["voc_train_ms_per_step"] = round(best * 1e3, 2)
    out["voc_train_config"] = f"B{B}/seq{seq}"

    # Tacotron: B=16, L=100, T=600, r=2 (the r=2 curriculum sessions)
    tcfg = TacotronConfig()
    tmodel = Tacotron(tcfg)
    tb, L, T, r = 16, 100, 600, 2
    tx = jnp.asarray(rng.integers(1, 60, (tb, L)), jnp.int32)
    tm = jnp.asarray(rng.uniform(-4, 4, (tb, T, 80)), jnp.float32)
    tvars = tmodel.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        tx, tm, r, True)
    topt = optax.adam(1e-4)
    tstate = new_train_state(tvars["params"], tvars["batch_stats"], topt)
    tstep = make_tts_train_step(tmodel, topt, r=r, donate=True)
    tstate, tloss, _, _, _ = tstep(tstate, tx, tm, jax.random.PRNGKey(2))
    float(tloss)  # compile + warm
    K, best = 4, np.inf
    for _ in range(3):
        t0 = time.time()
        for _ in range(K):
            tstate, tloss, _, _, _ = tstep(tstate, tx, tm,
                                           jax.random.PRNGKey(3))
        float(tloss)
        best = min(best, (time.time() - t0) / K)
    out["tts_train_ms_per_step"] = round(best * 1e3, 2)
    out["tts_train_config"] = f"B{tb}/L{L}/T{T}/r{r}"


def main():
    out = {"metric": "wavernn_gen_khz_per_chip", "unit": "kHz"}
    cfg, variables, backend = bench_vocoder(out)

    lite = os.environ.get("BENCH_LITE") == "1"
    extras = (
        [] if lite else
        [("mcd", lambda: bench_mcd_gate(out, cfg, variables, backend)),
         ("stream", lambda: bench_stream(out, cfg, variables, backend)),
         ("mulaw8", lambda: bench_mulaw8(out, cfg, variables, backend)),
         ("tts_gate", lambda: bench_tts_gate(out)),
         ("tts", lambda: bench_tacotron(out)),
         ("train", lambda: bench_train(out))]
    )
    for name, fn in extras:
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — never lose the headline
            out[f"{name}_error"] = f"{type(e).__name__}: {e}"

    print(json.dumps(out))
    # A crashed section is a RED bench, not a silently missing key (VERDICT
    # r4 weak #5): the headline JSON above still prints, but the exit code
    # tells the driver something broke.
    errors = [k for k in out if k.endswith("_error")]
    if errors or out.get("mcd_gate") == "fail" or out.get("tts_gate") == "fail":
        sys.exit(1)


if __name__ == "__main__":
    main()
