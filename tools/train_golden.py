"""Train and commit the golden checkpoints that pin the generate stack.

The reference ships pretrained LJSpeech checkpoints whose known-good audio
regression-tests the whole load→generate path out of the box
(ref: quick_start.py:12-21, README.md:85-88); those blobs are git-LFS
objects absent from this mount, so this repo pins the same contract with
self-trained golden artifacts on a synthetic harmonic corpus instead:

  --which tiny  (CPU, ~1 min)
      Train the miniature RAW config a few hundred steps and commit
      * tests/golden/tiny_wavernn_raw.msgpack   — weights blob
      * tests/golden/tiny_wavernn_raw_wav.npy   — deterministic scan decode
      tests/test_golden.py replays the decode and asserts the waveform, so
      any drift in load/upsample/decode/crossfade numerics fails loudly.

  --which taco  (TPU ~2 min or CPU ~15 min to train; pin runs on CPU)
      Train a tiny Tacotron to diagonal attention on a note-language
      corpus (each character a pure tone — the examples/e2e_tts.py recipe)
      and commit
      * tests/golden/tiny_tacotron.msgpack    — trained weights blob
      * tests/golden/tiny_tacotron_mel.npy    — CPU-pinned free-run decode
      * tests/golden/tiny_tacotron_attn.npy   — its attention matrix
      * tests/golden/tiny_tacotron_gt_mel.npy — ground-truth eval mel
      * tests/golden/tiny_tacotron_meta.json  — config + measured gates
      tests/test_golden.py replays the decode (attention monotonicity +
      pinned mel) and bench.py decodes it with BOTH TTS backends to gate
      the pallas kernel's numerics every round (the role the reference's
      pretrained Tacotron zip plays, ref: quick_start.py:12-21,
      README.md:88; attention criterion ref: train_tacotron.py:163-166).

  --which full  (TPU, ~3 min)
      Train the FULL-SIZE MOL config (the published flagship) 3000 steps to
      overfit a 90 s harmonic signal (the tools/kernel_quality.py recipe)
      and commit
      * bench_assets/wavernn_mol_golden.msgpack — trained flagship weights
      * bench_assets/golden_eval_mel.npy        — the copy-synthesis mel
      * bench_assets/golden_meta.json           — measured MCD per backend
      bench.py loads these to gate the pallas kernel's copy-synthesis MCD
      every round (quality-coupled perf reporting), and the TPU test tier
      asserts kernel-vs-scan numerics on real trained weights.

Run from the repo root.  Training is deterministic (fixed seeds).
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))


def harmonic_signal(sr: int, seconds: float) -> np.ndarray:
    """Harmonic tone with mild vibrato (same corpus as tools/kernel_quality
    — spectral structure for MCD, easy for an overfit vocoder)."""
    t = np.arange(int(sr * seconds)) / sr
    f0 = 180.0 + 8.0 * np.sin(2 * np.pi * 0.5 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    y = sum((0.5 ** k) * np.sin((k + 1) * phase) for k in range(4))
    return (0.45 * y / np.abs(y).max()).astype(np.float32)


# vowel formant targets (F1, F2, F3) Hz — rough adult-male vowel space
_VOWELS = [(730, 1090, 2440),   # /a/
           (270, 2290, 3010),   # /i/
           (300, 870, 2240),    # /u/
           (530, 1840, 2480),   # /e/
           (570, 840, 2410)]    # /o/


def speech_signal(sr: int, seconds: float, seed: int = 3) -> np.ndarray:
    """Speech-shaped golden corpus: a glottal pulse train with a wandering
    f0 contour, filtered through per-"phone" formant resonator cascades,
    interleaved with unvoiced fricative-like noise segments and short
    pauses.  The spectral envelopes (formant peaks, voiced/unvoiced
    contrast, silences) resemble real vocoding targets, so the MCD gate's
    sensitivity tracks real vocoder error instead of a 4-harmonic stack
    (VERDICT r4 directive #9)."""
    from scipy.signal import lfilter

    rng = np.random.default_rng(seed)
    n = int(sr * seconds)
    t = np.arange(n) / sr
    # phrase-level f0: declining contour + slow wander, 90-160 Hz
    f0 = 120.0 * 2 ** (0.25 * np.sin(2 * np.pi * 0.37 * t)
                       + 0.12 * np.sin(2 * np.pi * 1.7 * t + 1.0))
    phase_frac = np.cumsum(f0) / sr % 1.0
    # sawtooth source ≈ glottal pulse train (rich, -6 dB/oct harmonics)
    source = (2.0 * phase_frac - 1.0).astype(np.float64)

    out = np.zeros(n)
    pos = 0
    while pos < n:
        seg_len = int(rng.uniform(0.12, 0.3) * sr)
        seg_len = min(seg_len, n - pos)
        kind = rng.uniform()
        if kind < 0.12:                      # pause
            pass
        elif kind < 0.30:                    # unvoiced fricative: shaped noise
            noise = rng.standard_normal(seg_len)
            fc = rng.uniform(2500.0, 6000.0)
            r = 0.92
            w = 2 * np.pi * fc / sr
            seg = lfilter([1.0, -1.0], [1.0, -2 * r * np.cos(w), r * r],
                          noise)
            peak = np.abs(seg).max()
            out[pos: pos + seg_len] = 0.25 * seg / max(peak, 1e-9)
        else:                                # voiced vowel: formant cascade
            f1, f2, f3 = _VOWELS[rng.integers(0, len(_VOWELS))]
            seg = source[pos: pos + seg_len].copy()
            for fc, bw in ((f1, 80.0), (f2, 110.0), (f3, 160.0)):
                r = np.exp(-np.pi * bw / sr)
                w = 2 * np.pi * fc / sr
                seg = lfilter([1.0 - r], [1.0, -2 * r * np.cos(w), r * r],
                              seg)
            peak = np.abs(seg).max()
            out[pos: pos + seg_len] = seg / max(peak, 1e-9)
        pos += seg_len
    # 5 ms segment-boundary smoothing kills filter-edge clicks
    k = int(0.005 * sr)
    win = np.hanning(2 * k + 1)
    win /= win.sum()
    out = np.convolve(out, win, mode="same")
    return (0.45 * out / np.abs(out).max()).astype(np.float32)


def train(cfg, mel, y, labels, steps, batch_size, seq_len, lr, clip, pad,
          hop, log_every=200):
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.dsp import audio
    from wavernn_tpu.models.wavernn import WaveRNN
    from wavernn_tpu.training.state import make_optimizer, new_train_state
    from wavernn_tpu.training.wavernn import make_train_step

    model = WaveRNN(cfg)
    mel_win = seq_len // hop + 2 * pad
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, seq_len)),
        jnp.zeros((1, mel_win, cfg.feat_dims)), True,
    )
    opt = make_optimizer(lr, clip)
    state = new_train_state(variables["params"], variables["batch_stats"],
                            opt)
    train_step = make_train_step(model, opt, cfg.mode, donate=False)

    rng = np.random.default_rng(0)
    max_off = mel.shape[1] - 2 - (mel_win + 2 * pad)

    def batch():
        offs = rng.integers(0, max_off, batch_size)
        ms = np.stack([mel[:, o: o + mel_win]
                       for o in offs]).transpose(0, 2, 1)
        if cfg.mode == "RAW":
            lab = np.stack([labels[(o + pad) * hop:][: seq_len + 1]
                            for o in offs])
            x = audio.label_2_float(lab[:, :-1].astype(np.float32), cfg.bits)
            return x.astype(np.float32), lab[:, 1:].astype(np.int32), ms
        seg = np.stack([y[(o + pad) * hop:][: seq_len + 1]
                        for o in offs]).astype(np.float32)
        return seg[:, :-1], seg[:, 1:], ms

    t0 = time.time()
    loss = float("nan")
    for i in range(1, steps + 1):
        x, t, m = batch()
        state, loss, _ = train_step(state, x, t, m)
        if i % log_every == 0:
            print(f"step {i}/{steps} loss={float(loss):.4f}",
                  file=sys.stderr)
    return state, float(loss), time.time() - t0


def run_tiny():
    import jax

    from wavernn_tpu.config import hp, default_hparams_path
    from wavernn_tpu.dsp import audio
    from wavernn_tpu.models.wavernn import WaveRNNConfig
    from wavernn_tpu.ops.decode import Generator
    from wavernn_tpu.utils.checkpoints import save_pytree

    jax.config.update("jax_platforms", "cpu")  # golden is pinned on CPU f32
    hp.configure(str(default_hparams_path()))
    cfg = WaveRNNConfig(
        rnn_dims=32, fc_dims=32, bits=9, pad=2, upsample_factors=(5, 5, 11),
        feat_dims=80, compute_dims=16, res_out_dims=16, res_blocks=2,
        hop_length=275, sample_rate=22050, mode="RAW",
    )
    y = harmonic_signal(cfg.sample_rate, 12.0)
    mel = audio.melspectrogram(y).astype(np.float32)
    labels = audio.encode_mu_law(y, 2 ** cfg.bits).astype(np.int64)

    state, loss, secs = train(cfg, mel, y, labels, steps=300, batch_size=16,
                              seq_len=5 * cfg.hop_length, lr=4e-4, clip=4.0,
                              pad=cfg.pad, hop=cfg.hop_length, log_every=50)

    golden = REPO / "tests" / "golden"
    save_pytree({"params": state.params, "batch_stats": state.batch_stats,
                 "step": np.asarray(state.step)},
                golden / "tiny_wavernn_raw.msgpack")

    v = {"params": state.params, "batch_stats": state.batch_stats}
    gen = Generator(cfg, v, backend="scan", frame_bucket=16, fold_bucket=4,
                    deterministic=True)
    eval_mel = mel[:, :120]
    wav = gen(eval_mel, batched=True, target=2750, overlap=550, mu_law=True)
    np.save(golden / "tiny_wavernn_raw_wav.npy", wav.astype(np.float32))
    np.save(golden / "tiny_wavernn_raw_mel.npy", eval_mel)
    print(json.dumps({"which": "tiny", "final_loss": round(loss, 4),
                      "train_seconds": round(secs, 1),
                      "wav_len": int(len(wav)),
                      "wav_std": round(float(np.std(wav)), 5)}))


# --- tiny Tacotron golden -------------------------------------------------

# Same dims as the proven examples/e2e_tts.py recipe (attention aligns on
# the note corpus with this capacity; smaller decoders were measured to
# collapse).  num_chars = the full symbol table so the real text frontend
# drives training and decode.
TACO_DIMS = dict(
    embed_dims=128, num_chars=148, encoder_dims=64, decoder_dims=128,
    n_mels=80, fft_bins=80, postnet_dims=64, encoder_K=8, lstm_dims=256,
    postnet_K=4, num_highways=2,
)
TACO_EVAL_TEXT = "abcdeabcde"
NOTE_SECONDS = 0.125
TAIL_SECONDS = 0.25
CLEANERS = ["english_cleaners"]


def _taco_corpus_texts():
    """~1100 random melodies: the corpus must be LARGE relative to the
    decoder's capacity or it memorizes sequences and free-running tempo
    degrades (the examples/e2e_tts.py recipe's measured failure mode —
    the first golden trained on 540 melodies free-ran at ~2x tempo)."""
    rng = np.random.default_rng(7)
    return ([TACO_EVAL_TEXT, "ebcadebcad", "dcbaedcbae"]
            + ["".join(rng.choice(list("abcde"), int(n)))
               for n in rng.integers(8, 13, 1100)])


def _taco_tones(texts):
    """symbol id → tone frequency, spaced 28% apart (e2e_tts recipe)."""
    from wavernn_tpu.text import text_to_sequence

    used = sorted({sid for t in texts
                   for sid in text_to_sequence(t, CLEANERS)})
    return {sid: 261.6 * (1.28 ** k) for k, sid in enumerate(used)}


def _taco_wav(seq, tones, sr):
    n = int(NOTE_SECONDS * sr)
    t = np.arange(n) / sr
    env = np.minimum(1.0, np.minimum(np.arange(n), n - np.arange(n)) / 300.0)
    tail = np.zeros(int(TAIL_SECONDS * sr), np.float32)
    return np.concatenate(
        [0.5 * env * np.sin(2 * np.pi * tones[sid] * t) for sid in seq]
        + [tail]).astype(np.float32)


def run_taco(steps1: int, steps2: int):
    """Train the tiny Tacotron golden (any platform; TPU is fast), commit
    the checkpoint, then CPU-pin the free-running decode via a subprocess
    (decode numerics are pinned on CPU f32, like the tiny WaveRNN golden)."""
    import subprocess

    import jax
    import jax.numpy as jnp

    from wavernn_tpu.config import hp, default_hparams_path
    from wavernn_tpu.dsp import audio
    from wavernn_tpu.models.tacotron import Tacotron, TacotronConfig
    from wavernn_tpu.text import text_to_sequence
    from wavernn_tpu.training.state import make_optimizer, new_train_state
    from wavernn_tpu.training.tacotron import make_tts_train_step
    from wavernn_tpu.utils.checkpoints import save_pytree

    hp.configure(str(default_hparams_path()))
    sr = hp.sample_rate
    texts = _taco_corpus_texts()
    tones = _taco_tones(texts)
    seqs = [text_to_sequence(t, CLEANERS) for t in texts]

    # precompute padded (chars, mel) arrays: texts bucket to one L, mels pad
    # to one global r-friendly T (multiple of 14 covers r=7 and r=2), so the
    # whole curriculum compiles two programs
    L = _round_to(max(len(s) for s in seqs), 16)
    mels = []
    for seq in seqs:
        m = audio.melspectrogram(_taco_wav(seq, tones, sr)).astype(np.float32)
        mels.append(m.T)  # (T, 80) in [0, 1]
    T_pad = _round_to(max(m.shape[0] for m in mels) + 1, 14)
    chars = np.zeros((len(seqs), L), np.int32)
    mel_b = np.zeros((len(seqs), T_pad, 80), np.float32)
    for i, (seq, m) in enumerate(zip(seqs, mels)):
        chars[i, :len(seq)] = seq
        mel_b[i, :m.shape[0]] = m
    mel_b = mel_b * 8.0 - 4.0  # dataset scaling; padding = -4 (silence)

    cfg = TacotronConfig(**TACO_DIMS)
    model = Tacotron(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(chars[:2]), jnp.asarray(mel_b[:2]), 7, True)
    params, batch_stats = variables["params"], variables["batch_stats"]

    rng = np.random.default_rng(0)
    B = 8
    t0 = time.time()
    total = 0
    for r, lr, steps in [(7, 1e-3, steps1), (2, 3e-4, steps2)]:
        opt = make_optimizer(lr, 1.0)  # ref clips tacotron grads at 1.0
        state = new_train_state(params, batch_stats, opt)
        tstep = make_tts_train_step(model, opt, r=r, donate=True)
        for i in range(steps):
            idx = rng.integers(0, len(seqs), B)
            state, loss, _, attn, _ = tstep(
                state, jnp.asarray(chars[idx]), jnp.asarray(mel_b[idx]),
                jax.random.PRNGKey(total))
            total += 1
            if total % 500 == 0:
                path = np.asarray(attn[0]).argmax(axis=1)
                mono = float((np.diff(path) >= 0).mean())
                print(f"step {total} r={r} loss={float(loss):.4f} "
                      f"attn_monotone={mono:.2f}", file=sys.stderr)
        params, batch_stats = state.params, state.batch_stats

    golden = REPO / "tests" / "golden"
    save_pytree({"params": jax.device_get(params),
                 "batch_stats": jax.device_get(batch_stats),
                 "step": np.asarray(total)},
                golden / "tiny_tacotron.msgpack")
    gt_mel = audio.melspectrogram(
        _taco_wav(text_to_sequence(TACO_EVAL_TEXT, CLEANERS), tones, sr))
    np.save(golden / "tiny_tacotron_gt_mel.npy", gt_mel.astype(np.float32))
    meta = {"which": "taco", "dims": TACO_DIMS, "eval_text": TACO_EVAL_TEXT,
            "train_steps": total, "final_loss": round(float(loss), 4),
            "train_seconds": round(time.time() - t0, 1), "r": 2}
    (golden / "tiny_tacotron_meta.json").write_text(json.dumps(meta, indent=1))
    print(json.dumps(meta))

    # CPU-pin the decode in a fresh process (platform selection is
    # process-global; training may have run on TPU)
    env = dict(__import__("os").environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "train_golden.py"),
         "--which", "taco-pin"], env=env)
    if proc.returncode != 0:
        raise RuntimeError("taco-pin failed — golden NOT committed cleanly")


def _round_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


STOP_PATIENCE = 6  # survive brief note-boundary energy dips in free run


def _trim_tail(m, thresh=-3.4):
    """Drop trailing all-silent frames of a (n_mels, T) mel."""
    active = np.nonzero((m > thresh).any(axis=0))[0]
    return m[:, : active[-1] + 1] if len(active) else m


def taco_eval_decode(backend: str, variables=None):
    """Decode the golden eval text with the committed tiny Tacotron; returns
    (mel (80,T), attn (T/2, L), gates dict).  Shared by the pin step, the
    CPU regression test, and bench.py's TTS quality gate.

    ``mel_gt_l1`` is TEMPO-NORMALIZED: both mels are tail-trimmed and the
    generated one linearly resampled to the ground-truth length before the
    L1 — a free-running AR decoder renders correct spectra at a slightly
    wrong tempo, and a frame-aligned L1 would conflate the two; the tempo
    error itself is gated separately (``tempo`` ratio)."""
    from wavernn_tpu.config import hp, default_hparams_path
    from wavernn_tpu.infer.tacotron import TTSGenerator
    from wavernn_tpu.models.tacotron import TacotronConfig
    from wavernn_tpu.text import text_to_sequence

    if not hp.is_configured():
        hp.configure(str(default_hparams_path()))
    golden = REPO / "tests" / "golden"
    meta = json.loads((golden / "tiny_tacotron_meta.json").read_text())
    cfg = TacotronConfig(**meta["dims"])
    if variables is None:
        variables = load_taco_golden(cfg)
    gen = TTSGenerator(cfg, variables, steps=400, backend=backend,
                       stop_patience=STOP_PATIENCE)
    seq = text_to_sequence(meta["eval_text"], CLEANERS)
    mel, _, attn = gen(seq, r=meta["r"])

    path = attn.argmax(axis=1)
    steps = np.diff(path)
    monotone = float((steps >= 0).mean()) if len(steps) else 0.0
    coverage = float(len(np.unique(path))) / len(seq)
    gt = np.load(golden / "tiny_tacotron_gt_mel.npy") * 8.0 - 4.0
    gen_t, gt_t = _trim_tail(mel), _trim_tail(gt)
    tempo = gen_t.shape[1] / gt_t.shape[1]
    idx = np.linspace(0.0, gen_t.shape[1] - 1.0, gt_t.shape[1])
    src = np.arange(gen_t.shape[1], dtype=np.float64)
    warped = np.stack([np.interp(idx, src, gen_t[b])
                       for b in range(gen_t.shape[0])])
    l1 = float(np.abs(warped - gt_t).mean())
    gates = {"attn_monotone": round(monotone, 3),
             "attn_coverage": round(coverage, 3),
             "mel_gt_l1": round(l1, 4),
             "tempo": round(float(tempo), 3),
             "frames": int(mel.shape[1]), "gt_frames": int(gt.shape[1])}
    return mel, attn, gates


def load_taco_golden(cfg):
    """Load the committed tiny-Tacotron golden weights (host pytree)."""
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.models.tacotron import Tacotron
    from wavernn_tpu.utils.checkpoints import load_pytree

    model = Tacotron(cfg)
    template = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 4), jnp.int32), jnp.zeros((1, 2, cfg.n_mels)), 2, True)
    blob = load_pytree(
        {"params": template["params"],
         "batch_stats": template["batch_stats"], "step": np.asarray(0)},
        REPO / "tests" / "golden" / "tiny_tacotron.msgpack")
    return {"params": blob["params"], "batch_stats": blob["batch_stats"]}


def run_taco_pin():
    """CPU f32 pinning pass: decode the eval text with the XLA backend,
    assert the attention-diagonality gates, and commit the pinned mel +
    attention + measured gates."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    golden = REPO / "tests" / "golden"
    mel, attn, gates = taco_eval_decode("xla")
    assert gates["attn_monotone"] >= 0.9, gates
    assert gates["attn_coverage"] >= 0.7, gates
    assert 0.6 < gates["tempo"] < 1.5, gates
    assert gates["mel_gt_l1"] < 0.6, gates
    np.save(golden / "tiny_tacotron_mel.npy", mel.astype(np.float32))
    np.save(golden / "tiny_tacotron_attn.npy", attn.astype(np.float32))
    meta = json.loads((golden / "tiny_tacotron_meta.json").read_text())
    meta["pinned_gates_cpu_xla"] = gates
    (golden / "tiny_tacotron_meta.json").write_text(json.dumps(meta, indent=1))
    print(json.dumps({"which": "taco-pin", **gates}))


def run_full(steps: int):
    import jax

    from wavernn_tpu.config import hp, default_hparams_path
    from wavernn_tpu.dsp import audio
    from wavernn_tpu.infer.eval import copy_synthesis_mcd
    from wavernn_tpu.models.wavernn import WaveRNNConfig
    from wavernn_tpu.ops.decode import Generator
    from wavernn_tpu.utils.checkpoints import save_pytree

    hp.configure(str(default_hparams_path()), voc_mode="MOL")
    cfg = WaveRNNConfig.from_hp(hp)
    # speech-shaped corpus (formant-filtered pulse train) so the MCD gate's
    # sensitivity resembles real vocoding error, not a 4-harmonic overfit
    y = speech_signal(hp.sample_rate, 90.0)
    mel = audio.melspectrogram(y).astype(np.float32)

    state, loss, secs = train(cfg, mel, y, None, steps=steps, batch_size=32,
                              seq_len=hp.voc_seq_len, lr=hp.voc_lr, clip=4.0,
                              pad=hp.voc_pad, hop=hp.hop_length)

    assets = REPO / "bench_assets"
    assets.mkdir(exist_ok=True)
    save_pytree({"params": state.params, "batch_stats": state.batch_stats,
                 "step": np.asarray(state.step)},
                assets / "wavernn_mol_golden.msgpack")
    eval_mel = mel[:, :1200]
    np.save(assets / "golden_eval_mel.npy", eval_mel)

    v = {"params": state.params, "batch_stats": state.batch_stats}
    meta = {"which": "full", "mode": "MOL", "corpus": "speech_formant",
            "train_steps": steps, "final_loss": round(loss, 4),
            "train_seconds": round(secs, 1),
            "eval_frames": int(eval_mel.shape[1])}
    on_tpu = jax.devices()[0].platform == "tpu"
    backends = ("scan", "pallas") if on_tpu else ("scan",)
    for backend in backends:
        gen = Generator(cfg, v, backend=backend, fold_bucket=16)
        # scan = the gate baseline: 6 seeds so the committed spread (the
        # corridor unit in bench.py's MCD gate) is a measured quantity
        n_seeds = 6 if backend == "scan" else 3
        scores = [float(copy_synthesis_mcd(
            gen, eval_mel, batched=True, target=hp.voc_target,
            overlap=hp.voc_overlap, mu_law=hp.mu_law, seed=s)[0])
            for s in range(n_seeds)]
        meta[f"mcd_{backend}_mean"] = round(float(np.mean(scores)), 4)
        meta[f"mcd_{backend}_max"] = round(float(np.max(scores)), 4)
        if backend == "scan":
            meta["mcd_scan_spread"] = round(
                float(np.max(scores) - np.mean(scores)), 4)
    (assets / "golden_meta.json").write_text(json.dumps(meta, indent=1))
    print(json.dumps(meta))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--which", choices=["tiny", "full", "taco",
                                            "taco-pin"], required=True)
    parser.add_argument("--steps", type=int, default=3000,
                        help="training steps for --which full")
    parser.add_argument("--taco_steps1", type=int, default=2000,
                        help="r=7 session steps for --which taco")
    parser.add_argument("--taco_steps2", type=int, default=4000,
                        help="r=2 session steps for --which taco")
    args = parser.parse_args()
    if args.which == "tiny":
        run_tiny()
    elif args.which == "taco":
        run_taco(args.taco_steps1, args.taco_steps2)
    elif args.which == "taco-pin":
        run_taco_pin()
    else:
        run_full(args.steps)


if __name__ == "__main__":
    main()
