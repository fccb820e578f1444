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
    y = harmonic_signal(hp.sample_rate, 90.0)
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
    meta = {"which": "full", "mode": "MOL", "train_steps": steps,
            "final_loss": round(loss, 4), "train_seconds": round(secs, 1),
            "eval_frames": int(eval_mel.shape[1])}
    on_tpu = jax.devices()[0].platform == "tpu"
    backends = ("scan", "pallas") if on_tpu else ("scan",)
    for backend in backends:
        gen = Generator(cfg, v, backend=backend, fold_bucket=16)
        scores = [float(copy_synthesis_mcd(
            gen, eval_mel, batched=True, target=hp.voc_target,
            overlap=hp.voc_overlap, mu_law=hp.mu_law, seed=s)[0])
            for s in range(3)]
        meta[f"mcd_{backend}_mean"] = round(float(np.mean(scores)), 4)
        meta[f"mcd_{backend}_max"] = round(float(np.max(scores)), 4)
    (assets / "golden_meta.json").write_text(json.dumps(meta, indent=1))
    print(json.dumps(meta))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--which", choices=["tiny", "full"], required=True)
    parser.add_argument("--steps", type=int, default=3000,
                        help="training steps for --which full")
    args = parser.parse_args()
    if args.which == "tiny":
        run_tiny()
    else:
        run_full(args.steps)


if __name__ == "__main__":
    main()
