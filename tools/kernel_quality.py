"""Quantify the Pallas kernel's bf16-weight quality delta vs the f32 scan
decoder: copy-synthesis MCD of both backends on the same trained model and
mel (VERDICT r1 missing #5b).

Trains the full-size WaveRNN (RAW) to overfit a synthetic harmonic signal
on TPU (nb2-style), then copy-synthesizes one mel through BOTH decode
backends and reports each output's MCD against the source mel.  The
kernel-minus-scan delta is the quality cost of VMEM bf16 weights.

Prints one JSON line.  Run on TPU:  python tools/kernel_quality.py
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def harmonic_signal(sr: int, seconds: float) -> np.ndarray:
    """Harmonic tone with mild vibrato — spectral structure for MCD while
    staying easy for an overfit vocoder to memorize."""
    t = np.arange(int(sr * seconds)) / sr
    f0 = 180.0 + 8.0 * np.sin(2 * np.pi * 0.5 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    y = sum((0.5 ** k) * np.sin((k + 1) * phase) for k in range(4))
    return (0.45 * y / np.abs(y).max()).astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.config import hp, default_hparams_path
    from wavernn_tpu.dsp import audio
    from wavernn_tpu.infer.eval import copy_synthesis_mcd
    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.ops.decode import Generator
    from wavernn_tpu.training.state import make_optimizer, new_train_state
    from wavernn_tpu.training.wavernn import make_train_step

    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--eval_frames", type=int, default=400)
    args = parser.parse_args()

    hp.configure(str(default_hparams_path()), voc_mode="RAW")
    cfg = WaveRNNConfig.from_hp(hp)

    y = harmonic_signal(hp.sample_rate, 90.0)
    mel = audio.melspectrogram(y).astype(np.float32)
    labels = audio.encode_mu_law(y, 2 ** hp.bits).astype(np.int64)

    model = WaveRNN(cfg)
    mel_win = hp.voc_seq_len // hp.hop_length + 2 * hp.voc_pad
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, hp.voc_seq_len)),
        jnp.zeros((1, mel_win, hp.num_mels)), True,
    )
    opt = make_optimizer(hp.voc_lr * 4, hp.voc_clip_grad_norm)
    state = new_train_state(variables["params"], variables["batch_stats"], opt)
    train_step = make_train_step(model, opt, cfg.mode, donate=False)

    rng = np.random.default_rng(0)
    max_off = mel.shape[1] - 2 - (mel_win + 2 * hp.voc_pad)

    def batch():
        offs = rng.integers(0, max_off, args.batch_size)
        ms = np.stack([mel[:, o: o + mel_win] for o in offs]).transpose(0, 2, 1)
        lab = np.stack(
            [labels[(o + hp.voc_pad) * hp.hop_length:][: hp.voc_seq_len + 1]
             for o in offs])
        x = audio.label_2_float(lab[:, :-1].astype(np.float32), hp.bits)
        return x.astype(np.float32), lab[:, 1:].astype(np.int32), ms

    t0 = time.time()
    loss = float("nan")
    for i in range(1, args.steps + 1):
        x, t, m = batch()
        state, loss, _ = train_step(state, x, t, m)
        if i % 200 == 0:
            print(f"step {i}/{args.steps} loss={float(loss):.4f}",
                  file=sys.stderr)
    train_s = time.time() - t0

    v = {"params": state.params, "batch_stats": state.batch_stats}
    eval_mel = mel[:, : args.eval_frames]
    out = {"train_steps": args.steps, "final_loss": round(float(loss), 4),
           "train_seconds": round(train_s, 1)}
    # 3 seeds per backend: the scan seed-to-seed spread is the stochastic
    # noise floor the kernel's delta must be judged against
    scores = {}
    variants = [("scan", {}), ("pallas", {}),
                ("pallas_int8", {"backend": "pallas", "int8_gates": True})]
    for name, kw in variants:
        gen = Generator(cfg, v, backend=kw.get("backend", name),
                        fold_bucket=16,
                        int8_gates=kw.get("int8_gates", False))
        scores[name] = [
            float(copy_synthesis_mcd(
                gen, eval_mel, batched=True, target=hp.voc_target,
                overlap=hp.voc_overlap, mu_law=hp.mu_law, seed=s)[0])
            for s in range(3)
        ]
        out[f"mcd_{name}_mean"] = round(float(np.mean(scores[name])), 4)
        out[f"mcd_{name}_spread"] = round(
            float(np.max(scores[name]) - np.min(scores[name])), 4)
    out["mcd_delta_pallas_minus_scan"] = round(
        out["mcd_pallas_mean"] - out["mcd_scan_mean"], 4)
    out["mcd_delta_int8_minus_pallas"] = round(
        out["mcd_pallas_int8_mean"] - out["mcd_pallas_mean"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
