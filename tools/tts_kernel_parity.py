"""TPU parity check of the fused Tacotron decoder kernel (ops/pallas_tts.py).

Runs the full TTSGenerator on both backends (xla scan / pallas kernel) with
the same untrained-but-deterministic weights and prints ONE JSON line with
the mel/attention deltas and the measured decode rates.  Consumed by
tests/test_pallas_tts.py::test_tpu_backend_parity.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from wavernn_tpu.infer.tacotron import TTSGenerator
from wavernn_tpu.models.tacotron import Tacotron, TacotronConfig


def _train(cfg, model, variables, n_steps: int):
    """Overfit on a synthetic text→mel pair so the backends are compared
    with REALISTIC weight/activation ranges (sharpened attention, saturated
    gates) rather than the init distribution."""
    import optax

    from wavernn_tpu.training.state import make_optimizer, new_train_state
    from wavernn_tpu.training.tacotron import make_tts_train_step

    rng = np.random.default_rng(11)
    B, L, T, r = 4, 40, 120, 2
    x = rng.integers(1, cfg.num_chars, (B, L)).astype(np.int32)
    # smooth synthetic mels: per-utterance moving spectral bump, the mel
    # bin tracking text position (gives attention something to align to)
    t = np.arange(T)[None, :, None] / T
    m_bins = np.arange(cfg.n_mels)[None, None, :]
    center = (10 + 60 * t) + 5 * rng.standard_normal((B, 1, 1))
    m = 8 * np.exp(-0.5 * ((m_bins - center) / 6.0) ** 2) - 4
    m = m.astype(np.float32)

    optimizer = make_optimizer(1e-3, 1.0)
    state = new_train_state(variables["params"], variables["batch_stats"],
                            optimizer)
    step = make_tts_train_step(model, optimizer, r, donate=False)
    key = jax.random.PRNGKey(5)
    loss = None
    for i in range(n_steps):
        key, k = jax.random.split(key)
        state, loss, _, _, _ = step(state, jnp.asarray(x), jnp.asarray(m), k)
    return ({"params": state.params, "batch_stats": state.batch_stats},
            float(loss))


def main():
    assert jax.devices()[0].platform == "tpu", "TPU required"
    train_steps = 0
    if "--train" in sys.argv:
        train_steps = int(sys.argv[sys.argv.index("--train") + 1])
    cfg = TacotronConfig()
    model = Tacotron(cfg)
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.integers(1, cfg.num_chars, (1, 32)).astype(np.int32))
    m0 = jnp.asarray(rng.uniform(-4, 4, (1, 8, cfg.n_mels)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0, m0, 2, True,
    )
    final_loss = None
    if train_steps:
        variables, final_loss = _train(cfg, model, variables, train_steps)

    seq = list(rng.integers(1, cfg.num_chars, 60))
    steps = 400  # untrained model never hits the stop threshold: bounded run

    out = {}
    rates = {}
    variants = [("xla", {}), ("pallas", {})]
    if "--int8" in sys.argv:
        variants.append(("pallas_int8", {"int8_lstm": True}))
    for backend, kw in variants:
        gen = TTSGenerator(cfg, variables, steps=steps,
                           backend=kw and "pallas" or backend, **kw)
        mel, linear, attn = gen(seq, r=2)           # compile+run
        best = float("inf")
        for _ in range(3):                          # shed relay stalls
            t0 = time.time()
            mel, linear, attn = gen(seq, r=2)
            best = min(best, time.time() - t0)
        out[backend] = (mel, linear, attn)
        rates[backend] = mel.shape[1] / best

    mel_x, lin_x, attn_x = out["xla"]
    mel_p, lin_p, attn_p = out["pallas"]
    # a trained model stops at its own threshold crossing; bf16 noise can
    # move that by a frame group — compare over the common prefix
    frames_xla, frames_pallas = int(mel_x.shape[1]), int(mel_p.shape[1])
    n = min(frames_xla, frames_pallas)
    na = min(attn_x.shape[0], attn_p.shape[0])
    mel_x, mel_p = mel_x[:, :n], mel_p[:, :n]
    lin_x, lin_p = lin_x[:, :n], lin_p[:, :n]
    attn_x, attn_p = attn_x[:na], attn_p[:na]
    result = {
        "frames": int(n),
        "frames_xla": frames_xla,
        "frames_pallas": frames_pallas,
        "mel_mean_abs_diff": float(np.abs(mel_p - mel_x).mean()),
        "mel_max_abs_diff": float(np.abs(mel_p - mel_x).max()),
        "linear_mean_abs_diff": float(np.abs(lin_p - lin_x).mean()),
        "attn_max_abs_diff": float(np.abs(attn_p - attn_x).max()),
        "frames_per_s_xla": float(rates["xla"]),
        "frames_per_s_pallas": float(rates["pallas"]),
    }
    if "pallas_int8" in out:
        mel_q = out["pallas_int8"][0]
        nq = min(mel_q.shape[1], mel_x.shape[1])
        result["mel_mean_abs_diff_int8"] = float(
            np.abs(mel_q[:, :nq] - mel_x[:, :nq]).mean())
        result["mel_max_abs_diff_int8"] = float(
            np.abs(mel_q[:, :nq] - mel_x[:, :nq]).max())
        na_q = min(out["pallas_int8"][2].shape[0], attn_x.shape[0])
        result["attn_max_abs_diff_int8"] = float(np.abs(
            out["pallas_int8"][2][:na_q] - out["xla"][2][:na_q]).max())
        result["frames_per_s_pallas_int8"] = float(rates["pallas_int8"])
    if final_loss is not None:
        result["train_steps"] = train_steps
        result["final_train_loss"] = final_loss
    print(json.dumps(result))


if __name__ == "__main__":
    main()
