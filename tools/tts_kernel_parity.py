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


def main():
    assert jax.devices()[0].platform == "tpu", "TPU required"
    cfg = TacotronConfig()
    model = Tacotron(cfg)
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.integers(1, cfg.num_chars, (1, 32)).astype(np.int32))
    m0 = jnp.asarray(rng.uniform(-4, 4, (1, 8, cfg.n_mels)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0, m0, 2, True,
    )

    seq = list(rng.integers(1, cfg.num_chars, 60))
    steps = 400  # untrained model never hits the stop threshold: bounded run

    out = {}
    rates = {}
    for backend in ("xla", "pallas"):
        gen = TTSGenerator(cfg, variables, steps=steps, backend=backend)
        mel, linear, attn = gen(seq, r=2)           # compile+run
        t0 = time.time()
        mel, linear, attn = gen(seq, r=2)
        dt = time.time() - t0
        out[backend] = (mel, linear, attn)
        rates[backend] = mel.shape[1] / dt

    mel_x, lin_x, attn_x = out["xla"]
    mel_p, lin_p, attn_p = out["pallas"]
    result = {
        "frames": int(mel_x.shape[1]),
        "mel_mean_abs_diff": float(np.abs(mel_p - mel_x).mean()),
        "mel_max_abs_diff": float(np.abs(mel_p - mel_x).max()),
        "linear_mean_abs_diff": float(np.abs(lin_p - lin_x).mean()),
        "attn_max_abs_diff": float(np.abs(attn_p - attn_x).max()),
        "frames_per_s_xla": float(rates["xla"]),
        "frames_per_s_pallas": float(rates["pallas"]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
