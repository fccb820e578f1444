"""Serving wire-format A/B: int16 PCM vs mulaw8 egress on the strict clock.

The strict serving clock is bound by the host link (the axon relay moves
~35 MB/s), and the finished-audio stream is its dominant byte flow — so
the wire dtype is a serving-rate lever, not just a format choice.  This
probe runs STRICTLY INTERLEAVED A/B passes (per-pass prestage + submit +
prefetch + collect for every utterance, the bench's pipelined_strict
discipline) so relay drift hits both arms equally, then scores the
quality cost: copy-synthesis MCD through each wire format on the trained
golden weights (expand the wire bytes to float on the host — exactly
what a client of that serving format hears — then the same MCD as the
bench gate).

Round-5 measurements (three sessions, median clocks): mulaw8 +5.8% /
+6.0% on a healthy relay, +54% during a congested episode, MCD cost
+0.25 dB (inside the 0.63 dB seed spread) — adopted as an opt-in
(`serve.py --output_dtype mulaw8`); int16 stays the default.

Run on TPU:  python tools/wire_format_probe.py [passes] [runs_per_pass]

Reference anchor: the byte-lean intent of the reference's batched
generation (hparams.py:58-60); the mu-law label convention is
dsp.audio.encode_mu_law (mu=256), matching utils/dsp.py:42-51.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

import bench as B
from wavernn_tpu.config import hp, default_hparams_path
from wavernn_tpu.dsp.audio import decode_mu_law
from wavernn_tpu.infer.eval import copy_synthesis_mcd
from wavernn_tpu.models.wavernn import WaveRNNConfig
from wavernn_tpu.ops.decode import Generator


def main():
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    if not hp.is_configured():
        hp.configure(str(default_hparams_path()))
    cfg = WaveRNNConfig()
    variables = B.load_golden(cfg)
    trained = variables is not None
    if not trained:
        print("WARNING: no golden assets — timing on random weights, "
              "skipping the MCD half")
        import jax
        import jax.numpy as jnp
        from wavernn_tpu.models.wavernn import WaveRNN
        model = WaveRNN(cfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, cfg.hop_length)),
            jnp.zeros((1, 1 + 2 * cfg.pad, cfg.feat_dims)), True)

    expand = {
        "int16": lambda w: w.astype(np.float64) / 32767.0,
        "mulaw8": lambda w: decode_mu_law(
            w.astype(np.float64), 256, from_labels=True),
    }
    # arms: (output wire, input wire) — int16+f16in is the production
    # default; u8in quarters the f32 mel upload; mulaw8+u8in is the
    # min-bytes configuration (1 B/sample out, 1 B/mel-bin in)
    arms = {
        "int16": ("int16", "float16"),
        "mulaw8": ("mulaw8", "float16"),
        "int16_u8in": ("int16", "uint8"),
        "mulaw8_u8in": ("mulaw8", "uint8"),
    }
    to_float = {name: expand[od] for name, (od, _) in arms.items()}
    gens = {name: Generator(cfg, variables, backend="pallas",
                            fold_bucket=16, output_dtype=od,
                            input_dtype=idt)
            for name, (od, idt) in arms.items()}

    T_mel, target, overlap = 1920, 11_000, 550
    rng = np.random.default_rng(0)
    mels = [rng.uniform(0, 1, (cfg.feat_dims, T_mel)).astype(np.float32)
            for _ in range(runs)]
    for g in gens.values():  # warm the per-utterance program
        g(mels[0], batched=True, target=target, overlap=overlap,
          mu_law=False)

    res = {k: [] for k in gens}
    for p in range(passes):
        for name, gen in gens.items():  # interleaved arms
            t0 = time.time()
            hs = []
            for s, m in enumerate(mels):
                d = gen.prestage(m, batched=True, target=target,
                                 overlap=overlap)
                hs.append(gen.submit(d, batched=True, target=target,
                                     overlap=overlap, mu_law=False,
                                     seed=p * runs + s + 1))
            for h in hs:
                gen.prefetch(h)
            waves = [gen.collect(h) for h in hs]
            dt = time.time() - t0
            res[name].append(sum(len(w) for w in waves) / dt / 1e3)

    out = {}
    for name, r in res.items():
        out[f"{name}_khz_median"] = round(float(np.median(r)), 1)
        out[f"{name}_khz_best"] = round(float(max(r)), 1)
        print(name, "median", out[f"{name}_khz_median"],
              "best", out[f"{name}_khz_best"], [round(x) for x in r])
    base = out["int16_khz_median"]
    for name in arms:
        if name == "int16":
            continue
        out[f"{name}_vs_int16_pct"] = round(
            100.0 * (out[f"{name}_khz_median"] / base - 1), 1)
        print(f"{name} vs int16: {out[f'{name}_vs_int16_pct']:+.1f}% "
              "(median)")

    if trained:
        mel = np.load(B.ASSETS / "golden_eval_mel.npy")
        for name, gen in gens.items():
            mcd, _ = copy_synthesis_mcd(
                gen, mel, batched=True, target=target, overlap=overlap,
                mu_law=False, seed=0, to_float=to_float[name])
            out[f"mcd_{name}"] = round(float(mcd), 2)
            print(f"mcd through {name} wire: {out[f'mcd_{name}']}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
