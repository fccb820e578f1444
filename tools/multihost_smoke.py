"""Two-process jax.distributed smoke: the multi-host init path EXECUTED.

`wavernn_tpu/parallel/distributed.py` gates multi-host initialization on
env vars; on a real pod it runs once per host.  This script proves the path
is working code, not env-gated dead code, by emulating two hosts as two
local processes on the CPU backend (2 virtual devices each → a 4-device
global mesh spanning processes):

  * both workers initialize through ``maybe_initialize_distributed()``
    (the exact library code path, driven by the JAX_COORDINATOR_ADDRESS /
    JAX_PROCESS_ID / JAX_NUM_PROCESSES env contract);
  * a psum over the global mesh must see ALL devices (cross-process
    collective over the coordinator-established cluster);
  * one data-parallel WaveRNN train step runs on a global batch assembled
    from process-local shards (``jax.make_array_from_callback``), and both
    processes must compute the identical finite loss.

On a real multi-host slice the same script works unchanged with
``--coordinator host0:port`` and one invocation per host (the TPU runtime
then supplies the devices).  Run locally (launcher mode spawns the two
workers):    python tools/multihost_smoke.py
"""

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))


def worker(process_id: int, num_processes: int, coordinator: str) -> None:
    # env contract consumed by maybe_initialize_distributed
    os.environ["JAX_COORDINATOR_ADDRESS"] = coordinator
    os.environ["JAX_PROCESS_ID"] = str(process_id)
    os.environ["JAX_NUM_PROCESSES"] = str(num_processes)

    import jax

    if os.environ.get("SMOKE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    from wavernn_tpu.parallel.distributed import maybe_initialize_distributed

    active = maybe_initialize_distributed()
    assert active, "maybe_initialize_distributed did not activate"
    assert jax.process_count() == num_processes, jax.process_count()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
    from wavernn_tpu.parallel.mesh import make_mesh
    from wavernn_tpu.training.state import make_optimizer, new_train_state
    from wavernn_tpu.training.wavernn import make_train_step

    n_global = len(jax.devices())
    plan = make_mesh({"data": n_global})

    # cross-process collective: every device contributes 1
    psum_ones = jax.jit(
        jax.shard_map(
            lambda: jax.lax.psum(jnp.ones(()), "data"),
            mesh=plan.mesh, in_specs=(), out_specs=P(),
        )
    )
    total = float(psum_ones())
    assert total == n_global, (total, n_global)

    # one DP train step on a global batch assembled from local shards
    cfg = WaveRNNConfig(
        rnn_dims=32, fc_dims=32, bits=8, pad=2, upsample_factors=(2, 2),
        feat_dims=8, compute_dims=8, res_out_dims=8, res_blocks=1,
        hop_length=4, sample_rate=1000, mode="RAW",
    )
    model = WaveRNN(cfg)
    B = n_global
    mel_win, seq_len = 4 + 2 * cfg.pad, 4 * cfg.hop_length
    rng = np.random.default_rng(0)  # same data on every process
    x = rng.uniform(-1, 1, (B, seq_len)).astype(np.float32)
    y = rng.integers(0, cfg.n_classes, (B, seq_len)).astype(np.int32)
    mels = rng.uniform(0, 1, (B, mel_win, cfg.feat_dims)).astype(np.float32)

    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(mels), True))
    # materialize identical params on every process, then lift to global
    # replicated arrays (host values are process-local; make_array_from_
    # callback assembles the global view)
    concrete = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                          jnp.asarray(mels), True)
    concrete = jax.device_get(concrete)

    with plan.mesh:
        rep = NamedSharding(plan.mesh, P())
        dp = NamedSharding(plan.mesh, P("data"))

        def to_global(leaf, sharding):
            leaf = np.asarray(leaf)
            return jax.make_array_from_callback(
                leaf.shape, sharding, lambda idx: leaf[idx])

        params = jax.tree.map(lambda l: to_global(l, rep),
                              concrete["params"])
        bstats = jax.tree.map(lambda l: to_global(l, rep),
                              concrete["batch_stats"])
        xb = to_global(x, dp)
        yb = to_global(y, dp)
        mb = to_global(mels, dp)

        opt = make_optimizer(1e-3, 4.0)
        state = new_train_state(params, bstats, opt)
        step = make_train_step(model, opt, cfg.mode, donate=False)
        state, loss, grad_norm = step(state, xb, yb, mb)
        loss = float(loss)

    assert np.isfinite(loss), loss
    print(json.dumps({"process": process_id, "processes": num_processes,
                      "global_devices": n_global, "psum": total,
                      "loss": round(loss, 6)}))


def launch(num_processes: int, coordinator: str) -> None:
    env = dict(os.environ)
    env["SMOKE_CPU"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2").strip()
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--worker", str(i),
             "--processes", str(num_processes),
             "--coordinator", coordinator],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=str(REPO),
        )
        for i in range(num_processes)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    results = []
    for p, (out, err) in zip(procs, outs):
        if p.returncode != 0:
            raise RuntimeError(
                f"worker failed rc={p.returncode}; stderr tail: {err[-1500:]}")
        results.append(json.loads(out.strip().splitlines()[-1]))
    losses = {r["loss"] for r in results}
    assert len(losses) == 1, f"processes disagree on the loss: {results}"
    print(json.dumps({"ok": True, "workers": results}))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--worker", type=int, default=None)
    parser.add_argument("--processes", type=int, default=2)
    parser.add_argument("--coordinator", default="localhost:9433")
    args = parser.parse_args()
    if args.worker is None:
        launch(args.processes, args.coordinator)
    else:
        worker(args.worker, args.processes, args.coordinator)


if __name__ == "__main__":
    main()
