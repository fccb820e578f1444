"""Tacotron train-step cost attribution (TPU, pipelined timing).

The round-2/3 number is 27.3 ms device-side (B=16, L=100 chars, T=600
frames, r=2) with the remaining time attributed to the latency-bound
serial decoder cell.  This probe measures that attribution instead of
assuming it: full step vs loss-grad vs forward vs encoder/postnet pieces,
train vs eval dropout cost, and a decoder_unroll sweep.

Run on TPU:  python tools/tts_train_probe.py [B] [L] [T]
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    from wavernn_tpu.models.tacotron import Tacotron, TacotronConfig
    from wavernn_tpu.training.state import new_train_state
    from wavernn_tpu.training.tacotron import make_tts_train_step

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    T = int(sys.argv[3]) if len(sys.argv) > 3 else 600
    r = 2
    K = 4  # pipelined dispatches per timed pass

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, 60, (B, L)), jnp.int32)
    m = jnp.asarray(rng.uniform(-4, 4, (B, T, 80)), jnp.float32)

    def timed(name, fn, *args):
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])  # compile+warm
        def one_pass():
            t0 = time.time()
            outs = [fn(*args) for _ in range(K)]
            np.asarray(jax.tree_util.tree_leaves(outs[-1])[0])
            return (time.time() - t0) / K
        best = min(one_pass() for _ in range(3))
        print(f"{name:40s} {best * 1e3:6.2f} ms")
        return best

    def build(cfg):
        model = Tacotron(cfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, m, r, True)
        return model, variables

    cfg = TacotronConfig()
    model, variables = build(cfg)
    opt = optax.adam(1e-4)
    state = new_train_state(variables["params"], variables["batch_stats"], opt)
    step = make_tts_train_step(model, opt, r=r, donate=False)
    key = jax.random.PRNGKey(2)

    full = timed("full train step (fwd+bwd+adam)", step, state, x, m, key)

    def loss_fn(params, batch_stats, key):
        (m1, m2, attn), mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, m, r, True,
            mutable=["batch_stats"], rngs={"dropout": key})
        return jnp.abs(m1 - m).mean() + jnp.abs(m2 - m).mean(), mut

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    lb = timed("loss grad only (no optimizer)", grad_fn,
               state.params, state.batch_stats, key)

    fwd = jax.jit(loss_fn)
    f = timed("forward only (train mode)", fwd,
              state.params, state.batch_stats, key)

    def fwd_eval(params, batch_stats):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, m, r, False,
            rngs={"dropout": jax.random.PRNGKey(0)})
        m1, m2, attn = out
        return jnp.abs(m1 - m).mean() + jnp.abs(m2 - m).mean()

    fe = timed("forward only (eval mode)", jax.jit(fwd_eval),
               state.params, state.batch_stats)

    enc = jax.jit(lambda p, bs: model.apply(
        {"params": p, "batch_stats": bs}, x, True,
        method=Tacotron.encode, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(0)})[0][0].sum())
    e = timed("encoder forward (train)", enc, state.params, state.batch_stats)

    mels = jnp.asarray(rng.uniform(-4, 4, (B, T, 80)), jnp.float32)
    post = jax.jit(lambda p, bs: model.apply(
        {"params": p, "batch_stats": bs}, mels, True,
        method=Tacotron.postnet_forward, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(0)})[0].sum())
    pp = timed("postnet forward (train)", post, state.params,
               state.batch_stats)

    print(f"{'-> optimizer/apply share':40s} {(full - lb) * 1e3:6.2f} ms")
    print(f"{'-> backward share':40s} {(lb - f) * 1e3:6.2f} ms")
    print(f"{'-> dropout/zoneout share (fwd)':40s} {(f - fe) * 1e3:6.2f} ms")
    print(f"{'-> decoder-scan fwd (residual est.)':40s} "
          f"{(f - e - pp) * 1e3:6.2f} ms")

    for unroll in (1, 10, 25):
        cfg_u = TacotronConfig(decoder_unroll=unroll)
        model_u, variables_u = build(cfg_u)
        step_u = make_tts_train_step(model_u, opt, r=r, donate=False)
        state_u = new_train_state(variables_u["params"],
                                  variables_u["batch_stats"], opt)
        timed(f"full step, decoder_unroll={unroll}", step_u,
              state_u, x, m, key)
    cfg_n = TacotronConfig(decoder_remat=False)
    model_n, variables_n = build(cfg_n)
    step_n = make_tts_train_step(model_n, opt, r=r, donate=False)
    state_n = new_train_state(variables_n["params"],
                              variables_n["batch_stats"], opt)
    timed("full step, no decoder remat", step_n, state_n, x, m, key)


if __name__ == "__main__":
    main()
