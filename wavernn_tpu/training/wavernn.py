"""WaveRNN vocoder training runtime (ref: train_wavernn.py:91-155).

One jitted train step (forward + loss + clipped Adam update + batch-stat
update) compiled once; the epoch loop streams progress, runs the audition
generation + named checkpoint every ``voc_checkpoint_every`` steps, and
rewrites the latest checkpoint each epoch.

Data parallelism: the step is sharding-agnostic — when the caller places
batches with a NamedSharding over a device mesh, XLA inserts the gradient
all-reduce automatically (psum over ICI), superseding the reference's
DataParallel workaround (ref: utils/__init__.py:19-36).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wavernn_tpu.config import hp
from wavernn_tpu.models.wavernn import WaveRNN, WaveRNNConfig
from wavernn_tpu.ops.mol import discretized_mix_logistic_loss
from wavernn_tpu.paths import Paths
from wavernn_tpu.training.state import TrainState, set_learning_rate
from wavernn_tpu.utils.checkpoints import save_checkpoint
from wavernn_tpu.utils.display import stream


def append_log(path, msg: str) -> None:
    """Append-only text log (ref: models/fatchord_version.py:410-412)."""
    with open(path, "a") as f:
        print(msg, file=f)


def make_train_step(model: WaveRNN, optimizer: optax.GradientTransformation,
                    mode: str, donate: bool = True,
                    prune: bool = False) -> Callable:
    """Build the jitted vocoder train step.

    ``prune=True`` returns a step taking an extra ``masks`` pytree: the
    forward runs on masked params and pruned weights are re-zeroed after
    the optimizer update (the reference prototype's in-place weight zeroing,
    ref: notebooks/Pruning - Scratchpad.ipynb) — one fused elementwise
    multiply each way, no extra dispatches."""

    def loss_fn(params, batch_stats, x, y, mels):
        logits, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, mels, True, mutable=["batch_stats"],
        )
        if mode == "RAW":
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()
        elif mode == "MOL":
            loss = discretized_mix_logistic_loss(logits, y)
        else:
            raise ValueError(f"Unknown mode {mode}")
        return loss, mutated["batch_stats"]

    def step_impl(state: TrainState, x, y, mels, masks=None):
        params = state.params
        if masks is not None:
            from wavernn_tpu.pruning import Pruner

            params = Pruner.apply(masks, params)
        (loss, batch_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, state.batch_stats, x, y, mels
        )
        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, params)
        params = optax.apply_updates(params, updates)
        if masks is not None:
            from wavernn_tpu.pruning import Pruner

            params = Pruner.apply(masks, params)
        new_state = state.replace(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, loss, grad_norm

    donate_args = (0,) if donate else ()
    if prune:
        return jax.jit(step_impl, donate_argnums=donate_args)

    @partial(jax.jit, donate_argnums=donate_args)
    def train_step(state: TrainState, x, y, mels):
        return step_impl(state, x, y, mels)

    return train_step


def voc_train_loop(
    paths: Paths,
    cfg: WaveRNNConfig,
    state: TrainState,
    optimizer: optax.GradientTransformation,
    train_set,
    test_set,
    total_steps: int,
    lr: Optional[float] = None,
    shard_batch: Optional[Callable] = None,
    gen_at_checkpoint: bool = True,
) -> TrainState:
    """Epoch/step training loop with in-loop audition + checkpoint cadence.

    ``lr`` (when given) is re-injected into the restored optimizer state so a
    resumed run honors the configured learning rate instead of silently
    keeping the checkpointed one (matching the reference's per-run
    ``param_group['lr'] = lr``, ref: train_wavernn.py:95)."""
    from wavernn_tpu.infer.wavernn import gen_testset

    if lr is not None:
        set_learning_rate(state.opt_state, lr)
    model = WaveRNN(cfg)

    # sparse training (voc_prune_* hparams): cubic-ramp magnitude pruning
    # fused into the step; resume reconstructs masks from (params, step)
    from wavernn_tpu.pruning import make_pruner_from_hp

    pruner = make_pruner_from_hp(hp)
    train_step = make_train_step(model, optimizer, cfg.mode,
                                 prune=pruner is not None)
    masks = (pruner.masks_for_resume(state.params, state.get_step())
             if pruner is not None else None)

    total_iters = len(train_set)
    host_step = state.get_step()
    epochs = max(0, (total_steps - host_step) // max(total_iters, 1) + 1)
    msg = ""
    # Fetch loss/grad scalars only every few steps: each fetch syncs the
    # device, so per-step fetching would serialize the async dispatch
    # pipeline.  NaN detection therefore lags by at most display_every steps.
    display_every = max(1, min(10, hp.voc_checkpoint_every))
    state_finite = True   # last fetched loss/grad were finite
    # Epoch-end "latest" saves are wall-clock throttled: on real datasets an
    # epoch takes minutes (reference cadence preserved), but on tiny
    # corpora a per-epoch full state fetch+serialize would dominate the
    # run.  The final save (loop exit) is never skipped.
    save_min_s = float(hp.get("latest_save_min_interval_s", 30.0))
    last_save = 0.0

    for e in range(1, epochs + 1):
        start = time.time()
        running_loss = 0.0
        n_fetched = 0

        for i, (x, y, mels) in enumerate(train_set, 1):
            if shard_batch is not None:
                x, y, mels = shard_batch(x, y, mels)
            if pruner is not None:
                masks = pruner.maybe_update(masks, state.params, host_step + 1)
                state, loss, grad_norm = train_step(state, x, y, mels, masks)
            else:
                state, loss, grad_norm = train_step(state, x, y, mels)
            host_step += 1
            step = host_step
            k = step // 1000

            at_checkpoint = step % hp.voc_checkpoint_every == 0
            if i % display_every == 0 or at_checkpoint or step >= total_steps:
                loss_f, gn_f = float(loss), float(grad_norm)
                state_finite = np.isfinite(loss_f) and np.isfinite(gn_f)
                if not state_finite:
                    print(f"\nWARNING: non-finite loss/grad at step {step} "
                          f"(loss={loss_f}, grad_norm={gn_f}) — checkpoints "
                          "suppressed until training recovers!")
                running_loss += loss_f
                n_fetched += 1
                avg_loss = running_loss / n_fetched
                speed = i / (time.time() - start)
                msg = (
                    f"| Epoch: {e}/{epochs} ({i}/{total_iters}) | "
                    f"Loss: {avg_loss:.4f} | {speed:.1f} steps/s | Step: {k}k | "
                )
                stream(msg)

            if at_checkpoint:
                # the scalars above were fetched this step (at_checkpoint
                # forces the fetch), so the guard is free of extra syncs —
                # a NaN run must never overwrite a good checkpoint pair
                # (ref NaN-guard intent: train_wavernn.py:129-130)
                if state_finite:
                    if gen_at_checkpoint:
                        gen_testset(
                            cfg, state, test_set, hp.voc_gen_at_checkpoint,
                            hp.voc_gen_batched, hp.voc_target, hp.voc_overlap,
                            paths.voc_output,
                        )
                    save_checkpoint("voc", paths, state,
                                    name=f"wave_step{k}K", is_silent=True)

            if step >= total_steps:
                break

        done = host_step >= total_steps
        if state_finite and (done or time.time() - last_save >= save_min_s):
            save_checkpoint("voc", paths, state, is_silent=True)
            last_save = time.time()
        append_log(paths.voc_log, msg)
        print(" ")
        if done:
            break

    return state

