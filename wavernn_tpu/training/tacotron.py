"""Tacotron training runtime: curriculum sessions, jitted L1 train step,
attention diagnostics, GTA export (ref: train_tacotron.py:68-198).

Curriculum contract kept from the reference: the restored step counter
selects the active (r, lr, max_step, batch_size) session, so resume lands in
the right session with the right optimizer settings; the learning rate is
injected into the existing Adam state without losing moments.
"""

from __future__ import annotations

import time
from functools import partial
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wavernn_tpu.config import hp
from wavernn_tpu.models.tacotron import Tacotron, TacotronConfig
from wavernn_tpu.paths import Paths
from wavernn_tpu.training.state import TrainState, set_learning_rate
from wavernn_tpu.training.wavernn import append_log
from wavernn_tpu.utils.checkpoints import save_checkpoint
from wavernn_tpu.utils.display import save_attention, save_spectrogram, simple_table, stream


def make_tts_train_step(model: Tacotron, optimizer: optax.GradientTransformation,
                        r: int, donate: bool = True) -> Callable:
    """Jitted step: L1(mel head) + L1(postnet head) with zoneout/dropout rngs
    (ref losses: train_tacotron.py:136-139)."""

    def loss_fn(params, batch_stats, x, m, rng):
        (m1_hat, m2_hat, attn), mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x, m, r, True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        m1_loss = jnp.abs(m1_hat - m).mean()
        m2_loss = jnp.abs(m2_hat - m).mean()
        return m1_loss + m2_loss, (mutated["batch_stats"], attn, m2_hat)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, x, m, rng):
        (loss, (batch_stats, attn, m2_hat)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, x, m, rng)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, batch_stats=batch_stats, opt_state=opt_state,
            step=state.step + 1,
        )
        return new_state, loss, grad_norm, attn, m2_hat

    return train_step


def tts_train_loop(
    paths: Paths,
    cfg: TacotronConfig,
    state: TrainState,
    optimizer: optax.GradientTransformation,
    train_set,
    r: int,
    lr: float,
    train_steps: int,
    attn_example: str,
    shard_batch: Optional[Callable] = None,
    seed: int = 0,
) -> TrainState:
    model = Tacotron(cfg)
    set_learning_rate(state.opt_state, lr)
    train_step = make_tts_train_step(model, optimizer, r)

    total_iters = len(train_set)
    host_step = state.get_step()
    epochs = max(1, train_steps // max(total_iters, 1) + 1)
    rng = jax.random.PRNGKey(seed + host_step)
    msg = ""
    steps_done = 0
    # see voc_train_loop: scalar fetches are throttled to keep the device
    # dispatch pipeline full; NaN detection lags at most display_every steps
    display_every = max(1, min(10, hp.tts_checkpoint_every))
    state_finite = True   # last fetched loss/grad were finite
    # epoch-end latest saves wall-clock throttled (see voc_train_loop)
    save_min_s = float(hp.get("latest_save_min_interval_s", 30.0))
    last_save = 0.0
    last_plot = 0.0

    for e in range(1, epochs + 1):
        start = time.time()
        running_loss = 0.0
        n_fetched = 0

        for i, (x, m, ids, _) in enumerate(train_set, 1):
            if shard_batch is not None:
                x, m = shard_batch(x, m)
            rng, sub = jax.random.split(rng)
            state, loss, grad_norm, attn, m2_hat = train_step(state, x, m, sub)
            host_step += 1
            steps_done += 1
            step = host_step
            k = step // 1000

            if i % display_every == 0 or step % hp.tts_checkpoint_every == 0 \
                    or steps_done >= train_steps:
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
                    f"Loss: {avg_loss:#.4} | {speed:#.2} steps/s | Step: {k}k | "
                )
                stream(msg)

            # checkpoint boundaries force a scalar fetch above, so this
            # guard costs no extra syncs; a NaN run must never overwrite a
            # good checkpoint pair (ref intent: train_tacotron.py:145-146)
            if step % hp.tts_checkpoint_every == 0 and state_finite:
                save_checkpoint("tts", paths, state,
                                name=f"taco_step{k}K", is_silent=True)

            # attention/mel diagnostics, wall-clock throttled like the
            # latest save (on a tiny corpus the example appears every
            # epoch; a PNG render per step would dominate the loop)
            if attn_example in ids and time.time() - last_plot >= save_min_s:
                last_plot = time.time()
                idx = ids.index(attn_example)
                save_attention(
                    np.asarray(attn)[idx][:, :160], paths.tts_attention / f"{step}"
                )
                save_spectrogram(
                    np.asarray(m2_hat)[idx].T, paths.tts_mel_plot / f"{step}", 600
                )

            if steps_done >= train_steps:
                break

        done = steps_done >= train_steps
        if state_finite and (done or time.time() - last_save >= save_min_s):
            save_checkpoint("tts", paths, state, is_silent=True)
            last_save = time.time()
        append_log(paths.tts_log, msg)
        print(" ")
        if done:
            break

    return state


def run_schedule(
    paths: Paths,
    cfg: TacotronConfig,
    state: TrainState,
    optimizer: optax.GradientTransformation,
    get_datasets: Callable,
    force_train: bool = False,
    train_loop: Callable = None,
    shard_batch: Optional[Callable] = None,
) -> TrainState:
    """Execute the progressive (r, lr, max_step, batch_size) curriculum
    (ref: train_tacotron.py:68-98)."""
    train_loop = train_loop or tts_train_loop

    for i, session in enumerate(hp.tts_schedule):
        current_step = state.get_step()
        r, lr, max_step, batch_size = session
        training_steps = max_step - current_step

        if current_step >= max_step:
            if i == len(hp.tts_schedule) - 1:
                if force_train:
                    training_steps = 999_999_999
                else:
                    break
            else:
                continue

        simple_table([
            (f"Steps with r={r}", str(training_steps // 1000) + "k Steps"),
            ("Batch Size", batch_size),
            ("Learning Rate", lr),
            ("Outputs/Step (r)", r),
        ])

        train_set, attn_example = get_datasets(batch_size, r)
        kwargs = {"shard_batch": shard_batch} if shard_batch is not None else {}
        state = train_loop(
            paths, cfg, state, optimizer, train_set, r, lr,
            training_steps, attn_example, **kwargs,
        )

    return state


def r_for_step(step: int, schedule) -> int:
    """The r of the curriculum session a step falls in (the functional
    equivalent of the reference's checkpointed model.r buffer, ref:
    models/tacotron.py:302-308): sessions are (r, lr, max_step, bs)."""
    for r, _, max_step, _ in schedule:
        if step < max_step:
            return r
    return schedule[-1][0]


def create_gta_features(
    cfg: TacotronConfig,
    state: TrainState,
    train_set,
    save_path: Path,
    r: int,
):
    """Export ground-truth-aligned mel features for vocoder fine-tuning
    (ref: train_tacotron.py:178-198)."""
    from wavernn_tpu.utils.display import progbar

    model = Tacotron(cfg)

    @partial(jax.jit, static_argnames=("r_",))
    def gta_forward(variables, x, m, r_):
        _, gta, _ = model.apply(variables, x, m, r_, False, generate_gta=True)
        return gta

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    iters = len(train_set)
    for i, (x, mels, ids, mel_lens) in enumerate(train_set, 1):
        gta = np.asarray(gta_forward(variables, x, mels, r))
        for j, item_id in enumerate(ids):
            mel = gta[j, : mel_lens[j], :].T  # (n_mels, T) on disk
            mel = (mel + 4) / 8
            np.save(save_path / f"{item_id}.npy", mel, allow_pickle=False)
        stream(f"{progbar(i, iters)} {i}/{iters} Batches ")
