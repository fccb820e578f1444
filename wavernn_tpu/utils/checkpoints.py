"""Checkpoint save/restore (ref: utils/checkpoints.py).

Contracts kept from the reference:
  * weights and optimizer state live in *paired* files; exactly 0 or 2 of a
    pair may exist, anything else raises (corruption detector),
  * a 'latest' pair is always rewritten; named snapshots are additive,
  * ``create_if_missing`` bootstraps a fresh run,
  * the training step counter travels with the weights so resume restores
    schedule position.

Format: flax.serialization msgpack of pytree state-dicts (device-agnostic;
restore maps arrays onto whatever platform the caller initialized on).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional, Tuple

import numpy as np
from flax import serialization

from wavernn_tpu.paths import Paths


def save_pytree(pytree: Any, path: Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    state = serialization.to_state_dict(pytree)
    path.write_bytes(serialization.msgpack_serialize(state))


def load_pytree(template: Any, path: Path) -> Any:
    state = serialization.msgpack_restore(Path(path).read_bytes())
    return serialization.from_state_dict(template, state)


def get_checkpoint_paths(checkpoint_type: str, paths: Paths):
    if checkpoint_type == "tts":
        return paths.tts_latest_weights, paths.tts_latest_optim, paths.tts_checkpoints
    if checkpoint_type == "voc":
        return paths.voc_latest_weights, paths.voc_latest_optim, paths.voc_checkpoints
    raise NotImplementedError(checkpoint_type)


def _model_blob(state) -> dict:
    """Model-only payload: weights + norm stats + step (no optimizer data,
    matching the reference's model.save contract)."""
    return {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "step": np.asarray(state.step),
    }


def save_checkpoint(checkpoint_type: str, paths: Paths, state, *,
                    name: Optional[str] = None, is_silent: bool = False) -> None:
    """Write the latest pair (always) and optionally a named snapshot pair."""

    def helper(w_path: Path, o_path: Path, is_named: bool):
        s = "named" if is_named else "latest"
        num_exist = sum(p.exists() for p in (w_path, o_path))
        if num_exist not in (0, 2):
            raise FileNotFoundError(
                f"Expected both or neither file of the {s} checkpoint to "
                "exist, but found exactly one!"
            )
        if not is_silent:
            verb = "Creating" if num_exist == 0 else "Saving to existing"
            print(f"{verb} {s} checkpoint...")
            print(f"Saving {s} weights: {w_path}")
        save_pytree(_model_blob(state), w_path)
        if not is_silent:
            print(f"Saving {s} optimizer state: {o_path}")
        save_pytree({"opt_state": state.opt_state}, o_path)

    weights_path, optim_path, checkpoint_path = get_checkpoint_paths(
        checkpoint_type, paths
    )
    helper(weights_path, optim_path, False)
    if name:
        helper(
            checkpoint_path / f"{name}_weights.msgpack",
            checkpoint_path / f"{name}_optim.msgpack",
            True,
        )


def restore_checkpoint(checkpoint_type: str, paths: Paths, state, *,
                       name: Optional[str] = None,
                       create_if_missing: bool = False):
    """Restore a training state from disk (template = freshly-initialized
    ``state``).  Returns the restored state."""
    weights_path, optim_path, checkpoint_path = get_checkpoint_paths(
        checkpoint_type, paths
    )
    if name:
        w_path = checkpoint_path / f"{name}_weights.msgpack"
        o_path = checkpoint_path / f"{name}_optim.msgpack"
        s = "named"
    else:
        w_path, o_path, s = weights_path, optim_path, "latest"

    num_exist = sum(p.exists() for p in (w_path, o_path))
    if num_exist == 2:
        print(f"Restoring from {s} checkpoint...")
        print(f"Loading {s} weights: {w_path}")
        blob = load_pytree(_model_blob(state), w_path)
        print(f"Loading {s} optimizer state: {o_path}")
        opt = load_pytree({"opt_state": state.opt_state}, o_path)
        return state.replace(
            params=blob["params"],
            batch_stats=blob["batch_stats"],
            step=int(np.asarray(blob["step"])),
            opt_state=opt["opt_state"],
        )
    if create_if_missing:
        save_checkpoint(checkpoint_type, paths, state, name=name, is_silent=False)
        return state
    raise FileNotFoundError(f"The {s} checkpoint could not be found!")


def load_weights(state, path: Path):
    """Load a weights-only file onto a state (inference path, ref
    WaveRNN.load).  Optimizer state is untouched."""
    blob = load_pytree(_model_blob(state), path)
    return state.replace(
        params=blob["params"],
        batch_stats=blob["batch_stats"],
        step=int(np.asarray(blob["step"])),
    )


def save_weights(state, path: Path):
    """Save a weights-only file (ref WaveRNN.save: no optimizer data)."""
    save_pytree(_model_blob(state), path)
