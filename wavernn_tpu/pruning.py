"""Magnitude pruning with a cubic sparsity ramp (SURVEY.md C21).

The WaveRNN paper's sparse-pruning scheme, prototyped in the reference's
``notebooks/Pruning - Scratchpad.ipynb`` (``PruneMask`` / ``Pruner``):
   z(t) = Z * (1 - (1 - (t - t0)/S)^3)   for t in [t0, t0 + S]
Per-matrix magnitude masks are recomputed every ``prune_every`` steps; GRU
weight matrices are masked *per gate block* so each gate keeps its own
top-magnitude weights.

JAX-native design: masks live in a separate pytree (same structure as the
pruned params); applying them is one fused elementwise multiply inside the
jitted train step; mask recomputation is a jitted top-k threshold per leaf.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class PruneConfig:
    target_sparsity: float = 0.9375        # Z in the paper's schedule
    start_step: int = 20_000                # t0
    ramp_steps: int = 480_000               # S
    prune_every: int = 500
    gate_splits: int = 3                    # GRU gate blocks (LSTM: 4)


def sparsity_at(step, cfg: PruneConfig):
    """Cubic ramp z(t); 0 before start, Z after the ramp completes."""
    t = jnp.asarray(step, jnp.float32)
    frac = jnp.clip((t - cfg.start_step) / cfg.ramp_steps, 0.0, 1.0)
    return cfg.target_sparsity * (1.0 - (1.0 - frac) ** 3)


def _block_mask(w: jnp.ndarray, z, n_blocks: int) -> jnp.ndarray:
    """Keep the top-(1-z) magnitude entries independently per output-gate
    block of a (in, n_blocks*H) matrix."""
    in_dim, out_dim = w.shape
    H = out_dim // n_blocks
    blocks = w.reshape(in_dim, n_blocks, H).transpose(1, 0, 2).reshape(n_blocks, -1)
    mag = jnp.abs(blocks)
    n = mag.shape[1]
    k = jnp.clip((z * n).astype(jnp.int32), 0, n - 1)
    srt = jnp.sort(mag, axis=1)  # ascending
    thresh = jnp.take_along_axis(
        srt, jnp.full((n_blocks, 1), k, dtype=jnp.int32), axis=1
    )
    mask = (mag >= thresh).astype(w.dtype)
    return (
        mask.reshape(n_blocks, in_dim, H).transpose(1, 0, 2).reshape(in_dim, out_dim)
    )


def _full_mask(w: jnp.ndarray, z) -> jnp.ndarray:
    mag = jnp.abs(w).reshape(-1)
    n = mag.shape[0]
    k = jnp.clip((z * n).astype(jnp.int32), 0, n - 1)
    thresh = jnp.sort(mag)[k]
    return (jnp.abs(w) >= thresh).astype(w.dtype)


def default_prunable(path: Tuple, leaf) -> Optional[str]:
    """Which leaves to prune: the big recurrent/dense matrices.

    Returns 'gated' (per-gate-block mask), 'full', or None.  Mirrors the
    reference prototype's choice of Linear/GRU weights."""
    names = "/".join(str(getattr(p, "key", p)) for p in path)
    if leaf.ndim != 2:
        return None
    if "w_ih" in names or "w_hh" in names:
        return "gated"
    if "kernel" in names and min(leaf.shape) >= 64:
        return "full"
    return None


class Pruner:
    """Stateful scheduler mirroring the reference's ``Pruner`` (recompute
    masks on a cadence, cubic sparsity ramp, restart-safe because everything
    derives from the step counter)."""

    def __init__(self, cfg: PruneConfig,
                 prunable: Callable = default_prunable):
        self.cfg = cfg
        self.prunable = prunable

        def compute(params, step):
            z = sparsity_at(step, cfg)

            def leaf_mask(path, w):
                kind = self.prunable(path, w)
                if kind == "gated" and w.shape[1] % cfg.gate_splits == 0:
                    return _block_mask(w, z, cfg.gate_splits)
                if kind in ("gated", "full"):
                    return _full_mask(w, z)
                return jnp.ones_like(w)

            return jax.tree_util.tree_map_with_path(leaf_mask, params)

        self._compute = jax.jit(compute)

    def init_masks(self, params):
        return jax.tree_util.tree_map(jnp.ones_like, params)

    def maybe_update(self, masks, params, step: int):
        """Recompute masks on the prune cadence (host-side decision, like the
        reference's ``step % prune_every == 0``)."""
        if step >= self.cfg.start_step and step % self.cfg.prune_every == 0:
            return self._compute(params, step)
        return masks

    def masks_for_resume(self, params, step: int):
        """Reconstruct the active masks when resuming from a checkpoint at
        ``step``.  Sparsity state needs no extra checkpoint payload: the
        train step stores params MASKED (pruned weights are exactly zero on
        disk), the ramp z(t) derives from the step counter, and zero-
        magnitude weights sort below any positive threshold — so recomputing
        the mask at the last cadence point reproduces the pre-restart mask
        exactly."""
        step0 = (step // self.cfg.prune_every) * self.cfg.prune_every
        if step0 >= self.cfg.start_step:
            return self._compute(params, step0)
        return self.init_masks(params)

    @staticmethod
    def apply(masks, params):
        """Elementwise mask application (jit-fusable)."""
        return jax.tree_util.tree_map(lambda m, p: m * p, masks, params)


def make_pruner_from_hp(hp) -> Optional["Pruner"]:
    """Build a Pruner from the ``voc_prune_*`` hparams (None when pruning is
    off).  Engaged by voc_train_loop so sparse training is reachable from
    train_wavernn.py — productionizing the reference's notebook prototype
    (ref: notebooks/Pruning - Scratchpad.ipynb, prune_every=500 cubic
    ramp)."""
    if not hp.get("voc_prune", False):
        return None
    cfg = PruneConfig(
        target_sparsity=hp.get("voc_prune_target_sparsity", 0.9375),
        start_step=hp.get("voc_prune_start", 20_000),
        ramp_steps=hp.get("voc_prune_ramp", 480_000),
        prune_every=hp.get("voc_prune_every", 500),
    )
    return Pruner(cfg)


def measured_sparsity(masks) -> float:
    """Fraction of zeroed weights across all masked leaves."""
    leaves = jax.tree_util.tree_leaves(masks)
    total = sum(l.size for l in leaves)
    zeros = sum(float((l == 0).sum()) for l in leaves)
    return zeros / total
