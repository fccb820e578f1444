"""Mesh construction + sharding placement (SURVEY.md C23).

Design: the idiomatic XLA-SPMD recipe — build a ``jax.sharding.Mesh``,
annotate data and parameters with NamedShardings, and let the compiler
insert the collectives (gradient psum over ICI replaces the reference's
DataParallel scatter/gather).

Axes:
  * ``data``  — batch-dimension data parallelism for training, and the fold
    dimension in batched generation (sequence-parallel synthesis: folds of
    one long utterance decode on different chips and crossfade on host).
  * ``model`` — tensor parallelism over the hidden/gate dimension of the big
    recurrent matmuls and FC heads (used when a chip count exceeds what the
    batch can feed).

Multi-host: ``jax.distributed.initialize`` is invoked by the CLIs when the
environment provides coordinator settings; this module only sees the global
device list.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass
class MeshPlan:
    """A mesh plus the partition specs used by the training/generation paths."""

    mesh: Mesh

    @property
    def n_data(self) -> int:
        return self.mesh.shape["data"]

    @property
    def n_model(self) -> int:
        return self.mesh.shape["model"]

    def data_sharding(self, ndim: int) -> NamedSharding:
        """Batch-leading arrays: shard dim 0 over 'data'."""
        return NamedSharding(self.mesh, P("data", *([None] * (ndim - 1))))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())


def make_mesh(shape: Optional[Dict[str, int]] = None,
              devices=None) -> MeshPlan:
    """Build a (data, model) mesh.

    ``shape`` e.g. {"data": 4, "model": 2}; None uses all devices on the data
    axis (pure DP) — the reference's DataParallel semantics, minus the bug
    workaround.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = {"data": n, "model": 1}
    n_data = shape.get("data", 1)
    n_model = shape.get("model", 1)
    if n_data * n_model != n:
        raise ValueError(
            f"mesh shape {shape} does not match device count {n}"
        )
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return MeshPlan(Mesh(dev_array, axis_names=("data", "model")))


def shard_batch_fn(plan: MeshPlan) -> Callable:
    """Returns a function placing numpy batch arrays onto the mesh with the
    batch dim sharded over 'data'.  Batch size must divide n_data (the
    reference enforces the same divisibility, ref: train_wavernn.py:45-46)."""

    def place(*arrays):
        out = []
        for a in arrays:
            a = np.asarray(a)
            if a.shape[0] % plan.n_data != 0:
                raise ValueError(
                    f"batch size {a.shape[0]} must be divisible by the data-"
                    f"parallel degree {plan.n_data}"
                )
            out.append(jax.device_put(a, plan.data_sharding(a.ndim)))
        return tuple(out)

    return place


# -- parameter sharding rules -------------------------------------------------------


_MATRIX_NAMES = ("w_ih", "w_hh", "kernel")
_BIAS_FOR = {"w_ih": ("b_ih",), "w_hh": ("b_hh",), "kernel": ("bias",)}


def make_param_specs(params, n_model: int):
    """Tensor-parallel PartitionSpec pytree for WaveRNN/Tacotron params.

    Gate-blocked recurrent matrices (w_ih/w_hh: (in, G*H)) and Dense kernels
    shard their *output* dimension over 'model'.  A 1-D bias shards ONLY
    when a sibling matrix in the same module shards its output dim — so
    BatchNorm ``bias`` leaves (whose sibling is ``scale``, not a kernel)
    stay replicated next to their scale, and conv kernels (3-D) plus their
    biases stay replicated too.  Anything that does not tile evenly over
    ``n_model`` is replicated.  XLA inserts the all-gathers/reduce-scatters
    this layout implies.
    """

    def module_specs(node):
        if not isinstance(node, dict):
            return node
        leaves = {k: v for k, v in node.items() if hasattr(v, "ndim")}
        specs = {}
        sharded_bias_names = set()
        for name, leaf in leaves.items():
            if (name in _MATRIX_NAMES and leaf.ndim == 2
                    and leaf.shape[1] % n_model == 0):
                specs[name] = P(None, "model")
                sharded_bias_names.update(_BIAS_FOR[name])
            else:
                specs[name] = P()
        for name, leaf in leaves.items():
            if (name in sharded_bias_names and leaf.ndim == 1
                    and leaf.shape[0] % n_model == 0):
                specs[name] = P("model")
        for k, v in node.items():
            if k not in leaves:
                specs[k] = module_specs(v)
        return specs

    return module_specs(params)


def shard_params(plan: MeshPlan, params, tensor_parallel: bool = True):
    """Place a parameter pytree on the mesh (replicated, or TP over 'model')."""
    mesh = plan.mesh
    if not tensor_parallel or plan.n_model == 1:
        repl = NamedSharding(mesh, P())
        return jax.tree_util.tree_map(lambda l: jax.device_put(l, repl), params)

    specs = make_param_specs(params, plan.n_model)

    # manual walk: PartitionSpec is a tuple subclass, so a tree_map over
    # (params, specs) would descend into the specs themselves
    def place(node, spec):
        if isinstance(node, dict):
            return {k: place(v, spec[k]) for k, v in node.items()}
        return jax.device_put(node, NamedSharding(mesh, spec))

    return place(params, specs)


def shard_folds_decode(plan: MeshPlan, decode_fn: Callable,
                       weights, mels_f, aux_f, key):
    """Sequence-parallel generation across chips: the fold axis of one long
    utterance's batched decode is sharded over the mesh's 'data' axis and
    each chip runs the (per-chip) decode program — scan or the fused Pallas
    kernel — on its fold shard (SURVEY.md §5: the reference only folds
    intra-device; here folds fan out over ICI).

    ``decode_fn(weights, mels_f, aux_f, key) -> samples`` must be shape-
    polymorphic in the fold dimension.  The PRNG key is folded with the
    shard index so shards draw independent sample streams.

    Returns (num_folds, T) samples with the same global layout as the
    unsharded call.
    """
    from jax.experimental.shard_map import shard_map

    spec = P("data", None, None)

    def per_shard(w, m, a, k):
        k = jax.random.fold_in(k, jax.lax.axis_index("data"))
        return decode_fn(w, m, a, k)

    fn = shard_map(
        per_shard, mesh=plan.mesh,
        in_specs=(P(), spec, spec, P()),
        out_specs=P("data", None),
        check_rep=False,
    )
    return fn(weights, mels_f, aux_f, key)


def shard_cond_decode(plan: MeshPlan, decode_fn: Callable,
                      weights, cond, key):
    """Sequence-parallel generation over a PACKED conditioning stream: the
    fold axis (axis 1 of the kernel's (T_pad, B_pad, SEG) conditioning,
    built by pallas_decode.pack_cond_stream) is sharded over 'data' and
    each chip runs ``decode_fn(weights, cond_shard, key) -> (B_local, T)``
    on its fold shard — the Pallas kernel's multi-chip serving layout.

    The PRNG key is folded with the shard index so shards draw independent
    sample streams.  Returns (B_pad, T) with the unsharded layout.
    """
    from jax.experimental.shard_map import shard_map

    def per_shard(w, c, k):
        k = jax.random.fold_in(k, jax.lax.axis_index("data"))
        return decode_fn(w, c, k)

    fn = shard_map(
        per_shard, mesh=plan.mesh,
        in_specs=(P(), P(None, "data", None), P()),
        out_specs=P("data", None),
        check_rep=False,
    )
    return fn(weights, cond, key)
