"""Multi-host initialization (SURVEY.md C23).

The reference has no multi-node story at all (single-process DataParallel).
Here, multi-host TPU slices initialize through ``jax.distributed`` — the
runtime then exposes all chips of the slice in ``jax.devices()`` and the
mesh/NamedSharding layer (mesh.py) works unchanged, with XLA routing
collectives over ICI within a slice and DCN across slices.

Invocation is env-gated so single-host runs never pay the coordination cost:
set ``WAVERNN_TPU_DISTRIBUTED=1`` (TPU pods auto-detect coordinator/process
ids from the TPU runtime) or provide explicit ``JAX_COORDINATOR_ADDRESS`` /
``JAX_PROCESS_ID`` / ``JAX_NUM_PROCESSES``.
"""

from __future__ import annotations

import os

_initialized = False


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed when the environment requests it.
    Returns True if a multi-process runtime is active."""
    global _initialized
    import jax

    if _initialized:
        return jax.process_count() > 1

    want = os.environ.get("WAVERNN_TPU_DISTRIBUTED") == "1" or (
        "JAX_COORDINATOR_ADDRESS" in os.environ
    )
    if not want:
        return False

    kwargs = {}
    if "JAX_COORDINATOR_ADDRESS" in os.environ:
        kwargs["coordinator_address"] = os.environ["JAX_COORDINATOR_ADDRESS"]
    if "JAX_PROCESS_ID" in os.environ:
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    if "JAX_NUM_PROCESSES" in os.environ:
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])

    jax.distributed.initialize(**kwargs)
    _initialized = True
    return jax.process_count() > 1
