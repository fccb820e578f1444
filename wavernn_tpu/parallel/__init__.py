"""Device-mesh parallelism (supersedes the reference's single-process
DataParallel, ref: utils/__init__.py:19-36)."""

from wavernn_tpu.parallel.mesh import (  # noqa: F401
    MeshPlan,
    make_mesh,
    shard_batch_fn,
    shard_params,
)
