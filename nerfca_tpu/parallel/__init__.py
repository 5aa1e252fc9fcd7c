"""SPMD parallelism over a ``jax.sharding.Mesh``.

The reference is strictly single-process single-GPU (SURVEY §2.5); there is
no distributed code to mirror. The TPU-native design:

  - **Data parallelism** (the workhorse): the per-step ray batch is sharded
    over the ``'data'`` mesh axis; parameters are replicated; GSPMD inserts
    the single gradient all-reduce (a ``psum`` over ICI). See
    :mod:`nerfca_tpu.parallel.mesh`.
  - **Depth (ray-segment) parallelism** — the honest analog of sequence
    parallelism for this workload: the S depth samples of each ray are
    sharded over a ``'depth'`` axis and the partial Beer-Lambert line
    integrals are ``psum``-med. Cheap because the renderer is a pure sum
    (``model_helpers.py:82,95``). See :mod:`nerfca_tpu.parallel.depth_shard`.

Both compose on a 2-D ``('data', 'depth')`` mesh.
"""

from nerfca_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicate,
    shard_batch,
)
from nerfca_tpu.parallel.depth_shard import depth_sharded_render

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicate",
    "shard_batch",
    "depth_sharded_render",
]
