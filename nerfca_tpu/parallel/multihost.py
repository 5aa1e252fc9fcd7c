"""Multi-host (DCN) support.

SURVEY §2.5/§5: the reference has no distributed communication at all; at
its problem scale, cross-host training traffic is unnecessary — a TPU pod
slice's ICI covers data parallelism within a host's chips, and DCN is only
needed to (a) bring up a multi-host slice as one JAX process group and
(b) run independent sweep workers.

This module provides both:
  - :func:`initialize` wraps ``jax.distributed.initialize`` (coordinator
    discovery via the standard TPU environment or explicit args) so a
    multi-host slice presents all its devices to ``make_mesh``;
  - :func:`shard_sweep` statically partitions a sweep grid across hosts —
    each host trains its share independently (the reference's wandb agent
    model, without the service).
"""

from __future__ import annotations

import warnings
from typing import Optional, Sequence

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    *,
    strict: Optional[bool] = None,
) -> dict:
    """Bring up the JAX process group on a multi-host slice.

    With no arguments, relies on the TPU environment's automatic discovery
    (the standard path on Cloud TPU pods). Returns a summary dict; safe to
    call on a single host.

    ``strict`` controls failure handling and defaults to True whenever any
    explicit coordinator argument is given: a misconfigured pod must raise,
    not silently degrade to single-process training. The zero-argument
    auto-discovery path defaults to non-strict (plain single-host runs are
    expected to fall through), but still warns on unexpected errors."""
    explicit = any(
        v is not None for v in (coordinator_address, num_processes, process_id)
    )
    if strict is None:
        strict = explicit
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:
        already = "already initialized" in str(e).lower()
        if not already:
            if strict:
                raise
            warnings.warn(
                f"jax.distributed.initialize failed ({e}); continuing "
                f"single-process"
            )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def shard_sweep(grid: Sequence, process_id: Optional[int] = None,
                process_count: Optional[int] = None) -> list:
    """This host's share of a sweep grid (round-robin by process index)."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if process_count is None else process_count
    return [item for i, item in enumerate(grid) if i % n == pid]
