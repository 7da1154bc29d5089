"""Multi-host initialization (SURVEY.md §5: distributed backend).

The reference has no distributed layer (single GPU); the TPU framework's
distributed story is deliberately thin: `jax.distributed.initialize` wires
hosts over DCN, the scene broadcasts once per frame (it is identical on
every host), and all cross-chip traffic is the ray-DP sharding in
parallel/mesh.py riding ICI. There is no NCCL/MPI analog to port — XLA
collectives are the backend.

On a single-process run every function here is a no-op / passthrough, so
the same program runs unchanged from a laptop CPU to a multi-host slice.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Wire up multi-host JAX. No-op when single-process (the common case
    in tests and single-chip benches). Arguments mirror
    jax.distributed.initialize; when omitted, env-based auto-detection is
    used (TPU pods populate it)."""
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except RuntimeError:
        # Already initialized (idempotent callers) — fine.
        pass


def process_count() -> int:
    return jax.process_count()


def is_coordinator() -> bool:
    return jax.process_index() == 0


def global_mesh(axis: str = "rays"):
    """Mesh over ALL devices in the job (all hosts); rays shard over it.

    With multiple hosts each process feeds its local shard of the ray
    batch (jax.make_array_from_process_local_data) and reads back only its
    local hits — the image assembles on the coordinator."""
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))
