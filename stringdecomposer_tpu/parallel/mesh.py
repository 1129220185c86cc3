"""Device mesh construction and (optional) multi-host initialization.

The parallelism model (SURVEY.md §2): windows are the data-parallel axis —
the reference's OpenMP `parallel for` over read chunks (src/main.cpp:86-102)
becomes a 1-D "data" mesh over all chips; the monomer tensor (KBs) is
replicated in every chip's HBM; result assembly is a deterministic host-side
merge keyed by (read order, window offset), so no collective rides the
output path and output bytes are independent of device count.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def get_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def initialize_distributed(coordinator: str | None = None, num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up (jax.distributed). Reads are sharded per host by
    the caller (parallel/multihost.py shard_indices); DCN carries only input
    distribution and the final TSV-fragment merge."""
    kwargs = {}
    if coordinator:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
            # heavily loaded hosts can take minutes to reach this point
            # (cold imports + compiles); don't let the barrier give up first
            initialization_timeout=600,
        )
    jax.distributed.initialize(**kwargs)
