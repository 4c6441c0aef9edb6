"""Multi-host (DCN) wiring for pod-scale jobs — SURVEY.md §2c comm row.

The reference has no distributed runtime; pod extraction/eval here follows
the standard jax multi-controller recipe: `jax.distributed.initialize` per
host, a global ('data','frame') mesh over all chips, per-host input shards
lifted into global arrays with `make_array_from_process_local_data`, and
XLA/ICI collectives inside the jitted step.

Single-process runs degrade gracefully (process_count == 1) so the same
code path is exercised in tests and on the 1-chip dev box (SURVEY.md §4.5).
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from eov_tpu.parallel.mesh import DATA_AXIS, make_mesh

__all__ = [
    "initialize",
    "global_mesh",
    "process_record_shard",
    "host_batch_to_global",
]


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize multi-controller jax if configured; no-op single-process.

    On TPU pods the arguments come from the environment automatically; the
    explicit arguments support CPU/GPU bring-up and tests.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    # else: single-process — nothing to do.


def global_mesh(n_frame: int = 1) -> Mesh:
    """('data','frame') mesh over every chip of every host."""
    return make_mesh(n_frame=n_frame, devices=jax.devices())


def process_record_shard(records: Sequence, *,
                         process_index: int | None = None,
                         process_count: int | None = None) -> list:
    """The records this host is responsible for (strided assignment).

    Striding (rather than contiguous blocks) keeps per-host work balanced
    when clip durations correlate with dataset order.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(records[pi::pc])


def host_batch_to_global(mesh: Mesh, host_array: np.ndarray,
                         axis: str = DATA_AXIS) -> jax.Array:
    """Lift a per-host input batch into a global sharded array.

    host_array's leading dim is this host's shard; the result is the global
    [world_batch, ...] array sharded over `axis` — the input contract of the
    sharded extraction/eval steps.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, host_array)
