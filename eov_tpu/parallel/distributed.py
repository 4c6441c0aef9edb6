"""Multi-host (DCN) wiring for pod-scale jobs — SURVEY.md §2c comm row.

The reference has no distributed runtime; pod extraction/eval here follows
the standard jax multi-controller recipe: `jax.distributed.initialize` per
host, a global ('data','frame') mesh over all chips, per-host input shards
lifted into global arrays with `make_array_from_process_local_data`, and
XLA/ICI collectives inside the jitted step.

Single-process runs degrade gracefully (process_count == 1) so the same
code path is exercised in tests and on the 1-chip dev box (SURVEY.md §4.5);
the real 2-process path is exercised by tests/test_multihost.py (two local
CPU processes, gloo collectives).
"""

from __future__ import annotations

import logging
import os
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
    "host_local_rows",
    "global_max",
    "barrier",
]

log = logging.getLogger("eov.distributed")

def _cluster_env_detected() -> bool:
    """True when the environment says this process is one of several hosts.

    jax.distributed.initialize() (no args) auto-configures from Cloud TPU
    pod metadata, Slurm and OMPI; EOV_MULTIHOST=1 forces the attempt for
    anything else. Single-worker values must NOT trigger (the axon dev box
    exports an empty-ish TPU_WORKER_HOSTNAMES even with one host).
    """
    env = os.environ
    if env.get("EOV_MULTIHOST") or env.get("JAX_COORDINATOR_ADDRESS") \
            or env.get("MEGASCALE_COORDINATOR_ADDRESS"):
        return True
    hosts = [h for h in env.get("TPU_WORKER_HOSTNAMES", "").split(",") if h]
    if len(hosts) > 1:
        return True
    for var in ("SLURM_JOB_NUM_NODES", "OMPI_COMM_WORLD_SIZE"):
        try:
            if int(env.get(var, "1")) > 1:
                return True
        except ValueError:
            pass
    return False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize multi-controller jax; no-op single-process. Idempotent.

    Three cases:
      * explicit args (tests / manual bring-up): forwarded verbatim;
      * a cluster environment is detected (Cloud TPU pod, Slurm, OMPI, or
        an explicit ``JAX_COORDINATOR_ADDRESS``/``EOV_MULTIHOST=1``):
        ``jax.distributed.initialize()`` auto-configures from it — this is
        the path every ``--multichip`` CLI site reaches on a real pod
        (VERDICT r1: the r1 version required explicit args the CLI never
        passed, silently running single-host);
      * plain single-process run: nothing to do.
    """
    if jax.distributed.is_initialized():
        return
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return
    if _cluster_env_detected():
        jax.distributed.initialize()
        log.info(
            "multi-controller jax initialized: process %d/%d, %d local / %d "
            "global devices", jax.process_index(), jax.process_count(),
            len(jax.local_devices()), len(jax.devices()),
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


def host_local_rows(global_array: jax.Array) -> np.ndarray:
    """This host's rows of a leading-axis-sharded global array, in order.

    Inverse of :func:`host_batch_to_global` on the output side: a
    multi-controller process can only materialize its addressable shards;
    they are returned concatenated in global row order (which, for arrays
    built by host_batch_to_global / produced by the sharded steps, is this
    host's contiguous slice of the global batch).
    """
    # Dedupe by leading-axis offset: outputs sharded P('data') are
    # replicated over the 'frame' axis, so several addressable shards can
    # cover the same rows.
    by_start: dict[int, np.ndarray] = {}
    for s in global_array.addressable_shards:
        start = s.index[0].start or 0
        if start not in by_start:
            by_start[start] = np.asarray(s.data)
    return np.concatenate(
        [by_start[k] for k in sorted(by_start)], axis=0
    )


def global_max(value: int) -> int:
    """Max of a host-local int across all processes (1-process: identity).

    Used to agree on a global step count when hosts hold different numbers
    of records (strided sharding differs by ±1; decode failures differ
    arbitrarily) — every host must enter the same number of collective
    programs or the pod deadlocks.
    """
    if jax.process_count() == 1:
        return int(value)
    from jax.experimental import multihost_utils

    return int(
        np.max(multihost_utils.process_allgather(np.int64(value)))
    )


def barrier(name: str = "eov") -> None:
    """Cross-host sync point (no-op single-process)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
