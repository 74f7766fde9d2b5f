"""Multi-host orchestration over DCN.

The reference is a single process (`std::sync::mpsc` + scoped threads,
main.rs:98,151); its distributed analog here (SURVEY.md section 5):

- `initialize()` wires `jax.distributed` so all hosts join one runtime;
  the global mesh then spans hosts, `lax.ppermute` halo exchange rides
  ICI within a slice and DCN across slices.
- Each host feeds its local byte-stream shards (`host_shard_range`),
  device scan produces run tables sharded over the "data" axis, and
  `gather_run_tables` all-gathers the (small) tables so host 0 can run
  the emission automaton and print globally ordered output - the
  distributed version of the reference's kmerge.

Multi-host execution needs an actual pod slice; single-host tests cover
the mesh semantics on the virtual CPU mesh (tests/test_parallel.py) and
the driver dry-runs the N-device compile (dryrun_multichip).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-host JAX runtime (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_shard_range(total_bytes: int, shard_len: int) -> Tuple[int, int]:
    """Byte range this host feeds: contiguous run of data-shards."""
    nproc = jax.process_count()
    pid = jax.process_index()
    nshards = total_bytes // shard_len
    per = (nshards + nproc - 1) // nproc
    lo = min(pid * per, nshards)
    hi = min(lo + per, nshards)
    return lo * shard_len, hi * shard_len


def gather_run_tables(rt):
    """Bring the sharded run tables to every host (they are small:
    capacity-bounded per shard/mission). With jax.Array + a global mesh
    this is a device_get of the globally-sharded value; XLA inserts the
    cross-host transfers."""
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), rt)
