"""Multi-host data parallelism utilities.

The reference is single-node only (train_asr.py:107-110 warns multi-card
on ONE machine; MirroredStrategy). Here multi-host DP is first-class
(SURVEY.md §2.11): ICI within a slice, DCN across slices, with

- :func:`initialize`      — ``jax.distributed`` bootstrap (no-op when
  single-process);
- :func:`make_hybrid_mesh` — ('dcn_data', 'data') mesh so gradient
  reductions ride ICI first and DCN second;
- :func:`host_local_batch` — assemble a globally-sharded batch from each
  host's local shard (replaces AutoShardPolicy.DATA);
- :func:`process_batch_slice` — which rows of the global batch this host
  must load.

Per-host dataloaders must keep STEP SHAPES IDENTICAL across hosts (pjit
requirement) — the bucketed loaders guarantee this when seeded per host
with the same bucket layout.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bootstrap jax.distributed when running multi-process; safe no-op
    for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_hybrid_mesh(axis_names: Tuple[str, str] = ("dcn_data", "data")
                     ) -> Mesh:
    """(n_hosts, devices_per_host) mesh: DP over both axes, collectives
    hierarchical (ICI inside a host/slice, DCN across)."""
    n_proc = jax.process_count()
    n_local = jax.local_device_count()
    devices = np.asarray(jax.devices()).reshape(n_proc, n_local)
    return Mesh(devices, axis_names)


def data_spec(mesh: Mesh) -> P:
    return P(tuple(mesh.axis_names))


def process_batch_slice(global_batch: int) -> slice:
    """Rows of the global batch this process should produce."""
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def host_local_batch(local_batch: Dict[str, np.ndarray], mesh: Mesh
                     ) -> Dict[str, jax.Array]:
    """Assemble global jax.Arrays from per-host local shards
    (jax.make_array_from_process_local_data)."""
    spec = data_spec(mesh)

    def put(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, spec if x.ndim >= 1 else P())
        return jax.make_array_from_process_local_data(sharding, x)

    return {k: put(v) for k, v in local_batch.items()}
