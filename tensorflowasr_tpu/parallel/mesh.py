"""Device mesh + sharding utilities — the distributed story of the framework.

Replaces the reference's ``tf.distribute.MirroredStrategy`` single-node data
parallelism (asr/trainer/base_runners.py:74-79 in Z-yq/TensorflowASR) with
JAX GSPMD: a named mesh over ICI/DCN, batch-sharded inputs, replicated
params, and XLA-inserted collectives (grad psum happens implicitly when a
jit-compiled train step reduces a batch-sharded loss).

The 10-15M-param ASR models replicate per chip; DP over a ``data`` axis is
the whole scaling story (SURVEY.md §2.11). Multi-host: call
``jax.distributed.initialize()`` before ``make_mesh`` and feed each host its
own batch shard via ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_names: Sequence[str] = ("data",),
              shape: Optional[Tuple[int, ...]] = None,
              devices=None) -> Mesh:
    """Build a mesh over all (or the given) devices.

    Default: 1-D ``data`` axis over every device. For multi-host slices pass
    shape=(n_hosts, devices_per_host) with axis_names=('dcn_data', 'data')
    so DP gradient reductions ride ICI first, DCN second.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def make_data_mesh(global_batch: int, devices=None) -> Mesh:
    """1-D ``data`` mesh over the largest device count that divides the
    global batch (a batch smaller than the device count cannot be
    batch-sharded; XLA requires even division)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    k = max(d for d in range(1, n + 1) if global_batch % d == 0)
    return make_mesh(devices=devices[:k])


def batch_spec(mesh: Mesh) -> P:
    """PartitionSpec sharding the leading (batch) axis over every mesh axis."""
    return P(tuple(mesh.axis_names))


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of [B, ...] arrays sharded over the batch axis."""

    def put(x):
        spec = P(tuple(mesh.axis_names)) if np.ndim(x) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated on the mesh (params/opt state)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def data_parallel_shardings(mesh: Mesh):
    """(replicated, batch-sharded) NamedShardings for jit in/out_shardings."""
    return NamedSharding(mesh, P()), NamedSharding(mesh, batch_spec(mesh))


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.devices.size
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} devices")
    return global_batch // n
