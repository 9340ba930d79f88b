"""Tensor parallelism for the Conformer family — Megatron-style sharding
expressed as GSPMD sharding rules (no manual collectives).

The reference framework's only parallelism is single-node data
parallelism (tf.distribute.MirroredStrategy,
asr/trainer/base_runners.py:74-79); this module goes beyond it: the
encoder's FF and attention weights shard over a ``model`` mesh axis and
XLA inserts the (all-reduce) collectives where the Megatron pattern
needs them:

- ``ffn1`` ([d, 4d], column-parallel: output features sharded) then
  ``ffn2`` ([4d, d], row-parallel: input features sharded) — one
  all-reduce after ffn2, none in between;
- MHA ``query/key/value`` kernels ([d, heads, head_size], heads sharded
  — each device computes its own heads end-to-end) then ``out``
  ([heads, head_size, d], row-parallel over heads) — one all-reduce
  after the output projection.

The rules match by layer NAME (ffn1/ffn2/mha), so every ConformerBlock
stack shards — the encoder AND the 1-block ctcdecoder/translator stacks;
convs, norms, and embeddings replicate: at
10-15M params the win is NOT memory but the mechanism — the same rules
scale the bigger variants, and a ("data", "model") mesh composes TP
with the DP story in parallel/mesh.py (batch shards over ``data``
only). Collectives ride ICI when the ``model`` axis is the
fastest-varying mesh dimension.

Numerical parity with the replicated step is tested on the virtual
8-device CPU mesh (tests/test_tp.py); the driver's multi-chip dryrun
runs a (data x model) sharded train step end-to-end
(__graft_entry__.py).
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# leaf-path regex -> PartitionSpec over the "model" axis. Paths are
# "/"-joined flax param paths, e.g.
# encoder/conformer_block_0/ff_module_1/ffn1/kernel
_TP_RULES = [
    (re.compile(r"ffn1/kernel$"), P(None, "model")),
    (re.compile(r"ffn1/bias$"), P("model")),
    (re.compile(r"ffn2/kernel$"), P("model", None)),
    (re.compile(r"mha/(query|key|value)/kernel$"), P(None, "model", None)),
    (re.compile(r"mha/(query|key|value)/bias$"), P("model", None)),
    (re.compile(r"mha/out/kernel$"), P("model", None, None)),
]


def tp_spec(path: str, leaf=None) -> P:
    """PartitionSpec for one param leaf path (replicated if no rule, or
    if the sharded dimension does not divide — e.g. 4 heads on an 8-wide
    model axis stay replicated rather than erroring)."""
    for rx, spec in _TP_RULES:
        if rx.search(path):
            return spec
    return P()


def _key_str(k) -> str:
    if hasattr(k, "key"):
        return str(k.key)
    if hasattr(k, "idx"):
        return str(k.idx)
    if hasattr(k, "name"):
        return str(k.name)
    return str(k)


def _paths(tree) -> Any:
    """Pytree of '/'-joined key paths, same structure as ``tree``."""
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: "/".join(_key_str(k) for k in kp), tree)


def _divides(spec: P, leaf, mesh: Mesh) -> bool:
    axis = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)
    shape = np.shape(leaf)
    for dim, name in enumerate(spec):
        if name == "model" and (dim >= len(shape)
                                or shape[dim] % axis != 0):
            return False
    return True


def shard_params_tp(params, mesh: Mesh):
    """device_put each param leaf with its TP sharding over ``mesh``
    (which must have a ``model`` axis; other axes replicate params)."""

    def put(path, leaf):
        spec = tp_spec(path)
        if not _divides(spec, leaf, mesh):
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(put, _paths(params), params)


def shard_state_tp(state, mesh: Mesh):
    """Shard a full ASRTrainState with one path-based pass: optimizer
    moments (adam mu/nu) mirror the param tree's key names, so the same
    leaf-path rules shard them identically; every other leaf (counts,
    step, batch_stats, norms) replicates."""

    def put(kp, leaf):
        path = "/".join(_key_str(k) for k in kp)
        spec = tp_spec(path)
        if not _divides(spec, leaf, mesh):
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, state)


def shard_batch_dp(batch, mesh: Mesh):
    """Batch sharded over the ``data`` axis ONLY (TP meshes have a
    ``model`` axis that must not split the batch)."""

    def put(x):
        spec = P(("data",)) if np.ndim(x) >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)
