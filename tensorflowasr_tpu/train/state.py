"""Train state and optimizer/schedule factories.

The reference trains with plain Adam(lr=1e-4, b1=0.9, b2=0.98, eps=1e-6)
(ctc_runners.py:221-222 + optimizer_config in am_data.yml) and *defines* a
transformer warmup schedule it never wires up (train_asr.py:22-35). We
support both: fixed lr by default (parity) and the warmup schedule via
``warmup_steps`` when requested.

Unlike the reference's .h5-per-component checkpoints without optimizer
state (ctc_runners.py:272-325), the full state here — params, batch_stats,
opt_state, step — is one pytree, checkpointed atomically with orbax.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import optax
from flax.training import train_state


class ASRTrainState(train_state.TrainState):
    batch_stats: Any = None


def transformer_schedule(dmodel: int, warmup_steps: int = 10000,
                         peak_scale: float = 1.0) -> optax.Schedule:
    """lr = d^-0.5 * min(step^-0.5, step * warmup^-1.5)."""

    def schedule(step):
        step = jnp.maximum(step.astype(jnp.float32), 1.0)
        return peak_scale * dmodel ** -0.5 * jnp.minimum(
            step ** -0.5, step * warmup_steps ** -1.5)

    return schedule


def make_optimizer(optimizer_config: Optional[dict] = None,
                   dmodel: int = 144,
                   use_warmup: bool = False,
                   grad_clip_norm: Optional[float] = None
                   ) -> optax.GradientTransformation:
    oc = optimizer_config or {}
    lr = oc.get("lr", 1e-4)
    b1 = oc.get("beta1", 0.9)
    b2 = oc.get("beta2", 0.98)
    eps = oc.get("epsilon", 1e-6)
    if use_warmup:
        lr = transformer_schedule(dmodel, oc.get("warmup_steps", 10000))
    txs = []
    if grad_clip_norm:
        txs.append(optax.clip_by_global_norm(grad_clip_norm))
    txs.append(optax.adam(lr, b1=b1, b2=b2, eps=eps))
    tx = optax.chain(*txs)
    # optimizer_config.grad_accum_steps: accumulate k micro-batch grads
    # before applying one update (optax.MultiSteps). The effective batch
    # is k * batch_size without the B>128 HBM-remat cliff
    # (docs/train_step_profile.md). NOTE: changes the optimizer state
    # tree — checkpoints are not interchangeable across k values.
    k = int(oc.get("grad_accum_steps", 1))
    if k > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=k)
    return tx
