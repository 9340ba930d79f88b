"""Training knobs added with the round-3 profile analysis
(docs/train_step_profile.md): gradient accumulation
(optimizer_config.grad_accum_steps -> optax.MultiSteps) and
model_config.remat_blocks (jax.checkpoint per encoder block — backward
recomputes activations instead of storing them past the HBM cliff)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowasr_tpu.models.conformer import ConformerCTC, ConformerConfig
from tensorflowasr_tpu.train.asr_trainer import (
    _loss_and_metrics, make_train_step)
from tensorflowasr_tpu.train.state import ASRTrainState, make_optimizer

N_PHONE, N_CHAR = 12, 16


def tiny_cfg(**kw):
    return ConformerConfig(dmodel=16, num_blocks=2, head_size=8,
                           num_heads=2, kernel_size=8, dropout=0.0,
                           ctcdecoder_num_blocks=1, ctcdecoder_dropout=0.0,
                           translator_num_blocks=1, translator_dropout=0.0,
                           **kw)


def tiny_batch(b=2, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "wav": jnp.asarray(
            rng.standard_normal((b, 8000)).astype(np.float32) * 0.1),
        "input_length": jnp.full((b,), 13, jnp.int32),
        "phones": jnp.asarray(
            rng.integers(1, N_PHONE - 1, size=(b, 5)).astype(np.int32)),
        "phone_length": jnp.full((b,), 5, jnp.int32),
        "chars": jnp.asarray(
            rng.integers(1, N_CHAR, size=(b, 6)).astype(np.int32)),
    }


def _init_state(model, batch, tx):
    variables = model.init(jax.random.PRNGKey(0), batch["wav"][:1],
                           batch["phones"][:1])
    return ASRTrainState.create(apply_fn=model.apply,
                                params=variables["params"], tx=tx,
                                batch_stats=variables.get("batch_stats"))


def test_grad_accum_defers_and_matches_full_batch():
    """k=2 on two IDENTICAL micro-batches: params must not move after the
    first micro-step, and after the second must equal the k=1 update on
    the same batch (identical halves -> mean grad == each half's grad)."""
    cfg = tiny_cfg()
    model = ConformerCTC(cfg, N_PHONE, N_CHAR)
    batch = tiny_batch()
    rng = jax.random.PRNGKey(7)

    tx_acc = make_optimizer({"lr": 1e-2, "grad_accum_steps": 2})
    state = _init_state(model, batch, tx_acc)
    p0 = state.params
    step = make_train_step(model, tx_acc, blank_id=N_PHONE - 1,
                           donate=False)
    # dropout=0 and a FIXED rng make both micro-steps identical even
    # though state.step advances
    state1, _ = step(state.replace(step=0), batch, rng)
    mid = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p0, state1.params)
    assert max(jax.tree.leaves(mid)) == 0.0, "update applied too early"

    state2, _ = step(state1.replace(step=0), batch, rng)

    tx_one = make_optimizer({"lr": 1e-2})
    ref_state = _init_state(model, batch, tx_one)
    ref_step = make_train_step(model, tx_one, blank_id=N_PHONE - 1,
                               donate=False)
    ref1, _ = ref_step(ref_state.replace(step=0), batch, rng)

    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state2.params, ref1.params)
    assert max(jax.tree.leaves(diffs)) < 1e-6


@pytest.mark.parametrize("training", [False, True])
def test_remat_blocks_numerics_identical(training):
    """remat changes WHERE activations come from in the backward, never
    their values: loss and grads must match the stored-activation path."""
    batch = tiny_batch()
    rng = jax.random.PRNGKey(3)

    outs = {}
    for remat in (False, True):
        cfg = tiny_cfg(remat_blocks=remat)
        model = ConformerCTC(cfg, N_PHONE, N_CHAR)
        variables = model.init(jax.random.PRNGKey(0), batch["wav"][:1],
                               batch["phones"][:1])

        def loss_fn(p):
            total, _ = _loss_and_metrics(
                model, p, variables.get("batch_stats"), batch, rng,
                N_PHONE - 1, training)
            return total

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        outs[remat] = (float(loss), grads)

    # remat changes XLA fusion boundaries -> float32 reassociation noise
    # (measured ~1e-7 relative on the loss, ~7e-6 abs on grads)
    assert outs[False][0] == pytest.approx(outs[True][0], rel=1e-5)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        outs[False][1], outs[True][1])
    assert max(jax.tree.leaves(diffs)) < 1e-4
