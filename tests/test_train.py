"""Train-step tests: learning works, data-parallel sharding over the
8-device CPU mesh compiles and matches single-device results, and the full
state checkpoints round-trip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorflowasr_tpu.models.conformer import ConformerCTC, ConformerConfig
from tensorflowasr_tpu.parallel import mesh as mesh_lib
from tensorflowasr_tpu.train.asr_trainer import (
    make_eval_step,
    make_predict_step,
    make_train_step,
    mask_loss,
)
from tensorflowasr_tpu.train.state import ASRTrainState, make_optimizer

CFG = ConformerConfig(dmodel=32, num_blocks=1, head_size=8, num_heads=2,
                      kernel_size=8, dropout=0.0, ctcdecoder_num_blocks=1,
                      translator_num_blocks=1, ctcdecoder_dropout=0.0,
                      translator_dropout=0.0)
N_PHONE, N_CHAR = 20, 30
BLANK = N_PHONE - 1


def _batch(rng, b=8):
    t = 8000  # 50 mel frames -> 13 encoder frames
    wav = rng.standard_normal((b, t)).astype(np.float32) * 0.1
    input_length = np.full((b,), 13, np.int32)
    phones = rng.integers(1, N_PHONE - 1, size=(b, 6)).astype(np.int32)
    phone_length = np.full((b,), 6, np.int32)
    chars = rng.integers(1, N_CHAR, size=(b, 8)).astype(np.int32)
    return {
        "wav": jnp.asarray(wav),
        "input_length": jnp.asarray(input_length),
        "phones": jnp.asarray(phones),
        "phone_length": jnp.asarray(phone_length),
        "chars": jnp.asarray(chars),
    }


def _make_state(batch):
    model = ConformerCTC(CFG, N_PHONE, N_CHAR)
    variables = model.init(jax.random.PRNGKey(0), batch["wav"][:1],
                           batch["phones"][:1])
    tx = make_optimizer({"lr": 3e-3})
    state = ASRTrainState.create(apply_fn=model.apply,
                                 params=variables["params"], tx=tx,
                                 batch_stats=variables.get("batch_stats"))
    return model, tx, state


def test_train_step_decreases_loss(rng):
    batch = _batch(rng)
    model, tx, state = _make_state(batch)
    step = make_train_step(model, tx, BLANK, donate=False)
    rng_key = jax.random.PRNGKey(1)
    state, m0 = step(state, batch, rng_key)
    losses = [float(m0["train_loss"])]
    for _ in range(15):
        state, m = step(state, batch, rng_key)
        losses.append(float(m["train_loss"]))
    assert losses[-1] < losses[0] * 0.9, losses
    assert np.isfinite(losses).all()


def test_train_step_sharded_matches_unsharded(rng):
    """Gradients and metrics on an 8-device data-parallel mesh must match
    single-device execution (the implicit psum must be a true global mean).

    Post-Adam params are NOT compared: the first Adam update is
    ~ -lr*sign(g), which flips on reduction-order noise for near-zero
    gradients — gradients themselves are the well-conditioned quantity.
    """
    from tensorflowasr_tpu.train.asr_trainer import _loss_and_metrics

    batch = _batch(rng, b=8)
    model, tx, state = _make_state(batch)
    rng_key = jax.random.PRNGKey(1)

    def loss_and_grads(st, bt):
        grad_fn = jax.value_and_grad(
            lambda p: _loss_and_metrics(model, p, st.batch_stats, bt,
                                        rng_key, BLANK, True),
            has_aux=True)
        (loss, (metrics, _)), grads = grad_fn(st.params)
        return loss, metrics, grads

    jitted = jax.jit(loss_and_grads)

    loss1, m1, g1 = jitted(state, batch)

    mesh = mesh_lib.make_mesh()
    assert mesh.devices.size == 8
    state_r = mesh_lib.replicate(state, mesh)
    batch_s = mesh_lib.shard_batch(batch, mesh)
    loss2, m2, g2 = jitted(state_r, batch_s)

    assert float(loss1) == pytest.approx(float(loss2), rel=1e-5)
    for k in m1:
        assert float(m1[k]) == pytest.approx(float(m2[k]), rel=1e-4), k
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_eval_and_predict_steps(rng):
    batch = _batch(rng)
    model, tx, state = _make_state(batch)
    estep = make_eval_step(model, BLANK)
    metrics = estep(state, batch)
    assert np.isfinite(float(metrics["train_loss"]))
    pstep = make_predict_step(model, BLANK)
    phone_ids, phone_lens, char_ids = pstep(state, batch["wav"],
                                            batch["input_length"])
    assert phone_ids.shape[0] == 8
    assert char_ids.shape[1] == phone_ids.shape[1] + 10


def test_mask_loss_balances_pad_and_tokens():
    labels = jnp.asarray([[1, 2, 0, 0]])
    good = jnp.full((1, 4, 5), 0.0).at[0, 0, 1].set(10.0)\
        .at[0, 1, 2].set(10.0).at[0, 2, 0].set(10.0).at[0, 3, 0].set(10.0)
    bad = jnp.zeros((1, 4, 5))
    assert float(mask_loss(labels, good)[0]) < float(mask_loss(labels, bad)[0])


def test_checkpoint_roundtrip(tmp_path, rng):
    from tensorflowasr_tpu.train.checkpoint import CheckpointManager

    batch = _batch(rng, b=2)
    model, tx, state = _make_state(batch)
    step = make_train_step(model, tx, BLANK, donate=False)
    state, _ = step(state, batch, jax.random.PRNGKey(1))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(int(state.step), state)
    assert mgr.latest_step() == 1

    abstract = jax.tree.map(np.zeros_like, state)
    restored = mgr.restore_latest(abstract)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == 1
    mgr.close()
