"""Tensor parallelism (parallel/tp.py): Megatron-style GSPMD sharding of
the Conformer encoder over a ("data", "model") mesh.

Beyond the reference's capability surface (its only parallelism is
MirroredStrategy DP) — parity bar here is numerical: the TP+DP train
step must produce the same loss and updated params as the
single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from tensorflowasr_tpu.models.conformer import ConformerCTC, ConformerConfig
from tensorflowasr_tpu.parallel import mesh as mesh_lib
from tensorflowasr_tpu.parallel import tp
from tensorflowasr_tpu.train.asr_trainer import make_train_step
from tensorflowasr_tpu.train.state import ASRTrainState, make_optimizer

N_PHONE, N_CHAR = 12, 16


def _model():
    cfg = ConformerConfig(dmodel=16, num_blocks=2, head_size=4,
                          num_heads=4, kernel_size=8, dropout=0.0,
                          ctcdecoder_num_blocks=1, ctcdecoder_dropout=0.0,
                          translator_num_blocks=1, translator_dropout=0.0)
    return ConformerCTC(cfg, N_PHONE, N_CHAR)


def _batch(b=4):
    rng = np.random.default_rng(0)
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


def _state(model, batch):
    variables = model.init(jax.random.PRNGKey(0), batch["wav"][:1],
                           batch["phones"][:1])
    return ASRTrainState.create(apply_fn=model.apply,
                                params=variables["params"],
                                tx=make_optimizer({"lr": 1e-3}),
                                batch_stats=variables.get("batch_stats"))


def test_tp_rules_shard_the_right_leaves():
    mesh = mesh_lib.make_mesh(axis_names=("data", "model"), shape=(2, 4))
    model = _model()
    batch = _batch()
    state = tp.shard_state_tp(_state(model, batch), mesh)

    blk = state.params["encoder"]["conformer_block_0"]
    ffn1 = blk["ff_module_1"]["ffn1"]["kernel"]        # [16, 64]
    assert ffn1.sharding.spec == P(None, "model")
    assert ffn1.addressable_shards[0].data.shape == (16, 64 // 4)
    ffn2 = blk["ff_module_1"]["ffn2"]["kernel"]        # [64, 16]
    assert ffn2.sharding.spec == P("model", None)
    q = blk["mhsa"]["mha"]["query"]["kernel"]          # [16, 4, 4]
    assert q.sharding.spec == P(None, "model", None)
    assert q.addressable_shards[0].data.shape == (16, 1, 4)
    out = blk["mhsa"]["mha"]["out"]["kernel"]          # [4, 4, 16]
    assert out.sharding.spec == P("model", None, None)
    # non-ruled leaves replicate
    conv = blk["conv_module"]["pw_conv_1"]["kernel"]
    assert conv.sharding.spec == P()
    # adam moments shard like their params (same leaf paths)
    mu = jax.tree_util.tree_leaves_with_path(state.opt_state)
    sharded_mu = [l for kp, l in mu
                  if "ffn1" in jax.tree_util.keystr(kp)
                  and "kernel" in jax.tree_util.keystr(kp)]
    assert sharded_mu and all(
        l.sharding.spec == P(None, "model") for l in sharded_mu)


def test_tp_step_matches_single_device():
    """SGD on purpose: updated params are then params - lr*grad, so the
    comparison measures GRADIENT parity directly. (With Adam, a
    reassociated float32 reduction that flips the sign of a ~1e-9
    gradient element moves that param by a full +/-lr — noise
    amplification, not a sharding bug.)"""
    import optax

    model = _model()
    batch = _batch()
    rng = jax.random.PRNGKey(5)
    lr = 1e-2

    def fresh_state():
        variables = model.init(jax.random.PRNGKey(0), batch["wav"][:1],
                               batch["phones"][:1])
        return ASRTrainState.create(apply_fn=model.apply,
                                    params=variables["params"],
                                    tx=optax.sgd(lr),
                                    batch_stats=variables.get("batch_stats"))

    step = make_train_step(model, optax.sgd(lr), blank_id=N_PHONE - 1,
                           donate=False)

    ref_state, ref_metrics = step(fresh_state(), batch, rng)
    ref_loss = float(ref_metrics["train_loss"])

    mesh = mesh_lib.make_mesh(axis_names=("data", "model"), shape=(2, 4))
    state_tp = tp.shard_state_tp(fresh_state(), mesh)
    batch_tp = tp.shard_batch_dp(batch, mesh)
    new_state, metrics = step(state_tp, batch_tp, rng)
    tp_loss = float(metrics["train_loss"])

    assert abs(tp_loss - ref_loss) < 1e-4 * max(1.0, abs(ref_loss))
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        ref_state.params, new_state.params)
    assert max(jax.tree.leaves(diffs)) < lr * 1e-2

    # the updated ffn1 kernel must still be model-sharded (GSPMD kept the
    # layout end-to-end instead of silently replicating)
    ffn1 = new_state.params["encoder"]["conformer_block_0"][
        "ff_module_1"]["ffn1"]["kernel"]
    assert "model" in jax.tree.leaves(
        [ffn1.sharding.spec])[0:] or ffn1.sharding.spec == P(None, "model")


def test_depthwise_grad_partial_replication():
    """The reason layers.DepthwiseConv1D exists: XLA's grouped-conv
    kernel gradient over-counts by the replica factor on partially
    replicated meshes (batch sharded on 'data', params replicated across
    'model'). The shifted-slice form must give the same gradient sharded
    and unsharded."""
    from jax.sharding import NamedSharding

    from tensorflowasr_tpu.models.layers import DepthwiseConv1D

    c, b, t, k = 16, 8, 24, 5
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    mod = DepthwiseConv1D(c, k, padding="SAME")
    params = mod.init(jax.random.PRNGKey(0), x)

    def loss(p, x):
        y = mod.apply(p, x)
        return jnp.sum(y * y)

    g = jax.jit(jax.grad(loss))
    g_ref = g(params, x)

    mesh = mesh_lib.make_mesh(axis_names=("data", "model"), shape=(2, 4))
    ps = jax.tree.map(
        lambda l: jax.device_put(l, NamedSharding(mesh, P())), params)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    g_tp = g(ps, xs)
    diffs = jax.tree.map(
        lambda a, b_: float(jnp.max(jnp.abs(a - b_))), g_ref, g_tp)
    assert max(jax.tree.leaves(diffs)) < 1e-3  # NOT 4x over-counted


def test_indivisible_dims_fall_back_to_replication():
    """heads=4 on an 8-wide model axis must replicate, not error."""
    mesh = mesh_lib.make_mesh(axis_names=("model",), shape=(8,))
    model = _model()
    batch = _batch()
    state = tp.shard_state_tp(_state(model, batch), mesh)
    q = state.params["encoder"]["conformer_block_0"]["mhsa"]["mha"][
        "query"]["kernel"]                             # heads dim = 4
    assert q.sharding.spec == P()                      # 4 % 8 != 0
    ffn1 = state.params["encoder"]["conformer_block_0"][
        "ff_module_1"]["ffn1"]["kernel"]               # [16, 64]
    assert ffn1.sharding.spec == P(None, "model")      # 64 % 8 == 0
