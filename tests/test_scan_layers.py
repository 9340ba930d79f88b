"""scan_layers: scanned encoder == unrolled encoder after param
conversion, with the expected compile-time benefit."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowasr_tpu.models.conformer import (
    ConformerCTC,
    ConformerConfig,
    count_params,
    stack_encoder_block_params,
    unstack_encoder_block_params,
)


def _models():
    kw = dict(dmodel=32, num_blocks=3, head_size=8, num_heads=2,
              kernel_size=8, dropout=0.0, ctcdecoder_num_blocks=1,
              translator_num_blocks=1)
    return (ConformerCTC(ConformerConfig(scan_layers=False, **kw), 8, 10),
            ConformerCTC(ConformerConfig(scan_layers=True, **kw), 8, 10))


def test_scanned_matches_unrolled_after_conversion():
    unrolled, scanned = _models()
    wav = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 16000)).astype(np.float32) * 0.1)
    ph = jnp.ones((1, 4), jnp.int32)
    v_u = unrolled.init(jax.random.PRNGKey(0), wav[:1], ph)
    assert count_params(v_u["params"]) == count_params(
        scanned.init(jax.random.PRNGKey(0), wav[:1], ph)["params"])

    # convert unrolled -> stacked layout and run through the scanned model
    v_s = jax.tree.map(lambda x: x, v_u)  # shallow copy containers
    v_s = {
        "params": dict(v_u["params"]),
        **({"batch_stats": dict(v_u["batch_stats"])}
           if "batch_stats" in v_u else {}),
    }
    v_s["params"]["encoder"] = stack_encoder_block_params(
        v_u["params"]["encoder"], 3)
    if "batch_stats" in v_s and "encoder" in v_s["batch_stats"]:
        v_s["batch_stats"]["encoder"] = stack_encoder_block_params(
            v_s["batch_stats"]["encoder"], 3)

    out_u = np.asarray(unrolled.apply(v_u, wav, method=ConformerCTC.encode))
    out_s = np.asarray(scanned.apply(v_s, wav, method=ConformerCTC.encode))
    np.testing.assert_allclose(out_s, out_u, atol=2e-5, rtol=1e-4)

    # round trip back
    back = unstack_encoder_block_params(v_s["params"]["encoder"])
    for k, sub in v_u["params"]["encoder"].items():
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(back[k])[0]),
            np.asarray(jax.tree.leaves(sub)[0]), rtol=1e-6)


def test_scanned_train_step_descends():
    from tensorflowasr_tpu.train.asr_trainer import make_train_step
    from tensorflowasr_tpu.train.state import ASRTrainState, make_optimizer

    _, scanned = _models()
    rng = np.random.default_rng(1)
    batch = {
        "wav": jnp.asarray(rng.standard_normal(
            (2, 16000)).astype(np.float32) * 0.1),
        "input_length": jnp.full((2,), 25, jnp.int32),
        "phones": jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32),
        "phone_length": jnp.full((2,), 3, jnp.int32),
        "chars": jnp.asarray([[2, 3, 1], [4, 5, 1]], jnp.int32),
    }
    v = scanned.init(jax.random.PRNGKey(0), batch["wav"][:1],
                     batch["phones"][:1])
    tx = make_optimizer({"lr": 3e-3})
    state = ASRTrainState.create(apply_fn=scanned.apply,
                                 params=v["params"], tx=tx,
                                 batch_stats=v.get("batch_stats"))
    step = make_train_step(scanned, tx, blank_id=7, donate=False)
    losses = []
    key = jax.random.PRNGKey(1)
    for _ in range(6):
        state, m = step(state, batch, key)
        losses.append(float(m["train_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_scan_unroll_numerics_identical():
    """scan_unroll only changes the lax.scan lowering — outputs must match
    unroll=1 for the same stacked params up to XLA fusion rounding."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tensorflowasr_tpu.models.layers import ScannedConformerBlocks

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 20, 32)).astype(np.float32))
    kw = dict(num_blocks=3, input_dim=32, dropout=0.0, head_size=8,
              num_heads=2, kernel_size=8)
    m1 = ScannedConformerBlocks(**kw, unroll=1)
    m3 = ScannedConformerBlocks(**kw, unroll=3)
    v = m1.init(jax.random.PRNGKey(0), x)
    o1 = m1.apply(v, x)
    o3 = m3.apply(v, x)  # same params work: layout is unchanged
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o3),
                               atol=1e-5, rtol=1e-5)
