"""On-device SpecAugment (ops/specaug.py): mask statistics, determinism,
and train-path wiring for both the offline and chunk models.

Replaces the reference's host-side STFT hole masking
(augmentations/augments.py:9-26) with an in-graph op — these tests pin the
semantics (bands fully inside the axis, mean-fill, training-only)."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowasr_tpu.ops.specaug import spec_augment


def test_masks_fill_with_mean_and_stay_in_bounds():
    rng = jax.random.PRNGKey(0)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, 100, 80)).astype(np.float32)) + 5.0
    out = spec_augment(mel, rng, n_freq_masks=2, freq_width=27,
                       n_time_masks=2, time_ratio=0.1)
    assert out.shape == mel.shape
    changed = np.asarray(out != mel)
    assert changed.any(), "some positions must be masked"
    # every changed position carries the per-utterance mean
    mean = np.asarray(jnp.mean(mel, axis=(1, 2)))
    for b in range(4):
        vals = np.asarray(out)[b][changed[b]]
        if vals.size:
            np.testing.assert_allclose(vals, mean[b], rtol=1e-5)
    # masked fraction is plausible (2x27/80 freq + 2x10/100 time upper bound)
    assert changed.mean() < 0.9


def test_deterministic_under_fixed_rng_and_off_when_zero_masks():
    rng = jax.random.PRNGKey(7)
    mel = jnp.ones((2, 50, 80), jnp.float32)
    a = spec_augment(mel, rng)
    b = spec_augment(mel, rng)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = spec_augment(mel, rng, n_freq_masks=0, n_time_masks=0)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(mel))


def test_offline_encoder_applies_only_in_training():
    from tensorflowasr_tpu.models.conformer import (ConformerCTC,
                                                    ConformerConfig)

    cfg = ConformerConfig(dmodel=32, num_blocks=1, head_size=8, num_heads=2,
                          kernel_size=8, dropout=0.0,
                          ctcdecoder_num_blocks=1, translator_num_blocks=1,
                          spec_augment=True, specaug_time_ratio=0.3)
    model = ConformerCTC(cfg, 8, 10)
    wav = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 16000)).astype(np.float32) * 0.1)
    phones = jnp.ones((2, 4), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), wav[:1], phones[:1])

    # eval path: no rng needed, output deterministic
    e1 = model.apply(variables, wav, method=ConformerCTC.encode)
    e2 = model.apply(variables, wav, method=ConformerCTC.encode)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    # train path: different dropout rngs -> different masks -> different enc
    t1, _ = model.apply(variables, wav, True, method=ConformerCTC.encode,
                        rngs={"dropout": jax.random.PRNGKey(1)},
                        mutable=["batch_stats"])
    t2, _ = model.apply(variables, wav, True, method=ConformerCTC.encode,
                        rngs={"dropout": jax.random.PRNGKey(2)},
                        mutable=["batch_stats"])
    assert not np.array_equal(np.asarray(t1), np.asarray(t2))


def test_train_step_runs_with_spec_augment():
    from tensorflowasr_tpu.models.conformer import (ConformerCTC,
                                                    ConformerConfig)
    from tensorflowasr_tpu.train.asr_trainer import make_train_step
    from tensorflowasr_tpu.train.state import (ASRTrainState,
                                               make_optimizer)

    n_phone, n_char = 8, 10
    cfg = ConformerConfig(dmodel=32, num_blocks=1, head_size=8, num_heads=2,
                          kernel_size=8, ctcdecoder_num_blocks=1,
                          translator_num_blocks=1, spec_augment=True)
    model = ConformerCTC(cfg, n_phone, n_char)
    batch = {
        "wav": jnp.asarray(np.random.default_rng(2).standard_normal(
            (2, 16000)).astype(np.float32) * 0.1),
        "input_length": jnp.asarray([25, 25], jnp.int32),
        "phones": jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32),
        "phone_length": jnp.asarray([3, 3], jnp.int32),
        "chars": jnp.asarray([[2, 3, 1], [4, 5, 1]], jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["wav"][:1],
                           batch["phones"][:1])
    tx = make_optimizer({"lr": 1e-3})
    state = ASRTrainState.create(apply_fn=model.apply,
                                 params=variables["params"], tx=tx,
                                 batch_stats=variables.get("batch_stats"))
    step = make_train_step(model, tx, blank_id=n_phone - 1, donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["train_loss"]))


def test_chunk_front_spec_augment_train_only():
    import dataclasses

    from tensorflowasr_tpu.models.chunk_conformer import (
        ChunkConformer, ChunkConformerConfig, ChunkStackConfig)

    tiny = ChunkStackConfig(dmodel=32, num_blocks=1, head_size=8,
                            num_heads=2, kernel_size=8, win_front=4)
    cfg = ChunkConformerConfig(
        dmodel=32, chunk_num=16, spec_augment=True, specaug_time_ratio=0.2,
        encoder=tiny, picker=tiny, helper=tiny,
        decoder=dataclasses.replace(tiny, win_back=0))
    model = ChunkConformer(cfg, 8, 10)
    wav = jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, cfg.chunk_samples * 4)).astype(np.float32) * 0.1)
    extra = jnp.ones((2, 4), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), wav[:1], extra[:1], 8,
                           False, method=ChunkConformer.train_forward)

    outs, _ = model.apply(variables, wav, extra, 8, True,
                          rngs={"dropout": jax.random.PRNGKey(1)},
                          mutable=["batch_stats"],
                          method=ChunkConformer.train_forward)
    leaf = jax.tree_util.tree_leaves(outs)[0]
    assert np.all(np.isfinite(np.asarray(leaf, dtype=np.float32)))

    # eval path unaffected by the flag (no rng, deterministic)
    o1 = model.apply(variables, wav, extra, 8, False,
                     method=ChunkConformer.train_forward)
    o2 = model.apply(variables, wav, extra, 8, False,
                     method=ChunkConformer.train_forward)
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(o1)[0]),
        np.asarray(jax.tree_util.tree_leaves(o2)[0]))


def test_spec_augment_flows_from_user_config():
    """speech_config.spec_augment reaches the model config through the
    same two-YAML path the CLIs use."""
    from tensorflowasr_tpu.models.conformer import ConformerConfig
    from tensorflowasr_tpu.models.chunk_conformer import ChunkConformerConfig
    from tensorflowasr_tpu.utils.config import UserConfig

    cfg = UserConfig(extra={
        "speech_config": {"spec_augment": True, "specaug_freq_width": 13},
        "model_config": {"name": "ConformerCTC",
                         "ChunkConformerFront": {"spec_augment": True}}})
    c = ConformerConfig.from_user_config(cfg)
    assert c.spec_augment and c.specaug_freq_width == 13
    cc = ChunkConformerConfig.from_user_config(cfg)
    assert cc.spec_augment
