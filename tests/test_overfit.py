"""Learning sanity: a tiny ConformerCTC must overfit two synthetic
utterances until greedy CTC decodes them exactly (proves loss, decode,
and the train loop agree end-to-end)."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowasr_tpu.models.conformer import ConformerCTC, ConformerConfig
from tensorflowasr_tpu.ops.ctc import ctc_greedy_decode
from tensorflowasr_tpu.train.asr_trainer import make_train_step
from tensorflowasr_tpu.train.state import ASRTrainState, make_optimizer
from tensorflowasr_tpu.utils.metrics import cer


def test_overfit_two_utterances():
    sr = 16000
    n_phone, n_char = 8, 10
    cfg = ConformerConfig(dmodel=32, num_blocks=2, head_size=8, num_heads=2,
                          kernel_size=8, dropout=0.0,
                          ctcdecoder_num_blocks=1, translator_num_blocks=1)
    model = ConformerCTC(cfg, n_phone, n_char)
    blank = n_phone - 1

    # two distinct tone patterns with distinct labels
    t = np.arange(sr) / sr
    wav = np.stack([
        0.5 * np.sin(2 * np.pi * 220 * t),
        0.5 * np.sin(2 * np.pi * 550 * t) * np.sign(np.sin(2 * np.pi * 3 * t)),
    ]).astype(np.float32)
    batch = {
        "wav": jnp.asarray(wav),
        "input_length": jnp.asarray([25, 25], jnp.int32),
        "phones": jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32),
        "phone_length": jnp.asarray([3, 3], jnp.int32),
        "chars": jnp.asarray([[2, 3, 1], [4, 5, 1]], jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["wav"][:1],
                           batch["phones"][:1])
    tx = make_optimizer({"lr": 5e-3})
    state = ASRTrainState.create(apply_fn=model.apply,
                                 params=variables["params"], tx=tx,
                                 batch_stats=variables.get("batch_stats"))
    step = make_train_step(model, tx, blank_id=blank, donate=False)
    key = jax.random.PRNGKey(1)
    # 600 fixed steps: the params overfit in ~100, but the BatchNorm
    # RUNNING stats (momentum 0.99) need several hundred more to match
    # the batch stats — before that, eval-mode decode collapses to
    # blanks (bumped 400 -> 600 with the round-5 Keras glorot inits:
    # smaller first-layer activations made the running-stat catch-up
    # marginally slower)
    for _ in range(600):
        state, metrics = step(state, batch, key)
    assert float(metrics["ctc_acc"]) > 0.999

    v = {"params": state.params}
    if state.batch_stats is not None:
        v["batch_stats"] = state.batch_stats
    enc = model.apply(v, batch["wav"], method=ConformerCTC.encode)
    logits = model.apply(v, enc, method=ConformerCTC.ctc_logits)
    ids, lens = ctc_greedy_decode(logits, batch["input_length"],
                                  blank_id=blank)
    errs = []
    for b in range(2):
        ref = list(np.asarray(batch["phones"][b, :3]))
        hyp = list(np.asarray(ids)[b, :int(lens[b])])
        errs.append(cer(ref, hyp))
    assert np.mean(errs) == 0.0, (errs, np.asarray(ids), np.asarray(lens))
