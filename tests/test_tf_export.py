"""TF SavedModel export (jax2tf, reference 3-graph layout): TF-side
execution must reproduce the JAX model — token-exact greedy decode and
close logits — so a reference-ecosystem consumer (TF, or ONNX via
tf2onnx where available) can load our models.

Reference surface being mirrored: test_asr.py:226-259 (convert_to_onnx /
convert_to_pb: encoder, ctc_model, translator graphs)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

tf = pytest.importorskip("tensorflow")


def test_savedmodel_offline_parity(tmp_path):
    import jax
    import jax.numpy as jnp

    from tensorflowasr_tpu.export.tf_export import (
        export_savedmodel_offline,
        load_offline_session,
    )
    from tensorflowasr_tpu.models.conformer import (
        ConformerCTC,
        ConformerConfig,
    )
    from tensorflowasr_tpu.ops.ctc import ctc_greedy_decode

    n_phone, n_char = 12, 17
    cfg = ConformerConfig(dmodel=32, num_blocks=1, head_size=8,
                          num_heads=2, kernel_size=8, dropout=0.0,
                          ctcdecoder_num_blocks=1, translator_num_blocks=1,
                          ctcdecoder_dropout=0.0, translator_dropout=0.0)
    model = ConformerCTC(cfg, n_phone, n_char)
    rng = np.random.default_rng(0)
    sr, dur = 16000, 1
    wav = rng.standard_normal((2, dur * sr)).astype(np.float32) * 0.1
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(wav[:1]),
                           jnp.ones((1, 4), jnp.int32))

    out = str(tmp_path / "sm")
    export_savedmodel_offline(model, variables, out, durations=(dur,),
                              sample_rate=sr, max_phone_len=16)

    # JAX side of the parity check
    enc_j = model.apply(variables, jnp.asarray(wav),
                        method=ConformerCTC.encode)
    logits_j = model.apply(variables, enc_j,
                           method=ConformerCTC.ctc_logits)
    in_len = jnp.full((2,), logits_j.shape[1], jnp.int32)
    ids_j, lens_j = ctc_greedy_decode(logits_j, in_len,
                                      blank_id=n_phone - 1)
    toks_j = [list(np.asarray(ids_j)[i][:int(lens_j[i])])
              for i in range(2)]

    # TF side through the exported artifacts
    run = load_offline_session(out)
    toks_tf, char_logits_tf = run(wav, f"serving_{dur * 1000}ms",
                                  blank_id=n_phone - 1, pad_to=dur * sr)

    assert toks_tf == toks_j

    # logits parity on the encoder output (different backends: loose f32
    # tolerance, argmax already shown identical via the tokens)
    enc_m = tf.saved_model.load(out + "/encoder")
    enc_tf = enc_m.signatures[f"serving_{dur * 1000}ms"](
        wav=tf.constant(wav[:, :, None]))
    enc_tf = list(enc_tf.values())[0].numpy()
    np.testing.assert_allclose(enc_tf, np.asarray(enc_j), atol=2e-3,
                               rtol=2e-3)

    # translator parity on a fixed phone sequence (the exported width)
    padded = np.zeros((2, 16), np.int32)
    for i, t in enumerate(toks_j):
        padded[i, :min(len(t), 16)] = t[:16]
    char_j = model.apply(variables, jnp.asarray(padded), enc_j,
                         method=ConformerCTC.translate)
    tr_m = tf.saved_model.load(out + "/translator")
    char_tf = tr_m.signatures["serving_default"](
        phone_ids=tf.constant(padded), enc=tf.constant(enc_tf))
    char_tf = list(char_tf.values())[0].numpy()
    assert np.array_equal(np.argmax(char_tf, -1),
                          np.argmax(np.asarray(char_j), -1))
