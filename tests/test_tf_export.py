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


def test_savedmodel_chunk_streaming_parity(tmp_path):
    """The stateful picker/decoder SavedModel pair, driven by the
    reference-style host loop (load_chunk_streaming_session), must
    reproduce ChunkConformer.fused_stream_step token-exactly: same phone
    argmaxes, same emitted final char ids, same provisional tail.

    Reference surface being mirrored: test_chunk_asr.py:141-274
    (convert_to_onnx picker/decoder + onnx_stream_call host loop)."""
    import jax
    import jax.numpy as jnp

    from tensorflowasr_tpu.export.tf_export import (
        export_savedmodel_chunk_streaming,
        load_chunk_streaming_session,
    )
    from tensorflowasr_tpu.models.chunk_conformer import (
        ChunkConformer,
        ChunkConformerConfig,
        ChunkStackConfig,
    )

    n_phone, n_char = 12, 17
    stack = dict(dmodel=16, head_size=8, num_heads=2, kernel_size=4,
                 dropout=0.0, win_front=6)
    cfg = ChunkConformerConfig(
        dmodel=16, reduction_factor=4, front_dropout=0.0,
        sample_rate=16000, n_mels=20, stride_ms=10, chunk_num=16,
        encoder=ChunkStackConfig(num_blocks=2, win_back=0, **stack),
        picker=ChunkStackConfig(num_blocks=1, win_back=0, **stack),
        decoder=ChunkStackConfig(num_blocks=1, win_back=2, **stack),
        helper=ChunkStackConfig(num_blocks=1, win_back=0, **stack),
    )
    model = ChunkConformer(cfg, n_phone, n_char)
    rng = np.random.default_rng(3)
    n_chunks = 5
    wav = rng.standard_normal(
        (1, cfg.chunk_samples * n_chunks)).astype(np.float32) * 0.3
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(wav),
                           jnp.ones((1, 6), jnp.int32), 10, False,
                           method=ChunkConformer.train_forward)

    out = str(tmp_path / "chunk_sm")
    export_savedmodel_chunk_streaming(model, variables, out)

    step_tf = load_chunk_streaming_session(out, phone_blank=n_phone - 1)

    caches = model.apply(variables, 1,
                         method=ChunkConformer.init_stream_caches)
    fused = jax.jit(lambda w, c: model.apply(
        variables, w, c, method=ChunkConformer.fused_stream_step))

    any_char = False
    for i in range(n_chunks):
        chunk = wav[:, i * cfg.chunk_samples:(i + 1) * cfg.chunk_samples]
        ph_j, ch_j, prov_j, n_final_j, caches = fused(
            jnp.asarray(chunk), caches)
        ph_tf, ch_tf, prov_tf = step_tf(chunk[0])

        t = cfg.sub_length
        nf = int(np.asarray(n_final_j)[0])
        # phone argmaxes over the final region must agree exactly
        assert list(np.asarray(ph_j)[t - nf:]) == list(ph_tf[t - nf:]), i
        # emitted final char ids: fused emits -1 where nothing final
        ch_j_list = [int(x) for x in np.asarray(ch_j) if x >= 0]
        assert ch_j_list == ch_tf, (i, ch_j_list, ch_tf)
        any_char = any_char or bool(ch_tf)
        # provisional tail (argmaxes over valid pending slots)
        prov_j_list = [int(x) for x in np.asarray(prov_j) if x >= 0]
        if prov_j_list:
            assert prov_j_list == prov_tf[-len(prov_j_list):], i
    assert any_char, "test signal never produced a picked frame"
