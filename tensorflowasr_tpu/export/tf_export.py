"""TF SavedModel export (jax2tf) in the reference's 3-graph layout.

The reference exports its offline pipeline as three graphs — encoder /
ctc_decoder / translator — both as opset-13 ONNX
(`/root/reference/test_asr.py:226-242`) and as TF SavedModels
(`convert_to_pb`, test_asr.py:244-259); its whole Python/C++ serving
stack consumes those. This module produces the SavedModel form of the
SAME layout from our flax models via ``jax.experimental.jax2tf``, so:

- any TF-based consumer loads our models directly
  (``tf.saved_model.load(dir).signatures['serving_default']``);
- the ONNX form is one standard command away in any environment with
  tf2onnx installed (not available in this image, documented in
  MIGRATION.md):

      python -m tf2onnx.convert --saved-model <out>/encoder \
          --output encoder.onnx --opset 13

Graph signatures mirror the reference exactly (test_asr.py:231-241):

- encoder:    wav [B, S, 1] float32       -> enc [B, T, dmodel]
- ctc_decoder: enc [B, T, dmodel]         -> ctc logits [B, T, n_phone]
- translator: (phone_ids [B, U] int32,
               enc [B, T, dmodel])        -> char logits [B, U', n_char]

Dynamic shapes: batch is polymorphic in every graph; TIME dims are
bucketed — one signature per configured duration (and a fixed max phone
width on the translator). The models' positional encodings are
deliberately static numpy tables, and duration bucketing is this
framework's standard serving discipline anyway; consumers pad to the
bucket exactly like our own serving stack does.

Parity is tested in tests/test_tf_export.py (TF execution vs the JAX
model, token-exact greedy decode on CPU).
"""

from __future__ import annotations

import os
from typing import Sequence

import jax.numpy as jnp
import numpy as np


def export_savedmodel_offline(model, variables, outdir: str,
                              durations: Sequence[float] = (2, 4, 6, 8),
                              sample_rate: int = 16000,
                              max_phone_len: int = 64) -> dict:
    """Write encoder/, ctc_decoder/, translator/ SavedModels under
    ``outdir``; returns {name: path}."""
    import jax
    import tensorflow as tf
    from jax.experimental import jax2tf

    from tensorflowasr_tpu.models.conformer import ConformerCTC

    paths = {}

    def save(name, module):
        path = os.path.join(outdir, name)
        tf.saved_model.save(module, path,
                            signatures=module.signatures_dict)
        paths[name] = path
        return path

    def encode(wav):
        # [B, S, 1] -> [B, S] (the reference keeps an explicit channel
        # axis on its wav input, test_asr.py:233)
        return model.apply(variables, wav[:, :, 0],
                           method=ConformerCTC.encode)

    def ctc(enc):
        return model.apply(variables, enc, method=ConformerCTC.ctc_logits)

    def translate(phone_ids, enc):
        return model.apply(variables, phone_ids, enc,
                           method=ConformerCTC.translate)

    # enc frames per duration bucket (without running the device: use
    # jax.eval_shape on the encoder)
    def enc_frames(s):
        out = jax.eval_shape(
            lambda w: encode(w), jax.ShapeDtypeStruct((1, s, 1),
                                                      jnp.float32))
        return out.shape[1]

    enc_mod, ctc_mod, tr_mod = tf.Module(), tf.Module(), tf.Module()
    enc_sigs, ctc_sigs, tr_sigs = {}, {}, {}
    d_model = model.cfg.dmodel
    for d in durations:
        s = int(round(d * sample_rate))
        t = enc_frames(s)
        key = f"serving_{int(d * 1000)}ms"

        fn = tf.function(
            jax2tf.convert(encode, polymorphic_shapes=[f"(b, {s}, 1)"],
                           with_gradient=False),
            input_signature=[tf.TensorSpec([None, s, 1], tf.float32,
                                           name="wav")])
        enc_sigs[key] = fn.get_concrete_function()
        setattr(enc_mod, f"enc_{key}", fn)            # keep refs alive

        fn = tf.function(
            jax2tf.convert(ctc, polymorphic_shapes=[f"(b, {t}, _)"],
                           with_gradient=False),
            input_signature=[tf.TensorSpec([None, t, d_model],
                                           tf.float32, name="enc")])
        ctc_sigs[key] = fn.get_concrete_function()
        setattr(ctc_mod, f"ctc_{key}", fn)

        fn = tf.function(
            jax2tf.convert(
                translate,
                polymorphic_shapes=[f"(b, {max_phone_len})", f"(b, {t}, _)"],
                with_gradient=False),
            input_signature=[
                tf.TensorSpec([None, max_phone_len], tf.int32,
                              name="phone_ids"),
                tf.TensorSpec([None, t, d_model], tf.float32,
                              name="enc")])
        tr_sigs[key] = fn.get_concrete_function()
        setattr(tr_mod, f"tr_{key}", fn)

    default = f"serving_{int(max(durations) * 1000)}ms"
    for sigs in (enc_sigs, ctc_sigs, tr_sigs):
        sigs["serving_default"] = sigs[default]
    enc_mod.signatures_dict = enc_sigs
    ctc_mod.signatures_dict = ctc_sigs
    tr_mod.signatures_dict = tr_sigs
    save("encoder", enc_mod)
    save("ctc_decoder", ctc_mod)
    save("translator", tr_mod)

    with open(os.path.join(outdir, "README.txt"), "w") as f:
        f.write(
            "TF SavedModel export, reference 3-graph layout "
            "(encoder / ctc_decoder / translator).\n"
            "ONNX: python -m tf2onnx.convert --saved-model <dir>/encoder "
            "--output encoder.onnx --opset 13  (same for the others).\n"
            f"encoder signatures: one per duration bucket "
            f"{tuple(durations)} s at {sample_rate} Hz "
            "(pad audio to the bucket, like the serving stack does).\n")
    return paths


def export_savedmodel_chunk_streaming(model, variables, outdir: str) -> dict:
    """Stateful chunk-streaming SavedModel export: the reference's
    consumable picker/decoder pair (test_chunk_asr.py:141-274 drives
    picker.onnx + decoder.onnx with explicit cache IO; the graphs are
    built by chunk_conformer_blocks.py:854-911). Layout mirrored here:

    - ``picker/``: input_wav [1, chunk_samples, 1] + named cache inputs
      -> (phone_logits [1, t, Vp], hidden [1, t, d], n_final [1]) + the
      updated caches (same names). The host argmaxes phone_logits over
      the final frames and forwards non-blank rows of ``hidden`` — the
      reference's pick_feature (test_chunk_asr.py:166-176).
    - ``decoder/``: valid_enc_out [1, 1, d] + named cache inputs ->
      (char_logits [1, 1, Vc], provisional [1, L_d, Vc], n_final [1]) +
      updated caches. One call per picked frame: sequential s=1 calls
      evolve the rings exactly like our fused_stream_step's micro-steps
      (and like feeding the reference's decoder n rows at once — ring
      state after n rows is identical either way).

    Deviations from the reference artifact, both documented for
    consumers in the emitted README.txt: (a) cache IO is NAMED (dict
    signatures) rather than positional — the reference's own consumer
    zips outputs onto inputs generically, names make that trivial;
    (b) every graph ships an ``init_states`` signature returning the
    zero cache tree, so consumers never hardcode shapes/dtypes;
    (c) there is no separate "unvalid" phone head — our exact-lookahead
    rings re-emit pending frames as FINAL on a later step instead of
    previewing them (the char side's preview is the ``provisional``
    output, matching the reference's unvalid text tail).

    Parity with ``ChunkConformer.fused_stream_step`` is token-exact
    (tests/test_tf_export.py::test_savedmodel_chunk_streaming_parity).
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    from tensorflowasr_tpu.models.chunk_conformer import ChunkConformer

    c = model.cfg
    pk0 = model.apply(variables, 1,
                      method=ChunkConformer.init_picker_caches)
    dec0 = model.apply(variables, 1,
                       method=ChunkConformer.init_decoder_caches)
    pk_keys = sorted(pk0)
    dec_keys = sorted(dec0)

    def _np_specs(tree, keys):
        return [tf.TensorSpec(tuple(np.asarray(tree[k]).shape),
                              tf.as_dtype(np.asarray(tree[k]).dtype.name),
                              name=f"{k}_cache") for k in keys]

    def picker_fn(wav, *cache_vals):
        caches = dict(zip(pk_keys, cache_vals))
        logits, hidden, n_final, new = model.apply(
            variables, wav[:, :, 0], caches,
            method=ChunkConformer.picker_stream_step)
        return (logits, hidden, n_final) + tuple(new[k] for k in pk_keys)

    def decoder_fn(picked, *cache_vals):
        caches = dict(zip(dec_keys, cache_vals))
        logits, prov, n_final, new = model.apply(
            variables, picked, caches,
            method=ChunkConformer.decoder_stream_step)
        return (logits, prov, n_final) + tuple(new[k] for k in dec_keys)

    def build(fn, head_names, inp_spec, keys, tree):
        conv = jax2tf.convert(fn, with_gradient=False)
        names = list(head_names) + list(keys)

        def wrapped(*args):
            return dict(zip(names, conv(*args)))

        tff = tf.function(wrapped,
                          input_signature=[inp_spec] + _np_specs(tree, keys))

        def init_states():
            return {k: tf.zeros(tuple(np.asarray(tree[k]).shape),
                                tf.as_dtype(np.asarray(tree[k]).dtype.name))
                    for k in keys}

        init = tf.function(init_states, input_signature=[])
        mod = tf.Module()
        mod.step = tff          # keep refs alive
        mod.init = init
        mod.signatures_dict = {
            "serving_default": tff.get_concrete_function(),
            "init_states": init.get_concrete_function(),
        }
        return mod

    picker_mod = build(
        picker_fn, ("phone_logits", "hidden", "n_final"),
        tf.TensorSpec([1, c.chunk_samples, 1], tf.float32,
                      name="input_wav"),
        pk_keys, pk0)
    dec_mod = build(
        decoder_fn, ("char_logits", "provisional", "n_final"),
        tf.TensorSpec([1, 1, c.dmodel], tf.float32, name="valid_enc_out"),
        dec_keys, dec0)

    paths = {}
    for name, mod in (("picker", picker_mod), ("decoder", dec_mod)):
        path = os.path.join(outdir, name)
        tf.saved_model.save(mod, path, signatures=mod.signatures_dict)
        paths[name] = path

    with open(os.path.join(outdir, "README.txt"), "w") as f:
        f.write(
            "Stateful chunk-streaming SavedModel export "
            "(picker / decoder pair, reference test_chunk_asr.py "
            "onnx_stream_call layout).\n"
            "Protocol per 160 ms chunk:\n"
            "  1. states = picker.signatures['init_states']() once;\n"
            "     out = picker.signatures['serving_default']("
            "input_wav=[1, chunk, 1], **{k + '_cache': v}).\n"
            "  2. phone rows: argmax(out['phone_logits'][0, i]); for the "
            "last n_final rows whose argmax != blank (= Vp - 1), call "
            "decoder.signatures['serving_default'](valid_enc_out="
            "out['hidden'][:, i:i+1], **dec_states) once per row, in "
            "order.\n"
            "  3. copy each graph's returned caches into the next call's "
            "'<name>_cache' inputs.\n"
            "char_logits rows are FINAL once decoder n_final > 0; "
            "'provisional' previews the pending lookahead tail (the "
            "reference's unvalid text).\n"
            "ONNX: python -m tf2onnx.convert --saved-model <dir>/picker "
            "--output picker.onnx --opset 15  (same for decoder).\n")
    return paths


def load_chunk_streaming_session(outdir: str, phone_blank: int):
    """Minimal TF-side consumer of the stateful pair — mirrors the
    reference's onnx_stream_call host loop (test_chunk_asr.py:179-254):
    run picker per chunk, host-pick non-blank frames, advance the
    decoder one picked frame at a time. Used by the parity test and as
    migration sample code. Returns step(wav_chunk) -> (phone_ids,
    char_ids, provisional_ids) per-chunk lists."""
    import tensorflow as tf

    picker = tf.saved_model.load(os.path.join(outdir, "picker"))
    decoder = tf.saved_model.load(os.path.join(outdir, "decoder"))
    pk_sig = picker.signatures["serving_default"]
    dec_sig = decoder.signatures["serving_default"]
    pk_state = {k: v for k, v in
                picker.signatures["init_states"]().items()}
    dec_state = {k: v for k, v in
                 decoder.signatures["init_states"]().items()}

    def step(wav_chunk: np.ndarray):
        out = pk_sig(input_wav=tf.constant(
            np.asarray(wav_chunk, np.float32).reshape(1, -1, 1)),
            **{f"{k}_cache": v for k, v in pk_state.items()})
        for k in pk_state:
            pk_state[k] = out[k]
        logits = out["phone_logits"].numpy()[0]
        hidden = out["hidden"].numpy()
        n_final = int(out["n_final"].numpy()[0])
        t = logits.shape[0]
        phone_ids = logits.argmax(-1).astype(np.int32)
        char_ids, prov_ids = [], []
        for i in range(t):
            if i < t - n_final or phone_ids[i] == phone_blank:
                continue
            dout = dec_sig(valid_enc_out=tf.constant(hidden[:, i:i + 1]),
                           **{f"{k}_cache": v
                              for k, v in dec_state.items()})
            for k in dec_state:
                dec_state[k] = dout[k]
            if int(dout["n_final"].numpy()[0]) > 0:
                char_ids.append(
                    int(dout["char_logits"].numpy()[0, 0].argmax(-1)))
            prov_ids = list(
                dout["provisional"].numpy()[0].argmax(-1).astype(int))
        return list(phone_ids), char_ids, prov_ids

    return step


def load_offline_session(outdir: str):
    """Minimal TF-side consumer mirroring the reference's
    PythonInference asr session (encoder -> ctc greedy -> translator);
    used by the parity test and as migration sample code."""
    import tensorflow as tf

    enc_m = tf.saved_model.load(os.path.join(outdir, "encoder"))
    ctc_m = tf.saved_model.load(os.path.join(outdir, "ctc_decoder"))
    tr_m = tf.saved_model.load(os.path.join(outdir, "translator"))

    def run(wav: np.ndarray, duration_key: str, blank_id: int,
            pad_to: int):
        wav = np.asarray(wav, np.float32)
        if wav.ndim == 1:
            wav = wav[None]
        if wav.shape[1] > pad_to:
            raise ValueError(
                f"wav has {wav.shape[1]} samples but the "
                f"'{duration_key}' signature takes exactly {pad_to}; "
                "pick a longer duration bucket (or split the audio) — "
                "the exported encoder signatures are duration-bucketed")
        if wav.shape[1] < pad_to:
            wav = np.pad(wav, ((0, 0), (0, pad_to - wav.shape[1])))
        enc = enc_m.signatures[duration_key](
            wav=tf.constant(wav[:, :, None]))
        enc = list(enc.values())[0]
        logits = ctc_m.signatures[duration_key](enc=enc)
        logits = list(logits.values())[0]
        ids = tf.argmax(logits, -1, output_type=tf.int32).numpy()
        # greedy collapse (merge repeats, drop blanks), then translator
        toks = []
        for row in ids:
            out, prev = [], -1
            for t in row:
                if t != prev and t != blank_id:
                    out.append(int(t))
                prev = t
            toks.append(out)
        tr_sig = tr_m.signatures[duration_key]
        width = int(tr_sig.structured_input_signature[1]
                    ["phone_ids"].shape[1])
        padded = np.zeros((len(toks), width), np.int32)
        for i, t in enumerate(toks):
            padded[i, :min(len(t), width)] = t[:width]
        char_logits = tr_sig(phone_ids=tf.constant(padded), enc=enc)
        char_logits = list(char_logits.values())[0]
        return toks, np.asarray(char_logits)

    return run
