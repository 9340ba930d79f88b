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
